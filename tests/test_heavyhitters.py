"""Heavy hitters (operators/heavyhitters.heavy_hitters): randomized
differential vs the naive exact plan on heavy-tailed corpora across
partitionings, candidate-set boundedness (the 100 TB claim), threshold
boundary from both sides, null handling, plan shape (broadcast pass-2
join), validation."""

import random

import pytest
from pyspark.sql import functions as F

from ocr_application_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_candidates,
)


def _tokens_df(spark, toks, n_parts):
    return spark.createDataFrame(
        [(t,) for t in toks], "token string"
    ).repartition(n_parts)


def _naive(toks, num, den):
    n = sum(1 for t in toks if t is not None)
    counts = {}
    for t in toks:
        if t is not None:
            counts[t] = counts.get(t, 0) + 1
    return {
        t: (c, (c * 10000) // n, n)
        for t, c in counts.items()
        if c * den > n * num
    }


def _collect(df):
    return {r.token: (r.cnt, r.share_bp, r.n_total) for r in df.collect()}


def test_differential_vs_naive_on_heavy_tail(spark):
    """Zipf-ish stream: a few head tokens + a huge singleton tail; the
    two-pass plan must equal the naive exact answer for every phi and
    partitioning — including partitionings chosen to scatter head
    tokens thinly."""
    rng = random.Random(23)
    toks = []
    for i in range(8):  # head
        toks += [f"head{i}"] * rng.randrange(150, 400)
    toks += [f"tail{i}" for i in range(4000)]  # singleton tail
    toks += [f"mid{i}" for i in range(40) for _ in range(rng.randrange(2, 25))]
    rng.shuffle(toks)
    for num, den in [(1, 100), (1, 500), (3, 1000)]:
        want = _naive(toks, num, den)
        assert want, (num, den)  # fixture must exercise a non-empty cut
        for n_parts in (1, 3, 8):
            got = _collect(
                heavy_hitters(_tokens_df(spark, toks, n_parts), phi=(num, den))
            )
            assert got == want, (num, den, n_parts)


def test_candidate_set_is_bounded_by_partitions_times_capacity(spark):
    """The scale claim: however large the vocabulary, pass 1 emits at
    most capacity keys per partition (plus one sentinel row each)."""
    toks = [f"u{i}" for i in range(20_000)] + ["hot"] * 500
    df = _tokens_df(spark, toks, 4)
    cap = 50
    out = mg_candidates(df, "token", cap).collect()
    keys = [r.token for r in out if r.token is not None]
    sentinels = [r.part_n for r in out if r.token is None]
    assert len(keys) <= 4 * cap
    assert "hot" in keys  # the only key above n_p/(cap+1) anywhere
    assert sum(sentinels) == len(toks)


def test_threshold_boundary_exact(spark):
    """count*den > N*num is strict: a key at exactly phi*N is OUT, one
    occurrence more is IN. N = 1000, phi = 1/10: 100 is out, 101 is in."""
    toks = ["at"] * 100 + ["above"] * 101 + ["pad"] * 799
    got = _collect(heavy_hitters(_tokens_df(spark, toks, 2), phi=(1, 10)))
    assert set(got) == {"above", "pad"}
    assert got["above"] == (101, 1010, 1000)


def test_nulls_are_not_counted_and_never_hit(spark):
    toks = ["x"] * 30 + [None] * 200 + [f"t{i}" for i in range(60)]
    got = _collect(heavy_hitters(_tokens_df(spark, toks, 2), phi=(1, 4)))
    # N excludes nulls: 90 tokens, threshold 22.5 -> x (30) is the hitter
    assert got == {"x": (30, 3333, 90)}


def test_result_is_partitioning_invariant_even_when_candidates_differ(spark):
    """Candidate sets legitimately differ across partitionings; the
    final exact result must not."""
    rng = random.Random(7)
    toks = ["a"] * 60 + ["b"] * 59 + [f"z{i}" for i in range(800)]
    rng.shuffle(toks)
    results = [
        _collect(heavy_hitters(_tokens_df(spark, toks, p), phi=(1, 20)))
        for p in (1, 2, 7)
    ]
    assert results[0] == results[1] == results[2]
    assert set(results[0]) == {"a", "b"}


def test_pass2_join_is_broadcast(spark):
    """Plan contract: pass 2 joins the exploded stream to the candidate
    set via BroadcastHashJoin — never a sort-merge over the full key
    space."""
    df = _tokens_df(spark, ["a"] * 50 + [f"t{i}" for i in range(100)], 2)
    plan = heavy_hitters(df, phi=(1, 10))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_validation(spark):
    df = _tokens_df(spark, ["a", "b"], 1)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, phi=(0, 5))
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, phi=(5, 5))
    with pytest.raises(ValueError, match="provably complete"):
        heavy_hitters(df, phi=(1, 100), capacity=10)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, phi=(1, 100), capacity=3_000_000)
    with pytest.raises(ValueError, match="identifier"):
        mg_candidates(df, "tok; drop", 10)


def test_larger_capacity_changes_nothing_but_candidates(spark):
    toks = ["h"] * 40 + [f"t{i}" for i in range(300)]
    df = _tokens_df(spark, toks, 3)
    tight = _collect(heavy_hitters(df, phi=(1, 10)))
    roomy = _collect(heavy_hitters(df, phi=(1, 10), capacity=5000))
    assert tight == roomy == {"h": (40, 1176, 340)}
