"""KMV distinct-count sketch (operators/sketches.kmv_distinct):
randomized differential vs a hashlib twin of the integer spec, the
exact small-cardinality branch, null exclusion, accuracy sanity at
k=64, validation."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from ocr_application_spark.operators.sketches import _HEX_WIDTH, _SPACE, kmv_distinct


def _twin(rows, k):
    """Dict-model twin: md5-hex truncation, distinct, sort, bottom-k,
    same integer estimate arithmetic, plus the mergeable hash state."""
    groups = {}
    for g, v in rows:
        if v is None:
            continue
        groups.setdefault(g, set()).add(
            hashlib.md5(str(v).encode()).hexdigest()[:_HEX_WIDTH]
        )
    out = {}
    for g, hs in groups.items():
        bottom = sorted(hs)[:k]
        n_seen = len(bottom)
        kth = bottom[-1]
        est = (
            n_seen
            if n_seen < k
            else ((k - 1) * _SPACE) // max(1, int(kth, 16))
        )
        out[g] = (n_seen, kth, est, tuple(bottom))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "g string, v long")
    got = kmv_distinct(df, "g", F.col("v"), k=k)
    assert got.columns == [
        "g", "n_seen", "kth_hash", "distinct_est", "hashes", "sketch_k",
    ]
    assert {r.sketch_k for r in got.collect()} <= {k}
    return {
        r.g: (r.n_seen, r.kth_hash, r.distinct_est, tuple(r.hashes))
        for r in got.collect()
    }


def test_randomized_differential_vs_hashlib_twin(spark):
    rng = random.Random(11)
    for trial, k in enumerate([2, 5, 16]):
        rows = [
            (f"g{rng.randrange(4)}", rng.randrange(200)) for _ in range(600)
        ]
        assert _run(spark, rows, k) == _twin(rows, k), (trial, k)


def test_small_groups_are_exact(spark):
    # fewer distinct values than k -> n_seen < k -> the count is exact
    rows = [("a", v % 3) for v in range(50)] + [("b", 7)]
    got = _run(spark, rows, 16)
    assert got["a"][0] == 3 and got["a"][2] == 3
    assert got["b"][0] == 1 and got["b"][2] == 1


def test_nulls_contribute_nothing(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("z", None)], "g string, v long"
    )
    got = {
        r.g: (r.n_seen, r.distinct_est)
        for r in kmv_distinct(df, "g", F.col("v"), k=8).collect()
    }
    # an all-null group has no distinct values and no sketch row at all
    assert got == {"a": (2, 2)}


def test_estimate_accuracy_at_k64(spark):
    # deterministic fixture: 2000 distinct values, each duplicated;
    # KMV stderr at k=64 is ~12.6%, so 40% is a loose-but-meaningful gate
    rows = [("big", v) for v in range(2000)] * 2
    est = _run(spark, rows, 64)["big"][2]
    assert abs(est - 2000) / 2000 < 0.40, est


def test_validation(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    for bad in (1, 0, -3, 32001):
        with pytest.raises(ValueError, match="k must be"):
            kmv_distinct(df, "g", F.col("v"), k=bad)


def test_merge_of_slice_sketches_equals_direct(spark):
    from ocr_application_spark.operators.sketches import kmv_merge

    rng = random.Random(41)
    rows = [(f"g{rng.randrange(3)}", rng.randrange(500)) for _ in range(900)]
    k = 16
    direct = _run(spark, rows, k)
    # sketch three arbitrary slices independently, merge their states
    slices = [rows[0::3], rows[1::3], rows[2::3]]
    states = None
    for s in slices:
        df = spark.createDataFrame(s, "g string, v long")
        st = kmv_distinct(df, "g", F.col("v"), k=k).select("g", "hashes", "sketch_k")
        states = st if states is None else states.unionByName(st)
    merged = kmv_merge(states, "g", k=k)
    got = {
        r.g: (r.n_seen, r.kth_hash, r.distinct_est, tuple(r.hashes))
        for r in merged.collect()
    }
    assert got == direct


def test_merge_validation(spark):
    from ocr_application_spark.operators.sketches import kmv_merge

    df = spark.createDataFrame(
        [("a", ["ff"], 8)], "g string, hashes array<string>, sketch_k long"
    )
    with pytest.raises(ValueError, match="k must be"):
        kmv_merge(df, "g", k=1)


def test_merge_at_larger_k_than_slices_fails_loud(spark):
    # merging at k > slice sketch_k would silently UNDERestimate
    # (ranks slice_k+1..k of the union are missing from the state)
    from ocr_application_spark.operators.sketches import kmv_merge

    rows = [("a", v) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    states = kmv_distinct(df, "g", F.col("v"), k=8).select(
        "g", "hashes", "sketch_k"
    )
    with pytest.raises(Exception, match="cannot merge at k=16"):
        kmv_merge(states, "g", k=16).collect()
    # ...while merging at a SMALLER k than the slices is sound
    down = kmv_merge(states, "g", k=4).collect()[0]
    direct = kmv_distinct(df, "g", F.col("v"), k=4).collect()[0]
    assert (down.n_seen, down.kth_hash, down.distinct_est) == (
        direct.n_seen, direct.kth_hash, direct.distinct_est,
    )


def test_null_hash_in_reconstructed_state_is_ignored(spark):
    from ocr_application_spark.operators.sketches import kmv_merge

    df = spark.createDataFrame(
        [("a", ["0f", None, "aa"], 8)],
        "g string, hashes array<string>, sketch_k long",
    )
    row = kmv_merge(df, "g", k=8).collect()[0]
    assert (row.n_seen, row.kth_hash) == (2, "aa")


def test_overlap_matches_twin_and_handles_one_sided_groups(spark):
    """kmv_overlap == inclusion-exclusion over the twin's bottom-k
    states on random overlapping sets; a group on one side only gets
    est 0 for the missing side and overlap 0."""
    from ocr_application_spark.operators.sketches import kmv_distinct, kmv_overlap

    rng = random.Random(17)
    k = 8
    rows_a = [(f"g{rng.randrange(3)}", rng.randrange(120)) for _ in range(400)]
    rows_b = [(f"g{rng.randrange(3)}", rng.randrange(120) + 40) for _ in range(400)]
    rows_a += [("only_a", v) for v in range(30)]
    rows_b += [("only_b", v) for v in range(25)]
    dfa = spark.createDataFrame(rows_a, "g string, v long")
    dfb = spark.createDataFrame(rows_b, "g string, v long")
    got = {
        r.g: (r.est_a, r.est_b, r.est_union, r.overlap_est)
        for r in kmv_overlap(
            kmv_distinct(dfa, "g", F.col("v"), k=k),
            kmv_distinct(dfb, "g", F.col("v"), k=k),
            "g",
            k,
        ).collect()
    }
    ta, tb = _twin(rows_a, k), _twin(rows_b, k)
    want = {}
    for g in set(ta) | set(tb):
        ea = ta[g][2] if g in ta else 0
        eb = tb[g][2] if g in tb else 0
        # union est: re-rank the two states' hashes through the twin
        merged_hashes = sorted(
            set(ta.get(g, (0, "", 0, ()))[3]) | set(tb.get(g, (0, "", 0, ()))[3])
        )[:k]
        n_seen = len(merged_hashes)
        eu = (
            n_seen
            if n_seen < k
            else ((k - 1) * _SPACE) // max(1, int(merged_hashes[-1], 16))
        )
        want[g] = (ea, eb, eu, max(0, ea + eb - eu))
    assert got == want
    assert got["only_a"][1] == 0 and got["only_a"][3] == 0
    assert got["only_b"][0] == 0 and got["only_b"][3] == 0


def test_overlap_exact_on_small_disjoint_and_identical_sets(spark):
    """n_seen<k branch: overlap estimates are EXACT for small sets —
    disjoint -> 0, identical -> the set size, partial -> the true
    intersection."""
    from ocr_application_spark.operators.sketches import kmv_distinct, kmv_overlap

    dfa = spark.createDataFrame(
        [("d", v) for v in range(5)] + [("i", v) for v in range(4)]
        + [("p", v) for v in range(6)],
        "g string, v long",
    )
    dfb = spark.createDataFrame(
        [("d", v) for v in range(10, 15)] + [("i", v) for v in range(4)]
        + [("p", v) for v in range(3, 9)],
        "g string, v long",
    )
    got = {
        r.g: r.overlap_est
        for r in kmv_overlap(
            kmv_distinct(dfa, "g", F.col("v"), k=64),
            kmv_distinct(dfb, "g", F.col("v"), k=64),
            "g",
            64,
        ).collect()
    }
    assert got == {"d": 0, "i": 4, "p": 3}
