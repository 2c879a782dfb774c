"""As-of join (operators/asof.asof_join): randomized differential vs a
pure-Python scan twin, equal-ts inclusion, duplicate-(key, ts) right
rows, tolerance, composite keys, null-payload-field survival,
no-match null extension, validation."""

import random

import pytest
from pyspark.sql import functions as F

from ocr_application_spark.operators.asof import asof_join


def _twin(left, right, tolerance=None):
    """Scan twin: for each left (key, ts, lid), the matching right row
    is the max by (ts, payload) among rows with right.ts <= left.ts
    (and >= left.ts - tolerance when bounded)."""
    out = []
    for k, lts, lid in left:
        cands = [
            (rts, p)
            for rk, rts, p in right
            if rk == k
            and rts <= lts
            and (tolerance is None or lts - rts <= tolerance)
        ]
        if cands:
            rts, p = max(cands)
            out.append((k, lts, lid, rts, p))
        else:
            out.append((k, lts, lid, None, None))
    return sorted(out, key=lambda r: r[2])


def _run(spark, left, right, tolerance=None):
    ldf = spark.createDataFrame(left, "k long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k long, vts long, p long")
    got = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="vts",
        payload=["p"], tolerance=tolerance,
    )
    assert got.columns == ["k", "ts", "lid", "vts", "p"]
    return sorted(
        [(r.k, r.ts, r.lid, r.vts, r.p) for r in got.collect()],
        key=lambda r: r[2],
    )


def test_randomized_differential_vs_scan_twin(spark):
    rng = random.Random(7)
    for trial in range(4):
        # tiny ts range forces equal-ts collisions on both sides
        left = [
            (rng.randrange(5), rng.randrange(20), i) for i in range(60)
        ]
        right = [
            (rng.randrange(5), rng.randrange(20), rng.randrange(1000))
            for _ in range(40)
        ]
        tol = None if trial % 2 == 0 else rng.randrange(1, 8)
        assert _run(spark, left, right, tol) == _twin(left, right, tol), (
            trial,
            tol,
        )


def test_equal_ts_version_is_visible(spark):
    # backward-INCLUSIVE: the version published at exactly the event ts wins
    assert _run(spark, [(1, 10, 0)], [(1, 10, 77), (1, 9, 66)]) == [
        (1, 10, 0, 10, 77)
    ]


def test_duplicate_key_ts_right_rows_resolve_to_max_payload(spark):
    got = _run(spark, [(1, 10, 0)], [(1, 10, 3), (1, 10, 9), (1, 10, 5)])
    assert got == [(1, 10, 0, 10, 9)]


def test_no_match_extends_with_nulls(spark):
    assert _run(spark, [(1, 5, 0)], [(1, 6, 1), (2, 1, 2)]) == [
        (1, 5, 0, None, None)
    ]
    assert _run(spark, [(1, 5, 0)], []) == [(1, 5, 0, None, None)]


def test_tolerance_bounds_the_lookback(spark):
    left = [(1, 100, 0)]
    right = [(1, 90, 1)]
    assert _run(spark, left, right, tolerance=10) == [(1, 100, 0, 90, 1)]
    assert _run(spark, left, right, tolerance=9) == [(1, 100, 0, None, None)]


def test_null_payload_field_inside_matched_version_survives(spark):
    # the right row travels as one struct, so a NULL payload FIELD in
    # the matched version must not fall through to an older version
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    rdf = spark.createDataFrame(
        [(1, 5, 11), (1, 8, None)], "k long, vts long, p long"
    )
    row = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="vts", payload=["p"]
    ).collect()[0]
    assert (row.vts, row.p) == (8, None)


def test_composite_key(spark):
    ldf = spark.createDataFrame(
        [(1, "a", 10, 0), (1, "b", 10, 1)], "k1 long, k2 string, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(1, "a", 4, 100), (1, "b", 6, 200)], "k1 long, k2 string, vts long, p long"
    )
    got = {
        r.lid: (r.vts, r.p)
        for r in asof_join(
            ldf, rdf, on=["k1", "k2"], left_ts="ts", right_ts="vts",
            payload=["p"],
        ).collect()
    }
    assert got == {0: (4, 100), 1: (6, 200)}


def test_validation(spark):
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, ts long, p long")
    rdf = spark.createDataFrame([(1, 5, 1)], "k long, vts long, p long")
    with pytest.raises(ValueError, match="at least one right column"):
        asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="vts", payload=[])
    with pytest.raises(ValueError, match="collide"):
        asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="vts", payload=["p"])
    ldf2 = ldf.withColumnRenamed("p", "lid")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            ldf2, rdf, on="k", left_ts="ts", right_ts="vts",
            payload=["p"], tolerance=-1,
        )


def test_left_columns_pass_through_untouched(spark):
    ldf = spark.createDataFrame(
        [(1, 10, "x", 3.5)], "k long, ts long, tag string, score double"
    )
    rdf = spark.createDataFrame([(1, 2, 9)], "k long, vts long, p long")
    row = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="vts", payload=["p"]
    ).collect()[0]
    assert (row.k, row.ts, row.tag, row.score, row.vts, row.p) == (
        1, 10, "x", 3.5, 2, 9,
    )


def test_null_right_ts_is_never_a_match(spark):
    # a version "published at no time" must not become a phantom
    # fallback (NULL sorts first and would shadow every key group)
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    rdf = spark.createDataFrame([(1, None, 99)], "k long, vts long, p long")
    row = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="vts", payload=["p"]
    ).collect()[0]
    assert (row.vts, row.p) == (None, None)
    # ...and a NULL-ts row must not shadow a real older version either
    rdf2 = spark.createDataFrame(
        [(1, None, 99), (1, 5, 7)], "k long, vts long, p long"
    )
    row = asof_join(
        ldf, rdf2, on="k", left_ts="ts", right_ts="vts", payload=["p"]
    ).collect()[0]
    assert (row.vts, row.p) == (5, 7)


def test_reserved_internal_names_rejected(spark):
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, ts long, _m long")
    rdf = spark.createDataFrame([(1, 5, 1)], "k long, vts long, p long")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="vts", payload=["p"])


# --- interval_overlap_join --------------------------------------------------


def _ovl(spark, a_rows, b_rows, bucket):
    from ocr_application_spark.operators.asof import interval_overlap_join

    a = spark.createDataFrame(a_rows, "k long, a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "k long, b_id long, b_s long, b_e long")
    return {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, on=["k"], a_start="a_s", a_end="a_e",
            b_start="b_s", b_end="b_e", bucket=bucket,
        ).collect()
    }


def test_overlap_closed_endpoints_and_bin_crossing(spark):
    # closed intervals: touching endpoints ARE an overlap; pairs whose
    # intervals meet across a bin boundary must survive (the canonical
    # bin is the one holding max(starts)); disjoint pairs never appear
    a = [(1, 10, 100, 200), (1, 11, 950, 1050)]   # 11 straddles bin 0|1
    b = [
        (1, 20, 200, 300),     # touches a10 at exactly 200 -> overlap
        (1, 21, 1040, 1100),   # overlaps a11 across the bin boundary
        (1, 22, 300, 400),     # disjoint from a10 (301..), from a11
        (2, 23, 100, 200),     # right key, wrong partition key
    ]
    got = _ovl(spark, a, b, bucket=1000)
    assert got == {(10, 20), (11, 21)}


def test_overlap_matches_naive_join_on_random_intervals(spark):
    # randomized differential vs the O(n^2) definition, long intervals
    # included (spanning many bins) — the bucketization must lose and
    # invent nothing, and emit each pair exactly once
    import random

    rng = random.Random(7)
    a = []
    b = []
    for i in range(120):
        k = rng.randrange(4)
        s = rng.randrange(0, 5000)
        a.append((k, i, s, s + rng.randrange(0, 2500)))
        k2 = rng.randrange(4)
        s2 = rng.randrange(0, 5000)
        b.append((k2, 1000 + i, s2, s2 + rng.randrange(0, 2500)))
    want = {
        (ai, bi)
        for (ka, ai, s1, e1) in a
        for (kb, bi, s2, e2) in b
        if ka == kb and s1 <= e2 and s2 <= e1
    }
    # exactly-once: collect as a list and check no duplicates
    from ocr_application_spark.operators.asof import interval_overlap_join

    adf = spark.createDataFrame(a, "k long, a_id long, a_s long, a_e long")
    bdf = spark.createDataFrame(b, "k long, b_id long, b_s long, b_e long")
    rows = interval_overlap_join(
        adf, bdf, on=["k"], a_start="a_s", a_end="a_e",
        b_start="b_s", b_end="b_e", bucket=700,
    ).collect()
    got = [(r.a_id, r.b_id) for r in rows]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == want


def test_overlap_validation(spark):
    import pytest as _pytest

    from ocr_application_spark.operators.asof import interval_overlap_join

    a = spark.createDataFrame([(1, 1, 1, 2)], "k long, x long, a_s long, a_e long")
    b = spark.createDataFrame([(1, 2, 1, 2)], "k long, x long, b_s long, b_e long")
    with _pytest.raises(ValueError, match="collide"):
        interval_overlap_join(a, b, ["k"], "a_s", "a_e", "b_s", "b_e", 10)
    b2 = b.withColumnRenamed("x", "y")
    with _pytest.raises(ValueError, match="positive"):
        interval_overlap_join(a, b2, ["k"], "a_s", "a_e", "b_s", "b_e", 0)
    with _pytest.raises(ValueError, match="reserved"):
        interval_overlap_join(
            a.withColumnRenamed("x", "_bin"), b2,
            ["k"], "a_s", "a_e", "b_s", "b_e", 10,
        )
