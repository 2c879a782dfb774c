"""Zone-map data skipping (sources/snapshots.plan_scan / scan_snapshot):
pruning on clustered commits, randomized scan==filter differential,
conservative keeps (no stats, new columns, strings), timestamp ranges,
stats survival through compaction, validation."""

import datetime
import random

import pytest
from pyspark.sql import functions as F

from ocr_application_spark.sources.snapshots import (
    commit,
    compact,
    plan_scan,
    read_snapshot,
    scan_snapshot,
)


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("score")
    )


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


def test_disjoint_commits_prune_and_match_full_scan(spark, tmpdir_scratch):
    t = f"{tmpdir_scratch}/t"
    for lo in (0, 100, 200):
        commit(_ids(spark, lo, lo + 100).coalesce(1), t)
    plan = plan_scan(t, {"doc_id": (150, 160)})
    assert plan["total"] == 3 and plan["skipped"] == 2, plan
    got = scan_snapshot(spark, t, {"doc_id": (150, 160)})
    want = read_snapshot(spark, t).filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") <= 160)
    )
    assert _collect(got) == _collect(want)
    # a range matching nothing prunes everything and returns empty with
    # the table schema
    none = scan_snapshot(spark, t, {"doc_id": (900, 950)})
    assert none.count() == 0 and none.columns == ["doc_id", "score"]
    assert plan_scan(t, {"doc_id": (900, 950)})["skipped"] == 3


def test_randomized_scan_equals_filter(spark, tmpdir_scratch):
    rng = random.Random(23)
    t = f"{tmpdir_scratch}/r"
    for _ in range(3):
        rows = [(rng.randrange(1000), float(rng.randrange(50))) for _ in range(200)]
        commit(
            spark.createDataFrame(rows, "doc_id long, score double").coalesce(2),
            t,
        )
    for _ in range(6):
        lo = rng.choice([None, rng.randrange(1000)])
        hi = rng.choice([None, rng.randrange(1000)])
        ranges = {"doc_id": (lo, hi)}
        want = read_snapshot(spark, t)
        if lo is not None:
            want = want.filter(F.col("doc_id") >= lo)
        if hi is not None:
            want = want.filter(F.col("doc_id") <= hi)
        assert _collect(scan_snapshot(spark, t, ranges)) == _collect(want), ranges


def test_string_ranges_prune_nothing_but_filter_exactly(spark, tmpdir_scratch):
    # strings are excluded from zone stats by design (parquet may
    # truncate binary min/max); the residual filter still applies
    t = f"{tmpdir_scratch}/s"
    commit(
        spark.createDataFrame(
            [("alpha", 1), ("omega", 2), ("zeta", 3)], "name string, v long"
        ).coalesce(1),
        t,
    )
    plan = plan_scan(t, {"name": ("m", "t")})
    assert plan["skipped"] == 0
    assert _collect(scan_snapshot(spark, t, {"name": ("m", "t")})) == [("omega", 2)]


def test_new_column_after_evolution_keeps_old_files(spark, tmpdir_scratch):
    t = f"{tmpdir_scratch}/e"
    commit(_ids(spark, 0, 50).coalesce(1), t)
    commit(
        _ids(spark, 50, 100).withColumn("extra", F.col("doc_id") + 1000).coalesce(1),
        t,
    )
    # old files have no stats for `extra` -> kept; their projected NULL
    # rows fall to the residual filter, so the result is exact
    got = scan_snapshot(spark, t, {"extra": (1050, 1060)})
    want = read_snapshot(spark, t).filter(
        (F.col("extra") >= 1050) & (F.col("extra") <= 1060)
    )
    assert _collect(got) == _collect(want)
    assert got.count() == 11


def test_timestamp_ranges_prune(spark, tmpdir_scratch):
    t = f"{tmpdir_scratch}/ts"
    base = datetime.datetime(2024, 1, 1)
    for day in (0, 10):
        rows = [
            (i, base + datetime.timedelta(days=day, hours=i)) for i in range(5)
        ]
        commit(spark.createDataFrame(rows, "i long, ts timestamp").coalesce(1), t)
    ranges = {
        "ts": (
            datetime.datetime(2024, 1, 11),
            datetime.datetime(2024, 1, 12),
        )
    }
    plan = plan_scan(t, ranges)
    assert plan["skipped"] == 1, plan
    got = scan_snapshot(spark, t, ranges)
    assert sorted(r.i for r in got.collect()) == [0, 1, 2, 3, 4]


def test_compaction_recomputes_stats_for_rewritten_files(spark, tmpdir_scratch):
    t = f"{tmpdir_scratch}/c"
    for lo in (0, 100, 200):
        commit(_ids(spark, lo, lo + 100).coalesce(1), t)
    # compaction's repartition scatters rows across files, so pruning
    # power may drop — but the stats must be PRESENT and CORRECT: sort
    # first so the rewrite stays clustered and provably prunable
    df = read_snapshot(spark, t).repartitionByRange(3, "doc_id")
    commit(df, t, mode="replace_all", op_label="clustered-rewrite")
    plan = plan_scan(t, {"doc_id": (10, 20)})
    assert plan["skipped"] >= 1, plan
    got = scan_snapshot(spark, t, {"doc_id": (10, 20)})
    assert sorted(r.doc_id for r in got.collect()) == list(range(10, 21))


def test_unknown_range_column_raises(spark, tmpdir_scratch):
    t = f"{tmpdir_scratch}/u"
    commit(_ids(spark, 0, 10).coalesce(1), t)
    with pytest.raises(ValueError, match="not in snapshot schema"):
        plan_scan(t, {"nope": (1, 2)})
    with pytest.raises(FileNotFoundError):
        plan_scan(f"{tmpdir_scratch}/missing", {"doc_id": (1, 2)})


def test_cross_family_bounds_never_prune(spark, tmpdir_scratch):
    # a date bound against timestamp-micros stats must NOT be compared
    # (days vs micros would over-skip); the residual filter still
    # applies it through Spark's own coercion
    t = f"{tmpdir_scratch}/fam"
    rows = [(i, datetime.datetime(2024, 1, 11, i)) for i in range(5)]
    commit(spark.createDataFrame(rows, "i long, ts timestamp").coalesce(1), t)
    ranges = {"ts": (datetime.date(2024, 1, 11), datetime.date(2024, 1, 12))}
    assert plan_scan(t, ranges)["skipped"] == 0
    got = scan_snapshot(spark, t, ranges)
    want = read_snapshot(spark, t).filter(
        (F.col("ts") >= F.lit(datetime.date(2024, 1, 11)))
        & (F.col("ts") <= F.lit(datetime.date(2024, 1, 12)))
    )
    assert _collect(got) == _collect(want)
    assert got.count() == 5


def test_nan_stats_keep_manifest_strict_json(spark, tmpdir_scratch):
    import json as _json
    import os

    t = f"{tmpdir_scratch}/nan"
    commit(
        spark.createDataFrame(
            [(1, float("nan")), (2, 1.5)], "i long, x double"
        ).coalesce(1),
        t,
    )

    def _reject(_):
        raise AssertionError("manifest contains non-standard JSON constants")

    with open(f"{t}/_snapshots/v1.json") as fh:
        m = _json.load(fh, parse_constant=_reject)
    # the NaN-tainted column earned no stats; the clean one did
    for st in m["stats"].values():
        assert "x" not in st
        assert st["i"][:2] == [1, 2] and st["i"][2] == "num"
    # and scanning on the NaN column stays correct (no pruning)
    got = scan_snapshot(spark, t, {"x": (1.0, 2.0)})
    assert sorted(r.i for r in got.collect()) == [2]


def test_zorder_cluster_prunes_both_dimensions(spark, tmpdir_scratch):
    """Hash-distributed layout prunes nothing on either column; after
    cluster_snapshot(x, y) BOTH columns prune, results stay identical
    to the plain filter, and the pre-cluster snapshot still
    time-travels."""
    from ocr_application_spark.sources.snapshots import (
        cluster_snapshot,
        snapshot_versions,
    )

    t = f"{tmpdir_scratch}/z"
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("long").alias("x"),
        ((F.col("id") * 7) % 89).cast("long").alias("y"),
    )
    # repartition by doc_id hash: every file spans ~the full x AND y
    # ranges, so zone maps are blind on both
    commit(df.repartition(16, "doc_id"), t)
    v1 = snapshot_versions(t)[-1]
    rx, ry = {"x": (10, 15)}, {"y": (70, 75)}
    assert plan_scan(t, rx)["skipped"] == 0
    assert plan_scan(t, ry)["skipped"] == 0

    v2 = cluster_snapshot(spark, t, ["x", "y"], target_files=16)
    assert v2 == v1 + 1
    px, py = plan_scan(t, rx), plan_scan(t, ry)
    assert px["skipped"] > 0, px   # x-localized now
    assert py["skipped"] > 0, py   # y-localized too (not just the leading col)

    for ranges in (rx, ry, {"x": (10, 15), "y": (0, 88)}):
        got = scan_snapshot(spark, t, ranges)
        want = read_snapshot(spark, t)
        for c, (lo, hi) in ranges.items():
            want = want.filter((F.col(c) >= lo) & (F.col(c) <= hi))
        assert _collect(got) == _collect(want), ranges
    # the rewrite is a commit: same rows, old version still readable
    assert read_snapshot(spark, t).count() == 4000
    assert read_snapshot(spark, t, version=v1).count() == 4000


def test_zorder_validation(spark, tmpdir_scratch):
    from ocr_application_spark.sources.snapshots import cluster_snapshot

    t = f"{tmpdir_scratch}/zv"
    commit(
        spark.range(0, 10).select(
            F.col("id").alias("doc_id"), F.col("id").cast("string").alias("s")
        ),
        t,
    )
    with pytest.raises(ValueError, match="integral"):
        cluster_snapshot(spark, t, ["s"])
    with pytest.raises(ValueError, match="at least one"):
        cluster_snapshot(spark, t, [])
    with pytest.raises(ValueError, match="exceeds int64"):
        cluster_snapshot(spark, t, ["doc_id"], bits=63)
