"""Exact nearest-rank percentiles (operators/groupstats): randomized
differential vs a sorted-list twin, tie independence, single-element
groups, null exclusion, validation."""

import random

import pytest

from ocr_application_spark.operators.groupstats import group_percentiles


def _twin(rows, pcts):
    groups: dict = {}
    for g, v in rows:
        if v is not None:
            groups.setdefault(g, []).append(v)
    out = set()
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)
        for p in pcts:
            out.add((g, p, vs[(p * n + 99) // 100 - 1]))
    return out


def _run(spark, rows, pcts):
    df = spark.createDataFrame(rows, "g string, v long")
    got = group_percentiles(df, "g", "v", pcts)
    assert got.columns == ["g", "pct", "v"]
    return {(r.g, r.pct, r.v) for r in got.collect()}


def test_randomized_differential_vs_sorted_twin(spark):
    rng = random.Random(31)
    for trial in range(3):
        # small value range forces heavy ties — the selected value must
        # not depend on arbitrary tie order
        rows = [
            (f"g{rng.randrange(4)}", rng.randrange(15)) for _ in range(300)
        ]
        pcts = [1, 25, 50, 90, 99, 100]
        assert _run(spark, rows, pcts) == _twin(rows, pcts), trial


def test_single_element_and_null_groups(spark):
    rows = [("a", 7), ("b", None), ("b", 3)]
    got = _run(spark, rows, [50, 100])
    # every percentile of a single-element group is that element;
    # b's NULL has no rank
    assert got == {("a", 50, 7), ("a", 100, 7), ("b", 50, 3), ("b", 100, 3)}


def test_validation(spark):
    df = spark.range(3).selectExpr("'a' as g", "id as v")
    for bad in ([], [0], [101], [50, 50]):
        with pytest.raises(ValueError):
            group_percentiles(df, "g", "v", bad)


def test_reserved_working_names_rejected(spark):
    # withColumn('_n', ...) would silently replace a user column of
    # that name with the group count
    df = spark.range(3).selectExpr("'a' as g", "id as _n")
    with pytest.raises(ValueError, match="reserved"):
        group_percentiles(df, "g", "_n", [50])
    df2 = spark.range(3).selectExpr("'a' as pct", "id as v")
    with pytest.raises(ValueError, match="reserved"):
        group_percentiles(df2, "pct", "v", [50])
