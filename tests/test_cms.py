"""Count-Min frequency sketch (operators/sketches.cms_*): randomized
differential vs a hashlib twin of the double-hash integer spec, the
never-underestimate law, merge==direct, weighted builds, null
exclusion, validation."""

import hashlib
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_application_spark.operators.sketches import (
    cms_build,
    cms_merge,
    cms_query,
)


def _twin_cells(key, width, depth):
    """Dict-model twin of _cms_cells: two 48-bit md5 slices,
    Kirsch-Mitzenmacher double hashing mod width per row."""
    hx = hashlib.md5(str(key).encode()).hexdigest()
    h1, h2 = int(hx[:12], 16), int(hx[12:24], 16)
    return [(d, (h1 + d * h2) % width) for d in range(depth)]


def _twin_state(weighted_keys, width, depth):
    grid = {}
    for key, w in weighted_keys:
        if key is None:
            continue
        for cell in _twin_cells(key, width, depth):
            grid[cell] = grid.get(cell, 0) + w
    return grid


def _twin_query(grid, keys, width, depth):
    return {
        key: min(grid.get(c, 0) for c in _twin_cells(key, width, depth))
        for key in keys
    }


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key long")


def test_build_matches_twin_randomized(spark):
    rng = random.Random(11)
    for width, depth in ((8, 2), (64, 3), (256, 4)):
        keys = [rng.randrange(50) for _ in range(300)] + [None] * 5
        got = {
            (r.row_idx, r.col_idx): r.cnt
            for r in cms_build(
                _keys_df(spark, keys), F.col("key"), width=width, depth=depth
            ).collect()
        }
        assert got == _twin_state([(k, 1) for k in keys], width, depth)


def test_query_matches_twin_and_never_underestimates(spark):
    rng = random.Random(5)
    keys = [rng.randrange(40) for _ in range(400)]
    true = Counter(keys)
    width, depth = 8, 2  # undersized on purpose: want live collisions
    state = cms_build(_keys_df(spark, keys), F.col("key"), width=width, depth=depth)
    probes = sorted(true) + [10**9 + 7]  # one never-seen key
    got = {
        r.key: r.est_cnt
        for r in cms_query(
            state, _keys_df(spark, probes), "key", width=width, depth=depth
        ).collect()
    }
    grid = _twin_state([(k, 1) for k in keys], width, depth)
    assert got == _twin_query(grid, probes, width, depth)
    assert all(got[k] >= true[k] for k in true)  # never under, ever
    assert any(got[k] > true[k] for k in true)  # collisions really live


def test_merge_equals_direct_on_arbitrary_slicings(spark):
    rng = random.Random(13)
    keys = [rng.randrange(60) for _ in range(240)]
    direct = {
        (r.row_idx, r.col_idx): r.cnt
        for r in cms_build(
            _keys_df(spark, keys), F.col("key"), width=32, depth=3
        ).collect()
    }
    for cuts in ((80, 160), (1, 239), (120,)):
        bounds = [0, *cuts, len(keys)]
        slices = [
            cms_build(_keys_df(spark, keys[a:b]), F.col("key"), width=32, depth=3)
            for a, b in zip(bounds, bounds[1:])
        ]
        merged_df = slices[0]
        for s in slices[1:]:
            merged_df = merged_df.unionByName(s)
        merged = {
            (r.row_idx, r.col_idx): r.cnt for r in cms_merge(merged_df).collect()
        }
        assert merged == direct


def test_weighted_build_matches_twin(spark):
    rows = [(3, 7), (3, 2), (9, 5), (14, 1)]
    df = spark.createDataFrame(rows, "key long, w long")
    got = {
        (r.row_idx, r.col_idx): r.cnt
        for r in cms_build(
            df, F.col("key"), weight=F.col("w"), width=16, depth=2
        ).collect()
    }
    assert got == _twin_state(rows, 16, 2)


def test_validation(spark):
    df = _keys_df(spark, [1])
    with pytest.raises(ValueError, match="width"):
        cms_build(df, F.col("key"), width=0)
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, F.col("key"), depth=0)
