"""Bloom seen-set sketch (operators/sketches.bloom_*): randomized
differential vs a hashlib twin of the double-hash integer spec,
no-false-negative law, merge==direct, null exclusion, validation."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from ocr_application_spark.operators.sketches import (
    _BLOOM_WORD_BITS,
    bloom_build,
    bloom_merge,
    bloom_probe,
)


def _twin_positions(key, n_words, k):
    """Dict-model twin of _bloom_positions: two 48-bit md5 slices,
    Kirsch-Mitzenmacher double hashing mod n_words*63."""
    hx = hashlib.md5(str(key).encode()).hexdigest()
    h1, h2 = int(hx[:12], 16), int(hx[12:24], 16)
    m = n_words * _BLOOM_WORD_BITS
    return [(h1 + i * h2) % m for i in range(k)]


def _twin_state(keys, n_words, k):
    words = {}
    for key in keys:
        if key is None:
            continue
        for p in _twin_positions(key, n_words, k):
            wi, bi = divmod(p, _BLOOM_WORD_BITS)
            words[wi] = words.get(wi, 0) | (1 << bi)
    return words


def _twin_probe(words, keys, n_words, k):
    return {
        key: all(
            words.get(p // _BLOOM_WORD_BITS, 0) >> (p % _BLOOM_WORD_BITS) & 1
            for p in _twin_positions(key, n_words, k)
        )
        for key in keys
    }


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key long")


def test_build_matches_twin_randomized(spark):
    rng = random.Random(42)
    for n_words, k in ((8, 3), (64, 4), (256, 5)):
        keys = [rng.randrange(10**12) for _ in range(200)] + [None] * 5
        got = {
            r.word_idx: r.word
            for r in bloom_build(
                _keys_df(spark, keys), F.col("key"), n_words, k
            ).collect()
        }
        assert got == _twin_state(keys, n_words, k)


def test_probe_matches_twin_and_never_false_negative(spark):
    rng = random.Random(7)
    seen = [rng.randrange(10**9) for _ in range(300)]
    probes = seen[:50] + [rng.randrange(10**9) for _ in range(100)]
    n_words, k = 16, 4  # undersized on purpose: want live FPs
    state = bloom_build(_keys_df(spark, seen), F.col("key"), n_words, k)
    got = {
        r.key: r.maybe_seen
        for r in bloom_probe(
            state, _keys_df(spark, probes), "key", n_words, k
        ).collect()
    }
    want = _twin_probe(_twin_state(seen, n_words, k), probes, n_words, k)
    assert got == want
    assert all(got[key] for key in seen[:50])  # no false negatives, ever
    fps = [p for p in probes[50:] if got[p] and p not in set(seen)]
    assert fps  # the undersized filter really exercises the FP path


def test_merge_equals_direct_on_arbitrary_slicings(spark):
    rng = random.Random(3)
    keys = [rng.randrange(10**9) for _ in range(240)]
    direct = {
        r.word_idx: r.word
        for r in bloom_build(_keys_df(spark, keys), F.col("key"), 32, 4).collect()
    }
    for cuts in ((80, 160), (1, 239), (120,)):
        bounds = [0, *cuts, len(keys)]
        slices = [
            bloom_build(_keys_df(spark, keys[a:b]), F.col("key"), 32, 4)
            for a, b in zip(bounds, bounds[1:])
        ]
        merged_df = slices[0]
        for s in slices[1:]:
            merged_df = merged_df.unionByName(s)
        merged = {r.word_idx: r.word for r in bloom_merge(merged_df).collect()}
        assert merged == direct


def test_duplicate_keys_change_nothing(spark):
    keys = [5, 17, 99]
    once = {
        r.word_idx: r.word
        for r in bloom_build(_keys_df(spark, keys), F.col("key"), 8, 3).collect()
    }
    thrice = {
        r.word_idx: r.word
        for r in bloom_build(_keys_df(spark, keys * 3), F.col("key"), 8, 3).collect()
    }
    assert once == thrice


def test_validation(spark):
    df = _keys_df(spark, [1])
    with pytest.raises(ValueError, match="n_words"):
        bloom_build(df, F.col("key"), 0, 4)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_build(df, F.col("key"), 8, 0)


def test_antijoin_identical_to_plain_antijoin_randomized(spark):
    from ocr_application_spark.operators.sketches import bloom_antijoin_new

    rng = random.Random(23)
    seen_keys = list({rng.randrange(5000) for _ in range(400)})
    new_keys = list({rng.randrange(5000) for _ in range(300)})
    want = sorted(set(new_keys) - set(seen_keys))
    for n_words in (4, 16, 256):  # from absurdly-undersized to roomy
        got = sorted(
            r.key
            for r in bloom_antijoin_new(
                _keys_df(spark, new_keys), _keys_df(spark, seen_keys), "key", n_words, 3
            ).collect()
        )
        assert got == want  # parameter-independent: always the exact set
