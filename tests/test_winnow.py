"""Winnowing fingerprints (operators/dedup.winnow_fingerprints):
randomized differential vs a pure-Python twin of the integer spec, the
detection guarantee (shared substring >= w+k-1 chars => shared
fingerprint), the density bound, short-doc clamps, validation."""

import hashlib
import random

import pytest

from ocr_application_spark.operators.dedup import (
    _WINNOW_POSM,
    winnow_fingerprints,
)


def _twin(text, k, w):
    """Set of (pos, hash) winnowing selections, same packed-key spec."""
    t = text.lower()
    n = len(t) - k + 1
    if n < 1:
        return set()
    keys = [
        (
            int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:10], 16)
            * _WINNOW_POSM
            + (_WINNOW_POSM - 1 - (i + 1) % _WINNOW_POSM)
        )
        for i in range(n)
    ]
    out = set()
    for s in range(max(1, n - w + 1)):
        sk = min(keys[s : s + w])
        out.add((_WINNOW_POSM - 1 - sk % _WINNOW_POSM, sk // _WINNOW_POSM))
    return out


def _run(spark, texts, k=8, w=4):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    return got


def test_matches_twin_on_random_texts(spark):
    rng = random.Random(41)
    texts = [
        "".join(rng.choice("abcde ") for _ in range(rng.randrange(1, 120)))
        for _ in range(40)
    ]
    texts += ["", "x", "exactly8", "MiXeD CaSe RePeAtS " * 6]
    for k, w in ((8, 4), (5, 3)):
        got = _run(spark, texts, k, w)
        want = {
            i: _twin(t, k, w) for i, t in enumerate(texts) if _twin(t, k, w)
        }
        assert got == want, (k, w)


def test_detection_guarantee_shared_long_substring(spark):
    """Any substring of length >= w + k - 1 shared between two docs
    must contribute at least one COMMON fp_hash — winnowing's whole
    point (Schleimer et al. 2003, thm 1)."""
    rng = random.Random(43)
    k, w = 8, 4
    for trial in range(10):
        shared = "".join(rng.choice("qrstuv") for _ in range(k + w - 1))
        a = "".join(rng.choice("abc ") for _ in range(60)) + shared
        b = shared + "".join(rng.choice("xyz ") for _ in range(60))
        got = _run(spark, [a, b], k, w)
        ha = {h for _, h in got[0]}
        hb = {h for _, h in got[1]}
        assert ha & hb, (trial, shared)


def test_density_bound(spark):
    """Selections per doc stay well under the gram count — the ~2/(w+1)
    expected density is the affordability claim; assert a loose 2x
    ceiling so hash luck can't flake the test."""
    rng = random.Random(47)
    k, w = 8, 8
    text = "".join(rng.choice("abcdefghij") for _ in range(4000))
    got = _run(spark, [text], k, w)
    n_grams = len(text) - k + 1
    assert len(got[0]) <= (2 * 2 * n_grams) // (w + 1)


def test_short_doc_clamps(spark):
    # shorter than k: nothing; >= k but fewer than w grams: exactly the
    # single global-min selection
    got = _run(spark, ["tiny", "exactly09", "0123456789"], k=8, w=4)
    assert 0 not in got
    assert len(got[1]) == 1 and len(got[2]) == 1
    assert got[1] == _twin("exactly09", 8, 4)


def test_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        winnow_fingerprints(df, k=1)
    with pytest.raises(ValueError, match="w must"):
        winnow_fingerprints(df, w=1)
