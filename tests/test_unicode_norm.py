"""Unicode NFC normalization: differential vs unicodedata, idempotence,
null handling, and the exercised-path guarantee (changed flag fires)."""

import unicodedata

import pandas as pd
import pytest

from ocr_application_spark.operators.unicode_norm import (
    nfc_normalize_py,
    nfc_normalize_text,
    text_nfc_normalize,
)

SF_DIR = "/root/testdata/sf0.001"

# decomposed -> precomposed cases a crawl actually contains: Latin
# combining accents, Hangul jamo, compatibility-adjacent sequences that
# NFC must NOT touch (ligatures, fullwidth — those are NFKC's job)
CASES = [
    "café",  # e + COMBINING ACUTE -> é
    "Ångström",  # ring + diaeresis
    "각",  # Hangul jamo -> 각
    "ﬁle",  # ﬁ ligature: NFC-invariant
    "ｆｕｌｌ",  # fullwidth: NFC-invariant
    "plain ascii stays put",
    "ṩ",  # dot-below + dot-above ordering case
    "",
]


def test_pandas_twin_matches_unicodedata():
    got = nfc_normalize_text(pd.Series(CASES, dtype="object"))
    want = [unicodedata.normalize("NFC", c) for c in CASES]
    assert list(got) == want


def test_py_twin_none_and_idempotence():
    assert nfc_normalize_py(None) is None
    for c in CASES:
        once = nfc_normalize_py(c)
        assert nfc_normalize_py(once) == once  # NFC is idempotent


def test_none_preserved_in_series():
    got = nfc_normalize_text(pd.Series(["café", None], dtype="object"))
    assert got[0] == "café" and got[1] is None


def test_changed_flag_fires_and_lengths_shrink(spark):
    out = text_nfc_normalize(spark, SF_DIR)
    rows = out.collect()
    changed = [r for r in rows if r.changed == 1]
    assert changed, "derived decomposed input must recompose somewhere"
    for r in changed:
        # recomposition merges base+mark pairs: strictly fewer codepoints
        assert r.n_cp_nfc < r.n_cp_raw
    for r in rows:
        if r.changed == 0:
            assert r.n_cp_nfc == r.n_cp_raw
        assert len(r.nfc_digest) == 64
