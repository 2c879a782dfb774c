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


# --- text_script_mix ---------------------------------------------------------


def _mix_rows(spark, rows):
    from ocr_application_spark.operators.unicode_norm import script_mix_cols
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "doc_id long, t string")
    counts, total, dominant, mixed = script_mix_cols(F.col("t"))
    out = df.select(
        "doc_id",
        total.alias("n_scripted"),
        dominant.alias("dominant_script"),
        mixed.alias("mixed_script"),
        counts["latin"].alias("n_latin"),
        counts["cyrillic"].alias("n_cyrillic"),
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_script_mix_flag_threshold_is_five_percent(spark):
    # 19 latin + 1 cyrillic = 5.0% minority -> mixed (20*(20-19) >= 20)
    # 20 latin + 1 cyrillic < 5% -> not mixed
    got = _mix_rows(
        spark,
        [(1, "a" * 19 + "ж"), (2, "a" * 20 + "ж"), (3, "")],
    )
    assert got[1]["mixed_script"] is True
    assert got[2]["mixed_script"] is False
    assert got[3]["mixed_script"] is False  # empty: no scripts, not mixed


def test_script_mix_tie_breaks_in_fixed_order(spark):
    # equal latin and cyrillic counts -> latin (first in _SCRIPTS) wins
    got = _mix_rows(spark, [(1, "abc жуй"), (2, "123 ...")])
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["dominant_script"] == "none"  # nothing scripted
    assert got[2]["n_scripted"] == 0


def test_script_mix_counts_only_the_block(spark):
    got = _mix_rows(spark, [(1, "añé ж 你 ア 한 א م अ γ")])
    r = got[1]
    assert r["n_latin"] == 3 and r["n_cyrillic"] == 1
    # every named script contributed exactly one char besides latin's 3
    assert r["n_scripted"] == 3 + 8


# --- text_confusable_fold ----------------------------------------------------


def test_confusable_variants_converge_to_one_digest(spark):
    """Homoglyph variants of the same text must fold to the SAME digest
    as the clean original — the property that makes post-fold dedup
    catch evasion spam; clean text is untouched (was_clean)."""
    import pyspark.sql.functions as F

    from ocr_application_spark.operators.unicode_norm import fold_confusables

    clean = "the cape holds open product pools over provence"
    cyr = clean.replace("o", "о").replace("e", "е").replace("a", "а")
    greek = clean.replace("o", "ο")
    df = spark.createDataFrame(
        [(1, clean), (2, cyr), (3, greek)], "doc_id long, t string"
    )
    out = df.select(
        "doc_id",
        F.sha2(fold_confusables(F.col("t")), 256).alias("d"),
        (fold_confusables(F.col("t")) == F.col("t")).alias("clean"),
    ).collect()
    digs = {r["doc_id"]: r["d"] for r in out}
    assert digs[1] == digs[2] == digs[3]
    flags = {r["doc_id"]: r["clean"] for r in out}
    assert flags[1] is True and flags[2] is False and flags[3] is False
