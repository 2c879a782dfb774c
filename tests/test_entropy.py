"""Entropy/compression quality signals (operators/entropy.py)."""

import math

import pandas as pd

from ocr_application_spark.operators.entropy import (
    _ALPHABET,
    char_entropy_cols,
    compression_ratio,
    compression_ratio_py,
)

COLS = ["doc_id", "text", "lang", "source", "n_chars"]

ADVERSARIAL = [
    "plain english words with spaces",
    "aaaaaaaaaaaaaaaa",  # single symbol: entropy exactly 0
    "1234 !!! ### 999",  # digits/punct: only spaces hit the alphabet
    "9876!!!###",  # NO alphabet chars at all: entropy null, total 0
    "",  # empty: total 0
    "MiXeD CaSe TEXT lowercases first",
    "naïve café — unicode outside the alphabet counts nothing",
    ("the quick brown fox jumps over the lazy dog " * 3).strip(),
]


def _df(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=COLS))


def _entropy_py(text: str):
    """Independent reference: same alphabet, same quantization."""
    low = text.lower()
    counts = {c: low.count(c) for c in _ALPHABET}
    total = sum(counts.values())
    if total == 0:
        return total, None
    ent = 0
    for c in _ALPHABET:
        n = counts[c]
        if n > 0:
            p = n / total
            ent += int(round(-1e6 * p * math.log(p)))
    return total, ent


def test_char_entropy_matches_pure_reference(spark):
    out = {
        r["doc_id"]: r
        for r in _df(spark, ADVERSARIAL)
        .select("doc_id", *_sel())
        .collect()
    }
    for i, t in enumerate(ADVERSARIAL):
        total, ent = _entropy_py(t)
        assert out[i]["n_alpha_chars"] == total, t
        assert out[i]["entropy_micro_nats"] == ent, t
    # single-symbol text: exactly zero
    assert out[1]["entropy_micro_nats"] == 0
    # no-alphabet text: null, not garbage
    assert out[3]["entropy_micro_nats"] is None


def _sel():
    from pyspark.sql import functions as F

    total, ent = char_entropy_cols(F.col("text"))
    return [total.alias("n_alpha_chars"), ent.alias("entropy_micro_nats")]


def test_compression_ratio_matches_pure_twin_and_orders_sanely(spark):
    from pyspark.sql import functions as F

    texts = ADVERSARIAL + ["ab" * 5000]
    out = {
        r["doc_id"]: r["deflate_ratio"]
        for r in _df(spark, texts)
        .select("doc_id", compression_ratio(F.col("text")).alias("deflate_ratio"))
        .collect()
    }
    for i, t in enumerate(texts):
        expect = compression_ratio_py(t)
        if expect is None:
            assert out[i] is None, t
        else:
            assert abs(out[i] - expect) < 1e-12, t
    # repetitive text compresses far harder than prose
    assert out[len(texts) - 1] < out[0]


def test_entropy_plan_is_scan_fused(spark):
    import contextlib
    import io
    import re

    import __spark_entry__ as entrymod

    df = entrymod.queries()["text_char_entropy"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and set(re.findall(r"(\w+):", m.group(1))) <= {"struct", "doc_id", "text"}
