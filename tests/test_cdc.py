"""Behavior tests for operators/cdc.py (content-defined chunking).

The property that justifies CDC over fixed-size blocking — boundaries
depend only on local content, so edits re-chunk only the region they
touch — is pinned directly: a head insertion must leave the tail
chunk-hash multiset intact.
"""

import contextlib
import io
import re

import pyspark.sql.functions as F

from ocr_application_spark.operators import cdc as C

SF = "/root/testdata/sf0.001"


def _chunks_of(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return C.cdc_chunks(df).collect()


def test_chunks_reconstruct_the_document(spark):
    """Concatenating chunks in chunk_no order rebuilds the lowercased
    text exactly — no gaps, no overlaps, for docs with and without
    boundaries."""
    base = "The quick brown fox jumps over the lazy dog. " * 20
    rows = [(1, base), (2, "tiny"), (3, "x" * 7)]
    got = {}
    for r in _chunks_of(spark, rows):
        got.setdefault(r["doc_id"], []).append((r["chunk_no"], r["chunk_chars"]))
    for doc_id, text in rows:
        lens = [c for _, c in sorted(got[doc_id])]
        assert sum(lens) == len(text), doc_id
        nos = [n for n, _ in sorted(got[doc_id])]
        assert nos == list(range(1, len(nos) + 1)), doc_id


def test_head_insertion_preserves_tail_chunks(spark):
    """CDC's reason to exist: prepending bytes must leave every chunk
    after the first re-synchronized boundary identical (same hashes),
    where fixed-size blocking would shift-break ALL of them."""
    body = (
        "in a village of la mancha the name of which i have no desire to "
        "call to mind there lived not long since one of those gentlemen "
    ) * 8
    rows = [(1, body), (2, "BREAKING UPDATE 2026: " + body)]
    out = _chunks_of(spark, rows)
    h1 = [r["chunk_hash"] for r in sorted(out, key=lambda r: r["chunk_no"]) if r["doc_id"] == 1]
    h2 = [r["chunk_hash"] for r in sorted(out, key=lambda r: r["chunk_no"]) if r["doc_id"] == 2]
    # multiset overlap (the repeated body yields repeated chunk hashes,
    # so a set compare would collapse them): everything but the head
    # region re-synchronizes
    from collections import Counter

    overlap = sum((Counter(h1) & Counter(h2)).values())
    assert overlap >= len(h1) - 2, (len(h1), len(h2), overlap)
    # and the suffix sequence is preserved, not just the multiset
    assert h1[-5:] == h2[-5:]


def test_empty_docs_emit_nothing_short_docs_one_chunk(spark):
    out = _chunks_of(spark, [(1, ""), (2, None), (3, "abc")])
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_chars"] == 3


def test_mean_chunk_size_tracks_the_mask(spark):
    """h % 32 == 0 on a ~uniform 40-bit hash -> mean gap ~32 grams;
    chunks should average within a loose band of mask + k on real
    text (the knob a deployment tunes)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ch = C.cdc_chunks(docs)
    mean = ch.agg((F.sum("chunk_chars") / F.count("*")).alias("m")).collect()[0]["m"]
    assert 20 <= mean <= 80, mean


def test_gate_ratio_bounds_and_self_consistency(spark):
    out = C.QUERIES["dedup_cdc_chunks"](spark, SF)
    bad = out.filter(
        (F.col("shared_chars") > F.col("total_chars"))
        | (F.col("shared_bp") < 0)
        | (F.col("shared_bp") > 10000)
        | (F.col("n_chunks") < 1)
    )
    assert bad.count() == 0


def test_plan_no_cartesian_and_bounded_exchanges(spark):
    df = C.QUERIES["dedup_cdc_chunks"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # chunking fuses into the scan projection; the exchanges are the
    # chunk-hash distinct-agg (two-phase), the join side, and the doc
    # agg — all keyed O(chunks), never O(pairs)
    assert len(re.findall(r"\bExchange\b", plan)) <= 6, plan
