"""The byte-identity gate (BASELINE.json north_rule).

Oracle: gen_page + extract_document run eagerly in this process.
Engine: the same ids through synth_pages -> extract_pages on Spark.
Per-url SHA-256 digests must match exactly, under any parallelism.
"""

import hashlib

from ocr_application_spark.core.extraction_core import extract_document
from ocr_application_spark.datagen.webgen import gen_page
from ocr_application_spark.pipeline import extract_pages, verify_digests
from ocr_application_spark.sources.webpages import synth_pages

N = 400


def _oracle_digests(n):
    out = {}
    for i in range(n):
        page = gen_page(i)
        rec = extract_document(page["html"], page["text"])
        out[page["url"]] = rec["digest"]
    return out


def test_byte_identity_per_url(spark):
    oracle = _oracle_digests(N)
    result = extract_pages(synth_pages(spark, N)).select("url", "digest", "extracted_text").collect()
    assert len(result) == N
    # .get(): an engine-emitted url the oracle never generated must show
    # up in the mismatch report, not die as a bare KeyError
    mismatches = [r.url for r in result if oracle.get(r.url) != r.digest]
    assert mismatches == []
    # digest really is sha256 of the text bytes
    r0 = result[0]
    assert hashlib.sha256(r0.extracted_text.encode()).hexdigest() == r0.digest


def test_verify_digests_join_flags_mismatch(spark):
    ex = extract_pages(synth_pages(spark, 50)).select("url", "digest")
    ref_rows = [(u, d) for u, d in _oracle_digests(50).items()]
    ref = spark.createDataFrame(ref_rows, "url string, ref_digest string")
    assert verify_digests(ex, ref).count() == 0
    # poison one reference digest -> exactly one mismatch
    bad = spark.createDataFrame(
        [(u, ("0" * 64 if i == 0 else d)) for i, (u, d) in enumerate(ref_rows)],
        "url string, ref_digest string",
    )
    assert verify_digests(ex, bad).count() == 1


def test_all_branches_covered(spark):
    methods = {
        r.method
        for r in extract_pages(synth_pages(spark, 600)).select("method").distinct().collect()
    }
    assert {"html", "pdf", "passthrough"} <= methods


def test_classifier_accuracy(spark):
    labeled = synth_pages(spark, 600, with_label=True)
    pred = extract_pages(labeled.drop("true_class")).select("url", "doc_class")
    truth = labeled.select("url", "true_class")
    rows = pred.join(truth, "url").collect()
    acc = sum(r.doc_class == r.true_class for r in rows) / len(rows)
    # reference reports 95.0% (README.md:80-83); our deterministic stand-in
    # must be clearly better than chance on the same 4-way task
    assert acc >= 0.80, f"classifier accuracy {acc:.3f}"


def test_classify_distribution_covers_all_routes(spark):
    """classify_distribution (pytest-only since r03 — it was a rows-only
    queries() slot superseded by the value-checked classify_docwrap):
    the mixed corpus must exercise all four routing classes, each with a
    softmax-bounded average confidence."""
    from ocr_application_spark.operators.kernels_entry import classify_distribution

    rows = classify_distribution(spark, "/root/testdata/sf0.001").collect()
    assert {r.doc_class for r in rows} == {"article", "invoice", "form", "other"}
    assert all(r.n_docs > 0 and 0.25 < r.avg_conf <= 1.0 for r in rows)


def test_classifier_confidence_is_softmax(spark):
    """The confidence column IS the top softmax probability of the
    model's logits — pinned Spark-side (numpy reference on collected
    features) because a cross-engine oracle of a float softmax would
    violate the no-divergent-float-comparison invariant."""
    import numpy as np

    from ocr_application_spark.datagen.docwrap import documents_as_pages
    from ocr_application_spark.kernels.classify import classify, predict_batch, _W
    from ocr_application_spark.kernels.extract import extract

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = classify(extract(documents_as_pages(docs))).select(
        "features", "doc_class", "confidence"
    )
    rows = out.collect()
    feats = np.array([r.features for r in rows], dtype=np.float64)
    top, conf = predict_batch(feats, _W)
    classes = np.array(["article", "invoice", "form", "other"])[top]
    assert [r.doc_class for r in rows] == list(classes)
    assert np.allclose([r.confidence for r in rows], conf, rtol=0, atol=0)
    # softmax sanity: top probability bounded by (1/n_classes, 1]
    assert all(0.25 < r.confidence <= 1.0 for r in rows)


def test_quarantine_routes_to_explicit_path(spark, tmpdir_scratch, monkeypatch):
    """S5 oversize guard -> quarantine table, with quarantine_path
    override landing OUTSIDE the output root (no data loss: out + q
    partitions the corpus)."""
    import os
    from functools import partial

    import ocr_application_spark.pipeline as pl
    from ocr_application_spark.sources.webpages import synth_pages

    monkeypatch.setattr(pl, "oversize_guard", partial(pl.oversize_guard, max_bytes=200))
    pages = synth_pages(spark, 60)
    pl.run_to_table(
        pages,
        spark,
        tmpdir_scratch + "/out",
        tmpdir_scratch + "/lin",
        n_buckets=4,
        quarantine_path=tmpdir_scratch + "/q",
    )
    out_n = spark.read.parquet(tmpdir_scratch + "/out").count()
    q = spark.read.parquet(tmpdir_scratch + "/q")
    assert q.count() > 0
    assert out_n + q.count() == 60
    assert set(q.select("status").distinct().toPandas()["status"]) == {"error:oversize"}
    assert not os.path.exists(tmpdir_scratch + "/out_quarantine")


def test_normalize_kernel_matches_core_bytes(spark, tmpdir_scratch):
    """The standalone normalize stage (SURVEY §2.8 ``normalize(df)``)
    must reproduce core.decode_html + repair_mojibake byte-for-byte per
    url, and agree with the fused extraction kernel's decode (same core
    functions by construction)."""
    from ocr_application_spark.core.extraction_core import (
        decode_html,
        repair_mojibake,
    )
    from ocr_application_spark.kernels.normalize import normalize
    from ocr_application_spark.sources.webpages import synth_pages

    pages = synth_pages(spark, 300)
    got = {r["url"]: (r["charset"], r["html_norm"]) for r in normalize(pages).collect()}
    raw = {r["url"]: r["html"] for r in pages.select("url", "html").collect()}
    assert len(got) == 300
    for url, payload in raw.items():
        charset, text = got[url]
        if payload is None:
            assert (charset, text) == ("none", "")
        else:
            assert text == repair_mojibake(decode_html(bytes(payload)))
