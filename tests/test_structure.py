"""Structure stage: segment -> F2/F6/J2 -> schema map (K9 replacement)."""

import json

from ocr_application_spark.kernels.segment import segment
from ocr_application_spark.sources.webpages import synth_pages
from ocr_application_spark.structure import structure


def _pdf(spans) -> bytes:
    return ("%FPDF1 1000.0\n" + "\n".join(json.dumps(s) for s in spans)).encode()


def _span(x0, y0, text, conf=0.95, w=80.0, h=14.0, page=0):
    return {"page": page, "x0": x0, "y0": y0, "x1": x0 + w, "y1": y0 + h, "conf": conf, "text": text}


def test_structure_pairs_labels_with_right_values(spark):
    doc = _pdf(
        [
            _span(10, 10, "NOM:"),
            _span(120, 11, "Dupont"),
            _span(10, 50, "MONTANT"),
            _span(120, 52, "66.44"),
            _span(300, 52, "DT"),  # farther right -> not picked
            _span(10, 90, "DATE"),
            _span(120, 91, "15/01/2023", conf=0.3),  # F2 drops low conf
            _span(10, 300, "orphan text"),
        ]
    )
    rows = [("u1", None, doc, None, "fr")]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    spans = segment(pages)
    got = {r.url: r.structured for r in structure(spans).collect()}
    s = got["u1"]
    assert s["NOM"] == "Dupont"
    assert s["MONTANT"] == "66.44"
    assert s["DATE"] == "N/A"  # value filtered by F2 -> unmatched -> N/A
    assert s["PRENOM"] == "N/A"


def test_segment_applies_record_filters(spark):
    doc = _pdf(
        [
            _span(10, 10, "keep me"),
            _span(10, 30, "x"),  # F4 len<2
            _span(10, 50, "lowconf", conf=0.5),  # F1
            _span(10, 70, "tiny", w=5.0),  # F5
        ]
    )
    pages = spark.createDataFrame(
        [("u1", None, doc, None, "fr")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    texts = {r.text for r in segment(pages).collect()}
    assert texts == {"keep me"}


def test_structure_runs_on_synth_corpus(spark):
    pages = synth_pages(spark, 400)
    spans = segment(pages)
    out = structure(spans)
    rows = out.collect()
    assert all(len(r.structured) >= 11 for r in rows)
    assert {r.url for r in rows} == {r.url for r in spans.select("url").distinct().collect()}


def test_api_facade_importable():
    from ocr_application_spark import api

    for name in (
        "read_pages", "extract", "recognize", "segment", "structure",
        "tarify", "forecast_linear", "lineage", "verify", "run_to_table",
    ):
        assert callable(getattr(api, name))
