"""Unit tests for the pure extraction spec (the byte-identity oracle)."""

import json

from ocr_application_spark.core.extraction_core import (
    extract_document,
    extract_html,
    extract_pdf,
    group_lines,
    repair_mojibake,
    span_passes_filters,
)


def _html(body: str, charset: str = "utf-8") -> bytes:
    return (
        f'<html><head><meta charset="{charset}"/><title>t</title></head>'
        f"<body><nav><a href='/x'>home</a><a href='/y'>about</a></nav>"
        f"{body}<footer><p>copyright 2020</p></footer></body></html>"
    ).encode(charset)


def test_main_content_beats_boilerplate():
    body = (
        "<aside><a href='/ad'>buy now cheap deals</a><a href='/ad2'>more ads here</a></aside>"
        "<article><p>This is the real main content of the page with many words.</p>"
        "<p>Second paragraph adds more body text for density scoring here.</p></article>"
    )
    text, feats = extract_html(_html(body))
    assert "real main content" in text
    assert "buy now" not in text
    assert "copyright" not in text
    assert feats["n_links"] >= 2


def test_block_order_preserved():
    body = "<article><h2>Title here now</h2><p>alpha beta</p><p>gamma delta</p></article>"
    text, _ = extract_html(_html(body))
    assert text.splitlines() == ["Title here now", "alpha beta", "gamma delta"]


def test_charset_latin1():
    body = "<article><p>déjà vu résumé café société montant élevé ceci est long</p></article>"
    text, _ = extract_html(_html(body, "iso-8859-1"))
    assert "déjà" in text


def test_mojibake_repair_matches_reference_quirk():
    # layout_detector.py:256 — second replace never fires
    assert repair_mojibake("d??j?? vu") == "déjé vu"


def test_span_filters():
    ok = {"x0": 0, "y0": 0, "x1": 30, "y1": 15, "conf": 0.9, "text": "hello"}
    assert span_passes_filters(ok)
    assert not span_passes_filters({**ok, "conf": 0.69})  # F1
    assert not span_passes_filters({**ok, "text": "م"})  # F3 arabic
    assert not span_passes_filters({**ok, "text": "a"})  # F4 len
    assert not span_passes_filters({**ok, "x1": 10})  # F5 width
    assert not span_passes_filters({**ok, "y1": 5})  # F5 height


def test_line_grouping_gap_and_midline():
    mk = lambda x, y, t: {"page": 0, "x0": x, "y0": y, "x1": x + 40, "y1": y + 12, "conf": 1, "text": t}
    spans = [mk(10, 10, "a"), mk(60, 12, "b"), mk(700, 11, "R"), mk(10, 60, "c")]
    lines = group_lines(spans, 1000.0)
    texts = [" ".join(s["text"] for s in g) for g in lines]
    assert texts == ["a b", "R", "c"]  # left col, right col, next line


def test_pdf_roundtrip():
    spans = [
        {"page": 0, "x0": 10, "y0": 10, "x1": 60, "y1": 24, "conf": 0.95, "text": "hello"},
        {"page": 0, "x0": 70, "y0": 11, "x1": 130, "y1": 25, "conf": 0.92, "text": "world"},
        {"page": 0, "x0": 10, "y0": 50, "x1": 80, "y1": 64, "conf": 0.40, "text": "dropped"},
    ]
    raw = ("%FPDF1 1000.0\n" + "\n".join(json.dumps(s) for s in spans)).encode()
    text, _ = extract_pdf(raw)
    assert text == "hello world"


def test_error_envelope_never_loses_row():
    rec = extract_document(b"%FPDF1 xx\n{bad json", None)
    assert rec["status"] == "success"  # undecodable lines skipped, not fatal
    rec2 = extract_document(None, None)
    assert rec2["method"] == "empty" and rec2["digest"]


def test_passthrough_normalizes():
    rec = extract_document(None, "  a\t b \n c  ")
    assert rec["extracted_text"] == "a b c"
    assert rec["method"] == "passthrough"
