"""Segment kernel: binary payloads -> span records (K7 analog).

Explodes the PDF/layout branch's word boxes into a normalized
``text_regions`` table (extraction_service/app/ocr/extractor.py:101-105
shape) so the structure stage can run relational ops (W1/W2/J2/F6) over
them instead of per-document Python. Spans already pass the F1/F3/F4/F5
record filters (same pure functions as the extraction kernel).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ocr_application_spark.core.extraction_core import (
    PDF_MAGIC,
    _norm_ws,
    parse_pdf_payload,
    repair_mojibake,
    span_passes_filters,
)

SPANS_SCHEMA = (
    "url string, page int, x0 double, y0 double, x1 double, y1 double, "
    "conf double, text string"
)


def _segment_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, raw in zip(pdf["url"], pdf["html"]):
            if raw is None or bytes(raw[:5]) != PDF_MAGIC:
                continue
            _, spans = parse_pdf_payload(bytes(raw))
            for s in spans:
                if span_passes_filters(s):
                    rows.append(
                        (
                            url,
                            int(s.get("page", 0)),
                            float(s["x0"]),
                            float(s["y0"]),
                            float(s["x1"]),
                            float(s["y1"]),
                            float(s.get("conf", 1.0)),
                            # same normalization as the extraction path
                            # (extraction_core.extract_pdf): a span's text
                            # here must byte-match what W1 reassembly
                            # would contribute to extracted_text
                            repair_mojibake(_norm_ws(s["text"])),
                        )
                    )
        yield pd.DataFrame(
            rows, columns=["url", "page", "x0", "y0", "x1", "y1", "conf", "text"]
        )


def segment(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> one row per surviving span (PDF branch)."""
    return pages.select("url", "html").mapInPandas(_segment_batches, schema=SPANS_SCHEMA)
