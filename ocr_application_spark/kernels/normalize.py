"""Standalone normalize kernel (the K2-analog stage as its own df op).

The fused extraction kernel (kernels/extract.py) runs normalize ->
segment -> extract in one mapInPandas stage — the right production
shape. SURVEY.md §2.8 also lists ``normalize(df)`` as a public API op
in its own right (reference: Geometric_correction_service normalizes
and re-publishes without extracting), so this module exposes the
normalize stage alone: charset sniff -> decode -> mojibake repair,
per Arrow batch, reusing the EXACT byte-level functions from
core/extraction_core.py, so the stage's own output (the repaired
decoded html) is byte-identical to what those functions produce inside
the fused kernel — pinned by test_normalize_kernel_matches_core_bytes.

Composition caveat (deliberate, NOT an equivalence claim): the fused
path parses the UNREPAIRED html and repairs the EXTRACTED text
(extraction_core.extract_html), while this stage repairs before any
parse. The two orderings differ exactly when parsing itself produces a
repairable sequence — e.g. the character references '&#63;&#63;'
become '??' only after the parser converts charrefs, so the fused path
repairs them and a parse over html_norm does not. A standalone
re-publish stage (the reference analog normalizes and forwards without
extracting) wants the repair on its output payload, which is what this
operator does; feeding html_norm back into the extractor is NOT
guaranteed byte-identical to the fused pipeline.

Cites: Geometric_correction_service isoler/app/main.py (standalone
normalize-and-forward stage), classification_service consumes the
corrected payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ocr_application_spark.core.extraction_core import (
    decode_html,
    repair_mojibake,
    sniff_charset,
)

NORMALIZE_SCHEMA = (
    "url string, warc_ts timestamp, lang string, "
    "charset string, html_norm string, n_chars_norm int"
)


def _normalize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        raws = pdf["html"].to_numpy()
        charsets, texts = [], []
        for raw in raws:
            if raw is None:
                charsets.append("none")
                texts.append("")
                continue
            raw = bytes(raw)
            charsets.append(sniff_charset(raw))
            texts.append(repair_mojibake(decode_html(raw)))
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "charset": charsets,
                "html_norm": texts,
                "n_chars_norm": [len(t) for t in texts],
            }
        )


def normalize(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> normalized html string per page
    (charset-sniffed decode + exact lossy mojibake repair). Column-pruned
    scan, Arrow-batched, no per-row Python at the Spark level."""
    return pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        _normalize_batches, schema=NORMALIZE_SCHEMA
    )
