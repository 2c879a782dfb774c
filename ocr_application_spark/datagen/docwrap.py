"""Wrap the driver's ``documents`` table into input_hint-shaped pages.

Deterministic templating (no RNG): each (doc_id, text, lang) row becomes
an HTML page with nav/footer boilerplate around an <article> holding the
document text — so the flagship entry() exercises the full extraction
engine over the driver-provided testdata without synthesizing inputs.
"""

from __future__ import annotations

from collections.abc import Iterator
from html import escape as html_escape

import pandas as pd
from pyspark.sql import DataFrame

from ocr_application_spark.sources.webpages import PAGES_SCHEMA

_TPL = (
    '<html><head><meta charset="utf-8"/><title>doc {doc_id}</title></head><body>'
    '<nav><a href="/home">home</a><a href="/about">about</a><a href="/index">index</a></nav>'
    '<header><h1>corpus viewer</h1></header>'
    '<aside><a href="/ad1">sponsored link one</a><a href="/ad2">sponsored link two</a>'
    "<p>ad text</p></aside>"
    "<article><h2>document {doc_id}</h2>{paras}</article>"
    "<footer><p>footer {lang}</p><a href=\"/terms\">terms</a></footer></body></html>"
)


def wrap_document_html(doc_id: int, text: str, lang: str) -> bytes:
    words = (text or "").split(" ")
    paras = []
    for i in range(0, len(words), 25):
        chunk = " ".join(words[i : i + 25]).strip()
        if chunk:
            # escape so document text containing '<' or '&' survives the
            # wrap -> extract round trip (the extractor unescapes); the
            # digest oracle hashes the ORIGINAL text, so without this any
            # markup-looking character would break byte-identity
            paras.append(f"<p>{html_escape(chunk)}</p>")
    return _TPL.format(doc_id=doc_id, paras="".join(paras) or "<p>empty</p>", lang=lang).encode(
        "utf-8"
    )


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) -> pages(url, warc_ts, html, text, lang)."""

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": [f"https://docs.example/{i:08d}" for i in pdf["doc_id"]],
                    "warc_ts": pd.Timestamp("2023-06-01"),
                    "html": [
                        wrap_document_html(int(i), t, lg)
                        for i, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
                    ],
                    "text": None,
                    "lang": pdf["lang"],
                }
            )

    return documents.select("doc_id", "text", "lang").mapInPandas(wrap, schema=PAGES_SCHEMA)
