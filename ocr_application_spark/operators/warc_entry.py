"""Gate query for the WET/WARC segment source (sources/warc.py).

``warc_wet_roundtrip`` drives the full loop — documents -> deterministic
WET conversion records -> packed segment blobs (one shuffle) -> byte-level
parse kernel -> per-url (n_bytes, sha256) — and the oracle computes what
a LOSSLESS loop must produce straight from the documents table. Any
framing bug, Content-Length miscount, header corruption, or encode/
decode asymmetry changes a digest or flips a status and hash-fails.

The WARC-Date header is built from pure integer arithmetic + lpad in
BOTH engines (never a date library: cross-engine strftime is exactly
the float-sum class of landmine the repo bans) and must survive the
trip verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_ROUNDTRIP_ORACLE = """
    select 'https://docs.example/' || printf('%08d', doc_id) as url,
           '2024-01-01T' || lpad(cast(doc_id % 24 as varchar), 2, '0')
             || ':' || lpad(cast(doc_id % 60 as varchar), 2, '0')
             || ':' || lpad(cast((doc_id * 7) % 60 as varchar), 2, '0')
             || 'Z' as warc_date,
           strlen(text) as n_bytes,
           sha256(text) as digest,
           'ok' as status
    from documents
"""


def _two(col):
    return F.lpad(col.cast("string"), 2, "0")


@_q("warc_wet_roundtrip", _ROUNDTRIP_ORACLE)
def warc_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> WET records -> packed segments -> parse kernel ->
    per-url digest; the oracle states what lossless framing must emit."""
    from ocr_application_spark.sources.warc import pack_wet_segments, parse_wet_segments

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    pages = docs.select(
        F.format_string("https://docs.example/%08d", d).alias("url"),
        F.concat_ws(
            "",
            F.lit("2024-01-01T"),
            _two(d % 24),
            F.lit(":"),
            _two(d % 60),
            F.lit(":"),
            _two((d * 7) % 60),
            F.lit("Z"),
        ).alias("warc_date"),
        "text",
    )
    parsed = parse_wet_segments(pack_wet_segments(pages, n_segments=32))
    return parsed.select(
        "url",
        "warc_date",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("digest"),
        "status",
    )
