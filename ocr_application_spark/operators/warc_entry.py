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


# --- raw response records: the html:binary acquisition path --------------------
# Same discipline one level deeper: documents -> WARC/1.0 RESPONSE
# records whose body is BINARY (the input_hint `html: binary` column,
# bytes the parser may not decode) -> hex-packed segment blobs -> the
# byte-level response kernel -> per-url facts. Every fifth body has
# "\r\n\r\n" + a literal "WARC/1.0" INJECTED INTO ITS BYTES, so the
# parse only survives if both walkers trust the declared
# Content-Lengths and never scan for delimiters. The oracle computes
# the facts (status, content type, byte count, the full body hex) straight
# from documents — it never parses, so builder/parser compensation
# can't hide a framing bug from it on byte counts or the raw bytes; the
# adversarial pytest differential (independent hand-built records)
# covers the parser alone.

_RESP_ORACLE = """
    with src as (
      select doc_id,
             'https://host' || cast(doc_id % 256 as varchar)
               || '.example/doc/' || cast(doc_id as varchar) as url,
             '2024-01-' || lpad(cast(1 + doc_id % 28 as varchar), 2, '0')
               || 'T00:00:00Z' as warc_date,
             case when doc_id % 7 = 0 then 404 else 200 end as http_status,
             case when doc_id % 9 = 0 then 'application/octet-stream'
                  else 'text/html; charset=utf-8' end as content_type,
             encode(substr(text, 1, 120))
               || case when doc_id % 5 = 0
                       then '\\x0D\\x0A\\x0D\\x0A'::BLOB || encode('WARC/1.0')
                       else ''::BLOB end as body
      from documents
    )
    select url, warc_date, http_status, content_type,
           cast(octet_length(body) as bigint) as n_bytes,
           hex(body) as body_hex,
           'ok' as status
    from src
"""


@_q("warc_response_roundtrip", _RESP_ORACLE)
def warc_response_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> binary response records -> packed segments -> parse
    kernel -> per-url facts (see section comment)."""
    from ocr_application_spark.sources.warc import (
        pack_warc_segments,
        parse_warc_segments,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    body = F.concat(
        F.encode(F.substring("text", 1, 120), "UTF-8"),
        F.when(
            d % 5 == 0,
            F.concat(
                F.expr("X'0D0A0D0A'"), F.encode(F.lit("WARC/1.0"), "UTF-8")
            ),
        ).otherwise(F.expr("X''")),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://host"),
            (d % 256).cast("string"),
            F.lit(".example/doc/"),
            d.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad((1 + d % 28).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
        F.when(d % 7 == 0, 404).otherwise(200).alias("status"),
        F.when(d % 7 == 0, "Not Found").otherwise("OK").alias("reason"),
        F.when(d % 9 == 0, "application/octet-stream")
        .otherwise("text/html; charset=utf-8")
        .alias("content_type"),
        body.alias("body"),
    )
    parsed = parse_warc_segments(pack_warc_segments(pages, n_segments=32))
    return parsed.select(
        "url",
        "warc_date",
        "http_status",
        "content_type",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.hex(F.col("body")).alias("body_hex"),
        "status",
    )
