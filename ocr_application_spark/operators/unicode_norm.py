"""Unicode NFC normalization over the corpus text column.

Real web crawls mix precomposed and decomposed accents (NFC vs NFD) for
the *same* logical text — e.g. ``café`` encoded as U+00E9 by one CMS and
as ``e`` + U+0301 by another — which silently defeats exact dedup,
fingerprinting and token matching unless the corpus is canonicalized
first. Every production training-data pipeline runs a normalization
pass before hashing; this operator is that pass. (The reference's
extraction path hits the same class of problem at the byte level — its
mojibake repair in ``Text_extraction_service isoler/app/services.py`` is
studied behavior for `core/extraction_core.py:85` — but it has no
Unicode-normalization stage; this op is part of the training-data
toolkit, not reference parity.)

Verification contract (exact, cross-engine): Python's ``unicodedata``
and DuckDB's ``nfc_normalize`` both implement Unicode Standard Annex
#15 NFC; the oracle compares the normalized text via sha256 digests
plus codepoint lengths, so any divergence in any row fails the gate at
the byte level. The decomposed input is DERIVED deterministically
inside both engines (inject combining marks after 'e'/'a' on 2/3 of the
docs via plain ``replace`` — dialect-portable), so the operator is
genuinely exercised: ``changed`` is 1 exactly where a combining
sequence recomposed.

Spark side: NFC has no JVM built-in, so this is a legitimate pandas-UDF
case (pandas ``Series.str.normalize`` over Arrow batches — batched C
loop, never per-row Python). Everything else (derivation, lengths,
digest, change flag) stays JVM-side so the plan is a single narrow
projection with ONE ArrowEval and zero exchanges at any scale: at 100 TB
this is a map-only stage pipelined into whatever consumes it.

Cross-engine landmines dodged (repo invariants):
* lengths are codepoint counts in BOTH engines (Spark ``length`` counts
  codepoints on UTF8String, DuckDB ``length`` likewise) — but only
  because the injected marks are BMP; astral chars would be fine here
  too, unlike UTF-16-unit semantics (documented for the next reader).
* the change flag is a binary string compare post-normalization in both
  engines (no collation involvement).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_COMBINING_ACUTE = "́"  # chr(769)
_COMBINING_RING = "̊"  # chr(778)


def nfc_normalize_text(series: pd.Series) -> pd.Series:
    """NFC-normalize a pandas string Series (None-preserving)."""
    return series.str.normalize("NFC")


def _nfc_udf():
    # built lazily: @pandas_udf parses its schema against the active
    # SparkContext, so decorating at import time breaks sessionless
    # imports (same pattern as entropy.py:134)
    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return nfc_normalize_text(s)

    return nfc


def nfc_normalize_py(text: str | None) -> str | None:
    """Pure-Python twin of the UDF for differential tests."""
    return None if text is None else unicodedata.normalize("NFC", text)


def _decomposed(text):
    """Deterministically inject decomposed accent sequences (Spark side).

    Mirrored verbatim in the oracle SQL via chr(769)/chr(778); plain
    ``replace`` so both dialects do the identical byte-level rewrite.
    """
    acute = F.replace(text, F.lit("e"), F.lit("e" + _COMBINING_ACUTE))
    return F.replace(acute, F.lit("a"), F.lit("a" + _COMBINING_RING))


@_q(
    "text_nfc_normalize",
    """
    with raw as (
      select doc_id,
             case when doc_id % 3 = 0 then text
                  else replace(replace(text, 'e', 'e' || chr(769)),
                               'a', 'a' || chr(778))
             end as raw_text
      from documents
    )
    select doc_id,
           cast(raw_text <> nfc_normalize(raw_text) as int) as changed,
           length(raw_text) as n_cp_raw,
           length(nfc_normalize(raw_text)) as n_cp_nfc,
           sha256(nfc_normalize(raw_text)) as nfc_digest
    from raw
    """,
)
def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = F.when(F.col("doc_id") % 3 == 0, F.col("text")).otherwise(
        _decomposed(F.col("text"))
    )
    out = docs.select("doc_id", raw.alias("raw_text")).withColumn(
        "nfc_text", _nfc_udf()("raw_text")
    )
    return out.select(
        "doc_id",
        (F.col("raw_text") != F.col("nfc_text")).cast("int").alias("changed"),
        F.length("raw_text").alias("n_cp_raw"),
        F.length("nfc_text").alias("n_cp_nfc"),
        F.sha2("nfc_text", 256).alias("nfc_digest"),
    )
