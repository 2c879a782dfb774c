"""Training-data curation operators: PII scrubbing + decontamination.

Two stages every LLM corpus pipeline runs between crawl and training,
expressed entirely in JVM built-ins (regexp / array HOFs — no Python in
the hot path) with exact DuckDB oracles:

* ``text_pii_scrub`` — redact emails / phone numbers / IPv4s, reporting
  per-document match counts and the sha256 of the scrubbed text. The
  fixture text carries deterministically injected PII (derived from
  doc_id with engine-identical string building) so the scrubber is
  exercised on real positives, not vacuous zeros.
* ``decontaminate_13gram`` — flag training documents sharing any
  13-gram (whitespace tokens) with a benchmark/eval set (the GPT-3
  appendix-C discipline). Grams travel as 64-bit md5 prefixes, not raw
  strings — at 10^12 docs the gram shuffle is the dominant cost and
  16 hex chars per gram beats ~80-byte raw n-grams ~5x (same hash on
  both engines, so the oracle is unaffected; the false-collision rate
  at 64 bits is negligible and IDENTICAL across engines either way).

Scale notes: both plans are explode -> distinct -> equi-join shapes;
the distinct and the join shuffle on the gram hash, and the benchmark
side (eval sets are small — thousands of docs) broadcasts. No window,
no UDF, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}

# regex dialect intersection of Java (Spark) and RE2 (DuckDB): \b, \d,
# bounded/unbounded repetition and char classes behave identically
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_RE_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# deterministic PII injection (identical string building both engines):
# doc_id % 3 == 0 -> an email, % 4 == 0 -> a phone, % 5 == 0 -> an IP
_AUG_SQL = """
  text
  || case when doc_id % 3 = 0
          then ' Contact: user' || cast(doc_id as varchar) || '@mail.example'
          else '' end
  || case when doc_id % 4 = 0
          then ' Call 415-555-' || lpad(cast(doc_id % 10000 as varchar), 4, '0')
          else '' end
  || case when doc_id % 5 = 0
          then ' from 10.' || cast(doc_id % 256 as varchar) || '.0.'
               || cast(doc_id % 100 as varchar)
          else '' end
"""

_PII_ORACLE = f"""
with aug as (
  select doc_id, {_AUG_SQL} as t from documents
),
scrub as (
  select doc_id, t,
         len(regexp_extract_all(t, '{_RE_EMAIL}')) as n_email,
         len(regexp_extract_all(t, '{_RE_PHONE}')) as n_phone,
         regexp_replace(
           regexp_replace(t, '{_RE_EMAIL}', '<EMAIL>', 'g'),
           '{_RE_PHONE}', '<PHONE>', 'g') as t2
  from aug
)
select doc_id, n_email, n_phone,
       len(regexp_extract_all(t2, '{_RE_IP}')) as n_ip,
       sha256(regexp_replace(t2, '{_RE_IP}', '<IP>', 'g')) as digest,
       length(regexp_replace(t2, '{_RE_IP}', '<IP>', 'g')) as n_chars
from scrub
"""


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass: email -> phone -> IP, in that fixed order (the
    IP count runs AFTER phone redaction so '<PHONE>' can't shadow an
    adjacent IP differently across engines). One narrow projection, all
    JVM regexp — the shape that runs at full scan speed on 100 TB."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" Contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" Call 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(""),
    )
    t = aug
    t2 = F.regexp_replace(
        F.regexp_replace(t, _RE_EMAIL, "<EMAIL>"), _RE_PHONE, "<PHONE>"
    )
    t3 = F.regexp_replace(t2, _RE_IP, "<IP>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_RE_EMAIL), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(_RE_PHONE), 0)).alias("n_phone"),
        F.size(F.regexp_extract_all(t2, F.lit(_RE_IP), 0)).alias("n_ip"),
        F.sha2(t3, 256).alias("digest"),
        F.length(t3).alias("n_chars"),
    )


QUERIES["text_pii_scrub"] = text_pii_scrub
ORACLES["text_pii_scrub"] = _PII_ORACLE


_N = 13  # the canonical benchmark-overlap gram size (GPT-3 appendix C)
_BENCH_MOD = 7  # doc_id % 7 == 0 stands in for the eval/benchmark set

_DECON_ORACLE = f"""
with t as (
  select doc_id, string_split(text, ' ') as w from documents
),
g as (
  select doc_id,
         substr(md5(array_to_string(w[i+1 : i+{_N}], ' ')), 1, 16) as h
  from t, unnest(range(0, len(w) - {_N - 1})) u(i)
  where len(w) >= {_N}
),
d as (select distinct doc_id, h from g),
bench as (select distinct h from d where doc_id % {_BENCH_MOD} = 0)
select d.doc_id, count(*) as n_shared
from d join bench using (h)
where d.doc_id % {_BENCH_MOD} != 0
group by 1
"""


def decontaminate_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: (doc_id, n_shared) for every training
    document sharing >= 1 distinct 13-gram with the benchmark set.
    Tokenization is single-space split (empties preserved) — the same
    convention as the extraction chunker, mirrored by DuckDB's
    string_split. The benchmark gram set is tiny relative to the corpus
    and broadcasts into the final join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.col("text"), " ")
    grams = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= _N)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _N),
                    lambda i: F.md5(
                        F.array_join(F.slice(F.col("w"), i + 1, _N), " ")
                    ).substr(1, 16),
                )
            ).alias("h"),
        )
        .distinct()
    )
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select("h").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


QUERIES["decontaminate_13gram"] = decontaminate_13gram
ORACLES["decontaminate_13gram"] = _DECON_ORACLE


# --- paragraph-level exact dedup (Lee et al. 2022 "Deduplicating
# Training Data Makes Language Models Better", the ExactSubstr-lite
# variant): drop every repeated 25-word chunk corpus-wide except its
# first occurrence (smallest (doc_id, idx)), and rebuild each document
# from its surviving chunks. Chunking is the SAME 25-word convention as
# the extraction chunker, so the SQL mirror is already battle-tested.
#
# Scale shape: the keeper per chunk-hash is computed with groupBy(h) +
# min(struct(doc_id, idx)) — a partial-aggregating (map-side combined)
# reduction — NOT a row_number window over h: a boilerplate chunk with
# 10^9 occurrences would funnel one window partition through one task,
# while min() combines locally. The oracle keeps the naive window form,
# proving the skew-safe rewrite is semantics-preserving (same pattern
# as operators/skew.py).
_PARA_ORACLE = """
with toks as (
  select doc_id, string_split(text, ' ') as t from documents
),
chunks as (
  select doc_id, u.j as idx,
         array_to_string(t[u.j*25+1 : least((u.j+1)*25, len(t))], ' ') as c
  from toks, unnest(range(0, cast(ceil(len(t) / 25.0) as int))) u(j)
),
ranked as (
  select doc_id, idx, c,
         row_number() over (partition by md5(c) order by doc_id, idx) as rn
  from chunks
)
select doc_id,
       count(*) as n_chunks,
       cast(sum(case when rn > 1 then 1 else 0 end) as bigint) as n_dropped,
       sha256(coalesce(
         string_agg(c, chr(10) order by idx) filter (where rn = 1), ''
       )) as digest
from ranked group by 1
"""


def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide chunk dedup: (doc_id, n_chunks, n_dropped, digest of
    the surviving text). Keeper = min(struct(doc_id, idx)) per chunk
    hash via map-side-combined aggregation (see module header for why
    not a window)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.col("text"), " ")
    nchunks = F.ceil(F.size("w") / F.lit(25.0)).cast("int")
    chunks = (
        docs.select("doc_id", w.alias("w"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), nchunks - 1),
                    lambda j: F.array_join(F.slice(F.col("w"), j * 25 + 1, 25), " "),
                )
            ).alias("idx", "c"),
        )
        .withColumn("h", F.md5("c"))
    )
    keeper = chunks.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("first")
    )
    kept = (
        chunks.join(keeper, "h")
        .withColumn(
            "is_first",
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("idx") == F.col("first.idx")),
        )
    )
    surviving = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("is_first"), F.struct("idx", "c"))
                )
            ),
            lambda s: s["c"],
        ),
        "\n",
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(~F.col("is_first"), 1).otherwise(0)).alias("n_dropped"),
        F.sha2(surviving, 256).alias("digest"),
    )


QUERIES["dedup_paragraphs"] = dedup_paragraphs
ORACLES["dedup_paragraphs"] = _PARA_ORACLE


# --- deterministic stratified sampling: reproducible training-mixture
# draws. Per language stratum, the sample is the _SAMPLE_N docs with the
# smallest md5(doc_id) — uniform-in-expectation, seedless, and EXACTLY
# reproducible on any engine / any partitioning (the property a 100 TB
# mixture rebuild needs: re-running the pipeline must pick the same
# docs, or every downstream cache invalidates).
_SAMPLE_N = 40

_SAMPLE_ORACLE = f"""
select lang, doc_id, rk from (
  select lang, doc_id,
         row_number() over (
           partition by lang order by md5(cast(doc_id as varchar)), doc_id
         ) as rk
  from documents
) t where rk <= {_SAMPLE_N}
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sample of {_SAMPLE_N}: rank by
    md5(doc_id) within each stratum (WindowGroupLimit pushes the rank
    cut before the full sort, so each stratum tops out distributed)."""
    from pyspark.sql.window import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _SAMPLE_N)
    )


QUERIES["sample_stratified"] = sample_stratified
ORACLES["sample_stratified"] = _SAMPLE_ORACLE
