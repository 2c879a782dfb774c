"""Text-analysis operators over the ``documents`` table.

Language-ID heuristic, quality scoring, token counting, and document
fingerprinting — the per-document scalar layer a training-data pipeline
runs before filtering/dedup. All pure built-in column expressions
(codegen'd, no UDF), each with an exact DuckDB oracle.
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


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# token count via length arithmetic — dialect-portable, exact
_TOKENS_SQL = "(length(text) - length(replace(text, ' ', '')) + 1)"


def _tokens_col():
    return F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1


# --- token counting ------------------------------------------------------------
@_q(
    "text_token_stats",
    f"""
    select doc_id,
           {_TOKENS_SQL} as n_tokens,
           length(text) as n_chars_measured,
           cast(length(replace(text, ' ', '')) as double)
                 / {_TOKENS_SQL} as avg_token_len
    from documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + mean token length, pure arithmetic."""
    d = _docs(spark, sf_dir)
    nt = _tokens_col()
    nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return d.select(
        "doc_id",
        nt.alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        (nonspace.cast("double") / nt).alias("avg_token_len"),
    )


# --- language-ID heuristic --------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "to")


@_q(
    "text_langid_heuristic",
    f"""
    with toks as (
      select doc_id, unnest(string_split(text, ' ')) as token from documents
    ),
    ratios as (
      select doc_id,
             cast(sum(case when token in {_STOPWORDS} then 1 else 0 end) as double)
                   / count(*) as stopword_ratio
      from toks group by doc_id
    )
    select doc_id, stopword_ratio,
           case when stopword_ratio >= 0.08 then 'en-like' else 'other' end as pred_lang
    from ratios
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: English-function-word ratio
    per document -> coarse label. (The reference's Arabic-script regex
    F3 is the same family of heuristic; see reference_ops.f_record_filters.)"""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    ratios = toks.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("stopword_ratio")
    )
    return ratios.select(
        "doc_id",
        "stopword_ratio",
        F.when(F.col("stopword_ratio") >= 0.08, F.lit("en-like"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    )


# --- quality scoring ----------------------------------------------------------------
@_q(
    "text_quality_score",
    f"""
    select doc_id,
           {_TOKENS_SQL} as n_tokens,
           least(cast({_TOKENS_SQL} as double) / 100.0, 1.0) * 0.5
             + least(cast(length(replace(text, ' ', '')) as double)
                     / {_TOKENS_SQL} / 8.0, 1.0) * 0.3
             + case when length(text) between 100 and 20000 then 0.2 else 0.0 end
             as quality
    from documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score in [0,1]: token-count saturation (0.5) + mean-token-
    length saturation (0.3) + length-window bonus (0.2) — the
    length/ratio family of heuristics used for corpus filtering."""
    d = _docs(spark, sf_dir)
    nt = _tokens_col()
    nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    quality = (
        F.least(nt.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + F.least(nonspace.cast("double") / nt / 8.0, F.lit(1.0)) * 0.3
        + F.when(F.length("text").between(100, 20000), 0.2).otherwise(0.0)
    )
    return d.select("doc_id", nt.alias("n_tokens"), quality.alias("quality"))


# --- document fingerprinting -----------------------------------------------------------
@_q(
    "text_fingerprint",
    """
    select doc_id,
           md5(lower(text)) as fingerprint,
           substr(sha256(lower(text)), 1, 16) as fingerprint64
    from documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints (md5 + truncated sha256 of normalized text)
    — join keys for cross-snapshot dedup and the digest the lineage
    table folds (cf. pipeline digest contract)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.lower("text")).alias("fingerprint"),
        F.substring(F.sha2(F.lower(F.col("text")), 256), 1, 16).alias("fingerprint64"),
    )


# --- the cleaning decision, composed -------------------------------------------
# What a C4-style corpus-cleaning pass actually ships: one keep/drop
# decision per document from the scalar layer above plus exact dedup —
# language gate (stopword ratio), quality gate, and canonical-survivor
# selection (smallest doc_id per content fingerprint). Everything is
# built-in column expressions + two keyed aggregations; at corpus scale
# the only data-sized shuffles are groupBy(doc_id) over tokens and
# groupBy(fingerprint), both partial-aggregated map-side.
@_q(
    "corpus_clean_pipeline",
    f"""
    with toks as (
      select doc_id, unnest(string_split(text, ' ')) as token from documents
    ),
    ratios as (
      select doc_id,
             cast(sum(case when token in {_STOPWORDS} then 1 else 0 end) as double)
                   / count(*) as stopword_ratio
      from toks group by doc_id
    ),
    fp as (
      select doc_id, md5(lower(text)) as fingerprint,
             least(cast({_TOKENS_SQL} as double) / 100.0, 1.0) * 0.5
               + least(cast(length(replace(text, ' ', '')) as double)
                       / {_TOKENS_SQL} / 8.0, 1.0) * 0.3
               + case when length(text) between 100 and 20000 then 0.2 else 0.0 end
               as quality
      from documents
    ),
    keepers as (select fingerprint, min(doc_id) as keeper from fp group by 1)
    select f.doc_id,
           r.stopword_ratio,
           case when r.stopword_ratio >= 0.08 then 'en-like' else 'other' end
             as pred_lang,
           f.quality,
           f.doc_id != k.keeper as is_exact_dup,
           (r.stopword_ratio >= 0.08 and f.quality >= 0.5
            and f.doc_id = k.keeper) as kept
    from fp f
    join keepers k on f.fingerprint = k.fingerprint
    join ratios r on f.doc_id = r.doc_id
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop decision: en-like language AND quality >=
    0.5 AND canonical survivor of its exact-dup group. The floats in the
    gates are the same engineered-identical expressions the individual
    queries use, so the boolean decision is cross-engine stable."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    ratios = toks.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("token").isin(*_STOPWORDS), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("stopword_ratio")
    )
    nt = _tokens_col()
    nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    quality = (
        F.least(nt.cast("double") / 100.0, F.lit(1.0)) * 0.5
        + F.least(nonspace.cast("double") / nt / 8.0, F.lit(1.0)) * 0.3
        + F.when(F.length("text").between(100, 20000), 0.2).otherwise(0.0)
    )
    fp = d.select(
        "doc_id", F.md5(F.lower("text")).alias("fingerprint"), quality.alias("quality")
    )
    keepers = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper"))
    return (
        fp.join(keepers, "fingerprint")
        .join(ratios, "doc_id")
        .select(
            "doc_id",
            "stopword_ratio",
            F.when(F.col("stopword_ratio") >= 0.08, F.lit("en-like"))
            .otherwise(F.lit("other"))
            .alias("pred_lang"),
            "quality",
            (F.col("doc_id") != F.col("keeper")).alias("is_exact_dup"),
            (
                (F.col("stopword_ratio") >= 0.08)
                & (F.col("quality") >= 0.5)
                & (F.col("doc_id") == F.col("keeper"))
            ).alias("kept"),
        )
    )


# --- corpus vocabulary -------------------------------------------------------
@_q(
    "text_vocabulary",
    f"""
    with toks as (
      select doc_id, unnest(string_split(text, ' ')) as token from documents
    ),
    stats as (
      select token,
             count(*) as tf,
             count(distinct doc_id) as df
      from toks where token != '' group by token
    ),
    ranked as (
      select token, tf, df,
             row_number() over (order by df desc, tf desc, token) as rank
      from stats
    )
    select token, tf, df, rank,
           token in {_STOPWORDS} as is_stopword
    from ranked where rank <= 200
    """,
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary building (the tokenizer-training precursor):
    term frequency + document frequency per token, top-200 by df with a
    total (df, tf, token) tie-break so the cut is deterministic. Two
    keyed aggregations, both map-side partial — shuffle is O(vocab),
    never O(tokens), which is what makes vocab building feasible at
    corpus scale."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    stats = toks.groupBy("token").agg(
        F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    from pyspark.sql.window import Window

    # top-200 via orderBy+limit -> TakeOrderedAndProject (per-partition
    # partial top-k, plan-audited), NOT a global row_number window —
    # an unpartitioned window would funnel the ENTIRE vocabulary
    # (easily 10^8 rows at corpus scale) through one partition. The
    # rank window then runs over just the 200 survivors.
    top = stats.orderBy(F.desc("df"), F.desc("tf"), "token").limit(200)
    w = Window.orderBy(F.desc("df"), F.desc("tf"), "token")
    return top.select(
        "token", "tf", "df",
        F.row_number().over(w).alias("rank"),
        F.col("token").isin(*_STOPWORDS).alias("is_stopword"),
    )
