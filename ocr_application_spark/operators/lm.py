"""Distributed n-gram language-model scoring (CCNet/KenLM-style).

The CCNet recipe (Wenzek et al. 2020) filters web text by the
perplexity of a small LM trained on a trusted reference corpus. This
module implements that shape Spark-first: train an add-one-smoothed
bigram model over the English slice of ``documents`` entirely with
DataFrame aggregations (no UDF, no driver-side model), then score every
document by joining its bigram stream against the model.

Cross-engine exactness follows the repo invariant: counts are exact
integers in both engines; each bigram's log-probability
``ln((c12+1)/(c1+V))`` is computed on identical IEEE doubles (a ratio
of exact integers) and quantized to integer micro-nats BEFORE the
per-document sum, so the aggregation is exact-integer in both engines
and association order cannot matter. The only cross-engine exposure is
a <=1-ulp libm difference in ``ln`` landing exactly on a 5e-7
quantization boundary — measured zero hits over every sf tier.

Scale story (100 TB): the model is trained on the *reference* slice
(CCNet trains on Wikipedia, not on the crawl), so the model size is
bounded by the curated corpus, not the input. Both model joins are
plain equi-joins on the bigram/context keys — AQE broadcasts them when
small and falls back to shuffle hash joins (with skew split) when the
reference corpus is large; nothing is collected to the driver. The
``min_count`` dial prunes rare bigrams from the model (unseen at score
time), trading model size for smoothing — default 1 keeps the model
exact w.r.t. the oracle.

Reference analog: the classifier-confidence gates (F1/F2,
``classification_service/app/main.py``) are per-document quality
scores deciding routing; the LM score is the corpus-level version of
the same decision, as SURVEY.md SS2.8's quality-scoring family
prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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


_TRAIN_LANG = "en"


def _bigrams(tokens: Column) -> Column:
    """array<string> -> array<struct<w1,w2>> of adjacent pairs.

    Caller must guarantee size >= 2: Spark's sequence(1, n) DESCENDS
    for n < 1 instead of returning empty (unlike DuckDB's range), so an
    unguarded 1-token doc would produce a reversed bogus pair.
    """
    n = F.size(tokens)
    return F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(tokens, i).alias("w1"),
            F.element_at(tokens, i + 1).alias("w2"),
        ),
    )


def bigram_lm_tables(docs: DataFrame, min_count: int = 1) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the bigram model on the trusted slice.

    Returns (bigram_counts(w1, w2, c12), context_counts(w1, c1),
    vocab(v_size)) — all small DataFrames derived from one pass over
    the training slice. ``c1`` is the context count (sum of c12 over
    w2), derived from the bigram table so the two can never disagree.
    """
    train = docs.where(F.col("lang") == _TRAIN_LANG)
    toks = train.select(F.split(F.col("text"), " ").alias("t")).where(F.size("t") >= 2)
    pairs = toks.select(F.explode(_bigrams(F.col("t"))).alias("p")).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if min_count > 1:
        big = big.where(F.col("c12") >= min_count)
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        train.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v_size"))
    )
    return big, ctx, vocab


def score_documents(docs: DataFrame, big: DataFrame, ctx: DataFrame, vocab: DataFrame) -> DataFrame:
    """Score every >=2-token document against the trained model.

    Output per doc: n_bigrams, oov_bigrams (pairs the model never saw),
    lm_logprob_micro (exact-integer sum of per-pair micro-nat
    log-probs). More negative = less reference-like; the CCNet keep
    decision is a threshold on lm_logprob_micro/n_bigrams.
    """
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t")).where(F.size("t") >= 2)
    pairs = toks.select("doc_id", F.explode(_bigrams(F.col("t"))).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            "v_size",
        )
    )
    # ln of a ratio of exact integers: the int->double casts and the
    # division are IEEE-exact-rounded identically in both engines;
    # quantize to integer micro-nats BEFORE summing (repo invariant:
    # never aggregate raw floats whose association order differs).
    # Guarded against the empty-model edge (v_size = 0 -> ratio = inf,
    # whose ANSI bigint cast would throw): an empty training slice
    # yields NULL scores — loud downstream, never garbage.
    denom = (F.col("c1") + F.col("v_size")).cast("double")
    q = F.when(
        denom > 0,
        F.round(F.lit(1e6) * F.log((F.col("c12") + 1).cast("double") / denom), 0).cast("bigint"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(F.col("c12") == 0, 1).otherwise(0)).alias("oov_bigrams"),
        F.sum(q).alias("lm_logprob_micro"),
    )


_LM_ORACLE = f"""
    with toks as (
      select doc_id, lang, string_split(text, ' ') as t from documents
    ),
    train_pairs as (
      select t[u.i] as w1, t[u.i+1] as w2
      from toks, unnest(range(1, len(t))) u(i)
      where lang = '{_TRAIN_LANG}'
    ),
    big as (
      select w1, w2, count(*) as c12 from train_pairs group by 1, 2
    ),
    ctx as (
      select w1, sum(c12) as c1 from big group by 1
    ),
    vocab as (
      select count(distinct u.tok) as v_size
      from toks, unnest(t) u(tok)
      where lang = '{_TRAIN_LANG}'
    ),
    score_pairs as (
      select doc_id, t[u.i] as w1, t[u.i+1] as w2
      from toks, unnest(range(1, len(t))) u(i)
    ),
    joined as (
      select p.doc_id,
             coalesce(b.c12, 0) as c12,
             coalesce(c.c1, 0) as c1,
             v.v_size
      from score_pairs p
      left join big b on p.w1 = b.w1 and p.w2 = b.w2
      left join ctx c on p.w1 = c.w1
      cross join vocab v
    )
    select doc_id,
           count(*) as n_bigrams,
           sum(case when c12 = 0 then 1 else 0 end) as oov_bigrams,
           sum(cast(round(1e6 * ln(cast(c12 + 1 as double)
                                   / cast(c1 + v_size as double)), 0) as bigint))
             as lm_logprob_micro
    from joined
    group by doc_id
"""


@_q("text_lm_score", _LM_ORACLE)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: add-one bigram model trained on
    the English slice, every document scored by exact-integer micro-nat
    log-prob sum. Train + score are pure DataFrame aggregations/joins;
    the oracle replays both stages in SQL with identical quantization."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big, ctx, vocab = bigram_lm_tables(docs)
    return score_documents(docs, big, ctx, vocab)
