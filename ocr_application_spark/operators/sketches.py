"""Mergeable-sketch operators — distinct-count estimation at 100 TB.

KMV (k-minimum-values, a.k.a. bottom-k) distinct-count sketch: per
group, keep the k smallest *distinct* md5 hash values of the tracked
expression; the k-th minimum estimates the cardinality as
``(k-1) * H div h_k`` where ``H`` is the hash-space size. Unlike
Spark's built-in ``approx_count_distinct`` (HLL++, whose register
layout and rounding are engine-private and therefore un-oracle-able),
KMV is INTEGER-EXACT BY SPEC: the hash is md5 (identical in Spark and
DuckDB), the order statistic is a plain min-k over fixed-width hex
strings (lexicographic == numeric for fixed width), and the estimate is
one int64 multiply + truncating divide — bit-identical across engines
and shuffle orders (CLAUDE.md float invariant, applied to cardinality
estimation).

The hash is truncated to 12 hex chars (48 bits) so ``(k-1) * 2^48``
stays inside int64 for k up to ~32 000; at 48 bits the collision bias
is ~D^2/2^49 (negligible below ~10^7 distinct per group, and in any
case part of the deterministic spec both engines share). For a
production 100 TB run you would widen to 15 chars (60 bits) and do the
one division in DECIMAL; the gate keeps 48 bits so every operand is a
plain BIGINT in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_HEX_WIDTH = 12
_SPACE = 16**_HEX_WIDTH  # 2^48


def kmv_distinct(df: DataFrame, group: str, value: Column, k: int = 64) -> DataFrame:
    """Per-``group`` KMV distinct-count estimate of ``value`` ->
    (group, n_seen, kth_hash, distinct_est).

    ``n_seen < k`` means fewer than k distinct hashes exist, so the
    count is exact (= n_seen); otherwise the bottom-k estimator
    ``(k-1) * 2^48 div h_k`` applies (standard error ~ 1/sqrt(k-2)).

    Scale shape: stage 1 dedupes (group, hash) pairs with map-side
    partial aggregation (shuffle O(per-task distinct) — the accepted
    dedup_exact shape); stage 2 is the row_number-filter pattern Spark
    rewrites to WindowGroupLimit, whose *partial* mode caps each map
    task's contribution at k rows per group before the exchange, so the
    second shuffle is O(tasks * k) regardless of group cardinality. The
    final per-group aggregate reuses the window's partitioning — no
    third exchange. Never a collect, never a UDF.
    """
    k = int(k)
    if not 2 <= k <= 32000:
        raise ValueError(f"k must be in [2, 32000], got {k}")
    h = F.substring(F.md5(value.cast("string")), 1, _HEX_WIDTH)
    pairs = df.select(F.col(group), h.alias("h"))
    return _bottomk_estimate(pairs, group, k)


def _bottomk_estimate(pairs: DataFrame, group: str, k: int) -> DataFrame:
    """(group, h) hash pairs -> the bottom-k estimate row per group.
    Shared by the direct sketch and the merge path — they CANNOT
    diverge. ``hashes`` (the sorted bottom-k hex array) plus
    ``sketch_k`` (the k it was built at) are the sketch's mergeable
    state."""
    # NULL hashes (NULL input values, or NULL elements in an externally
    # reconstructed state array) contribute no distinct element — and
    # must never reach the order-by (Spark sorts NULLS FIRST asc,
    # DuckDB NULLS LAST: a null hash would corrupt rank 1 on one
    # engine only)
    deduped = pairs.filter(
        F.col("h").isNotNull()
    ).distinct()  # map-side partial, same as groupBy with no aggs
    w = Window.partitionBy(group).orderBy("h")
    ranked = deduped.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    # h is nonzero with probability 1 - 2^-48; greatest(1, .) keeps the
    # ANSI divide total without changing any realistic result
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen")
    ).otherwise(
        F.expr(
            f"({k - 1} * {_SPACE}L) div greatest(1L, cast(conv(kth_hash, 16, 10) as bigint))"
        )
    )
    return (
        ranked.groupBy(group)
        .agg(
            F.max("rn").cast("long").alias("n_seen"),
            F.max("h").alias("kth_hash"),
            F.sort_array(F.collect_list("h")).alias("hashes"),
        )
        .select(
            group,
            "n_seen",
            "kth_hash",
            est.cast("long").alias("distinct_est"),
            "hashes",
            F.lit(k).cast("long").alias("sketch_k"),
        )
    )


def kmv_merge(sketches: DataFrame, group: str, k: int) -> DataFrame:
    """Merge KMV sketches (rows carrying the ``hashes`` bottom-k array
    and its ``sketch_k``, e.g. one sketch per day/partition/source)
    into one estimate per ``group`` — PROVABLY identical to sketching
    the union directly, PROVIDED merge-k <= every slice's sketch_k:
    then any hash in the union's global bottom-k is necessarily in its
    own slice's bottom-k, so min-k over the concatenated states loses
    nothing. Merging at k LARGER than a slice was built with would
    silently underestimate (ranks slice_k+1..k of the union are
    missing from that state), so each state row asserts
    ``k <= sketch_k`` inline — per-row, inside the existing scan, fail
    loud. This is the 100 TB property: sketch each snapshot/day once
    (O(k) state per group), then answer "distinct urls over any window"
    by merging states — never rescanning data. Same estimate pipeline
    as the direct path (shared `_bottomk_estimate`), so merged == direct
    is pinned by construction AND by test."""
    k = int(k)
    if not 2 <= k <= 32000:
        raise ValueError(f"k must be in [2, 32000], got {k}")
    checked = F.when(F.col("sketch_k") >= k, F.col("hashes")).otherwise(
        F.raise_error(
            F.format_string(
                f"kmv_merge: cannot merge at k={k} a sketch built with "
                "sketch_k=%s (missing ranks would silently "
                "underestimate); rebuild slices at k >= merge k",
                F.col("sketch_k").cast("string"),
            )
        ).cast("array<string>")
    )
    pairs = sketches.select(F.col(group), F.explode(checked).alias("h"))
    return _bottomk_estimate(pairs, group, k)


# ONE SQL rendering of the KMV spec (hash, bottom-k, estimate),
# composed by BOTH gate oracles — the direct and the merged gate must
# share it so a future estimator change (e.g. the documented
# widen-to-15-hex production variant) cannot make them diverge.
def _kmv_core_ctes(k: int = 64) -> str:
    return f"""
    with vals as (
      select printf('h%02d', cast(doc_id % 89 as int)) as host,
             substr(md5(cast(doc_id % 997 as varchar)), 1, {_HEX_WIDTH}) as h
      from documents
    ),
    pairs as (select host, h from vals group by host, h),
    ranked as (
      select host, h,
             row_number() over (partition by host order by h) as rn
      from pairs
    ),
    agg as (
      select host, cast(max(rn) as bigint) as n_seen, max(h) as kth_hash
      from ranked where rn <= {k} group by host
    )"""


def _kmv_est_sql(k: int = 64, prefix: str = "") -> str:
    return f"""cast(case when {prefix}n_seen < {k} then {prefix}n_seen
                else ({k - 1} * {_SPACE}) //
                     greatest(1, cast(('0x' || {prefix}kth_hash) as bigint))
                end as bigint) as distinct_est"""


_KMV_ORACLE = f"""
    {_kmv_core_ctes()},
    exact as (
      select printf('h%02d', cast(doc_id % 89 as int)) as host,
             cast(count(distinct doc_id % 997) as bigint) as n_exact
      from documents group by host
    )
    select a.host, a.n_seen, a.kth_hash,
           {_kmv_est_sql(prefix="a.")},
           e.n_exact
    from agg a join exact e on e.host = a.host
    """


@_q("sketch_kmv_distinct", _KMV_ORACLE)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch gate: estimate the number of distinct
    values (doc_id mod 997 — coprime with the 89-host split, so per-host
    cardinality is a known arithmetic fact) per synthesized host, with
    the exact count joined alongside so the estimator's accuracy is
    visible in the verified result itself. Bit-exact vs the oracle:
    identical md5 spec, identical integer estimate arithmetic (DuckDB
    ``//`` == Spark ``div`` on nonnegative int64)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hosted = docs.select(
        F.format_string("h%02d", (F.col("doc_id") % 89).cast("int")).alias("host"),
        (F.col("doc_id") % 997).alias("v"),
    )
    sk = kmv_distinct(hosted, "host", F.col("v"), k=64).drop("hashes", "sketch_k")
    exact = hosted.groupBy("host").agg(
        F.countDistinct("v").cast("long").alias("n_exact")
    )
    return sk.join(exact, "host")


_KMV_MERGED_ORACLE = f"""
    {_kmv_core_ctes()}
    select host, n_seen, kth_hash,
           {_kmv_est_sql()}
    from agg
    """


@_q("sketch_kmv_merged", _KMV_MERGED_ORACLE)
def sketch_kmv_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability gate: sketch each (host, source) SLICE separately,
    then kmv_merge the slice states per host — and the oracle is the
    DIRECT whole-corpus KMV SQL, so the bit-exact match IS the proof
    that merging bottom-k states over any partitioning loses nothing
    (the property that lets a 10^12-row table answer distinct-count
    windows from O(k)-sized per-snapshot states, never a rescan)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sliced = docs.select(
        F.format_string("h%02d", (F.col("doc_id") % 89).cast("int")).alias("host"),
        F.col("source"),
        (F.col("doc_id") % 997).alias("v"),
    ).withColumn("slice", F.concat_ws("|", "host", "source"))
    per_slice = kmv_distinct(sliced, "slice", F.col("v"), k=64)
    states = per_slice.select(
        F.split(F.col("slice"), "\\|").getItem(0).alias("host"),
        "hashes",
        "sketch_k",
    )
    return kmv_merge(states, "host", k=64).drop("hashes", "sketch_k")
