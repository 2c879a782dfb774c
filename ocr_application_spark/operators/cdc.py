"""Content-defined chunking (CDC) + chunk-level cross-doc dedup.

The backup/rsync dedup idea applied to a web corpus: split each
document at positions where a LOCAL rolling-window hash satisfies a
mask (here: 40-bit md5-slice of the 8-gram ending at the position,
h % 32 == 0 -> mean chunk ~ 32+8 chars), then dedup at CHUNK
granularity across documents. Because boundaries depend only on the
surrounding bytes, an insertion near the head re-chunks ONLY the
region it touches — every later chunk keeps its content and hash
(shift robustness; pinned in tests), which is exactly what fixed-size
blocking loses. The op complements the existing ladder: whole-doc
fingerprint (one byte breaks it) < CDC shared-chunk ratio (localized
edits) < winnowing (arbitrary-offset substring overlap) < shingle
Jaccard (set similarity).

Scale shape: chunking itself is ARRAY-SIDE inside one projection
(same zero-shuffle idiom as winnowing — only real chunks become rows);
the cross-doc sharing needs one explode + a chunk-hash groupBy + a
join back + a doc groupBy. The chunk-hash key space is ~text_bytes/40
— the shuffles are O(corpus bytes / mean chunk), never O(pairs), and
a hot boilerplate chunk costs one counter, not a posting blowup.

Integer-exact by spec: chunk hashes are 40-bit md5 slices (conv in
Spark == '0x'||substr cast in DuckDB — the winnowing convention);
shared ratios are basis points via integer division of non-negative
bigints (floor == truncate when non-negative, the div-vs-// rule).
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


_CDC_K = 8  # rolling-window gram width (chars)
_CDC_MASK = 32  # boundary when gram-hash % 32 == 0 -> mean chunk ~ 40 chars


def cdc_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document CDC chunks -> (doc_id, chunk_no, chunk_chars,
    chunk_hash), one row per non-empty chunk, chunk_no 1-based in
    document order. Docs shorter than the gram width (or empty) form a
    single chunk when non-empty, none when empty. Array-side: boundary
    selection, start/end pairing and slicing all run inside one
    projection; only final chunks become rows."""
    k, m = _CDC_K, _CDC_MASK
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    d = df.select(F.col(id_col).alias("doc_id"), t.alias("t")).filter(
        F.length("t") >= 1
    )
    # boundary char indices: END position of each masked gram
    bounds = (
        f"case when length(t) >= {k} then "
        f"transform(filter(sequence(1, length(t) - {k} + 1), p -> "
        f"cast(conv(substring(md5(substring(t, p, {k})), 1, 10), 16, 10) as bigint)"
        f" % {m} = 0), e -> e + {k} - 1) "
        f"else array() end"
    )
    chunks = (
        "filter(zip_with("
        "concat(array(1), transform(bs, e -> e + 1)), "
        "concat(bs, array(length(t))), "
        "(s, e) -> substring(t, s, e - s + 1)), c -> length(c) > 0)"
    )
    return (
        d.select("doc_id", "t", F.expr(bounds).alias("bs"))
        .select("doc_id", F.posexplode(F.expr(chunks)).alias("i", "c"))
        .select(
            "doc_id",
            (F.col("i") + 1).alias("chunk_no"),
            F.length("c").alias("chunk_chars"),
            F.expr("cast(conv(substring(md5(c), 1, 10), 16, 10) as bigint)").alias(
                "chunk_hash"
            ),
        )
    )


_CDC_SEL_SQL = f"""
d as (
  select doc_id, lower(coalesce(text, '')) as t
  from documents where length(coalesce(text, '')) >= 1
),
bl as (
  select doc_id, list(i + {_CDC_K} - 1 order by i) as bs
  from (
    select doc_id, i,
           ('0x' || substr(md5(substr(t, cast(i as int), {_CDC_K})), 1, 10))::bigint as h
    from d, unnest(range(1, greatest(length(t) - {_CDC_K} + 2, 1))) u(i)
  ) g
  where h % {_CDC_MASK} = 0
  group by doc_id
),
segs as (
  select d.doc_id, d.t,
         list_prepend(1, list_transform(coalesce(bl.bs, []), e -> e + 1)) as ss,
         list_append(coalesce(bl.bs, []), cast(length(d.t) as bigint)) as es
  from d left join bl using (doc_id)
),
chunks as (
  select doc_id, u.i as chunk_no,
         substr(t, cast(ss[u.i] as int), cast(es[u.i] - ss[u.i] + 1 as int)) as c
  from segs, unnest(range(1, len(ss) + 1)) u(i)
  where es[u.i] - ss[u.i] + 1 > 0
),
hashed as (
  select doc_id, chunk_no, length(c) as chunk_chars,
         ('0x' || substr(md5(c), 1, 10))::bigint as chunk_hash
  from chunks
)"""


_CDC_ORACLE = f"""
    with {_CDC_SEL_SQL.lstrip()},
    sharing as (
      select chunk_hash, count(distinct doc_id) as nd
      from hashed group by chunk_hash
    )
    select h.doc_id,
           cast(count(*) as bigint) as n_chunks,
           cast(sum(h.chunk_chars) as bigint) as total_chars,
           cast(sum(case when s.nd >= 2 then h.chunk_chars else 0 end) as bigint)
             as shared_chars,
           cast(10000 * cast(sum(case when s.nd >= 2 then h.chunk_chars else 0 end) as bigint)
                // cast(sum(h.chunk_chars) as bigint) as bigint) as shared_bp
    from hashed h join sharing s using (chunk_hash)
    group by h.doc_id
"""


@_q("dedup_cdc_chunks", _CDC_ORACLE)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC dedup gate: per doc, chunk count, total/shared chunk chars
    (shared = the chunk's hash appears in >= 2 docs) and the shared
    ratio in basis points — the signal a curation pass thresholds to
    drop template-heavy near-copies while keeping genuinely novel
    text. chunk_no order is irrelevant to the aggregate, so the whole
    op is explode -> chunk-hash agg -> join -> doc agg."""
    ch = cdc_chunks(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    sharing = ch.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    shared_chars = F.sum(
        F.when(F.col("nd") >= 2, F.col("chunk_chars")).otherwise(0)
    ).cast("long")
    return (
        ch.join(sharing, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("chunk_chars").cast("long").alias("total_chars"),
            shared_chars.alias("shared_chars"),
        )
        .withColumn(
            "shared_bp",
            F.expr("cast(10000 * shared_chars div total_chars as bigint)"),
        )
    )
