"""Redirect-chain resolution: (src -> Location) edges -> terminal URLs.

A crawl frontier stores one hop per fetch (the 3xx Location header);
dedup/canonicalization and the link graph want the TERMINAL url each
chain lands on, with the hop count and a too-many-redirects verdict
(browsers and crawlers cap chains — we use the customary cap of 8; a
redirect LOOP is indistinguishable from an over-long chain under a cap,
exactly as in a real fetcher, and lands in the same verdict).

Scale shape — pointer doubling, not per-hop walking: resolving up to
``2^r`` hops costs ``r`` self-joins of the (node, cur, hops) state
instead of ``2^r`` passes over the edge table, so the 8-hop cap is 3
composition rounds (+1 seed join) of equi-joins AQE can plan; state
stays 3 columns per node at any corpus size. Redirect functions are
deterministic (one Location per src), so composing the partial walk
with itself is exact: ``hops`` adds, terminals compose with hop 0 and
stay put. The DuckDB oracle instead walks hop-by-hop with a recursive
CTE and keeps each chain's deepest row — agreement proves the doubling
algebra, not just the fixture.

The reference has no crawl layer (uploads only); this extends the
acquisition family (sitemap/robots/politeness/recrawl/cache-headers)
with the remaining URL-identity step in front of
``urlops.canonical_url`` (a server redirect is the strongest canonical
vote of all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}

MAX_HOPS = 8  # customary fetcher cap; 2^3 -> 3 doubling rounds
_ROUNDS = 3


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def resolve_redirects(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Resolve every url in ``nodes(url)`` through ``edges(src, dst)``
    to (url, final_url, n_hops, status). ``status`` is 'ok' when the
    walk reached a url with no outgoing redirect within MAX_HOPS hops,
    else 'too_many_redirects' (over-long chain or loop — a capped
    fetcher cannot and need not distinguish them)."""
    e = edges.select(F.col("src"), F.col("dst"))
    # walk over the FULL url domain (nodes ∪ edge endpoints): the
    # composition join is inner, so a Location pointing outside the
    # requested node set must still have a state row or its chain would
    # silently vanish; the output is restricted back to `nodes` at the end
    domain = (
        nodes.select("url")
        .union(e.select(F.col("src").alias("url")))
        .union(e.select(F.col("dst").alias("url")))
        .distinct()
    )
    # seed: one step (hop 1), terminals stay at hop 0
    m = (
        domain.select(F.col("url").alias("src_url"))
        .join(e, F.col("src_url") == F.col("src"), "left")
        .select(
            "src_url",
            F.coalesce("dst", "src_url").alias("cur"),
            F.when(F.col("dst").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("hops"),
        )
    )
    # pointer doubling: M_{2k} = M_k ∘ M_k (exact for deterministic chains)
    for _ in range(_ROUNDS):
        b = m.select(
            F.col("src_url").alias("b_src"),
            F.col("cur").alias("b_cur"),
            F.col("hops").alias("b_hops"),
        )
        m = m.join(b, m.cur == b.b_src, "inner").select(
            "src_url",
            F.col("b_cur").alias("cur"),
            (F.col("hops") + F.col("b_hops")).alias("hops"),
        )
    has_out = e.select(F.col("src").alias("cur")).distinct().withColumn(
        "dangling", F.lit(True)
    )
    out = m.join(has_out, "cur", "left").select(
        F.col("src_url").alias("url"),
        F.col("cur").alias("final_url"),
        F.col("hops").alias("n_hops"),
        F.when(F.col("dangling").isNotNull(), F.lit("too_many_redirects"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
    return out.join(nodes.select("url").distinct(), "url", "left_semi")


# --- deterministic fixture (twin expressions) --------------------------------
#
# node d = url over doc_id; next(d): d%20==0 -> terminal, d%20==11 ->
# d itself (self-loop), else d-1. Exercises every verdict class:
# hops 0 (terminals), ok 1..7, ok at EXACTLY the cap (d%20==8), finite
# chains past the cap (d%20 in 9,10), a pure loop (11), and chains that
# fall INTO the loop (12..19).

_URL_SQL = (
    "'https://h' || cast(doc_id % 20 as varchar) || '.example.com/p/'"
    " || cast(doc_id as varchar)"
)


def _url_of(expr: str) -> str:
    return _URL_SQL.replace("doc_id", f"({expr})")


_NEXT_SQL = f"""
    case
      when doc_id % 20 = 0 then null
      when doc_id % 20 = 11 then {_URL_SQL}
      else {_url_of('doc_id - 1')}
    end
"""

_ORACLE = f"""
    with recursive nodes as (
      select doc_id, {_URL_SQL} as url from documents
    ),
    edges as (
      select {_URL_SQL} as src, {_NEXT_SQL} as dst
      from documents
      where doc_id % 20 <> 0
    ),
    walk(url, cur, hops) as (
      select url, url, 0 from nodes
      union all
      select w.url, e.dst, w.hops + 1
      from walk w join edges e on w.cur = e.src
      where w.hops < {MAX_HOPS}
    ),
    deepest as (
      select url, max_by(cur, hops) as final_url,
             cast(max(hops) as bigint) as n_hops
      from walk group by url
    )
    select d.url, d.final_url, d.n_hops,
      case when e.src is not null then 'too_many_redirects' else 'ok' end
        as status
    from deepest d
    left join (select distinct src from edges) e on d.final_url = e.src
"""


@_q("url_redirect_resolve", _ORACLE)
def url_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.expr(_URL_SQL.replace("as varchar", "as string"))
    nodes = docs.select(url.alias("url"))
    edges = docs.filter(F.expr("doc_id % 20 <> 0")).select(
        url.alias("src"),
        F.expr(_NEXT_SQL.replace("as varchar", "as string")).alias("dst"),
    )
    return resolve_redirects(nodes, edges)
