"""Relational engine demonstrators over the driver's TPC-H-ish tables.

The reference has no relational queries at all (SURVEY §2.3: records
never meet except via similarity/spatial joins) — these queries exist to
prove the engine's scan/agg/join/window machinery and its physical
plans: decimal-exact aggregation, broadcast dimension joins, AQE-sized
shuffles, top-k windows. Plan notes per query state the 100 TB strategy.

Cross-engine exactness: money sums go through DECIMAL (order-independent
exact arithmetic) and are cast to double only at the end, so Spark and
DuckDB produce bit-identical doubles regardless of partition/summation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_DEC = "decimal(18,2)"


# --- TPC-H Q1 style pricing summary ---------------------------------------
@_q(
    "q1_pricing_summary",
    """
    select l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
           cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_base_price,
           cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))) as double) as sum_disc_price,
           count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: single scan -> partial hash agg (map-side combine) -> one
    # shuffle on the 2-col grouping key (6 groups). At 100 TB the partial
    # agg reduces the shuffle to O(partitions * groups) rows.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# --- Q3 style shipping priority --------------------------------------------
@_q(
    "q3_shipping_priority",
    """
    select l.l_orderkey,
           cast(sum(cast(l.l_extendedprice as decimal(18,2)) * (1 - cast(l.l_discount as decimal(18,2)))) as double) as revenue,
           o.o_orderdate
    from customer c join orders o on c.c_custkey = o.o_custkey
         join lineitem l on l.l_orderkey = o.o_orderkey
    where c.c_mktsegment = 'BUILDING'
      and o.o_orderdate < timestamp '1995-03-15 00:00:00'
      and l.l_shipdate > timestamp '1995-03-15 00:00:00'
    group by l.l_orderkey, o.o_orderdate
    order by revenue desc, l_orderkey
    limit 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: customer (small, filtered) broadcasts into orders; the
    # orders->lineitem join shuffles on orderkey (both huge at scale —
    # bucketing both tables on orderkey makes it co-located). Top-10 via
    # TakeOrderedAndProject, no global sort materialization.
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey), l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- Q5 style region revenue ------------------------------------------------
@_q(
    "q5_region_revenue",
    """
    select n.n_name,
           cast(sum(cast(l.l_extendedprice as decimal(18,2)) * (1 - cast(l.l_discount as decimal(18,2)))) as double) as revenue
    from region r
      join nation n on n.n_regionkey = r.r_regionkey
      join customer c on c.c_nationkey = n.n_nationkey
      join orders o on o.o_custkey = c.c_custkey
      join lineitem l on l.l_orderkey = o.o_orderkey
    where r.r_name = 'ASIA'
    group by n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: region/nation/customer are dimensions -> broadcast all three
    # (no shuffle); the only wide op is orders<->lineitem on orderkey +
    # final 5-group agg. The reference's medicine-catalog broadcast (J1,
    # tarification_pipeline.py:153-155) is the same shape.
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        c.join(n.join(r, n.n_regionkey == r.r_regionkey), c.c_nationkey == n.n_nationkey).select(
            "c_custkey", "n_name"
        )
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --- top-k per group window --------------------------------------------------
@_q(
    "topk_orders_per_customer",
    """
    select o_custkey, o_orderkey, o_totalprice, rn from (
      select o_custkey, o_orderkey, o_totalprice,
             row_number() over (partition by o_custkey
                                order by o_totalprice desc, o_orderkey) as rn
      from orders) t
    where rn <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: one shuffle on custkey; rank pushdown (WindowGroupLimit) keeps
    # only 3 rows per key before the final sort at scale.
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --- Q6 style selective filter-aggregate --------------------------------------
@_q(
    "q6_revenue_change",
    """
    select cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(l_discount as decimal(18,2))) as double) as revenue,
           count(*) as n_rows
    from lineitem
    where l_shipdate >= timestamp '1994-01-01 00:00:00'
      and l_shipdate < timestamp '1995-01-01 00:00:00'
      and l_discount between 0.05 and 0.07
      and l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: every predicate pushes to the parquet scan (PushedFilters);
    # the agg is a 1-group partial+final — the canonical scan-bound query.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# --- Q4 style exists semi-join -------------------------------------------------
@_q(
    "q4_priority_semijoin",
    """
    select o_orderpriority, count(*) as order_count
    from orders o
    where exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey and l.l_returnflag = 'R')
    group by o_orderpriority
    """,
)
def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: LEFT SEMI hash join (exists -> semi, never a distinct+inner
    # that would materialize duplicates), returnflag filter pushed to the
    # lineitem scan, then a tiny group-by on priority.
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Q10 style returned-item customer ranking ----------------------------------
@_q(
    "q10_returned_customers",
    """
    select c_custkey, c_name, n_name,
           cast(sum(cast(l_extendedprice as decimal(18,2))
                    * (1 - cast(l_discount as decimal(18,2)))) as double) as revenue
    from customer
      join orders on c_custkey = o_custkey
      join lineitem on l_orderkey = o_orderkey
      join nation on c_nationkey = n_nationkey
    where l_returnflag = 'R'
    group by c_custkey, c_name, n_name
    order by sum(cast(l_extendedprice as decimal(18,2))
                 * (1 - cast(l_discount as decimal(18,2)))) desc, c_custkey
    limit 20
    """,
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: lineitem (big, filtered at scan) shuffles once onto orderkey;
    # customer joins on custkey; nation broadcasts; TakeOrderedAndProject
    # caps the result without a full sort. Ordering key is the exact
    # decimal sum (identical in both engines), ties broken by custkey.
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.sum(
        F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("rev_dec"))
        .orderBy(F.desc("rev_dec"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", F.col("rev_dec").cast("double").alias("revenue"))
    )


# --- event sessionization (the W2 pattern on a real event stream) -------------
@_q(
    "events_sessionize",
    """
    with gaps as (
      select event_id, user_id, ts,
             case when lag(ts) over w is null then 1
                  when epoch_us(ts) - epoch_us(lag(ts) over w) > 1800 * 1000000 then 1
                  else 0 end as new_session
      from events
      window w as (partition by user_id order by ts, event_id)
    )
    select user_id, event_id,
           cast(sum(new_session) over (partition by user_id
                                       order by ts, event_id
                                       rows unbounded preceding) as bigint) as session_id
    from gaps
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 30-minute-gap sessionization — the same lag+cumsum shape as W2,
    # exercised on the events table; one shuffle on user_id reused by
    # both window passes.
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer MICROSECOND gaps: unix_timestamp() truncates to whole
    # seconds, which disagrees with the oracle's fractional epoch() on
    # gaps within 1s of the 1800s boundary (sf0.1 has several). The
    # NTZ->timestamp cast is identity under the session's pinned UTC tz;
    # both engines then compare exact bigints (epoch_us in DuckDB).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    gaps = ev.withColumn(
        "new_session",
        F.when(prev_us.isNull(), 1)
        .when(us - prev_us > 1800 * 1_000_000, 1)
        .otherwise(0),
    )
    w2 = w.rowsBetween(W.unboundedPreceding, 0)
    return gaps.select(
        "user_id", "event_id", F.sum("new_session").over(w2).alias("session_id")
    )


# --- pivot: language distribution per source -----------------------------------
@_q(
    "pivot_lang_by_source",
    """
    select source,
           count(case when lang = 'en' then 1 end) as en,
           count(case when lang = 'fr' then 1 end) as fr,
           count(case when lang = 'de' then 1 end) as de,
           count(case when lang = 'es' then 1 end) as es,
           count(case when lang = 'zh' then 1 end) as zh
    from documents group by source
    """,
)
def pivot_lang_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # .pivot with an explicit value list: no extra pass to discover
    # values, single shuffle — the S4 class-routing shape as a query.
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .pivot("lang", ["en", "fr", "de", "es", "zh"])
        .count()
        .na.fill(0)
    )


# --- Q14 style promo revenue share ----------------------------------------
@_q(
    "q14_promo_revenue",
    """
    select cast(sum(case when p_type like 'PROMO%'
                         then cast(l_extendedprice as decimal(18,2))
                              * (1 - cast(l_discount as decimal(18,2)))
                         else cast(0 as decimal(18,2)) end) as double)
           / cast(sum(cast(l_extendedprice as decimal(18,2))
                      * (1 - cast(l_discount as decimal(18,2)))) as double)
           * 100.0 as promo_share_pct,
           count(*) as n_rows
    from lineitem join part on l_partkey = p_partkey
    where l_shipdate >= timestamp '1996-01-01 00:00:00'
      and l_shipdate < timestamp '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: part is a dimension -> explicit broadcast hash join (no
    # shuffle of lineitem); shipdate predicate pushes to the scan; the
    # conditional agg is a 1-group partial+final. Decimal sums -> one
    # final double division on identical inputs = bit-identical ratio.
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0).cast(_DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") / F.sum(disc).cast("double") * 100.0).alias(
                "promo_share_pct"
            ),
            F.count("*").alias("n_rows"),
        )
    )


# --- Q18 style large-volume orders ----------------------------------------
@_q(
    "q18_large_orders",
    """
    with big as (
      select l_orderkey, cast(sum(cast(l_quantity as decimal(18,2))) as double) as total_qty
      from lineitem group by l_orderkey
      having sum(cast(l_quantity as decimal(18,2))) > 300
    )
    select c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    from big
    join orders on o_orderkey = l_orderkey
    join customer on c_custkey = o_custkey
    order by o_totalprice desc, o_orderkey
    limit 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: aggregate FIRST (one shuffle on l_orderkey, partial agg
    # map-side), filter to the rare big orders, THEN join — the
    # post-having side is tiny, so both joins broadcast it; the final
    # order-by+limit fuses to TakeOrderedAndProject (no global sort).
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# --- Q7 style nation-pair trade volume -------------------------------------
@_q(
    "q7_nation_volume",
    """
    select sn.n_name as supp_nation, cn.n_name as cust_nation,
           year(l_shipdate) as l_year,
           cast(sum(cast(l_extendedprice as decimal(18,2))
                    * (1 - cast(l_discount as decimal(18,2)))) as double) as volume
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation cn on c_nationkey = cn.n_nationkey
    join supplier on l_suppkey = s_suppkey
    join nation sn on s_nationkey = sn.n_nationkey
    where sn.n_name in ('NATION_1', 'NATION_2') and cn.n_name in ('NATION_1', 'NATION_2')
      and sn.n_name <> cn.n_name
    group by 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan: the star side (lineitem) shuffles once for the orders join;
    # customer/supplier/nation are dimensions -> broadcast joins with the
    # nation-name filters pushed below the join (Catalyst pushes the IN
    # through the broadcast). At 100 TB: same shape, the orders join is
    # the only big exchange and AQE sizes it.
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    two = ("NATION_1", "NATION_2")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(
            F.col("supp_nation").isin(*two)
            & F.col("cust_nation").isin(*two)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
            )
            .cast("double")
            .alias("volume")
        )
    )


# --- cohort retention over events -------------------------------------------
@_q(
    "events_retention_cohorts",
    """
    with firsts as (
      select user_id, min(strftime(date_trunc('day', ts), '%Y-%m-%d')) as cohort_day
      from events group by user_id
    ),
    activity as (
      select distinct user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') as activity_day
      from events
    )
    select cohort_day, activity_day, count(*) as n_active
    from activity join firsts using (user_id)
    group by cohort_day, activity_day
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on every later day they return (dates serialized yyyy-MM-dd, the
    repo's cross-engine date convention — see a4_monthly_sums)."""
    # Plan: ONE shuffle on user_id computes both the cohort (min day)
    # and the distinct activity days from the same exchange (aggregate
    # carries a collect_set of days, then explodes) — versus the naive
    # two-scan join-back. The final cohort-matrix group-by is over
    # ~days^2 rows: trivial at any scale. Counts are integers -> exact.
    ev = _t(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    per_user = (
        ev.select("user_id", day.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"), F.collect_set("d").alias("days"))
    )
    return (
        per_user.select("cohort_day", F.explode("days").alias("activity_day"))
        .groupBy("cohort_day", "activity_day")
        .agg(F.count("*").alias("n_active"))
    )
