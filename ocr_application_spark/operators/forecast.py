"""Forecasting operators (A7 analog).

The reference fits LinearRegression / ARIMA(1,1,1) on monthly
remboursement series (tarification_pipeline.py:255-263,299-304). Here:

* ``forecast_linear`` — least-squares on the monthly event-value series
  computed from *exact* integer/decimal sufficient statistics
  (n, Σx, Σy, Σxy, Σx²), so it has an exact DuckDB oracle: the only
  float ops are final divisions on identical inputs.
* ``forecast_ar1`` — per-series AR(1) via ``applyInPandas`` (grouped-map
  kernel; model fitting is not a Catalyst op). The estimator is
  closed-form, so it still gets an exact SQL oracle (below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


_DEC = "decimal(18,2)"


@_q(
    "forecast_linear",
    """
    with daily as (
      select datediff('day', date '2020-01-01', cast(ts as date)) as x,
             sum(cast(value as decimal(18,2))) as y
      from events group by 1
    ),
    stats as (
      select count(*) as n, sum(x) as sx, sum(y) as sy,
             sum(x * y) as sxy, sum(x * x) as sx2, max(x) as mx
      from daily
    )
    select cast(n * sxy - sx * sy as double)
             / nullif(cast(n * sx2 - sx * sx as double), 0.0) as slope,
           (cast(sy as double)
              - cast(n * sxy - sx * sy as double)
                / nullif(cast(n * sx2 - sx * sx as double), 0.0)
                * cast(sx as double)) / n as intercept,
           n as n_days, mx as last_day_index
    from stats
    """,
)
def forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A7: daily rollup -> closed-form least squares from exact
    sufficient statistics. Two tiny shuffles (days, then a 1-row agg);
    at scale the daily rollup is the only data-sized pass. (Daily, not
    monthly: the synthetic events span one month — the monthly series
    lives in forecast_ar1, which aggregates by month.)"""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2020-01-01").cast("date")).alias("x")
    ).agg(F.sum(F.col("value").cast(_DEC)).alias("y"))
    stats = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.max("x").alias("mx"),
    )
    numer = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denom = F.nullif((F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double"), F.lit(0.0))
    slope = numer / denom
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n")
    return stats.select(
        slope.alias("slope"),
        intercept.alias("intercept"),
        F.col("n").alias("n_days"),
        F.col("mx").alias("last_day_index"),
    )


# The estimator is closed-form (lag-1 autocovariance ratio), and the
# fit is ENGINEERED EXACT across engines: both sides accumulate the
# sufficient statistics as exact integers (monthly sums in cents —
# Python bigints in the kernel, HUGEINT in DuckDB), scale the centered
# sums by n^2 to clear the mean's division, and only then perform the
# SAME short sequence of IEEE-double ops (one cast, one divide, two
# multiplies per horizon, in identical association order). No float sum
# ever differs in association order between engines, so the outputs are
# bit-identical — no tolerance is relied on (cf. ADVICE r01 on phi-
# cancellation flakiness under relative-only rtol).
#
# Scaled centered stats over the k = n-1 lag pairs (all exact ints):
#   num = n^2 * Σ y_t·y_{t-1}  - n·S·(Σ_t y_t + Σ_t y_{t-1}) + k·S^2
#   den = n^2 * Σ y_{t-1}^2    - 2·n·S·Σ_t y_{t-1}           + k·S^2
#   phi = double(num) / double(den)        (den == 0 -> phi = 0, exact
#                                           INTEGER comparison)
_AR1_ORACLE = """
with monthly as (
  select event_type, cast(date_trunc('month', ts) as date) as month,
         cast(sum(cast(value as decimal(18,2))) * 100 as hugeint) as yc
  from events group by 1, 2
),
lagged as (
  select event_type, month, yc,
         lag(yc) over (partition by event_type order by month) as yp
  from monthly
),
stats as (
  select event_type,
         count(*) as n,
         sum(yc) as s,
         count(yp) as k,
         coalesce(sum(case when yp is not null then yc end), 0) as sp_cur,
         coalesce(sum(case when yp is not null then yp end), 0) as sp_prev,
         coalesce(sum(yc * yp), 0) as spp,
         coalesce(sum(yp * yp), 0) as sprev2,
         last(yc order by month) as y_last
  from lagged group by 1
),
fit as (
  select event_type, n, s, y_last,
         n*n*spp - n*s*(sp_cur + sp_prev) + k*s*s as num,
         n*n*sprev2 - 2*n*s*sp_prev + k*s*s as den
  from stats
),
phis as (
  select event_type, n, s, y_last,
         case when den > 0 then cast(num as double) / cast(den as double)
              else 0.0 end as phi
  from fit
)
select event_type, phi,
       cast(s as double) / (100.0 * n) as mean_y,
       cast(s as double) / (100.0 * n)
         + (cast(y_last as double) / 100.0 - cast(s as double) / (100.0 * n))
           * phi as h1,
       cast(s as double) / (100.0 * n)
         + (cast(y_last as double) / 100.0 - cast(s as double) / (100.0 * n))
           * (phi * phi) as h2,
       cast(s as double) / (100.0 * n)
         + (cast(y_last as double) / 100.0 - cast(s as double) / (100.0 * n))
           * ((phi * phi) * phi) as h3
from phis
"""


def _ar1_exact_fit(yc: list) -> tuple:
    """Closed-form AR(1) on an integer (cents) series via exact bigint
    sufficient statistics. Returns (phi, mu, h1, h2, h3) as the doubles
    produced by the one canonical IEEE op sequence (mirrored verbatim in
    the SQL oracles)."""
    n = len(yc)
    s = sum(yc)
    sp_cur = sum(yc[1:])
    sp_prev = sum(yc[:-1])
    spp = sum(a * b for a, b in zip(yc[1:], yc[:-1]))
    sprev2 = sum(b * b for b in yc[:-1])
    k = n - 1
    num = n * n * spp - n * s * (sp_cur + sp_prev) + k * s * s
    den = n * n * sprev2 - 2 * n * s * sp_prev + k * s * s
    phi = float(num) / float(den) if den > 0 else 0.0
    mu = s / (100.0 * n)
    last_c = yc[-1] / 100.0 - mu
    h1 = mu + last_c * phi
    h2 = mu + last_c * (phi * phi)
    h3 = mu + last_c * ((phi * phi) * phi)
    return phi, mu, h1, h2, h3


def forecast_ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) per event_type over the monthly series, fit in a grouped-map
    pandas kernel (the reference's ARIMA analog,
    tarification_pipeline.py:299-304): phi from lag-1 autocovariance,
    3-step-ahead forecast with mean reversion. The kernel receives exact
    integer cents and runs `_ar1_exact_fit` — bit-identical to the SQL
    oracle (see _AR1_ORACLE header)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    monthly = (
        ev.groupBy(
            "event_type", F.date_trunc("month", "ts").cast("date").alias("month")
        )
        .agg(F.sum(F.col("value").cast(_DEC)).alias("y_dec"))
        # exact integer cents: the kernel's sufficient statistics stay in
        # arbitrary-precision Python ints, like DuckDB's HUGEINT
        .select(
            "event_type", "month", (F.col("y_dec") * 100).cast("long").alias("yc")
        )
    )

    schema = "event_type string, phi double, mean_y double, h1 double, h2 double, h3 double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month")
        yc = [int(v) for v in pdf["yc"]]
        phi, mu, h1, h2, h3 = _ar1_exact_fit(yc)
        return pd.DataFrame(
            [[pdf["event_type"].iloc[0], phi, mu, h1, h2, h3]],
            columns=["event_type", "phi", "mean_y", "h1", "h2", "h3"],
        )

    return monthly.groupBy("event_type").applyInPandas(fit, schema=schema)


QUERIES["forecast_ar1"] = forecast_ar1
ORACLES["forecast_ar1"] = _AR1_ORACLE  # closed-form estimator, SQL twin


# --- ARIMA(1,1,1) analog: differenced AR(1) + drift --------------------------
# The reference fits ARIMA(1,1,1) on the monthly series
# (Tarification_service isoler/app/tarification_pipeline.py:299-304).
# A true MA(1) term has no closed-form estimator (innovations are
# latent), so the deterministic analog is the d=1 backbone: difference
# the series (the "I"), fit AR(1)-with-mean on the differences (drift +
# mean-reverting step sizes), and integrate forecasts back to levels —
# f_{t+h} = y_t + Σ_{i<=h} ẑ_{t+i}. Exactness engineering is identical
# to forecast_ar1: integer-cents differences, exact bigint sufficient
# statistics, one shared IEEE op sequence (_ar1_exact_fit) mirrored
# verbatim in SQL.
_ARIMA_ORACLE = """
with monthly as (
  select event_type, cast(date_trunc('month', ts) as date) as month,
         cast(sum(cast(value as decimal(18,2))) * 100 as hugeint) as yc
  from events group by 1, 2
),
diffs as (
  select event_type, month,
         yc - lag(yc) over (partition by event_type order by month) as zc
  from monthly
),
z as (select event_type, month, zc from diffs where zc is not null),
zlag as (
  select event_type, month, zc,
         lag(zc) over (partition by event_type order by month) as zp
  from z
),
zstats as (
  select event_type,
         count(*) as m, sum(zc) as sz, count(zp) as k,
         coalesce(sum(case when zp is not null then zc end), 0) as sp_cur,
         coalesce(sum(case when zp is not null then zp end), 0) as sp_prev,
         coalesce(sum(zc * zp), 0) as spp,
         coalesce(sum(zp * zp), 0) as sprev2,
         last(zc order by month) as z_last
  from zlag group by 1
),
zfit as (
  select event_type, m, sz, z_last,
         m*m*spp - m*sz*(sp_cur + sp_prev) + k*sz*sz as num,
         m*m*sprev2 - 2*m*sz*sp_prev + k*sz*sz as den
  from zstats
),
lasts as (
  select event_type, last(yc order by month) as y_last from monthly group by 1
),
joined as (
  select l.event_type, l.y_last,
         coalesce(case when den > 0
                       then cast(num as double) / cast(den as double)
                       else 0.0 end, 0.0) as phi,
         case when m is null then 0.0
              else cast(sz as double) / (100.0 * m) end as drift,
         case when m is null then 0.0
              else cast(z_last as double) / 100.0
                   - cast(sz as double) / (100.0 * m) end as zcent
  from lasts l left join zfit z on l.event_type = z.event_type
)
select event_type, phi, drift,
       cast(y_last as double) / 100.0
         + (drift + zcent * phi) as f1,
       cast(y_last as double) / 100.0
         + (drift + zcent * phi)
         + (drift + zcent * (phi * phi)) as f2,
       cast(y_last as double) / 100.0
         + (drift + zcent * phi)
         + (drift + zcent * (phi * phi))
         + (drift + zcent * ((phi * phi) * phi)) as f3
from joined
"""


def forecast_arima_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARIMA(1,1,1) analog per event_type: first-difference the monthly
    cents series, fit AR(1)+drift on the differences via the exact
    integer sufficient statistics (`_ar1_exact_fit`), integrate the
    3-step forecasts back to levels. Grouped-map pandas kernel like
    forecast_ar1; bit-identical to the SQL oracle."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    monthly = (
        ev.groupBy(
            "event_type", F.date_trunc("month", "ts").cast("date").alias("month")
        )
        .agg(F.sum(F.col("value").cast(_DEC)).alias("y_dec"))
        .select(
            "event_type", "month", (F.col("y_dec") * 100).cast("long").alias("yc")
        )
    )

    schema = "event_type string, phi double, drift double, f1 double, f2 double, f3 double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month")
        yc = [int(v) for v in pdf["yc"]]
        zc = [b - a for a, b in zip(yc[:-1], yc[1:])]
        if zc:
            phi, drift, e1, e2, e3 = _ar1_exact_fit(zc)
        else:
            phi = drift = e1 = e2 = e3 = 0.0
        y_last = yc[-1] / 100.0
        f1 = y_last + e1
        f2 = f1 + e2
        f3 = f2 + e3
        return pd.DataFrame(
            [[pdf["event_type"].iloc[0], phi, drift, f1, f2, f3]],
            columns=["event_type", "phi", "drift", "f1", "f2", "f3"],
        )

    return monthly.groupBy("event_type").applyInPandas(fit, schema=schema)


QUERIES["forecast_arima_like"] = forecast_arima_like
ORACLES["forecast_arima_like"] = _ARIMA_ORACLE
