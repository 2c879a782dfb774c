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


# The estimator is closed-form (lag-1 autocovariance ratio), so even
# though the Spark side is a grouped-map model-fit kernel, its VALUES
# have an exact SQL twin: mu = avg(y); phi = Σ d_t·d_{t-1} / Σ d_{t-1}²
# over lagged pairs; h-step forecast = mu + (y_last - mu)·phi^h.
# Float sums may differ in association order across engines — the
# harness's 1e-9 relative tolerance covers that.
_AR1_ORACLE = """
with monthly as (
  select event_type, cast(date_trunc('month', ts) as date) as month,
         cast(sum(cast(value as decimal(18,2))) as double) as y
  from events group by 1, 2
),
mus as (
  select event_type, avg(y) as mu, count(*) as n from monthly group by 1
),
lagged as (
  select m.event_type, m.y, mu,
         lag(m.y) over (partition by m.event_type order by m.month) as y_prev
  from monthly m join mus using (event_type)
),
fit as (
  -- no WHERE on y_prev: a single-month series must survive with
  -- num = den = 0 (phi -> 0), matching the kernel's denom-guard branch
  select event_type, any_value(mu) as mu,
         coalesce(sum(case when y_prev is not null
                           then (y - mu) * (y_prev - mu) end), 0.0) as num,
         coalesce(sum(case when y_prev is not null
                           then (y_prev - mu) * (y_prev - mu) end), 0.0) as den
  from lagged group by event_type
),
lasts as (
  select event_type, last(y order by month) as y_last from monthly group by 1
)
select f.event_type,
       case when den > 0 then num / den else 0.0 end as phi,
       mu as mean_y,
       mu + (y_last - mu) * pow(case when den > 0 then num / den else 0.0 end, 1) as h1,
       mu + (y_last - mu) * pow(case when den > 0 then num / den else 0.0 end, 2) as h2,
       mu + (y_last - mu) * pow(case when den > 0 then num / den else 0.0 end, 3) as h3
from fit f join lasts using (event_type)
"""


def forecast_ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) per event_type over the monthly series, fit in a grouped-map
    pandas kernel (the reference's ARIMA analog): phi from lag-1
    autocorrelation, 3-step-ahead forecast with mean reversion."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    monthly = (
        ev.groupBy(
            "event_type", F.date_trunc("month", "ts").cast("date").alias("month")
        )
        # decimal sum -> double: bit-identical y in both engines, so the
        # float estimator sees the same inputs (cf. forecast_linear)
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double").alias("y"))
    )

    schema = "event_type string, phi double, mean_y double, h1 double, h2 double, h3 double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month")
        y = pdf["y"].to_numpy(dtype=np.float64)
        et = pdf["event_type"].iloc[0]
        mu = float(y.mean())
        d = y - mu
        denom = float((d[:-1] ** 2).sum())
        phi = float((d[1:] * d[:-1]).sum() / denom) if denom > 0 else 0.0
        last = float(y[-1]) - mu
        preds = [mu + last * phi ** h for h in (1, 2, 3)]
        return pd.DataFrame(
            [[et, phi, mu, preds[0], preds[1], preds[2]]],
            columns=["event_type", "phi", "mean_y", "h1", "h2", "h3"],
        )

    return monthly.groupBy("event_type").applyInPandas(fit, schema=schema)


QUERIES["forecast_ar1"] = forecast_ar1
ORACLES["forecast_ar1"] = _AR1_ORACLE  # closed-form estimator, SQL twin
