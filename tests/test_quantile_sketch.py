"""HDR quantile sketch: merged==direct bit-identity, the relative-error
guarantee vs exact order statistics, and bucket monotonicity."""

import duckdb
import pytest

from ocr_application_spark.operators.quantile_sketch import (
    SUB_BITS,
    _bucket_expr,
    hdr_build,
    hdr_merge,
    hdr_quantiles,
    sketch_hdr_quantiles,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_merged_equals_direct_bit_exact(spark):
    # sketch is a pure function of the multiset: building per-shard
    # (lang, source) states and merging must equal building in one shot
    docs = _docs(spark)
    direct = hdr_build(docs, ["lang"], "n_chars")
    shards = hdr_build(docs, ["lang", "source"], "n_chars")
    merged = hdr_merge(shards.drop("source"), ["lang"])
    a = {(r.lang, r.bucket_id): r.cnt for r in direct.collect()}
    b = {(r.lang, r.bucket_id): r.cnt for r in merged.collect()}
    assert a == b


def test_quantile_estimates_within_bound(spark):
    # estimate is the lower bound of the bucket holding the ceil(q*n)-th
    # order statistic: rep <= exact < rep * (1 + 2^-SUB_BITS)
    out = {r.lang: r for r in sketch_hdr_quantiles(spark, SF_DIR).collect()}
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{SF_DIR}/documents.parquet'")
    rows = con.sql(
        "select lang, list(greatest(n_chars, 1) order by n_chars) from documents group by lang"
    ).fetchall()
    assert rows
    for lang, xs in rows:
        n = len(xs)
        for q_num, q_den, col in [(1, 2, "p50_est"), (9, 10, "p90_est"), (99, 100, "p99_est")]:
            exact = xs[-(-q_num * n // q_den) - 1]  # ceil(q*n)-th smallest
            est = getattr(out[lang], col)
            assert est <= exact <= est * (1 + 2**-SUB_BITS), (lang, col, est, exact)


def test_bucket_id_monotone_and_rep_bounds():
    con = duckdb.connect()
    rows = con.sql(
        f"""
        with v as (select range as x from range(1, 200000))
        select x, {_bucket_expr('x')} as b from v order by x
        """
    ).fetchall()
    prev_b = 0
    for x, b in rows:
        assert b >= prev_b, (x, b, prev_b)  # monotone in x
        prev_b = b
        shift, base = b // 64, b % 64
        rep = base << shift
        assert rep <= x < rep + (1 << shift if shift else 1), (x, b, rep)


def test_quantiles_exact_for_small_values(spark):
    # below 2^(SUB_BITS+1) every value is its own bucket: estimates are
    # exact order statistics
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 10, "v": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]})
    )
    state = hdr_build(df, ["g"], "v")
    r = hdr_quantiles(state, ["g"]).collect()[0]
    assert (r.p50_est, r.p90_est, r.p99_est) == (5, 9, 10)
