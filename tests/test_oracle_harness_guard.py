"""The dtype-parity guard (VERDICT r03 #2) must fire on the exact
failure class that shipped in r03: a DuckDB oracle whose values are
bit-exact but whose column types as HUGEINT (sum(BIGINT) does), which
the driver's pandas bridge renders as float64 and the exact hash then
rejects. These cases prove the guard fires by construction, so the
class can never pass the local mirror again."""

import duckdb
import pytest

from tests.oracle_harness import compare, dtype_parity_errs


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_guard_fires_on_hugeint_sum(spark, con):
    sdf = spark.createDataFrame([(3,)], "total bigint")
    # DuckDB: sum(BIGINT) -> HUGEINT; values bit-exact (3 == 3) but the
    # pandas bridge would hand the driver 3.0
    sql = "select sum(x) as total from (values (cast(1 as bigint)), (cast(2 as bigint))) t(x)"
    rel = con.sql(sql)
    errs = dtype_parity_errs(sdf, rel)
    assert errs and "HUGEINT" in errs[0], errs
    # and compare() must surface it as a failure, not silently coerce
    errs, _ = compare(sdf, con, sql, "guard_case")
    assert errs and "HUGEINT" in errs[0], errs


def test_guard_fires_on_double_for_integral(spark, con):
    sdf = spark.createDataFrame([(3,)], "total bigint")
    sql = "select cast(3 as double) as total"
    errs = dtype_parity_errs(sdf, con.sql(sql))
    assert errs and "duck=DOUBLE" in errs[0], errs


def test_guard_allows_cast_bigint_and_decimal_money(spark, con):
    from decimal import Decimal

    sdf = spark.createDataFrame(
        [(3, Decimal("1.50"))], "total bigint, amount decimal(12,2)"
    )
    sql = (
        "select cast(sum(x) as bigint) as total, cast(1.50 as decimal(12,2)) as amount "
        "from (values (cast(1 as bigint)), (cast(2 as bigint))) t(x)"
    )
    rel = con.sql(sql)
    assert dtype_parity_errs(sdf, rel) == []
    errs, _ = compare(sdf, con, sql, "clean_case")
    assert errs == [], errs
