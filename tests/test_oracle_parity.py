"""Every oracle-paired query must match DuckDB at sf0.001 (the driver
runs the same comparison at sf0.01 -> CORRECTNESS_r{N}.json)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, con):
    errs, max_delta = compare(_QUERIES[name](spark, SF_DIR), con, _ORACLES[name], name)
    assert not errs, f"{name}: {errs} (max float rel delta {max_delta:.2e})"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
