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
    # both rows-only queries (IVF top-k, classifier distribution) must
    # produce results, not merely avoid crashing
    assert df.count() > 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_digest_oracle_survives_adversarial_text(spark, tmpdir_scratch):
    """The flagship digest oracle must mirror the kernel on text the
    clean driver fixtures never exercise: whitespace runs, empty and
    whitespace-only docs, mojibake markers, >8-digit ids, chunk-boundary
    straddles, markup characters."""
    import duckdb
    import pandas as pd

    from ocr_application_spark.operators import kernels_entry as ke
    from tests.oracle_harness import compare

    rows = [
        (1, "plain single spaced words " * 10, "en", "s", 0),
        (2, "double  spaced   runs here " * 8, "en", "s", 0),
        (3, "", "en", "s", 0),
        (4, "   ", "en", "s", 0),
        (5, "d??j?? vu mojibake test", "fr", "s", 0),
        (123456789012, "big id doc", "en", "s", 0),
        (7, "x " * 26, "en", "s", 0),
        (8, " lead and trail  ", "en", "s", 0),
        (9, "a<b AT&T markup 'quotes' \"dq\"", "en", "s", 0),
        # unicode whitespace the ASCII \s class would miss (ADVICE r01):
        # file/group/record/unit separators, NEL, NBSP, vertical tab,
        # line/paragraph separators, NNBSP, ideographic space
        (10, "fs\x1cgs\x1drs\x1eus\x1f nel\x85nbsp\xa0vt\x0b", "en", "s", 0),
        (11, "ls\u2028ps\u2029em\u2003nn\u202fid\u3000end", "en", "s", 0),
        (12, "    \x1c ", "en", "s", 0),  # unicode-ws-only doc
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(f"{tmpdir_scratch}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{tmpdir_scratch}/documents.parquet'")
    errs, _ = compare(
        ke.QUERIES["pipeline_extract_digest"](spark, tmpdir_scratch),
        con,
        ke.ORACLES["pipeline_extract_digest"],
        "digest_adversarial",
    )
    assert errs == [], errs
