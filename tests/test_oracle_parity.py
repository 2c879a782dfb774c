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
    # rows-only queries must produce results, not merely avoid crashing
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


def test_ar1_exact_fit_edge_branches():
    """Pin the integer-sufficient-statistic fitter's guard branches:
    single point (den=0 -> phi=0), constant series (den=0), and a known
    two-point series; all values must be exact IEEE results of the
    documented op sequence."""
    from ocr_application_spark.operators.forecast import _ar1_exact_fit

    # single month: phi 0, forecasts collapse to the value itself
    phi, mu, h1, h2, h3 = _ar1_exact_fit([1234])
    assert (phi, mu) == (0.0, 12.34)
    assert h1 == h2 == h3 == 12.34

    # constant series: den = 0 -> phi = 0, forecasts = mean = value
    phi, mu, h1, h2, h3 = _ar1_exact_fit([500, 500, 500])
    assert (phi, mu, h1) == (0.0, 5.0, 5.0)

    # two points: den > 0, exact closed form
    # yc = [100, 300]: n=2, S=400, pairs: spp=30000, sprev2=10000
    # num = 4*30000 - 2*400*(300+100) + 1*160000 = -40000
    # den = 4*10000 - 2*2*400*100 + 160000 = 40000  -> phi = -1.0
    phi, mu, h1, _, h3 = _ar1_exact_fit([100, 300])
    assert phi == -1.0 and mu == 2.0
    assert h1 == 2.0 + (3.0 - 2.0) * -1.0  # mean-reverting flip
    assert h3 == 2.0 + (3.0 - 2.0) * -1.0  # odd power
