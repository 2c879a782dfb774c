"""Local emulation of the driver's DuckDB-oracle comparison.

For each queries() entry with an oracle_sql() twin: run both at a given
sf_dir, compare row count, sorted column names, and order-insensitive
values (exact for non-floats; floats must agree to 1e-9 relative — we
report the max observed delta so drift is visible before it flips a
hash).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v + 0.0  # -0.0 -> 0.0 so the alignment key can't split them
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _sort_key(row):
    # floats enter the ROW-ALIGNMENT key at 9 significant digits so two
    # sides that agree within the value tolerance still align to the
    # same position; the cell comparison afterwards applies the real rtol
    return tuple(
        f"{v:.9e}" if isinstance(v, float) else repr(v) for v in row
    )


def _rows_to_key(rows, cols):
    # case-insensitive column order: the column-equality check lower()s
    # names, so the alignment must too (Spark 'Zone' vs duck 'zone' would
    # otherwise sort into different positions and pair wrong cells)
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=_sort_key)


_INTEGRAL_SPARK = {"tinyint", "smallint", "int", "bigint"}


def dtype_parity_errs(spark_df, rel) -> list[str]:
    """Type-parity guard (VERDICT r03 #2): the driver hashes DuckDB results
    through the pandas bridge, which renders HUGEINT as float64 — so an
    oracle whose values are bit-exact still fails the driver's exact hash
    if any output column types as HUGEINT (DuckDB's sum(BIGINT) does).
    Flag HUGEINT anywhere, and DOUBLE/FLOAT/DECIMAL where Spark is
    integral (DECIMAL where Spark is DECIMAL is fine — money stays exact
    through the bridge)."""
    errs = []
    duck_types = {c.lower(): str(t).upper() for c, t in zip(rel.columns, rel.types)}
    for f in spark_df.schema.fields:
        dt = duck_types.get(f.name.lower())
        if dt is None:
            continue
        s = f.dataType.simpleString()
        if dt == "HUGEINT":
            errs.append(
                f"dtype: {f.name} is HUGEINT in DuckDB (pandas bridge -> "
                f"float64, driver hash mismatch); cast(... as bigint) in the oracle"
            )
        elif s in _INTEGRAL_SPARK and (
            dt in ("DOUBLE", "FLOAT") or dt.startswith("DECIMAL")
        ):
            errs.append(
                f"dtype: {f.name} spark={s} but duck={dt}; align the oracle type"
            )
    return errs


def compare(spark_df, con, sql: str, name: str, float_rtol: float = 1e-9):
    sdf = spark_df.toPandas()
    rel = con.sql(sql)
    errs = dtype_parity_errs(spark_df, rel)
    if errs:
        return errs, 0.0
    ddf = rel.df()
    if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, ddf.columns)):
        errs.append(f"columns: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return errs, 0.0
    if len(sdf) != len(ddf):
        errs.append(f"rowcount: spark={len(sdf)} duck={len(ddf)}")
        return errs, 0.0
    s_rows = _rows_to_key(sdf.itertuples(index=False, name=None), list(sdf.columns))
    d_rows = _rows_to_key(ddf.itertuples(index=False, name=None), list(ddf.columns))
    # Pass 1: cancel rows identical on both sides as a multiset (tuple
    # equality; -0.0 == 0.0, so sign-of-zero can't misalign here). Only
    # residual rows — those needing float tolerance — go through the
    # formatted-sort-key alignment, so a value straddling a 9-digit
    # rounding boundary can only perturb pairing among the (tiny) set of
    # genuinely-differing rows, never fail rows that agree exactly.
    from collections import Counter

    try:
        s_ctr, d_ctr = Counter(s_rows), Counter(d_rows)
        common = s_ctr & d_ctr
        s_rows = sorted((s_ctr - common).elements(), key=_sort_key)
        d_rows = sorted((d_ctr - common).elements(), key=_sort_key)
    except TypeError:
        pass  # unhashable cells (array columns): keep full sorted lists
    max_delta = 0.0
    n_mismatch = 0
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if x == y:
                    continue
                denom = max(abs(x), abs(y), 1e-300)
                delta = abs(x - y) / denom
                max_delta = max(max_delta, delta)
                if delta > float_rtol:
                    n_mismatch += 1
                    if n_mismatch <= 3:
                        errs.append(f"row {i}: float {x!r} != {y!r} (rel {delta:.2e})")
            elif x != y:
                n_mismatch += 1
                if n_mismatch <= 3:
                    errs.append(f"row {i}: {x!r} != {y!r}")
    if n_mismatch > 3:
        errs.append(f"... {n_mismatch} mismatched cells total")
    return errs, max_delta
