"""Mimic the driver's t2 correctness gate locally: run every declared query
on Spark and its DuckDB oracle on the same parquet tables, compare row
count, column names, and an order-insensitive value multiset."""

from __future__ import annotations

import math

import duckdb
import pytest

from pincspark.plans.queries import QUERIES
from tests.conftest import SF_DIR

ORACLED = [(n, fn, sql) for n, (fn, sql) in QUERIES.items() if sql is not None]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision (round-trip exact), matching the driver's hash
        # strength: %.9g masked q59's last-ulp divergence class in r6, so a
        # query could pass locally and fail the driver gate. Any float that
        # cannot survive %.17g comparison must not be in a hashed projection.
        return f"{v:.17g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def test_approx_distinct_within_rsd(spark):
    """q26's HLL estimate must satisfy its own 3-sigma rsd bound (the bound
    is the oracle-hashed output; this pins it truly exercises the sketch)."""
    from pincspark.plans.queries import QUERIES

    approx = QUERIES["q26_approx_distinct"][0](spark, SF_DIR)
    rows = approx.collect()
    assert rows and all(r["approx_within_rsd"] for r in rows)


def _spark_type_class(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("string", "varchar"):
        return "str"
    if dt == "boolean":
        return "bool"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith("array"):
        return "list"
    if dt == "binary":
        return "bin"
    return dt


def _arrow_type_class(t) -> str:
    import pyarrow.types as pat

    if pat.is_integer(t):
        return "int"
    if pat.is_floating(t):
        return "float"
    if pat.is_decimal(t):
        return "decimal"
    if pat.is_string(t) or pat.is_large_string(t):
        return "str"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_date(t):
        return "date"
    if pat.is_timestamp(t):
        return "ts"
    if pat.is_list(t) or pat.is_large_list(t):
        return "list"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "bin"
    return str(t)


@pytest.mark.parametrize("name,fn,sql", ORACLED, ids=[n for n, _, _ in ORACLED])
def test_oracle_type_parity(spark, name, fn, sql):
    """The driver hashes values through a dtype-sensitive path (arrow/
    pandas), where DuckDB's HUGEINT (any un-cast SUM of integers) becomes
    decimal128/float64 and hash-diverges from Spark's bigint even when the
    numbers are equal — the exact class that kept q59 red through r6 AND r7
    while fetchall()-based local parity (Python ints both sides) stayed
    green. Pin: every oracle output column's arrow type class must equal the
    Spark column's type class."""
    sdf = fn(spark, SF_DIR)
    s_class = {f.name: _spark_type_class(f.dataType.simpleString()) for f in sdf.schema.fields}

    con = _duck(SF_DIR)
    tbl = con.execute(sql).arrow()
    d_class = {f.name: _arrow_type_class(f.type) for f in tbl.schema}

    assert set(s_class) == set(d_class), f"{name}: column names differ"
    diffs = {c: (s_class[c], d_class[c]) for c in s_class if s_class[c] != d_class[c]}
    assert not diffs, (
        f"{name}: oracle/Spark type-class mismatch (spark, duckdb-arrow): {diffs} — "
        "cast the oracle output column (HUGEINT SUMs need CAST(... AS BIGINT))"
    )


@pytest.mark.parametrize("name,fn,sql", ORACLED, ids=[n for n, _, _ in ORACLED])
def test_query_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sset = _rowset(s_cols, s_rows)
    dset = _rowset(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
