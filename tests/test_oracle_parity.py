"""Pre-validate the driver's correctness gate: every oracle-backed query in
__spark_entry__ must match its DuckDB SQL at sf0.01 — row count, (sorted)
column names, and order-insensitive exact values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())

# DuckDB types whose value serialization diverges from Spark's in the
# driver's hash compare even when the Python values are equal (e.g. an
# uncast SUM(BIGINT) returns HUGEINT/int128).  Every oracle column must
# stay inside the BIGINT/DOUBLE/VARCHAR/BOOL/DATE/TS family — nested
# list/struct element types included (checked as substrings).
_FORBIDDEN_DUCK_TYPES = (
    "HUGEINT", "DECIMAL", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_types_are_hash_safe(duck, name):
    rel = duck.sql(entrymod.oracle_sql()[name])
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        for bad in _FORBIDDEN_DUCK_TYPES:
            assert bad not in t, (
                f"{name}.{col}: DuckDB type {t} will hash-mismatch the "
                f"driver compare — CAST it (e.g. AS BIGINT) in the oracle SQL")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entrymod.oracle_sql()[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count differs"
    assert _sorted_rows(s_cols, s_rows) == _sorted_rows(d_cols, d_rows), \
        f"{name}: values differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "conv_id"


def test_rows_only_queries_run(spark):
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name in oracles:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
