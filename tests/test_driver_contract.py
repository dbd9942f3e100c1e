"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB — row count, column
names, and order-insensitive value equality."""
import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF01 = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF01}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm_cell(x) for x in v)
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return round(v, 5)
        if hasattr(v, "isoformat"):  # Timestamp: drop ns/us dtype divergence
            return v.isoformat()
        if type(v).__module__ == "numpy":  # int32 vs int64 etc.
            return v.item()
        return v

    for c in df.columns:
        df[c] = df[c].map(norm_cell).astype(object)
    return df.sort_values(list(df.columns), key=lambda s: s.map(str)).reset_index(drop=True)


# The full builder set (driver registry + pytest-only consolidated
# queries): every oracle comparison ever registered keeps running here,
# whether or not the name still occupies one of the driver gate's 50 rows.
from pdf2doi_spark.queries import build_all_oracles, build_all_queries

QUERIES = build_all_queries()
ORACLES = build_all_oracles()


def test_driver_registry_fits_gate_cap():
    """The driver's correctness gate records at most 50 rows; round 2
    registered 62 queries and silently left 12 unchecked. Pin the
    consolidated registry: <=50 entries, every entry a known builder, and
    every driver oracle is the same SQL the full set carries."""
    drv_q = entrymod.queries()
    drv_o = entrymod.oracle_sql()
    assert len(drv_q) <= 50
    assert set(drv_q) <= set(QUERIES)
    assert set(drv_o) <= set(drv_q)
    for name, sql in drv_o.items():
        assert ORACLES[name] == sql


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "url", "identifier", "identifier_type", "method", "tier",
        "validation_info", "extracted_text"
    }


def test_every_query_has_callable():
    assert len(QUERIES) >= 20
    for name in ORACLES:
        assert name in QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_vs_oracle(spark, ducks, name):
    got = QUERIES[name](spark, SF01).toPandas()
    if name not in ORACLES:
        assert len(got) >= 0  # rows-only check, mirroring the driver
        return
    want = ducks.execute(ORACLES[name]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: cols {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff_mask = (g != w) & ~(g.isna() & w.isna())
        bad = diff_mask.any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{g[bad].head(5)}\nduck:\n{w[bad].head(5)}"
        )
