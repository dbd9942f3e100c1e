#!/usr/bin/env python
"""Strict local mimic of the driver's correctness gate.

Stricter than tests/test_driver_contract.py on purpose: values are compared
by exact repr (no float rounding), which is the only way to guarantee the
driver's value-hash matches. Lists crash the driver's canonicalizer, so any
array-typed output column is reported as an ERROR here too.

Usage: python tools/drivercheck.py [query ...]   (default: all with oracles)
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                raise TypeError("unhashable type: 'list' (driver canonicalizer crash)")
            if isinstance(v, float):
                row.append("NULL" if math.isnan(v) else repr(v))
            elif v is None or v is pd.NaT:
                row.append("NULL")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(repr(v.item() if type(v).__module__ == "numpy" else v))
        rows.append(tuple(row))
    return sorted(rows), list(df.columns)


def main() -> None:
    import __spark_entry__ as entrymod
    from pdf2doi_spark.session import build_session

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or sorted(queries)

    spark = build_session(master="local[8]", app_name="drivercheck",
                          shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_bad = 0
    for name in names:
        try:
            got = queries[name](spark, SF).toPandas()
            if name not in oracles:
                print(f"{name}: NO_ORACLE rows={len(got)}")
                continue
            want = con.execute(oracles[name]).df()
            g, gc = canon(got)
            w, wc = canon(want)
            if gc != wc:
                print(f"{name}: SCHEMA cols {gc} vs {wc}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"{name}: ROWS {len(g)} vs {len(w)}")
                n_bad += 1
                continue
            diffs = [(a, b) for a, b in zip(g, w) if a != b]
            if diffs:
                print(f"{name}: HASH {len(diffs)}/{len(g)} differing rows; cols={gc}")
                for a, b in diffs[:3]:
                    print(f"  spark: {a}\n  duck : {b}")
                n_bad += 1
            else:
                print(f"{name}: OK rows={len(g)}")
        except Exception as e:
            print(f"{name}: ERR {type(e).__name__}: {e}")
            n_bad += 1
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
