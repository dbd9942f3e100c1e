#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

    {"metric": "...", "value": <docs/sec>, "unit": "docs/sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>, ...}

``--scaling`` additionally runs the flagship job at local[8] and local[32]
on the same input and reports both throughputs + efficiency
(eff = t4N / (4 * tN)) — the sandbox stand-in for the north rule's
N→4N-executor requirement (see BENCH.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_cascade",
    "method_metrics",
    "doi_tier0",
    "standardise_doi",
    "exact_dup_groups",
    "minhash_bands",
    "cosine_topk",
    "quality_score",
    "token_count",
]


def _force(df) -> int:
    """Materialize fully without driver collection; returns row count."""
    return df.count()


def _run_once(spark, sf_dir: str):
    from pdf2doi_spark.queries import build_queries

    qs = build_queries()
    timings = {}
    n_docs = 0
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = _force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        if name == "extract_cascade":
            n_docs = n
    return timings, n_docs


def _flagship_throughput(master: str, sf_dir: str) -> tuple:
    """Fresh session at the given parallelism; flagship docs/sec."""
    from pdf2doi_spark.session import build_session

    spark = build_session(master=master, app_name=f"bench-{master}")
    try:
        from pdf2doi_spark.queries import build_queries

        q = build_queries()["extract_cascade"]
        _force(q(spark, sf_dir))  # warm (JIT, code cache, file listing)
        t0 = time.perf_counter()
        n = _force(q(spark, sf_dir))
        dt = time.perf_counter() - t0
        return n / dt, n, dt
    finally:
        spark.stop()


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    if "--scaling" in sys.argv:
        lo_tp, n, lo_dt = _flagship_throughput("local[8]", SF_DIR)
        hi_tp, _, hi_dt = _flagship_throughput("local[32]", SF_DIR)
        eff = hi_tp / (4 * lo_tp)
        print(json.dumps({
            "metric": "flagship extraction scaling local[8] -> local[32]",
            "value": round(eff, 3),
            "unit": "efficiency",
            "queries": {"local8_docs_per_sec": round(lo_tp, 1),
                        "local32_docs_per_sec": round(hi_tp, 1),
                        "local8_sec": round(lo_dt, 2),
                        "local32_sec": round(hi_dt, 2)},
            "n_docs": n,
            "sf": sf,
        }))
        return

    from pdf2doi_spark.session import build_session

    spark = build_session(master=f"local[{CPUS}]", app_name="bench")
    try:
        timings, n_docs = _run_once(spark, SF_DIR)
        total = sum(timings.values())
        docs_per_sec = round(n_docs / timings["extract_cascade"], 1) if timings.get(
            "extract_cascade"
        ) else 0.0
        print(json.dumps({
            "metric": "identifier-extraction throughput (flagship cascade) + headline query latencies",
            "value": docs_per_sec,
            "unit": "docs/sec",
            "queries": timings,
            "total_sec": round(total, 2),
            "n_docs": n_docs,
            "sf": sf,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
