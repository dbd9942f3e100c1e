#!/usr/bin/env python
"""No-Spark scaling control (BENCH.md §3): the identical extraction kernel
+ pyarrow file reads, fanned out with bare multiprocessing over the same
materialized pages files the Spark scaling bench reads.

Purpose: attribute per-core retention. If bare processes lose the same
per-core throughput at full fan-out as Spark does, the loss is the host's
memory-bandwidth/turbo knee, not the engine.

Usage: python tools/scaling_control.py [pages_dir] [procs ...]
Defaults: the bench --scaling artifact, procs 8 and 32.
Prints one JSON line.
"""
from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _default_pages() -> str:
    """Newest complete bench --scaling artifact (the path now embeds a
    content fingerprint, so glob rather than hardcode)."""
    cands = [
        p for p in glob.glob("/tmp/pdf2doi_bench_pages_*_x200_*")
        if os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    return max(cands, key=os.path.getmtime) if cands else "/nonexistent"


def _work(path: str) -> int:
    import pyarrow.parquet as pq

    from pdf2doi_spark.operators.extract import _batch_extract

    batch = pq.read_table(path, columns=["url", "html", "text"]).to_pandas()
    out = _batch_extract(batch, replace_arxiv=True, with_text=True)
    return len(out)


def run(files, procs: int) -> dict:
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        counts = pool.map(_work, files, chunksize=1)
    dt = time.perf_counter() - t0
    n = sum(counts)
    return {"procs": procs, "n": n, "sec": round(dt, 2),
            "docs_per_sec": round(n / dt, 1),
            "per_core": round(n / dt / procs, 1)}


def main() -> None:
    args = sys.argv[1:]
    pages = args[0] if args and not args[0].isdigit() else _default_pages()
    procs = [int(a) for a in args if a.isdigit()] or [8, 32]
    files = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    if not files:
        sys.exit(f"no parquet files under {pages} — run `python bench.py --scaling` first")
    # warm the page cache so the first level isn't disadvantaged
    run(files, max(procs))
    levels = {f"procs{p}": run(files, p) for p in procs}
    lo, hi = min(procs), max(procs)
    retention = (
        levels[f"procs{hi}"]["per_core"] / levels[f"procs{lo}"]["per_core"]
    )
    print(json.dumps({
        "metric": "no-Spark multiprocessing control: same kernel, same files",
        "levels": levels,
        "per_core_retention_hi_vs_lo": round(retention, 3),
        "n_files": len(files),
    }))


if __name__ == "__main__":
    main()
