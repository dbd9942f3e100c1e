#!/usr/bin/env python
"""Incremental corpus ingestion against a persisted near-dup index.

The production cadence for training-corpus construction: crawl dumps
arrive one at a time, and each must be near-dup-checked against EVERY
dump already ingested — without re-signaturing the whole corpus per dump
(operators/dedup_index.py). This example replays that cadence over the
synthetic documents table:

  start    → build_minhash_index over ZERO docs (a valid empty index —
             so every dump, including the first, runs the same path and
             gets its intra-dump dups flagged)
  dump 0.. → incremental_near_dups (probe: collisions vs the index AND
             within the dump), write the dump's survivors, then
             merge_minhash_index(exclude=dups) so the NEXT dump sees them
  finally  → compact_minhash_index (one file per partition again)

Per-dump cost is O(dump + collisions): the signature pass runs over the
new dump only; the postings/sigs scans are partition-pruned to the
buckets the dump actually hashes into. Nothing about the accumulated
corpus is recomputed — the index IS the corpus state.

Usage (plain python, or spark-submit --py-files pdf2doi_spark.zip):

    python examples/incremental_ingest.py \
        --sf-dir /root/testdata/sf0.001 --index-dir /tmp/incr_index \
        [--dumps 3] [--threshold 0.5]

Prints one JSON lineage line per dump and a final index summary.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--index-dir", default="/tmp/incr_index")
    ap.add_argument("--dumps", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pdf2doi_spark.operators.dedup_index import (
        build_minhash_index,
        compact_minhash_index,
        incremental_near_dups,
        merge_minhash_index,
    )
    from pdf2doi_spark.session import build_session

    spark = build_session(master=args.master, app_name="incremental-ingest")
    try:
        shutil.rmtree(args.index_dir, ignore_errors=True)
        docs = (
            spark.read.parquet(f"{args.sf_dir}/documents.parquet")
            .select("doc_id", "text")
        )

        def dump(i: int):
            return docs.filter(F.col("doc_id") % args.dumps == i)

        build_minhash_index(spark, docs.limit(0), args.index_dir)
        print(json.dumps({"action": "build_empty_index"}))

        for i in range(0, args.dumps):
            batch = dump(i)
            # return_sigs: the probe's checkpointed signature frame feeds
            # the merge, so the dominant cost (shingle+minhash) runs ONCE
            # per dump — the canonical ingest-loop shape
            dups, batch_sigs = incremental_near_dups(
                spark, args.index_dir, batch, threshold=args.threshold,
                return_sigs=True,
            )
            dups = dups.persist()
            by_source = {
                r["source"]: r["n"]
                for r in dups.groupBy("source").agg(
                    F.count(F.lit(1)).alias("n")).collect()
            }
            # survivors of THIS dump join the corpus; the next dump's
            # probe sees them without any recompute of dumps 0..i
            merge_minhash_index(
                spark, args.index_dir, batch,
                exclude=dups.select("doc_id"), sigs=batch_sigs,
            )
            n_batch = batch.count()
            n_dups = sum(by_source.values())
            print(json.dumps({
                "dump": i, "docs": n_batch,
                "dups_vs_index": by_source.get("index", 0),
                "dups_within_dump": by_source.get("batch", 0),
                "survivors_merged": n_batch - n_dups,
            }))
            dups.unpersist()

        compact_minhash_index(spark, args.index_dir)
        sigs = spark.read.parquet(args.index_dir + "/sigs")
        import glob

        print(json.dumps({
            "index_docs": sigs.count(),
            "sig_files": len(glob.glob(
                f"{args.index_dir}/sigs/sp=*/*.parquet")),
            "posting_files": len(glob.glob(
                f"{args.index_dir}/postings/pq=*/*.parquet")),
            "action": "compacted",
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
