"""Custom stateful streaming operator: cross-micro-batch first-seen dedup.

An incremental crawl re-fetches urls; downstream consumers want each url's
extraction exactly once. This operator keeps a per-group "seen" state with
``applyInPandasWithState`` (the Structured Streaming escape hatch for
stateful logic the built-in aggregations can't express) and emits only
rows whose url was never seen in any earlier micro-batch.

Scale design: state is keyed by a shard of the url hash (bounded group
count, ~uniform), and each group's state stores the set of seen url
*hashes* (8-byte ints, not strings) — at 10^12 urls this is still large,
so production would bound state with a TTL (``GroupStateTimeout``) or an
approximate filter; the exact-set version keeps the test oracle crisp.
"""
from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_STATE_SHARDS = 64

DEDUP_OUTPUT_SCHEMA = "url string, warc_ts timestamp, first_seen boolean"
_STATE_SCHEMA = "seen array<long>"


def _dedup_group(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in batches:
        mask = []
        for h in pdf["url_hash"]:
            h = int(h)
            if h in seen:
                mask.append(False)
            else:
                seen.add(h)
                mask.append(True)
        fresh = pdf.loc[mask, ["url", "warc_ts"]]
        if len(fresh):
            fresh = fresh.assign(first_seen=True)
            out.append(fresh)
    state.update((list(seen),))
    for o in out:
        yield o


def first_seen_urls(pages_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame → stream of urls never emitted before.

    Groups by a bounded url-hash shard; state per group is the seen-hash
    set. Exactly-once emission per url across all micro-batches.
    """
    keyed = pages_stream.select(
        "url",
        "warc_ts",
        F.xxhash64("url").alias("url_hash"),
        F.pmod(F.xxhash64("url"), F.lit(N_STATE_SHARDS)).alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
