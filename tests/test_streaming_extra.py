"""Stateful streaming path: watermarked event-time hit-rate aggregation,
and hypothesis-driven robustness of the byte-stream tokenizer."""
import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pdf2doi_spark.core.webmeta import extract_main_content, extract_meta


def test_windowed_hit_rate_stream(spark, sf_dir, tmp_path):
    from pdf2doi_spark.pages import pages_from_documents
    from pdf2doi_spark.streaming.incremental import windowed_hit_rate

    landing = str(tmp_path / "landing")
    pages = pages_from_documents(spark, sf_dir).limit(64).cache()
    pages.write.parquet(landing)

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        ).parquet(landing)
    )
    q = (
        windowed_hit_rate(stream)
        .writeStream.format("memory")
        .queryName("hitrate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from hitrate").toPandas()
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes everything except possibly the last window
    assert got["n_docs"].sum() >= 0
    assert set(got.columns) == {"window_start", "n_docs", "n_hits"}
    if len(got):
        assert (got["n_hits"] <= got["n_docs"]).all()
    pages.unpersist()


# Deterministic property tests: tokenizer total-function guarantees on
# arbitrary byte/str input (a Spark task must never die on a mangled page).
@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=4096))
def test_main_content_total_on_bytes(b):
    out = extract_main_content(b)
    assert isinstance(out, str)
    assert extract_main_content(b) == out  # deterministic


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(max_size=4096))
def test_meta_total_on_text(s):
    pairs = extract_meta(s)
    assert isinstance(pairs, list)
    keys = [k for k, _ in pairs]
    assert len(keys) == len(set(keys))  # first-occurrence dedupe holds
