"""applyInPandasWithState: exactly-once url emission across micro-batches,
including state recovery from checkpoint across query restarts."""
import os

import pandas as pd


def _run_once(spark, schema, landing, out, ckpt):
    from pdf2doi_spark.streaming.stateful import first_seen_urls

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{landing}/*")
    q = (
        first_seen_urls(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_first_seen_urls_across_batches(spark, sf_dir, tmp_path):
    from pdf2doi_spark.pages import pages_from_documents

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    pages = pages_from_documents(spark, sf_dir).limit(40).cache()
    pdf = pages.toPandas()

    # run 1: rows 0-29
    spark.createDataFrame(pdf.iloc[:30], schema=pages.schema).write.parquet(
        f"{landing}/b1"
    )
    _run_once(spark, pages.schema, landing, out, ckpt)
    got1 = spark.read.parquet(out).toPandas()
    assert len(got1) == 30
    assert got1["url"].is_unique

    # run 2 (restart from checkpoint): rows 20-39 — 10 urls overlap
    spark.createDataFrame(pdf.iloc[20:40], schema=pages.schema).write.parquet(
        f"{landing}/b2"
    )
    _run_once(spark, pages.schema, landing, out, ckpt)
    got2 = spark.read.parquet(out).toPandas()
    # only the 10 genuinely-new urls were appended; no re-emission
    assert len(got2) == 40
    assert got2["url"].is_unique
    assert (got2["first_seen"] == True).all()  # noqa: E712
    pages.unpersist()


class _FakeState:
    """Minimal GroupState stand-in: deterministic clock, same surface the
    TTL group function touches (exists/get/update/remove/hasTimedOut/
    getCurrentProcessingTimeMs/setTimeoutDuration)."""

    def __init__(self, now_ms):
        self.now_ms = now_ms
        self._tuple = None
        self.hasTimedOut = False
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._tuple is not None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t

    def remove(self):
        self._tuple, self.removed = None, True

    def getCurrentProcessingTimeMs(self):
        return self.now_ms

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_ttl_dedup_group_evicts_and_reemits():
    """VERDICT r3 #4 (unit half): per-entry TTL eviction — within the
    window a re-sighted url is suppressed and refreshed; past the window
    it is evicted and re-emitted; a timed-out shard drops all state."""
    from pdf2doi_spark.streaming.stateful import _make_ttl_dedup_group

    fn = _make_ttl_dedup_group(ttl_ms=1000)
    batch = pd.DataFrame(
        {"url": ["u1"], "warc_ts": [pd.Timestamp("2024-01-01")],
         "url_hash": [42]}
    )

    st = _FakeState(now_ms=10_000)
    out = pd.concat(list(fn((0,), iter([batch]), st)))
    assert list(out["url"]) == ["u1"] and st.timeout_set == 1000

    # re-seen 400 ms later: inside TTL -> suppressed, timestamp refreshed
    st.now_ms = 10_400
    assert list(fn((0,), iter([batch]), st)) == []
    assert st.get == ([42], [10_400])  # refreshed, not the original 10_000

    # 900 ms after the REFRESH (1300 after first sight): still inside the
    # sliding window -> suppressed
    st.now_ms = 11_300
    assert list(fn((0,), iter([batch]), st)) == []

    # 1001 ms idle: evicted -> re-emitted as first_seen (the documented
    # exactly-once-per-TTL-window contract)
    st.now_ms = 12_301
    out = pd.concat(list(fn((0,), iter([batch]), st)))
    assert list(out["first_seen"]) == [True]

    # shard timeout callback: all state removed, nothing emitted
    st.hasTimedOut = True
    assert list(fn((0,), iter([]), st)) == []
    assert st.removed and not st.exists


def test_first_seen_urls_ttl_mode_streaming(spark, sf_dir, tmp_path):
    """VERDICT r3 #4 (integration half): the TTL variant runs through a
    real checkpointed stream — with a TTL far wider than the run, output
    is identical to exact mode (no eviction), proving the two-array state
    round-trips through the state store. Runs with
    noDataMicroBatches.enabled=false, the stateful.py-documented knob for
    bounded TTL runs: ProcessingTimeTimeout keeps shouldRunAnotherBatch
    true forever, so with the default conf BOTH availableNow and
    processAllAvailable never terminate (measured — the docstring caveat
    this test exists to pin)."""
    from pdf2doi_spark.pages import pages_from_documents
    from pdf2doi_spark.streaming.stateful import first_seen_urls

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prior = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")

    pages = pages_from_documents(spark, sf_dir).limit(30).cache()
    pdf = pages.toPandas()
    spark.createDataFrame(pdf.iloc[:20], schema=pages.schema).write.parquet(
        f"{landing}/b1"
    )

    def run():
        stream = spark.readStream.schema(pages.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{landing}/*")
        q = (
            first_seen_urls(stream, ttl_seconds=3600)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination()

    try:
        run()
        assert spark.read.parquet(out).count() == 20

        # restart with 10 overlapping + 10 new urls: overlaps stay
        # suppressed across the checkpoint
        spark.createDataFrame(
            pdf.iloc[10:30], schema=pages.schema
        ).write.parquet(f"{landing}/b2")
        run()
        got = spark.read.parquet(out).toPandas()
        assert len(got) == 30 and got["url"].is_unique
    finally:
        spark.conf.set(conf_key, prior)
        pages.unpersist()


def test_first_seen_urls_rejects_bad_ttl(spark, sf_dir):
    import pytest

    from pdf2doi_spark.pages import pages_from_documents
    from pdf2doi_spark.streaming.stateful import first_seen_urls

    pages = pages_from_documents(spark, sf_dir).limit(1)
    with pytest.raises(ValueError, match="ttl_seconds"):
        first_seen_urls(pages, ttl_seconds=0)
