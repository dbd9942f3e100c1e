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
