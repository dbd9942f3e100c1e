"""Pages sources, identifier-cache table, and the resumable result sink.

North-rule requirements covered here:

* **Scan**: parquet (Iceberg in production — same DataFrame surface) with
  Catalyst predicate/partition pushdown; ``read_pages`` keeps the scan
  declarative so filters like ``lang = 'en'`` or ``warc_ts`` ranges reach
  the file reader (check ``PushedFilters`` in ``.explain``).
* **Identifier cache** (the reference's metadata write-back memoization,
  finders.py:587-608 / main.py:98-100, re-expressed): a small side table
  ``(url, identifier, identifier_type, method)`` merged after each run and
  broadcast-joined as a pre-pass in the next — reruns resolve as method #1
  without touching the kernel. Source rows are never mutated.
* **Resumability** ("resumable from checkpoint with per-partition lineage
  + metrics"): results are written partitioned by a deterministic shard
  ``pmod(xxhash64(url), n_shards)``; a manifest records per-shard status +
  row counters. A restarted job reads the manifest and processes only
  missing shards — per-partition lineage without any driver state.
"""
from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------- fs layer
# All cache/manifest side-state goes through the Hadoop FileSystem API, not
# driver-local os.path/open: the production shapes are hdfs:///s3a://
# paths, where os.path.exists is silently False — which would disable the
# cache fast path AND make the merge treat a populated remote cache as
# brand-new (overwriting prior rows in every touched shard). Plain local
# paths route through Hadoop's LocalFileSystem, so sandbox behavior is
# unchanged.

def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hp = _fs(spark, path)
    return bool(fs.exists(hp))


def fs_is_dir(spark: SparkSession, path: str) -> bool:
    fs, hp = _fs(spark, path)
    return bool(fs.exists(hp)) and bool(fs.getFileStatus(hp).isDirectory())


def fs_qualify(spark: SparkSession, path: str) -> Optional[str]:
    """Fully-qualified URI for ``path`` if it exists, else None — the same
    resolution Spark's file sources apply (schemeless paths go to
    ``fs.defaultFS``, NOT necessarily the driver's local disk), so a url
    derived from this matches the ``path`` column binaryFile emits."""
    fs, hp = _fs(spark, path)
    if not fs.exists(hp):
        return None
    return fs.makeQualified(hp).toString()


def _fs_child_names(spark: SparkSession, path: str) -> list:
    fs, hp = _fs(spark, path)
    return [s.getPath().getName() for s in fs.listStatus(hp)]


def _fs_read_small(spark: SparkSession, path: str) -> str:
    fs, hp = _fs(spark, path)
    stream = fs.open(hp)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _fs_write_small(spark: SparkSession, path: str, content: str) -> None:
    fs, hp = _fs(spark, path)
    out = fs.create(hp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-on-a-filesystem rename (HDFS/local are atomic; object
    stores degrade to copy+delete — still one visible switch of ``dst``).
    Raises if the filesystem refuses (e.g. missing ``src``)."""
    fs, hsrc = _fs(spark, src)
    _, hdst = _fs(spark, dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename {src!r} -> {dst!r} refused by filesystem")


def _rmtree(path: str, spark: SparkSession = None) -> None:
    if spark is not None:
        fs, hp = _fs(spark, path)
        if fs.exists(hp):
            fs.delete(hp, True)
        return
    import shutil

    shutil.rmtree(path, ignore_errors=True)

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read a pages table (parquet dir or file). Projection stays lazy —
    downstream operators select only what they use, so column pruning
    reaches the scan (html is never read for metadata-only queries)."""
    return spark.read.parquet(path)


def read_raw_files(spark: SparkSession, path: str,
                   glob: str = "*.html") -> DataFrame:
    """Raw-file ingestion (reference S1's directory scan, Spark-native):
    ``binaryFile`` source → pages-shaped DataFrame. ``pathGlobFilter``
    replaces the reference's case-insensitive suffix check at the source
    (pushed into file listing, no data read for non-matching files);
    ``modificationTime`` stands in for the crawl timestamp; ``text`` is
    NULL (populated downstream by the main-content stage)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def shard_column(n_shards: int, url_col: str = "url") -> F.Column:
    """Deterministic shard id: pmod(xxhash64(url), n). xxhash64 is JVM-side
    (whole-stage codegen) and stable across runs/executors."""
    return F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards)).alias("shard")


CACHE_N_SHARDS = 64


def merge_cache(spark: SparkSession, cache_path: str, results: DataFrame,
                n_shards: int = CACHE_N_SHARDS) -> DataFrame:
    """Incremental upsert of found identifiers into the cache table (parquet
    stand-in for Iceberg ``MERGE INTO``): new results win over prior rows
    on url. Only rows NOT resolved from the cache/metadata fast path are
    written, mirroring the reference's gate (main.py:98-100: no write-back
    when found by method #1 or disabled).

    Scale shape: the cache is stored partitioned by a deterministic url
    shard (``pmod(xxhash64(url), n_shards)`` — the parquet analogue of
    Iceberg's ``bucket(N, url)`` transform), and a merge touches ONLY the
    shards the new urls hash into: old rows of touched shards are anti-joined
    against the new urls and rewritten together with the new rows via
    dynamic partition overwrite; untouched shard directories are never read
    or rewritten. At a billions-row cache a merge therefore costs
    O(new + touched-shard rows), not a full shuffle + full rewrite per run
    (the round-1 design).

    ``n_shards`` applies when the cache is CREATED; an existing cache's
    stored shard count (pinned by a ``_pdf2doi_n_shards`` marker) always
    wins. Recomputing shards under a different modulus would anti-join
    against the wrong shard set, leaving a url's stale row alive under its
    old shard id — two rows per url would then fan out every matching page
    in the downstream broadcast join.
    """
    marker = cache_path.rstrip("/") + "/_pdf2doi_n_shards"
    if fs_exists(spark, marker):
        n_shards = int(_fs_read_small(spark, marker).strip())

    new = (
        results.filter(F.col("identifier").isNotNull())
        .filter(F.col("tier").isNull() | (F.col("tier") >= 0))
        .select("url", "identifier", "identifier_type", "method")
        .dropDuplicates(["url"])
        .withColumn("shard", shard_column(n_shards))
    )
    # The merge evaluates the batch up to three times (touched-shard
    # collect, post-anti-join collect, the write). If ``results`` is an
    # unmaterialized extraction plan, each evaluation would re-run the
    # whole kernel — persist so every caller pays ONE extraction pass.
    new = new.persist()
    pinned = [new]

    def _is_sharded(path: str) -> bool:
        return any(
            e.startswith("shard=") for e in _fs_child_names(spark, path)
        )

    if fs_exists(spark, cache_path) and not _is_sharded(cache_path):
        # one-time migration of a flat (round-1 layout) cache
        flat = spark.read.parquet(cache_path).withColumn(
            "shard", shard_column(n_shards)
        )
        flat.write.mode("overwrite").parquet(cache_path + ".mig")
        spark.read.parquet(cache_path + ".mig") \
            .repartition(F.col("shard")) \
            .write.mode("overwrite") \
            .partitionBy("shard").parquet(cache_path)
        _rmtree(cache_path + ".mig", spark)

    try:
        if fs_exists(spark, cache_path):
            # pin the modulus NOW, not only after a successful write: the
            # idempotent-re-merge early returns below skip the write path,
            # and a freshly-migrated (or crash-recovered) cache would
            # otherwise stay unpinned — a later merge under a different
            # n_shards would then anti-join against the wrong shard set.
            _fs_write_small(spark, marker, str(n_shards))
            # touched shards = the (small) distinct-shard set of the new
            # batch; collected on the driver to build a partition-pruning
            # filter for the old-side scan (bounded by n_shards values,
            # never row data).
            touched = sorted(
                r["shard"] for r in new.select("shard").distinct().collect()
            )
            if not touched:
                return spark.read.parquet(cache_path)
            old_touched = spark.read.parquet(cache_path).filter(
                F.col("shard").isin(touched)
            ).select("url", "identifier", "identifier_type", "method",
                     "shard")
            # Rows ALREADY in the cache with identical values are no-ops —
            # dropping them first makes an idempotent re-merge (job restart,
            # recrawl of an unchanged corpus) rewrite ZERO shards instead of
            # re-churning every shard its hits map into. Null-safe equality:
            # identifier_type/method can be NULL, and NULL = NULL is never
            # true under plain equality, so such rows would count as "new"
            # and re-churn their shard on every merge forever.
            old_cmp = old_touched.select(
                *[F.col(c).alias(f"_old_{c}") for c in
                  ("url", "identifier", "identifier_type", "method",
                   "shard")]
            )
            same = [
                new[c].eqNullSafe(old_cmp[f"_old_{c}"])
                for c in ("url", "identifier", "identifier_type", "method",
                          "shard")
            ]
            cond = same[0]
            for c in same[1:]:
                cond = cond & c
            new = new.join(old_cmp, cond, "left_anti").persist()
            pinned.append(new)
            touched = sorted(
                r["shard"] for r in new.select("shard").distinct().collect()
            )
            if not touched:
                return spark.read.parquet(cache_path)
            old_touched = old_touched.filter(F.col("shard").isin(touched))
            survivors = old_touched.join(
                new.select("url"), on="url", how="left_anti"
            )
            merged = survivors.unionByName(new)
        elif new.isEmpty():
            # no prior cache AND nothing to write: materializing an empty
            # partitioned parquet leaves a schema-less directory that the
            # read-back would reject — return the empty batch as-is instead
            return new
        else:
            merged = new

        # Materialize before the overwrite (the merged plan reads the very
        # partitions being replaced); dynamic mode rewrites ONLY the shard
        # directories present in the batch.
        merged.write.mode("overwrite").parquet(cache_path + ".tmp")
        (
            spark.read.parquet(cache_path + ".tmp")
            # co-locate each shard in one task before the partitioned
            # write (Iceberg hash distribution): without this, every
            # tmp-scan task opens a writer per shard it touches —
            # tasks × touched-shards files (measured 2,048 for a 64-shard
            # 8.7M-row merge, BENCH §6) instead of exactly one per shard
            .repartition(F.col("shard"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard")
            .parquet(cache_path)
        )
        # The dynamic-overwrite write above already materialized every
        # merged row into cache_path; the returned frame is a FRESH scan of
        # cache_path with no lineage through the tmp dir, so the tmp source
        # can be dropped immediately. (Round-2 review: the full-cache
        # ``result.count()`` that used to sit here was a pointless O(cache)
        # scan per merge at a billions-row cache —
        # tests/test_operators.py::test_merge_cache_never_counts pins its
        # absence.)
        _rmtree(cache_path + ".tmp", spark)
        # pin the modulus for every later merge
        _fs_write_small(spark, marker, str(n_shards))
        return spark.read.parquet(cache_path)
    finally:
        for df in pinned:
            df.unpersist()


def completed_shards(spark: SparkSession, manifest_path: str) -> set:
    if not fs_exists(spark, manifest_path):
        return set()
    rows = spark.read.parquet(manifest_path).filter(F.col("status") == "done")
    return {r["shard"] for r in rows.select("shard").distinct().collect()}


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    replace_arxiv: bool = True,
    cache: Optional[DataFrame] = None,
    strict_sealed: Optional[bool] = None,
) -> DataFrame:
    """Extraction with per-shard checkpointed lineage.

    Results land in ``{out_dir}/results`` partitioned by shard; the
    manifest at ``{out_dir}/manifest`` records (shard, status, n_docs,
    n_hits). On restart, shards already marked done are filtered out of the
    *input* (a pushed-down pmod filter), so completed work is never
    recomputed — the sandbox stand-in for Iceberg snapshot-based restart.

    ``n_shards`` applies on the FIRST run; a restart always resumes under
    the modulus pinned in ``{out_dir}/_n_shards``. A restart under a
    different modulus would skip-filter a DIFFERENT row set than the one
    the manifest recorded as done (silent loss) while leaving the old
    shard partitions alive next to recomputed ones (duplicates).

    **Write-once contract**: ``out_dir`` belongs to ONE logical input. Once
    every shard is marked done the directory is sealed — a later call
    returns the stored results AS OF the run that sealed it and never
    re-examines the input (checking would cost the full input scan the
    O(1) restart exists to avoid). Point a grown/changed input at a fresh
    ``out_dir``; the sealed short-circuit logs a warning to make a stale
    reuse visible.

    ``strict_sealed``: unattended/scheduled jobs can't read warnings — pass
    ``True`` (or set ``PDF2DOI_SPARK_STRICT_SEALED=1`` in the env) to make
    the sealed short-circuit RAISE instead, so a crawl pointed at an old
    ``--output`` fails loudly rather than silently reprocessing nothing.
    """
    from pdf2doi_spark.operators.extract import RESULT_SCHEMA, extract_identifiers

    results_path = os.path.join(out_dir, "results")
    manifest_path = os.path.join(out_dir, "manifest")
    marker = out_dir.rstrip("/") + "/_n_shards"
    if fs_exists(spark, marker):
        n_shards = int(_fs_read_small(spark, marker).strip())
    else:
        _fs_write_small(spark, marker, str(n_shards))

    def _has_result_data() -> bool:
        return fs_exists(spark, results_path) and any(
            name.startswith("shard=")
            for name in _fs_child_names(spark, results_path)
        )

    def _read_results() -> DataFrame:
        # an all-empty input writes no parquet part files, so a plain
        # read-back would die on schema inference — return a typed empty
        # frame instead ("shard int" to match what parquet partition-column
        # inference yields on the non-empty branch, so the two branches
        # never disagree on the schema)
        if not _has_result_data():
            return spark.createDataFrame([], RESULT_SCHEMA + ", shard int")
        return spark.read.parquet(results_path)

    done = completed_shards(spark, manifest_path)
    if len(done) >= n_shards:
        # every shard already recorded done: a restart must cost O(1), not
        # a full input re-scan for an empty extraction pass. See the
        # write-once contract above — this returns the SEALED results.
        if strict_sealed is None:
            strict_sealed = os.environ.get(
                "PDF2DOI_SPARK_STRICT_SEALED", ""
            ).strip().lower() in ("1", "true", "yes")
        msg = (
            f"run_resumable: {out_dir} is sealed (all {n_shards} shards "
            "done); stored results would be returned without consulting "
            "the input. Use a fresh out_dir if the input has changed."
        )
        if strict_sealed:
            raise RuntimeError(msg + " (strict_sealed is set)")
        import warnings

        warnings.warn(msg, stacklevel=2)
        return _read_results()
    sharded = pages.withColumn("shard", shard_column(n_shards))
    if done:
        sharded = sharded.filter(~F.col("shard").isin(*sorted(done)))

    if sharded.isEmpty():
        # THIS run observed zero pending input rows — never seal on that.
        # The probe is a limit-1 job (first-file footer at 100 TB, so
        # effectively free on the normal path), and it keys the guard on
        # the run's own observation rather than on stored data: a stored-
        # data check would let a crashed-partial first run followed by a
        # retry with a mistyped (empty) input glob slip past the guard and
        # zero-backfill every shard 'done', permanently sealing partial
        # results (round-3 review). The most common cause of an all-empty
        # pending input is that mistyped path/glob, which must stay loudly
        # retryable with the same out_dir once corrected.
        import warnings

        warnings.warn(
            f"run_resumable: pending input is empty; {out_dir} was NOT "
            "sealed (no manifest written) — check the input path/glob and "
            "rerun.",
            stacklevel=2,
        )
        return _read_results()

    pending = extract_identifiers(
        sharded.select("url", "html", "text"), replace_arxiv=replace_arxiv, cache=cache
    ).withColumn("shard", shard_column(n_shards))

    # Hash-distribute RESULTS on the write partition key before the
    # partitioned write (what Iceberg's write.distribution-mode=hash does).
    # Without it every extraction task opens a writer in every shard
    # directory it touches — tasks × shards files: measured 11,010 files
    # for a 43-task × 256-shard 10M-page run, with ~90 s of driver-side
    # commit/listing (BENCH §6), and at the design point (65k shards,
    # thousands of tasks) hundreds of millions of files, which no metastore
    # survives. After the repartition each shard lands wholly in one task,
    # so the layout is exactly n_shards files and commit is O(n_shards).
    # The shuffle moves RESULT rows (post-kernel, ≤ input bytes) and keys
    # on pmod(xxhash64(url)) — uniform by construction, no skew. The
    # kernel itself still runs pre-shuffle at the input's parallelism.
    pending = pending.repartition(F.col("shard"))

    # Dynamic partition overwrite makes the write idempotent PER SHARD: a
    # run that died after writing some shards but before the manifest can
    # be restarted safely — recomputed shards REPLACE their partition
    # directories instead of appending duplicates.
    (
        pending.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(results_path)
    )

    # Manifest derived from the data itself (never ahead of it); counters =
    # the per-partition lineage metrics the north rule asks for. Only the
    # shards processed THIS run are re-counted — the shard filter prunes to
    # their partition directories, so a restart never re-scans the results
    # of shards whose manifest rows already exist (at 100 TB that re-scan
    # would dominate every incremental run).
    written = _read_results().withColumn(
        "status", F.lit("done")
    )
    fresh = written.filter(~F.col("shard").isin(*sorted(done))) if done else written
    manifest = (
        fresh.groupBy("shard", "status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("identifier").alias("n_hits"),
        )
    )
    if done:
        manifest = manifest.unionByName(
            spark.read.parquet(manifest_path).filter(
                F.col("shard").isin(*sorted(done))
            )
        )
    # This run covered every not-yet-done shard, so shards with no rows in
    # the manifest simply had no input urls hashing into them — record them
    # done (n_docs 0) too, or the O(1) restart short-circuit above would
    # never fire for inputs that leave some of the n_shards buckets empty.
    manifest = manifest.unionByName(
        spark.range(n_shards)
        .select(F.col("id").cast("int").alias("shard"))
        .join(manifest.select("shard"), "shard", "left_anti")
        .select(
            "shard",
            F.lit("done").alias("status"),
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_hits"),
        )
    )
    tmp = manifest_path + ".tmp"
    manifest.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(manifest_path)
    _rmtree(tmp, spark)
    return _read_results()


def write_bucketed(df: DataFrame, table: str, n_buckets: int = 256,
                   key: str = "url") -> None:
    """Persist a table bucketed+sorted on the join key (Spark-native
    bucketing; Iceberg analogue: ``bucket(N, url)`` partition transform).

    The 100 TB co-location story: the pages table and the identifier cache
    are both written bucketed by ``url``, so the cache pre-join (and any
    MERGE) plans as a SortMergeJoin with ZERO Exchange — neither side of a
    petabyte join ever shuffles (tests/test_plans.py::
    test_bucketed_cache_join_is_shuffle_free pins the plan).
    """
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def resolve_pages_source(spark: SparkSession, target: str,
                         glob: str = "*.html") -> DataFrame:
    """Single router from a user-facing target to a pages-shaped DataFrame
    (shared by the library entry and the CLI so their behavior can never
    drift):

    * ``table:<identifier>`` → catalog table scan via
      ``spark.read.table`` — THE Iceberg lane: on a cluster with the
      Iceberg runtime jar and a configured catalog
      (``--conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog``
      …), ``--input table:cc.crawl.pages`` reads the Iceberg pages table
      with full partition pruning / snapshot semantics; the identifier
      is explicit (never guessed from a path-looking string), and the
      SAME code path serves plain managed/temp tables, which is how the
      lane is pinned by tests in this jar-less sandbox;
    * a ``.warc`` / ``.warc.gz`` FILE (the normal Common Crawl unit) or a
      directory containing WARC archives → ``read_warc``;
    * a directory of parquet files → pages-table scan;
    * any other directory → raw-file (``binaryFile``) ingestion of ``glob``;
    * anything else → pages-table scan (parquet path).
    """
    if target.startswith("table:"):
        return spark.read.table(target[len("table:"):])
    low = target.rstrip("/").lower()
    if low.endswith(".warc") or low.endswith(".warc.gz"):
        from pdf2doi_spark.sources.warc import read_warc

        return read_warc(spark, target)
    # Directory probe goes through the Hadoop FS API (not os.path): a
    # directory of WARCs or raw HTML on hdfs:///s3a:// would otherwise be
    # invisible to os.path.isdir and fall through to the parquet branch.
    if fs_is_dir(spark, target):
        entries = _fs_child_names(spark, target)
        if any(e.endswith(".parquet") or e == "_SUCCESS" for e in entries):
            return read_pages(spark, target)
        if any(".warc" in e for e in entries):
            from pdf2doi_spark.sources.warc import read_warc

            return read_warc(spark, target)
        return read_raw_files(spark, target, glob=glob)
    return read_pages(spark, target)
