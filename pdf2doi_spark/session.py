"""SparkSession factory with scale-appropriate defaults.

Tuned for the 100 TB design point even though tests run on local[N]:

- AQE on (runtime shuffle-partition coalescing + skew-join splitting —
  Common-Crawl domains are Zipfian, so skew handling must be on by default);
- Arrow execution on, with a bounded records-per-batch: pages rows carry
  multi-hundred-KB ``html`` payloads, so the default 10k-row Arrow batch
  could reach multi-GB row-wise; 2048 rows × ~200 KB ≈ 400 MB worst case,
  and Spark 4's byte-bound ``arrow.maxBytesPerBatch`` (64 MB default) is
  the hard memory guard that slices batches earlier whenever rows are fat
  (measured: row caps 512↔10k differ <5% on 1.5 KB pages — the byte bound
  is what matters);
- 128 MB file-split target so a 100 TB scan yields ~800k well-sized input
  tasks instead of a few giant ones.
"""
from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 2048


_SHIPPED_APPS: set = set()


def ship_package(spark: SparkSession) -> None:
    """Ship the ``pdf2doi_spark`` package to executors.

    Equivalent of ``spark-submit --py-files pipeline.zip`` for sessions
    built programmatically: zips the installed package and registers it via
    ``addPyFile`` so every Python worker can import the pure-Python core
    regardless of the driver's working directory.

    Memoized per applicationId (multiple build_session/registry calls must
    not re-walk and re-zip). The zip gets a PROCESS-UNIQUE name: a fixed
    /tmp path would let a concurrent process truncate the file while this
    session's executors are still fetching it, and fails outright for the
    second user on a shared box.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(
        prefix="pdf2doi_spark_pyfiles_", suffix=".zip"
    )
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "pdf2doi_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    # Executors (re-)fetch and content-check the zip from this local path
    # lazily at task-dependency update, so it must outlive the session —
    # an eager unlink here makes the very first task fail (and a recycled
    # tempfile name then poisons later sessions with a content mismatch).
    # atexit cleanup keeps long-lived hosts from accumulating one orphan
    # zip per session in /tmp without racing the executors.
    import atexit

    atexit.register(_unlink_quiet, zip_path)
    _SHIPPED_APPS.add(app_id)


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def build_session(master: str | None = None, app_name: str = "pdf2doi_spark",
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = SparkSession.builder
    if master:
        builder = builder.master(master)
    else:
        # Respect the cluster manager chosen at submit time: under
        # spark-submit, ``--master`` lands in the launched JVM's system
        # properties and an unconditional ``builder.master(...)`` here
        # would silently override it (measured: a ``spark-submit --master
        # local[8]`` soak run actually executed with 32 task slots). The
        # property must be read from the gateway JVM directly — a fresh
        # Python-side SparkConf(loadDefaults=True) does NOT see it before
        # a context exists (verified empirically on Spark 4.1). Fall back
        # to local[*] only when no master is configured anywhere
        # (programmatic sessions, pytest).
        preset = None
        try:
            from pyspark import SparkContext

            SparkContext._ensure_initialized()
            preset = SparkContext._jvm.System.getProperty("spark.master")
        except Exception:
            preset = None
        if not preset:
            builder = builder.master("local[*]")
    builder = (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin the session zone: timestamp<->epoch conversions must not
        # depend on the host JVM's default zone (DST transitions would
        # silently shift gaps/windows relative to tz-free engines).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # zstd ≈ snappy decode speed at ~30-40% smaller parquet — at 100 TB
        # of results + text columns that is tens of TB of storage and scan
        # bandwidth saved for a negligible write-side CPU cost.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Iterative operators (connected components) write one durable
        # checkpoint per round when a checkpoint dir is configured; without
        # GC-driven cleanup a long pipeline leaks every round's files until
        # the job ends. Safe when off (no checkpoint dir -> no-op).
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
