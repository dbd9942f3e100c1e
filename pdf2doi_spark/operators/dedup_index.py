"""Persisted incremental near-dup index (MinHash band postings + signatures).

The production shape of corpus dedup is INCREMENTAL: a new crawl dump
(10^8-10^9 docs) must be near-dup-checked against every dump already
ingested (10^11-10^12 docs) without re-signaturing the whole corpus per
batch. A one-shot self-join (``dedup.minhash_near_duplicates``) is the
wrong tool for that — it is O(corpus) per batch. This module persists the
per-doc MinHash state once and makes each batch O(batch + collisions):

* ``sigs/``      — one row per indexed doc: (doc_id, mh0..mh{k-1}),
  partitioned by ``sp = pmod(xxhash64(doc_id), n_parts)``.
* ``postings/``  — (doc_id, band_idx, band_hash), partitioned by
  ``pq = pmod(xxhash64(band_idx, band_hash), n_parts)``.
* ``_params``    — JSON (num_hashes, bands, hash_fn, n_parts), written via
  the Hadoop FS API. Probe and merge take NO scheme arguments — they
  always replay the stored params, so the index can never be probed with
  a mismatched scheme (the silently-empty-collisions desync trap the IVF
  codebook guard exists for, similarity.py).

Scale shape of a batch probe (``incremental_near_dups``):

1. band the new batch (O(batch) signature work — the only heavy compute);
2. collect the batch's DISTINCT ``pq`` values (bounded by n_parts, a
   driver-side list like the IVF probe cells) and scan only those
   postings partitions — a small batch touches few partitions, a full
   dump touches all of them, and either way the scan is partition-pruned
   to exactly the buckets the batch can collide with;
3. shuffle-join batch bands against the pruned postings on
   (band_idx, band_hash) — collisions only, never all pairs; ``max_bucket``
   caps degenerate boilerplate buckets exactly as in the one-shot path;
4. fetch the colliding OLD docs' signatures from ``sigs/`` (partition-
   pruned the same way via their ``sp``) and keep pairs whose signature
   agreement ≥ threshold. Agreement = fraction of equal minhash
   components — the standard unbiased Jaccard estimator, the only
   similarity computable without storing every historical text.

``merge_minhash_index`` appends the batch's survivors idempotently
(anti-join on doc_id against the touched ``sp`` partitions first, the
merge_cache pattern) and hash-distributes on the partition key before the
partitioned write, so each merge adds at most ONE file per touched
partition (see sources/io.py on the tasks×shards explosion).

Reference: the reference tool has no incremental mode (pdf2doi processes
files one-shot, reference main.py:222-260); this family is part of the
training-data-pipeline mandate, not reference parity.
"""
from __future__ import annotations

import json
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf2doi_spark.operators.dedup import (
    _truncate_lineage,
    cap_buckets,
    has_min_words,
    minhash_signature,
    word_shingles,
)
from pdf2doi_spark.sources.io import (
    _fs_read_small,
    _fs_write_small,
    fs_exists,
)

_PARAMS_FILE = "_params"


def _params_path(index_path: str) -> str:
    return index_path.rstrip("/") + "/" + _PARAMS_FILE


def load_index_params(spark: SparkSession, index_path: str) -> dict:
    if not fs_exists(spark, _params_path(index_path)):
        raise ValueError(
            f"no minhash index at {index_path!r} (missing {_PARAMS_FILE})"
        )
    return json.loads(_fs_read_small(spark, _params_path(index_path)))


def _sig_df(docs: DataFrame, text_col: str, num_hashes: int,
            hash_fn: str) -> DataFrame:
    # NULL doc_ids are dropped outright: every downstream consumer keys on
    # doc_id (anti-joins, semi-joins, best-match windows), and a NULL key
    # matches nothing — a null-id row would re-append to the index on
    # EVERY merge (the idempotency anti-join can never see it) and never
    # be findable by any probe.
    sh = docs.filter(
        F.col("doc_id").isNotNull() & has_min_words(F.col(text_col))
    ).select(
        F.col("doc_id"), word_shingles(F.col(text_col)).alias("sh")
    )
    return sh.select(
        "doc_id", *minhash_signature(F.col("sh"), num_hashes, hash_fn)
    )


def _bands_from_sigs(sigs: DataFrame, num_hashes: int, bands: int,
                     hash_fn: str) -> DataFrame:
    """(doc_id, band_idx, band_hash) derived from an existing signature
    table — same band construction as dedup.minhash_bands, but without
    re-shingling and re-hashing the text (the signature pass is the heavy
    compute; build/merge would otherwise pay it twice)."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}")
                 for r in range(rows_per_band)]
        band_hash = (
            F.md5(F.concat_ws("|", *parts)) if hash_fn == "md5"
            else F.xxhash64(*parts)
        )
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), band_hash.alias("band_hash"))
        )
    return (
        sigs.select(F.col("doc_id"),
                    F.explode(F.array(*band_cols)).alias("band"))
        .select("doc_id", F.col("band.band_idx").alias("band_idx"),
                F.col("band.band_hash").alias("band_hash"))
    )


def _sp(n_parts: int):
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_parts)).cast("int")


def _pq(n_parts: int):
    return F.pmod(
        F.xxhash64(F.col("band_idx"), F.col("band_hash")), F.lit(n_parts)
    ).cast("int")


def _read_index_table(spark: SparkSession, root: str, table: str,
                      params: dict) -> DataFrame:
    """Read ``sigs``/``postings`` with the schema captured at build time
    (stored in ``_params``). An explicit schema makes a ZERO-ROW table
    readable: a partitionBy write of an empty frame leaves only _SUCCESS,
    and schema inference over that raises UNABLE_TO_INFER_SCHEMA — so an
    index bootstrapped from a batch with no signaturable docs (all short /
    NULL ids) would otherwise wedge every later probe and merge. Pre-schema
    indexes (no stored schema) fall back to inference."""
    schema_json = params.get(f"{table}_schema")
    reader = spark.read
    if schema_json is not None:
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
    return reader.parquet(f"{root}/{table}")


def build_minhash_index(spark: SparkSession, docs: DataFrame,
                        index_path: str, *, text_col: str = "text",
                        num_hashes: int = 12, bands: int = 4,
                        hash_fn: str = "md5", n_parts: int = 64) -> None:
    """Create the persisted index from an initial corpus (typically the
    survivors of a one-shot near-dup pass). Overwrites ``index_path``."""
    if bands <= 0 or num_hashes % bands != 0:
        # same contract as dedup.minhash_bands: a remainder would silently
        # drop trailing minhash components from every band for the LIFE of
        # the persisted index (probe/merge replay the stored params, so
        # nothing downstream could ever notice)
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into "
            f"bands ({bands})"
        )
    sigs = _sig_df(docs, text_col, num_hashes, hash_fn) \
        .dropDuplicates(["doc_id"]) \
        .withColumn("sp", _sp(n_parts))
    (sigs.repartition(F.col("sp"))
         .write.mode("overwrite").partitionBy("sp")
         .parquet(index_path.rstrip("/") + "/sigs"))
    params = {"num_hashes": num_hashes, "bands": bands,
              "hash_fn": hash_fn, "n_parts": n_parts,
              # the build-time schemas make zero-row tables readable later
              # (_read_index_table) — an empty corpus is a VALID index
              "sigs_schema": sigs.schema.json()}
    # bands from the JUST-WRITTEN sigs: one signature pass total, and the
    # postings are derived from exactly the rows the sigs table stores
    stored = _read_index_table(
        spark, index_path.rstrip("/"), "sigs", params
    )
    posts = _bands_from_sigs(stored, num_hashes, bands, hash_fn) \
        .withColumn("pq", _pq(n_parts))
    params["postings_schema"] = posts.schema.json()
    (posts.repartition(F.col("pq"))
          .write.mode("overwrite").partitionBy("pq")
          .parquet(index_path.rstrip("/") + "/postings"))
    # params last: their presence marks the index complete (load refuses
    # a half-written index)
    _fs_write_small(spark, _params_path(index_path), json.dumps(params))


def bootstrap_index_if_absent(spark: SparkSession, index_path: str,
                              like: DataFrame, **build_kwargs) -> bool:
    """Create an EMPTY index at ``index_path`` iff nothing exists there;
    returns True when it bootstrapped. The one check every ingest entry
    point (job.py --dedup-index, the streaming sink) must share: testing
    ``_params`` alone is NOT enough, because a crashed compaction leaves
    a populated index dir with ``_params`` deliberately removed (the
    loud-refusal marker) — an entry point that mistook that for "first
    use" would overwrite every prior dump's survivors with an empty
    index. A non-empty dir without ``_params`` is therefore REFUSED:
    recover from the ``.cmp`` copies (see ``compact_minhash_index``) or
    point at a fresh path.
    """
    from pdf2doi_spark.sources.io import _fs_child_names

    if fs_exists(spark, _params_path(index_path)):
        return False
    root = index_path.rstrip("/")
    if fs_exists(spark, root):
        children = _fs_child_names(spark, root)
        if children:
            raise ValueError(
                f"index dir {index_path!r} exists WITHOUT {_PARAMS_FILE} "
                f"(contents: {sorted(children)[:5]}…) — that is a "
                "crashed compaction's loud-refusal state, not a fresh "
                "path; refusing to overwrite it with an empty index. "
                "Recover from the .cmp copies or use a new path."
            )
    build_minhash_index(spark, like.limit(0), index_path, **build_kwargs)
    return True


def _pruned(table: DataFrame, part_col: str, values: List[int]) -> DataFrame:
    # isin over a bounded driver-side list (≤ n_parts ints) → partition
    # pruning at the parquet scan, the stored-IVF probe pattern
    return table.filter(F.col(part_col).isin(values))


def _agreement(num_hashes: int, left: str = "mh", right: str = "omh"):
    terms = [
        (F.col(f"{left}{i}") == F.col(f"{right}{i}")).cast("int")
        for i in range(num_hashes)
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return expr / F.lit(num_hashes)


def incremental_near_dups(spark: SparkSession, index_path: str,
                          new_docs: DataFrame, *, text_col: str = "text",
                          threshold: float = 0.5,
                          max_bucket: Optional[int] = None,
                          include_intra_batch: bool = True,
                          return_sigs: bool = False):
    """Near-dups of ``new_docs`` against the index (and, by default, among
    the batch itself): (doc_id, dup_of, est_jaccard, source).

    ``return_sigs=True`` additionally returns the batch's checkpointed
    signature frame as ``(pairs, sigs)`` — hand it to
    ``merge_minhash_index(sigs=...)`` so the probe→merge ingest loop runs
    the (dominant-cost) signature pass ONCE per dump instead of twice.

    ``est_jaccard`` is the signature-agreement estimate; ``source`` is
    ``'index'`` or ``'batch'``. Each new doc reports at most one row —
    its best match (max est_jaccard, then min dup_of), index matches
    preferred over intra-batch matches at equal similarity. Docs shorter
    than the shingle minimum never signature, so they never report.
    Resolution is one-level (a doc is not re-pointed to its dup's dup):
    callers wanting full clusters feed the pairs to
    ``dedup.connected_components``.
    """
    p = load_index_params(spark, index_path)
    num_hashes, bands_n = p["num_hashes"], p["bands"]
    hash_fn, n_parts = p["hash_fn"], p["n_parts"]
    root = index_path.rstrip("/")
    # the probe REPLAYS the stored params — log them so a red oracle row
    # or a recall regression is diagnosable from the run output (the
    # index's equivalent of queries._log_lsh_params, VERDICT r4 #8)
    import logging

    logging.getLogger("pdf2doi_spark").info(
        "incremental_near_dups: index=%s hash_fn=%s num_hashes=%d "
        "bands=%d rows_per_band=%d n_parts=%d threshold=%s",
        index_path, hash_fn, num_hashes, bands_n,
        num_hashes // bands_n, n_parts, threshold,
    )

    # ONE signature pass for the batch, cut EAGERLY: new_sigs feeds the
    # probe plan through up to six branches (both collision arms twice,
    # both agreement joins), and a persist() would stop protecting the
    # moment this function returns (the caller's actions would re-run the
    # signature pass per branch — measured 19.6 s vs 2.9 s for a 1.7k-doc
    # probe at sf0.1). The checkpoint pins the signature pass to exactly
    # one execution for the life of the returned DataFrame.
    new_sigs = _truncate_lineage(
        _sig_df(new_docs, text_col, num_hashes, hash_fn)
    )
    new_bands = _bands_from_sigs(new_sigs, num_hashes, bands_n, hash_fn) \
        .withColumn("pq", _pq(n_parts))
    if max_bucket is not None:
        new_bands = cap_buckets(new_bands, ["band_idx", "band_hash"],
                                max_bucket)
    touched = [r.pq for r in new_bands.select("pq").distinct().collect()]

    posts = _pruned(
        _read_index_table(spark, root, "postings", p), "pq", touched
    )
    if max_bucket is not None:
        posts = cap_buckets(posts, ["band_idx", "band_hash"], max_bucket)
    coll = (
        new_bands.alias("n")
        .join(posts.alias("o"),
              (F.col("n.band_idx") == F.col("o.band_idx"))
              & (F.col("n.band_hash") == F.col("o.band_hash"))
              # a re-submitted batch must not match itself in the index
              & (F.col("n.doc_id") != F.col("o.doc_id")))
        .select(F.col("n.doc_id").alias("doc_id"),
                F.col("o.doc_id").alias("dup_of"))
        .distinct()
    )

    old_ids = coll.select(F.col("dup_of").alias("doc_id")).distinct() \
        .withColumn("sp", _sp(n_parts))
    sp_touched = [r.sp for r in old_ids.select("sp").distinct().collect()]
    # rename the historical side up front: unqualified column refs
    # after a chain of joins on like-named columns are ambiguous
    old_sigs = (
        _pruned(_read_index_table(spark, root, "sigs", p), "sp", sp_touched)
        .join(old_ids.select("doc_id"), "doc_id", "left_semi")
        .select(F.col("doc_id").alias("_oid"),
                *[F.col(f"mh{i}").alias(f"omh{i}")
                  for i in range(num_hashes)])
    )

    idx_pairs = (
        coll.join(new_sigs, "doc_id")
        .join(old_sigs, F.col("dup_of") == F.col("_oid"))
        .select("doc_id", "dup_of",
                _agreement(num_hashes).alias("est_jaccard"),
                F.lit("index").alias("source"))
    )

    pairs = idx_pairs
    if include_intra_batch:
        batch_coll = (
            new_bands.alias("n0")
            .join(new_bands.alias("o0"),
                  (F.col("n0.band_idx") == F.col("o0.band_idx"))
                  & (F.col("n0.band_hash") == F.col("o0.band_hash"))
                  # later doc dups the earlier one, never both ways
                  & (F.col("n0.doc_id") > F.col("o0.doc_id")))
            .select(F.col("n0.doc_id").alias("doc_id"),
                    F.col("o0.doc_id").alias("dup_of"))
            .distinct()
        )
        earlier = new_sigs.select(
            F.col("doc_id").alias("_oid"),
            *[F.col(f"mh{i}").alias(f"omh{i}")
              for i in range(num_hashes)],
        )
        batch_pairs = (
            batch_coll.join(new_sigs, "doc_id")
            .join(earlier, F.col("dup_of") == F.col("_oid"))
            .select("doc_id", "dup_of",
                    _agreement(num_hashes).alias("est_jaccard"),
                    F.lit("batch").alias("source"))
        )
        pairs = idx_pairs.unionByName(batch_pairs)

    from pyspark.sql import Window

    best = Window.partitionBy("doc_id").orderBy(
        F.col("est_jaccard").desc(),
        # index matches outrank batch matches at equal similarity
        # ('index' > 'batch' lexicographically, so descending):
        # pointing at the persisted corpus keeps dup chains shallow
        F.col("source").desc(),
        F.col("dup_of").asc(),
    )
    out = (
        pairs.filter(F.col("est_jaccard") >= threshold)
        .withColumn("_rk", F.row_number().over(best))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    return (out, new_sigs) if return_sigs else out


def merge_minhash_index(spark: SparkSession, index_path: str,
                        new_docs: DataFrame, *, text_col: str = "text",
                        exclude: Optional[DataFrame] = None,
                        sigs: Optional[DataFrame] = None) -> None:
    """Append ``new_docs`` (minus ``exclude`` — typically the ``doc_id``
    column of ``incremental_near_dups``' result) to the index.

    Idempotent: doc_ids already present are anti-joined away against the
    touched ``sp`` partitions before any write, so a restarted ingest
    re-merges to a no-op. ``exclude``'s plan is evaluated lazily inside
    this call — build it from the index BEFORE merging (the normal
    probe-then-merge order); its parquet reads keep their pre-append file
    listing, so the self-reference is safe in that order. Appends are hash-distributed on the partition
    key → at most one new file per touched partition per merge; compact
    with ``build_minhash_index`` over the full corpus when file counts
    warrant (one rewrite, offline).

    Crash ordering (ADVICE r4): **postings are appended BEFORE sigs.**
    Sigs is the idempotency key — a doc is "in the index" iff its sigs
    row exists — so a job that dies between the two appends leaves only
    orphan postings, and the retry (anti-join sees the doc as absent)
    re-appends BOTH tables: the doc converges to findable, the duplicate
    postings are harmless because every probe ``.distinct()``s its
    collision pairs (they only inflate ``minhash_index_profile`` counts
    until the next compaction rewrites them away). The reverse order had
    a permanent-desync window: sigs committed ⇒ retry skips the doc ⇒ its
    postings never exist ⇒ indexed but unfindable by every future probe.

    ``sigs``: precomputed signature frame from
    ``incremental_near_dups(return_sigs=True)`` **against this same
    index** — reusing it makes the ingest loop's dominant cost (the
    shingle+minhash pass) run once per dump instead of twice;
    ``new_docs``/``text_col`` are then ignored. The column shape is
    validated, but the hash_fn cannot be inferred from data: sigs from a
    DIFFERENT index's params would silently corrupt recall, so only pass
    what the probe of this index returned.
    """
    p = load_index_params(spark, index_path)
    root = index_path.rstrip("/")
    num_hashes, bands_n = p["num_hashes"], p["bands"]
    hash_fn, n_parts = p["hash_fn"], p["n_parts"]

    def drop_excluded(df: DataFrame) -> DataFrame:
        if exclude is None:
            return df
        return df.join(
            exclude.select(F.col("doc_id")).distinct(), "doc_id", "left_anti"
        )

    if sigs is not None:
        want = {"doc_id", *(f"mh{i}" for i in range(num_hashes))}
        have = set(sigs.columns)
        if not want <= have:
            raise ValueError(
                f"precomputed sigs missing columns {sorted(want - have)} "
                f"for this index's num_hashes={num_hashes} — pass the "
                "frame incremental_near_dups(return_sigs=True) returned "
                "for THIS index"
            )
        base = drop_excluded(sigs.select(
            "doc_id", *(f"mh{i}" for i in range(num_hashes))
        ))
    else:
        # exclusion BEFORE signaturing: excluded docs never pay the pass
        base = _sig_df(drop_excluded(new_docs), text_col,
                       num_hashes, hash_fn)
    # one row per doc even if the batch carries repeats (a re-crawled
    # url in the same dump): two sig rows for one id would double its
    # postings and break the postings == sigs × bands invariant
    sigs = base.dropDuplicates(["doc_id"]) \
        .withColumn("sp", _sp(n_parts)).persist()
    try:
        sp_touched = [r.sp for r in sigs.select("sp").distinct().collect()]
        existing = _pruned(
            _read_index_table(spark, root, "sigs", p), "sp", sp_touched
        ).select("doc_id")
        # EAGER lineage cut, not persist(): fresh's plan reads the very
        # sigs path the first write appends to, and that write's commit
        # refreshes/invalidates every cache entry over the path — the
        # postings write would then RE-EVALUATE the anti-join against the
        # just-appended table and derive postings from an empty frame
        # (sigs/postings silently desync: rows indexed but unfindable).
        # Caught by the xxhash64-lane test; checkpointing pins fresh to
        # the pre-append snapshot for both writes.
        fresh = _truncate_lineage(sigs.join(existing, "doc_id", "left_anti"))
        # postings from the checkpointed fresh sigs: no second shingle
        # pass, and the two tables cannot desync. Written FIRST — see the
        # crash-ordering note in the docstring (sigs commit marks the doc
        # indexed, so it must be the LAST thing that happens).
        posts = (
            _bands_from_sigs(fresh, num_hashes, bands_n, hash_fn)
            .withColumn("pq", _pq(n_parts))
        )
        (posts.repartition(F.col("pq"))
              .write.mode("append").partitionBy("pq")
              .parquet(root + "/postings"))
        (fresh.repartition(F.col("sp"))
              .write.mode("append").partitionBy("sp")
              .parquet(root + "/sigs"))
    finally:
        sigs.unpersist()


def compact_minhash_index(spark: SparkSession, index_path: str) -> None:
    """Rewrite both index tables to one file per partition.

    Every merge appends ≤1 file per touched partition, so after K dumps a
    partition holds up to K small files; scan cost and open-file overhead
    creep up with corpus age. Run this offline when file counts warrant
    (it is one full read+write of the index — the same cost as one
    signature-free merge of the whole corpus). Values are untouched.
    Via a .tmp swap because Spark (correctly) refuses to overwrite a path
    it is reading from.

    Crash safety: ``_params`` is REMOVED before the destructive rewrite
    of the live tables and restored only after both complete — a job
    that dies mid-rewrite leaves an index that ``load_index_params``
    REFUSES (loud), never one that probes read silently truncated (the
    silent-missing-collisions failure the params guard exists for). The
    restore is a RENAME of a ``_params.tmp`` staged BEFORE the
    destructive section (VERDICT r4 #5): the only post-swap step is one
    atomic metadata operation, so a crash can never leave a truncated /
    half-written ``_params`` that reads as valid-but-wrong. The ``.cmp``
    copies survive a mid-swap crash for manual recovery.
    """
    from pdf2doi_spark.sources.io import _fs_rename, _rmtree

    p = load_index_params(spark, index_path)  # refuse half-built index
    root = index_path.rstrip("/")
    params_raw = json.dumps(p)
    tmps = {}
    for table, part_col in (("sigs", "sp"), ("postings", "pq")):
        tmp = f"{root}/{table}.cmp"
        live = _read_index_table(spark, root, table, p)
        (live.repartition(F.col(part_col))
             .write.mode("overwrite").partitionBy(part_col).parquet(tmp))
        tmps[table] = (tmp, part_col, live.schema)
    # stage the params restore BEFORE anything destructive happens
    params_tmp = _params_path(index_path) + ".tmp"
    _fs_write_small(spark, params_tmp, params_raw)
    # both compacted copies exist: mark the index incomplete, swap, re-mark
    _rmtree(_params_path(index_path), spark)
    for table, (tmp, part_col, schema) in tmps.items():
        (spark.read.schema(schema).parquet(tmp)
             .repartition(F.col(part_col))
             .write.mode("overwrite").partitionBy(part_col)
             .parquet(f"{root}/{table}"))
    _fs_rename(spark, params_tmp, _params_path(index_path))
    for tmp, _pc, _s in tmps.values():
        _rmtree(tmp, spark)


def minhash_index_profile(spark: SparkSession, index_path: str) -> DataFrame:
    """Bucket-size distribution of the PERSISTED postings — the skew audit
    for the incremental family (same schema as dedup.bucket_histogram, so
    it composes with the one-shot audits). Run it before choosing a
    ``max_bucket`` for the next dump's probe: the index accumulates every
    prior dump's boilerplate, so a bucket that was harmless at dump 0 can
    be degenerate by dump 50 — this is the query that tells you.
    """
    from pdf2doi_spark.operators.dedup import bucket_histogram

    p = load_index_params(spark, index_path)
    posts = _read_index_table(spark, index_path.rstrip("/"), "postings", p)
    return bucket_histogram(posts, ["band_idx", "band_hash"])
