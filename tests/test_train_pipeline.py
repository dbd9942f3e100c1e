"""End-to-end composition test: the training-corpus pipeline example
(examples/train_pipeline.py) chains quality gate → exact dedup → minhash
near-dup pruning → decontamination → mixture sampling → sequence packing
over the sf0.001 documents table and must uphold every stage's contract
simultaneously — operators that pass alone can still disagree about
column names, NULL semantics, or determinism when composed."""
import importlib.util
import os

import pytest
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "train_pipeline",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples", "train_pipeline.py"),
)
train_pipeline = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(train_pipeline)


@pytest.fixture(scope="module")
def pipeline_result(spark, sf_dir):
    packed, lineage, release = train_pipeline.run_pipeline(
        spark, sf_dir, budget=64, eval_pct=1.0)
    yield packed, lineage
    release()


def test_lineage_counts_are_monotone_and_nonvacuous(pipeline_result):
    _, lin = pipeline_result
    order = ["input_docs", "quality_gated", "exact_deduped",
             "near_dup_pruned", "decontaminated", "mixture_sampled"]
    for a, b in zip(order, order[1:]):
        assert lin[b] <= lin[a], (a, b, lin)
    # at sf0.001 the near-dup, decontamination, and mixture stages must
    # each actually remove documents — a pipeline that prunes nothing is
    # testing nothing
    assert lin["near_dup_pruned"] < lin["exact_deduped"], lin
    assert lin["decontaminated"] < lin["near_dup_pruned"], lin
    assert lin["mixture_sampled"] < lin["decontaminated"], lin
    # packing is a reshape, never a filter: one output row per short doc
    # plus one per context chunk of each oversized doc (and chunking must
    # actually trigger at this budget, or the stage is testing nothing)
    assert lin["oversized_docs"] > 0, lin
    assert lin["context_chunks"] > lin["oversized_docs"], lin
    assert lin["packed_docs"] == (
        lin["mixture_sampled"] - lin["oversized_docs"] + lin["context_chunks"]
    ), lin


def test_packed_sequences_respect_budget(pipeline_result):
    packed, _ = pipeline_result
    over = (
        packed.groupBy("lang", "bin", "chunk_in_bin")
        .agg(F.sum("n_tokens").alias("seq_tokens"))
        # with context chunking ahead of packing there is no longer any
        # legitimate over-budget sequence: oversized docs were windowed
        # to <= budget before packing, so ANY sequence over budget is a
        # bug (round 4 dropped the old singleton exemption)
        .filter(F.col("seq_tokens") > 64)
        .count()
    )
    assert over == 0
    # provenance columns reassemble the original document: chunk_idx is
    # dense from 0 per src_doc_id
    from pyspark.sql import Window
    w = Window.partitionBy("src_doc_id").orderBy("chunk_idx")
    bad = (
        packed.select("src_doc_id", "chunk_idx",
                      F.row_number().over(w).alias("rn"))
        .filter(F.col("chunk_idx") != F.col("rn") - 1)
        .count()
    )
    assert bad == 0


def test_pipeline_is_deterministic(spark, sf_dir, pipeline_result):
    packed, lineage = pipeline_result
    packed2, lineage2, release2 = train_pipeline.run_pipeline(
        spark, sf_dir, budget=64, eval_pct=1.0)
    try:
        assert lineage2 == lineage
        assert packed2.exceptAll(packed).count() == 0
        assert packed.exceptAll(packed2).count() == 0
    finally:
        release2()


def test_no_eval_contamination_survives(spark, sf_dir, pipeline_result):
    """Re-running the decontamination check over the surviving doc set must
    find nothing — the pipeline's own filter has to be a fixpoint."""
    from pdf2doi_spark.operators.dedup import contamination_overlap
    from pdf2doi_spark.operators.quality import hash_sample

    packed, _ = pipeline_result
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # packed doc_id is the composite packing key (src_doc_id * KEY_SPACE
    # + chunk_idx) — join provenance on src_doc_id, or the join is vacuous
    survivors = docs.join(
        packed.select(F.col("src_doc_id").alias("doc_id")).distinct(),
        "doc_id",
    )
    assert survivors.count() > 0  # non-vacuous by construction
    evalset = hash_sample(docs.select("doc_id", "text"), pct=1.0)
    assert contamination_overlap(survivors, evalset).count() == 0


def test_provenance_decode_is_exact_at_64bit(spark):
    """floor(key / KEY_SPACE) routes through double division: at
    doc_id=1e10, chunk_idx=999999 the composite key rounds to the next
    million and decodes to the WRONG source document. The pipeline's
    decoder must use integral div."""
    key_space = 1_000_000
    cases = [
        (10_000_000_000, 999_999),   # the double-rounding trap
        (9_000_000_000_000, 999_999),  # near the documented id bound
        (0, 0),
        (42, 7),
    ]
    df = spark.createDataFrame(
        [(d * key_space + c,) for d, c in cases], "doc_id long"
    )
    got = {
        (r.src_doc_id, r.chunk_idx)
        for r in train_pipeline._decode_provenance(df, key_space).collect()
    }
    assert got == set(cases)
