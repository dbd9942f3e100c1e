"""Training-batch construction operators: sequence packing and
source-mixture sampling.

These are the two corpus-assembly steps that sit between curation (dedup /
quality gates, ``operators/dedup.py`` / ``operators/quality.py``) and the
trainer: pick how much of each source to keep (mixture), then pack the
kept documents into fixed-token-budget training sequences (packing). No
reference counterpart (pdf2doi stops at extraction); these extend the
pipeline the way ``dedup.py``/``similarity.py`` do.

Scale shape
-----------
Greedy packing is inherently sequential in the chosen document order, so
it cannot be one global scan at 10^12 docs. The standard parallel
decomposition is BOUNDED BINS: split the order key into fixed-size ranges,
pack greedily inside each (group, bin) independently, and accept that each
bin may end with one partial sequence. With ``bin_size`` docs per bin the
waste is at most one underfull sequence per bin — a vanishing fraction as
bins grow — and every bin is an independent task: the only shuffle is the
``groupBy(group, bin)`` feeding ``applyInPandas``, each task touches at
most ``bin_size`` rows, and no global window/row_number is ever computed
(binning is a pure function of the key: ``floor(order_key / bin_size)``).

Mixture sampling keeps membership a pure function of the document key
(same md5 contract as ``quality.hash_sample``) so the subset is identical
across engines, runs and cluster sizes; the per-source keep-fractions are
derived from a tiny per-source token aggregate that Spark broadcasts —
no driver-side collect, no second pass over the corpus.
"""

from typing import Iterable, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    group_col: str = "lang",
    order_col: str = "doc_id",
    bin_size: int = 4096,
) -> DataFrame:
    """Greedy first-fit-in-order packing of documents into training
    sequences of at most ``budget`` tokens.

    Within each ``(group_col, bin)`` — ``bin = floor(order_col /
    bin_size)`` — documents are visited in ``order_col`` order and
    appended to the current sequence; a document that would push the
    running total past ``budget`` starts a new sequence (a single
    document larger than the budget gets a sequence of its own).

    Output: one row per input document with ``(doc_id-compatible
    order_col, group_col, bin, chunk_in_bin, n_tokens)`` where
    ``chunk_in_bin`` is the 0-based sequence index inside the bin; the
    globally-unique sequence id is the triple (group, bin, chunk_in_bin).

    Deterministic: binning and visit order are pure functions of the key,
    so the packing is reproducible across runs, partitionings and cluster
    sizes, and re-expressible as an ordered recursion in ANSI SQL (the
    driver oracle uses a recursive CTE). ``order_col`` values must be
    unique within a group: ties would be broken by arrival order, which
    is partition-dependent (and the SQL oracle's row_number would break
    them arbitrarily too). ``order_col`` and ``token_col`` must also be
    NON-NULL: NULL longs arrive in the pandas group as NaN, where a NaN
    token breaks the budget arithmetic and a NaN order key makes the
    visit order undefined — the kernel fails fast with a clear error
    instead of a bare ``ValueError`` from ``int(nan)`` mid-executor.
    """
    group_type = dict(df.dtypes)[group_col]
    out_schema = (
        f"{order_col} long, {group_col} {group_type}, bin long, "
        f"chunk_in_bin long, n_tokens long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[order_col].isna().any() or pdf[token_col].isna().any():
            raise ValueError(
                f"pack_sequences: NULL {order_col!r}/{token_col!r} values "
                f"in group {pdf[group_col].iloc[0]!r} — both columns must "
                "be non-null (NULL order keys make the deterministic visit "
                "order undefined; NULL token counts break the budget "
                "arithmetic). Filter or impute upstream."
            )
        pdf = pdf.sort_values(order_col, kind="mergesort")
        toks = pdf[token_col].to_numpy()
        chunk = []
        cur_chunk = 0
        cur = 0
        first = True
        for t in toks:
            t = int(t)
            # every doc after the first starts a new chunk when it would
            # overflow — no cur>0 guard: that would let an oversize doc
            # ride along with a preceding zero-token doc and break the
            # budget invariant
            if not first and cur + t > budget:
                cur_chunk += 1
                cur = 0
            cur += t
            first = False
            chunk.append(cur_chunk)
        return pd.DataFrame(
            {
                order_col: pdf[order_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "bin": pdf["bin"].to_numpy(),
                "chunk_in_bin": chunk,
                "n_tokens": toks,
            }
        )

    binned = df.select(
        F.col(order_col),
        F.col(group_col),
        # integer division (`div`), NOT floor(a/b): exact at 64-bit (no
        # double rounding above 2^53) and truncation-consistent with the
        # oracle's DuckDB `//`
        F.expr(f"CAST(`{order_col}` div {int(bin_size)} AS BIGINT)").alias(
            "bin"
        ),
        F.col(token_col).cast("long").alias(token_col),
    )
    return binned.groupBy(group_col, "bin").applyInPandas(_pack, out_schema)


def _hash_unit(key_col: str) -> Column:
    """Deterministic uniform draw in [0, 1): the shared
    ``quality._md5_int32`` draw over 2^32 (2^-32 granularity instead of
    ``_hash_bucket``'s 1%); bit-identical in DuckDB as ``('0x' ||
    substr(md5(k), 1, 8))::UBIGINT / 4294967296.0`` (exact: integer over
    a power of two)."""
    from pdf2doi_spark.operators.quality import _md5_int32

    return _md5_int32(key_col) / F.lit(float(2 ** 32))


def mixture_sample(
    df: DataFrame,
    targets: dict,
    source_col: str = "source",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
) -> DataFrame:
    """Downsample sources to a target token mixture.

    ``targets`` maps source → desired share of the output token mass
    (shares need not sum to 1; they are read as ratios). The largest
    output corpus consistent with the targets is the one where the
    binding source is kept whole: ``T = min_s(tokens_s / share_s)``;
    every source then keeps ``share_s * T / tokens_s`` of its token mass,
    implemented as the key-hash filter ``md5(key)/2^32 < keep_frac_s``
    (expected token mass, exact in distribution; membership per document
    stays a pure function of the key). Sources absent from ``targets``
    are dropped.

    Plan shape: one partial-aggregated groupBy over the corpus for the
    per-source token totals (|sources| rows), a broadcast join of the
    resulting fractions, and a narrow filter — no collect, no second
    wide pass.
    """
    shares = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    totals = (
        df.groupBy(source_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("_src_tokens"))
        .withColumn("_share", shares[F.col(source_col)])
        .filter(F.col("_share").isNotNull())
    )
    # T = min over sources of tokens_s / share_s; a tiny two-row plan —
    # broadcast both the scalar and the per-source fractions back in.
    t_bound = totals.agg(
        F.min(F.col("_src_tokens") / F.col("_share")).alias("_t")
    )
    fracs = (
        totals.crossJoin(F.broadcast(t_bound))
        .select(
            source_col,
            (F.col("_share") * F.col("_t") / F.col("_src_tokens")).alias(
                "_keep_frac"
            ),
        )
    )
    return (
        df.join(F.broadcast(fracs), on=source_col, how="inner")
        .filter(_hash_unit(key_col) < F.col("_keep_frac"))
        .drop("_keep_frac")
    )


def chunk_documents(docs: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 256,
                    overlap: int = 32,
                    passthrough: Iterable[str] = ()) -> DataFrame:
    """Split long documents into overlapping token windows —
    ``(doc_id, chunk_idx, chunk_text, n_tokens)`` — the step BEFORE
    ``pack_sequences`` when documents exceed the training context length
    (the reference processes whole files, main.py:222-260; context-length
    chunking is training-pipeline mandate, not reference parity).

    Windows are ``chunk_tokens`` whitespace tokens with ``overlap`` tokens
    shared between neighbours (stride = chunk_tokens - overlap). A final
    window that would contribute nothing but overlap is not emitted: a
    start ``s > 0`` must satisfy ``s + overlap < n_tokens``. ``chunk_idx``
    is ``s / stride`` — dense from 0 per document.

    Scale shape: a pure narrow map + explode — ZERO shuffles. Each task
    chunks its own documents; the output inherits the input partitioning,
    so the downstream packing shuffle is the first exchange in the chain.
    Tokenisation strips edge whitespace with an explicit regex
    (``^\\s+|\\s+$``) rather than ``trim`` so the Java and oracle-side
    splits agree on every edge case (space-only ``trim`` leaves ``\\n``
    edges; Java ``split`` then drops trailing empty tokens while other
    engines keep them).
    """
    stride = chunk_tokens - overlap
    if chunk_tokens <= 0 or overlap < 0 or stride <= 0:
        raise ValueError(
            f"need 0 <= overlap ({overlap}) < chunk_tokens ({chunk_tokens})"
        )
    extra = list(passthrough)
    t = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), *extra, t.alias("_txt"))
        .filter(F.length("_txt") > 0)  # whitespace-only docs chunk to nothing
        .select(id_col, *extra, F.split(F.col("_txt"), r"\s+").alias("_t"))
        .withColumn("_n", F.size("_t"))
    )
    starts = base.select(
        id_col, *extra, "_t", "_n",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)),
                       F.lit(stride))
        ).alias("_s"),
    )
    return (
        starts.filter(
            (F.col("_s") == 0) | (F.col("_s") + F.lit(overlap) < F.col("_n"))
        )
        .select(
            F.col(id_col),
            *extra,
            (F.col("_s") / F.lit(stride)).cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("_t"), F.col("_s") + 1, F.lit(chunk_tokens)),
                " ",
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s"))
            .cast("int").alias("n_tokens"),
        )
    )
