"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline operators (driver mandate): token counting,
language-ID heuristic, quality scoring, document fingerprinting. All are
**pure native column expressions** — whole-stage codegen end-to-end, no
Python in the hot path, and every one has an exact ANSI-SQL oracle.
Scale notes: each is a narrow map (no shuffle); fingerprinting feeds the
dedup operators in ``dedup.py``.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny fixed stopword banks for the ratio-based language heuristic.
# (An n-gram language model is overkill for the synthetic corpus; the
# heuristic's *shape* — per-language marker-hit ratios, argmax — is what a
# real pipeline needs, and it is fully SQL-expressible.)
EN_MARKERS = ("the", "a", "and", "of", "to")
PUNCT_CLASS = r"[\.,;:!\?\)\(]"


def tokens(col: Column) -> Column:
    """Whitespace tokenisation (empty string → empty array)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (4 chars/token heuristic on non-space length)."""
    t = F.trim(F.col(text_col))
    nospace = F.length(F.regexp_replace(t, r"\s+", ""))
    return df.select(
        F.col("doc_id"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        F.ceil(nospace / F.lit(4)).cast("long").alias("n_subword_est"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word-ratio language heuristic: share of tokens that are
    English marker words; classify 'en' above 2%."""
    toks = tokens(F.lower(F.col(text_col)))
    hits = F.size(F.filter(toks, lambda x: x.isin(*EN_MARKERS)))
    total = F.size(toks)
    ratio = F.when(total > 0, hits / total).otherwise(F.lit(0.0))
    return df.select(
        F.col("doc_id"),
        F.round(ratio, 6).alias("en_marker_ratio"),
        F.when(ratio > 0.02, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality features: length, mean word length, punctuation
    ratio, stopword ratio — the standard cheap pre-training filters."""
    t = F.col(text_col)
    toks = tokens(F.lower(t))
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*EN_MARKERS)))
    mean_wl = F.when(n_tok > 0, (F.length(F.regexp_replace(F.trim(t), r"\s+", "")) / n_tok)).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.when((n_tok >= 10) & (mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col("doc_id"),
        n_chars.alias("n_chars_seen"),
        n_tok.alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalised
    lowercased text (md5 chosen because it is bit-identical across Spark,
    DuckDB, and Python — the cross-engine contract for dedup joins)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col("doc_id"), F.md5(norm).alias("fp"))


def ascii_scrub(df: DataFrame, text_col: str = "text", n_chars: int = 1000) -> DataFrame:
    """Reference F11 (finders.py:844-852): non-ASCII → space, fold
    newline/CR/tab to space, truncate to the first ``n_chars`` characters —
    fully native (regexp_replace + translate + substring)."""
    scrubbed = F.regexp_replace(F.col(text_col), r"[^\x00-\x7f]", " ")
    folded = F.translate(scrubbed, "\n\r\t", "   ")
    return df.select(
        F.col("doc_id"), F.substring(folded, 1, n_chars).alias("scrubbed_text")
    )
