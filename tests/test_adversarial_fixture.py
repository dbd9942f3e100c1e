"""Driver-gate queries re-run over an ADVERSARIAL mini documents table —
rows the deterministic sf fixtures never contain (short texts, empty and
whitespace-only strings, NBSP-joined tokens, exact duplicates, unicode).
Every oracle must still match exactly: this is the guard against
divergences that are latent on the well-behaved synthetic data (the round-2
review found several of that species).

Deliberately excluded: vertical tab (\x0B) and astral codepoints — the
Java-vs-RE2 dialect skew on those is documented as a pinned limitation in
queries.py's module docstring.
"""
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_driver_contract import _canon

ROWS = [
    (0, "The quick brown fox jumps over the lazy dog near the bank today.", "en", "srcA"),
    (1, "tiny", "en", "srcA"),                      # <3 words, <12 chars
    (2, "", "en", "srcB"),                           # empty text
    (3, "   \t  \n ", "en", "srcB"),                # whitespace-only
    (4, "hello world foo bar baz qux quux corge grault", "fr", "srcA"),  # NBSP-joined token
    (5, "The quick brown fox jumps over the lazy dog near the bank today.", "en", "srcC"),  # dup of 0
    (6, "Ein längerer deutscher Satz, der die Wörter und nicht nur Zeichen prüft.", "de", "srcC"),
    (7, "word " * 40 + "ending.", "en", "srcA"),    # highly repetitive
    (8, "10.1234/j.adversarial.1 appears right here in plain text body", "en", "srcB"),
    (9, "a b", "en", "srcC"),                        # 2 words: below shingle floor
]

CHECKED = [
    "title_select", "ngram_jaccard", "token_count", "lang_id",
    "quality_score", "doc_fingerprint", "exact_dup_groups", "simhash",
    "simhash_near_dups", "line_dedup", "winnowing_sketch",
    "minhash_bands", "minhash_near_dups", "repetition_signals",
    "corpus_pipeline", "doi_tier0", "ascii_scrub", "hash_sample",
    "metrics_cube", "distinct_counts",
]


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv"))
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in ROWS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adv_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", CHECKED)
def test_adversarial_query_vs_oracle(spark, adv_dir, adv_duck, name):
    from pdf2doi_spark.queries import _BUILDERS

    q, sql = _BUILDERS[name]()
    if sql is None:
        pytest.skip("rows-only query")
    got = q(spark, adv_dir).toPandas()
    want = adv_duck.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns)
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff_mask = (g != w) & ~(g.isna() & w.isna())
        bad = diff_mask.any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{g[bad].head(5)}\nduck:\n{w[bad].head(5)}"
        )
