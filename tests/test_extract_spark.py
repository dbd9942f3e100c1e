"""End-to-end Spark pipeline parity: synthesised pages → fused kernel →
per-row comparison against the pure-Python oracle (north-rule invariant:
byte-identical extracted_text and identifier per url)."""
import pandas as pd
import pytest

from pdf2doi_spark.pages import (
    build_page,
    category_of,
    expected_for_page,
    pages_from_documents,
)


@pytest.fixture(scope="module")
def results_vs_expected(spark, sf_dir):
    from pdf2doi_spark.operators.extract import extract_identifiers

    docs_pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pages = pages_from_documents(spark, sf_dir)
    got = extract_identifiers(pages).toPandas().set_index("url")

    expected = {}
    for row in docs_pdf.itertuples():
        exp = expected_for_page(int(row.doc_id), row.text, row.lang, row.source)
        expected[exp["url"]] = exp
    return got, expected, docs_pdf


def test_row_count_and_urls(results_vs_expected):
    got, expected, docs = results_vs_expected
    assert len(got) == len(docs)
    assert set(got.index) == set(expected.keys())


def test_identifier_parity_per_url(results_vs_expected):
    got, expected, _ = results_vs_expected
    mismatches = []
    for url, exp in expected.items():
        g = got.loc[url]
        for k in ("identifier", "identifier_type", "method"):
            gv = g[k] if pd.notna(g[k]) else None
            if gv != exp[k]:
                mismatches.append((url, k, gv, exp[k]))
    assert not mismatches, mismatches[:10]


def test_extracted_text_byte_identical(results_vs_expected):
    got, expected, _ = results_vs_expected
    bad = [
        url
        for url, exp in expected.items()
        if got.loc[url]["extracted_text"] != exp["extracted_text"]
    ]
    assert not bad, bad[:5]


def test_every_category_produces_expected_stage(results_vs_expected):
    got, expected, docs = results_vs_expected
    # Category → expected method for synthesised rows (FIXTURES.md §1).
    want = {
        0: "document_infos", 1: "document_text", 2: "document_infos",
        3: "filename", 4: "filename", 5: "document_text", 6: "document_text",
        7: "document_text", 8: "document_text", 9: "document_text",
        10: "document_text + arxiv2doi", 11: "document_text",
        12: "document_text", 13: "document_text", 14: None, 15: None,
    }
    for row in docs.itertuples():
        cat = category_of(int(row.doc_id))
        url, *_ = build_page(int(row.doc_id), row.text, row.lang, row.source)
        g = got.loc[url]
        method = g["method"] if pd.notna(g["method"]) else None
        assert method == want[cat], (row.doc_id, cat, method, want[cat])


def test_multi_doi_first_match_wins(results_vs_expected):
    got, _, docs = results_vs_expected
    from pdf2doi_spark.pages import doi_for

    sample = docs[docs.doc_id % 16 == 9].head(5)
    for row in sample.itertuples():
        url, *_ = build_page(int(row.doc_id), row.text, row.lang, row.source)
        assert got.loc[url]["identifier"] == doi_for(int(row.doc_id))


def test_prefilter_necessity_bare_arxiv_filename(spark):
    # A row whose ONLY identifier evidence is the bare 'NNNN.NNNNN.pdf'
    # filename form (arXiv tier 1): no 'arxiv', no '10.' anywhere. A naive
    # '10.|arxiv' prefilter silently drops it; the two-stage prefilter must
    # keep it (its regex stage is a proved-necessary condition per tier).
    from pdf2doi_spark.operators.extract import extract_identifiers

    pages = spark.createDataFrame(
        [("https://x.org/papers/1907.11692v2.pdf",
          bytearray(b"<p>nothing special here at all</p>"),
          "plain body with no markers")],
        "url string, html binary, text string",
    )
    row = extract_identifiers(pages, with_text=False).collect()[0]
    assert row["identifier"] == "10.48550/arXiv.1907.11692"
    assert row["method"] == "filename + arxiv2doi"


def test_cache_fast_path(spark, sf_dir):
    from pdf2doi_spark.operators.extract import extract_identifiers

    pages = pages_from_documents(spark, sf_dir).limit(32)
    some = pages.select("url").limit(4).toPandas()["url"].tolist()
    cache = spark.createDataFrame(
        [(u, "10.9999/cached.hit") for u in some], "url string, identifier string"
    )
    res = (
        extract_identifiers(pages, cache=cache, with_text=False)
        .toPandas()
        .set_index("url")
    )
    for u in some:
        assert res.loc[u]["identifier"] == "10.9999/cached.hit"
        assert res.loc[u]["method"] == "document_infos"
        assert res.loc[u]["tier"] == -1


def test_accumulator_counters(spark, sf_dir):
    from pdf2doi_spark.operators.extract import (
        ExtractionCounters,
        extract_identifiers,
    )

    pages = pages_from_documents(spark, sf_dir).limit(64)
    counters = ExtractionCounters(spark.sparkContext)
    res = extract_identifiers(pages, with_text=False, counters=counters)
    n = res.count()
    got = counters.as_dict()
    assert got["n_docs"] == n == 64
    assert 0 < got["n_hits"] <= got["n_candidates"] <= got["n_docs"]


def test_metrics_and_report(spark, sf_dir):
    from pdf2doi_spark.operators.extract import (
        extract_identifiers,
        format_report,
        method_metrics,
    )

    pages = pages_from_documents(spark, sf_dir).limit(64)
    res = extract_identifiers(pages, with_text=False)
    m = method_metrics(res).toPandas()
    assert m["n_docs"].sum() == 64
    assert set(m.columns) == {"method", "identifier_type", "n_docs"}

    lines = format_report(res).toPandas()["report_line"]
    assert all(line[15] == " " or len(line) >= 56 for line in lines)
    # n.a. placeholders present for misses
    assert any(line.startswith("n.a.") for line in lines)


def test_cache_preserves_identifier_type(spark):
    """A cached arXiv ID (e.g. manually tagged via cli -id) must resolve
    with its stored type, not be mislabeled as a DOI."""
    from pdf2doi_spark.operators.extract import extract_identifiers

    pages = spark.createDataFrame(
        [("u1", b"<p>nothing to find here at all</p>", None, None, None)],
        "url string, html binary, text string, lang string, warc_ts timestamp",
    ).select("url", "warc_ts", "html", "text", "lang")
    cache = spark.createDataFrame(
        [("u1", "2301.01234", "arxiv ID", "manual")],
        "url string, identifier string, identifier_type string, method string",
    )
    row = extract_identifiers(pages, cache=cache).collect()[0]
    assert row["identifier"] == "2301.01234"
    assert row["identifier_type"] == "arxiv ID"
    assert row["method"] == "document_infos" and row["tier"] == -1
