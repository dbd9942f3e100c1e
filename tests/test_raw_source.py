"""binaryFile raw-ingestion source (reference S1 directory scan)."""
import os


def test_read_raw_files_glob_and_extract(spark, tmp_path):
    from pdf2doi_spark.operators.extract import extract_identifiers
    from pdf2doi_spark.sources.io import read_raw_files

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.html").write_bytes(
        b'<html><head><meta name="citation_doi" content="10.1068/p080244">'
        b"</head><body><p>long enough body paragraph here</p></body></html>"
    )
    (d / "b.html").write_bytes(b"<p>no identifiers in this one at all</p>")
    (d / "ignore.txt").write_bytes(b"not html, filtered at listing time")

    pages = read_raw_files(spark, str(d))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = pages.count()
    assert rows == 2  # glob filter excluded ignore.txt

    res = extract_identifiers(pages, with_text=False).toPandas()
    hit = res[res["url"].str.endswith("a.html")].iloc[0]
    assert hit["identifier"] == "10.1068/p080244"
    assert hit["method"] == "document_infos"


def test_library_entry_routes_all_targets(spark, tmp_path):
    """pdf2doi_spark.pdf2doi(target) mirrors the reference library entry:
    parquet dir, raw-html dir, and WARC dir all route to the same results
    schema."""
    import pdf2doi_spark
    from pdf2doi_spark.sources.warc import build_warc_bytes

    html = (b"<html><head><meta name=\"citation_doi\" content=\"10.1063/1.2409490\">"
            b"</head><body><p>Body text long enough to survive the gate.</p></body></html>")

    raw_dir = tmp_path / "raw"; raw_dir.mkdir()
    (raw_dir / "one.html").write_bytes(html)

    warc_dir = tmp_path / "warc"; warc_dir.mkdir()
    (warc_dir / "a.warc").write_bytes(
        build_warc_bytes([("https://x.org/a", "2024-01-01T00:00:00Z", html)])
    )

    pq_dir = tmp_path / "pages"
    pdf2doi_spark.pdf2doi(str(raw_dir), spark=spark).sparkSession  # warm route
    from pdf2doi_spark.sources.io import read_raw_files
    read_raw_files(spark, str(raw_dir)).write.parquet(str(pq_dir))

    for target in (str(raw_dir), str(warc_dir), str(pq_dir)):
        out = pdf2doi_spark.pdf2doi(target, spark=spark)
        assert out.columns == ["url", "identifier", "identifier_type",
                               "method", "tier", "validation_info",
                               "extracted_text"]
        row = out.collect()[0]
        assert row["identifier"] == "10.1063/1.2409490"
        assert row["method"] == "document_infos"
