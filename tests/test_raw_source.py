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
