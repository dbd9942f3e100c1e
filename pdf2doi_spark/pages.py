"""Deterministic synthetic Common-Crawl-style ``pages`` table.

BASELINE.json ``input_hint`` fixes the input shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No driver-provisioned table has that shape, so tests and benchmarks
synthesise it *deterministically* from the provided ``documents`` parquet
(``doc_id, text, lang, source, n_chars``): every generated value is a pure
function of ``doc_id`` and the document row — no RNG, no clock — so the
same rows are produced on every executor, every run, at every parallelism.

Row categories follow FIXTURES.md §1's stage-coverage matrix (category =
``doc_id % 16``), so every finder stage / regex tier has dedicated rows at
every scale factor. Domains are drawn Zipfian-ish from a fixed host list to
exercise skew handling (heavier weight on low ranks).
"""
from __future__ import annotations

import datetime as _dt
from typing import Iterator, Tuple

import pandas as pd

# Fixed host list; index chosen by a quadratic-residue trick that
# concentrates mass on low indexes (Zipf-flavored skew, deterministic).
_HOSTS = [
    "archive-hub.org", "openpapers.net", "scholarmirror.com", "crawlcache.io",
    "webtext.example", "docs-depot.org", "paperstash.net", "mirror-a.org",
    "mirror-b.org", "mirror-c.org", "longtail-1.org", "longtail-2.org",
    "longtail-3.org", "longtail-4.org", "longtail-5.org", "longtail-6.org",
    "longtail-7.org", "longtail-8.org", "longtail-9.org", "longtail-10.org",
]

_EPOCH = _dt.datetime(2024, 1, 1)

N_CATEGORIES = 16

_NAV = (
    '<nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/login">Login</a></nav>'
)
_FOOTER = (
    '<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a> '
    '<a href="/imprint">Imprint</a></footer>'
)


def _host(doc_id: int) -> str:
    # Zipf-ish: ~50% of rows land on the first 4 hosts.
    r = (doc_id * 2654435761) % 100
    if r < 20:
        return _HOSTS[0]
    if r < 35:
        return _HOSTS[1]
    if r < 45:
        return _HOSTS[2]
    if r < 52:
        return _HOSTS[3]
    return _HOSTS[4 + (doc_id * 40503) % (len(_HOSTS) - 4)]


def doi_for(doc_id: int) -> str:
    """Deterministic lowercase DOI unique to a doc_id."""
    registrant = 1000 + (doc_id * 7919) % 9000
    return f"10.{registrant}/j.test.{doc_id}"


def arxiv_for(doc_id: int) -> str:
    """Deterministic post-2007 arXiv ID."""
    yymm = 1501 + (doc_id * 37) % 900
    return f"{yymm}.{10000 + doc_id % 80000}"


def category_of(doc_id: int) -> int:
    return doc_id % N_CATEGORIES


def build_page(doc_id: int, doc_text: str, lang: str, source: str) -> Tuple[str, _dt.datetime, bytes, str]:
    """One pages row: ``(url, warc_ts, html, text)`` for a document row.

    The category decides where (if anywhere) the identifier is embedded —
    meta tag, url, or body text at a specific regex tier.
    """
    cat = category_of(doc_id)
    doi = doi_for(doc_id)
    axv = arxiv_for(doc_id)
    host = _host(doc_id)
    snippet = (doc_text or "")[:400]

    url = f"https://{host}/{source}/page-{doc_id}.html"
    meta_tags = ""
    body_extra = ""
    text_extra = ""

    if cat == 0:  # meta_hit: citation_doi holds the exact DOI (tier-4 form)
        meta_tags = f'<meta name="citation_doi" content="{doi}">'
    elif cat == 1:  # meta_blacklist: only a journal-level key -> falls to text
        meta_tags = f'<meta name="wps-journaldoi" content="{doi_for(doc_id + 1)}">'
        body_extra = f" Cited as doi: {doi} in this work."
        text_extra = f" doi: {doi} "
    elif cat == 2:  # meta_priority: junk key earlier, priority key wins
        meta_tags = (
            f'<meta name="zz_junkfield" content="{doi_for(doc_id + 2)}">'
            f'<meta name="citation_doi" content="{doi}">'
        )
    elif cat == 3:  # url_hit: DOI in basename under a .pdf suffix
        url = f"https://{host}/{source}/{doi.replace('/', '%2F')}.pdf"
    elif cat == 4:  # url_encoded: %2F separator, .html suffix
        url = f"https://{host}/files/{doi.replace('/', '%2F')}.html"
    elif cat == 5:  # text_tier0: "doi: <doi>" in body
        body_extra = f" See doi: {doi} for the published version."
        text_extra = f" See doi: {doi} for the published version."
    elif cat == 6:  # text_tier1: bare DOI + terminator
        body_extra = f" The identifier {doi} appears bare here."
        text_extra = f" The identifier {doi} appears bare here."
    elif cat == 7:  # text run-on (tier 1 absorbs letters offline)
        body_extra = f" run-on form {doi}and continues."
        text_extra = f" run-on form {doi}and continues."
    elif cat == 8:  # text_url_tier3: doi.org URL in body
        body_extra = f' Available at https://doi.org/{doi} online.'
        text_extra = f" Available at https://doi.org/{doi} online."
    elif cat == 9:  # multi_doi: first validated match wins
        other = doi_for(doc_id + 3)
        body_extra = f" First {doi} then {other} in one unit."
        text_extra = f" First {doi} then {other} in one unit."
    elif cat == 10:  # arxiv_text
        body_extra = f" Preprint arXiv:{axv}v2 available."
        text_extra = f" Preprint arXiv:{axv}v2 available."
    elif cat == 11:  # nonstandard separator ':' -> standardised to '/'
        body_extra = f" doi: {doi.replace('/', ':')} with colon."
        text_extra = f" doi: {doi.replace('/', ':')} with colon."
    elif cat == 12:  # trailing junk: DOI ends with '.'
        body_extra = f" Sentence ends with {doi}."
        text_extra = f" Sentence ends with {doi}."
    elif cat == 13:  # unicode noise around the DOI
        body_extra = f" résumé — doi: {doi} — end."
        text_extra = f" résumé — doi: {doi} — end."
    # cat 14, 15: miss — no identifier anywhere

    title = f"Document {doc_id} from {source} long enough title"
    html = (
        f"<html><head><title>{title}</title>{meta_tags}"
        f'<script>var tracker = "js-{doc_id}";</script></head>'
        f"<body>{_NAV}"
        f"<p>Main content for document {doc_id}: {snippet}{body_extra}</p>"
        f"{_FOOTER}</body></html>"
    ).encode("utf-8")

    text = f"Document {doc_id}: {snippet}{text_extra}"
    # bounded so replicated load-test ids (doc_id ~ 5e9) stay in pandas'
    # Timestamp range
    warc_ts = _EPOCH + _dt.timedelta(minutes=int(doc_id) % 1_000_000)
    return url, warc_ts, html, text


def pages_pdf_from_documents(docs: pd.DataFrame) -> pd.DataFrame:
    """pandas variant (oracle-side / per-Arrow-batch generation)."""
    rows = [
        build_page(int(d), t, l, s)
        for d, t, l, s in zip(docs["doc_id"], docs["text"], docs["lang"], docs["source"])
    ]
    out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text"])
    out["lang"] = docs["lang"].values
    return out


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

# doc_id offset between replicas — far above any real doc_id, so replica
# pages get distinct urls/DOIs (build_page is a pure function of doc_id).
REPLICA_STRIDE = 50_000_000


def pages_from_documents(spark, sf_dir: str, replicate: int = 1):
    """Spark variant: documents parquet → pages DataFrame.

    Generation happens inside ``mapInPandas`` (one Arrow crossing, batch
    pandas construction) so the synthesised table scales with the input and
    never materialises on the driver.

    The source is one small parquet file (a single input split), so we
    repartition the *narrow* document rows to the session's parallelism
    BEFORE the expansion — a few-MB shuffle that buys fully parallel HTML
    generation + downstream extraction. (A real crawl has thousands of
    splits and skips this.) Round-robin repartition never changes row
    values, only placement, so results stay deterministic.

    ``replicate`` > 1 scales the table for load tests: each replica shifts
    doc_id by REPLICA_STRIDE, producing distinct deterministic pages.
    """
    import pyspark.sql.functions as F

    par = max(spark.sparkContext.defaultParallelism, 8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("_rep"))
        docs = docs.crossJoin(reps).select(
            (F.col("doc_id") + F.col("_rep") * REPLICA_STRIDE).alias("doc_id"),
            "text", "lang", "source",
        )
    docs = docs.repartition(par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pages_pdf_from_documents(b)

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)


def expected_for_page(doc_id: int, doc_text: str, lang: str, source: str,
                      replace_arxiv: bool = True) -> dict:
    """Golden expectation for one synthesised row, via the pure-Python
    kernel oracle (build → meta-scan → cascade), used by parity tests."""
    from pdf2doi_spark.core.kernel import extract_one
    from pdf2doi_spark.core.webmeta import extract_meta, extract_main_content, page_text_units

    url, _, html, text = build_page(doc_id, doc_text, lang, source)
    res = extract_one(url, extract_meta(html), page_text_units(html, text),
                      replace_arxiv=replace_arxiv)
    res["url"] = url
    res["extracted_text"] = extract_main_content(html)
    return res
