r"""Driver-contract query builders + DuckDB oracle SQL.

Every entry pairs a PySpark query (callable ``(spark, sf_dir) -> DataFrame``)
with an ANSI-SQL oracle that DuckDB evaluates over the same parquet tables.
Column names/aliases are kept identical on both sides (the driver's compare
sorts columns by name before value-hashing).

Inputs are synthesised *deterministically in SQL-expressible form* from the
provided tables (documents/embeddings), so both engines construct
bit-identical inputs — no side-channel files.

Pinned regex-dialect limitation: Spark compiles Java regex (``\s`` =
``[ \t\n\x0B\f\r]``, ``length()`` counts UTF-16 units) while DuckDB
compiles RE2 (``\s`` excludes ``\x0B``; codepoint lengths). The two agree
on every character class these fixtures (and ordinary crawl text) contain;
a document carrying a vertical tab or astral-plane codepoints would
tokenize/measure differently per engine. Python-side kernels tokenize on
the explicit Java-``\s`` class (see dedup._simhash_batch) so the THIRD
engine can never add its own Unicode-whitespace variant of this skew. Where a result is genuinely
engine-specific (SimHash's bit votes, LSH-ANN's hash-derived hyperplanes,
HLL/t-digest sketches) the oracle is omitted and the driver records the
weaker rows-only check, with a dedicated pytest pinning each instead; the
flagship cascade AND its extracted_text have exact oracles because the
synthetic pages are a pure function of doc_id (see ``pages.py``) and the
expected outcome per row category is a closed-form CASE expression.
"""
from __future__ import annotations

from typing import Callable, Dict

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from pdf2doi_spark.core.patterns import arxiv_regexp, doi_regexp

QueryFn = Callable[[SparkSession, str], DataFrame]

_SHIPPED = set()


def _log_lsh_params(query: str, n_bands: int, planes_per_band: int) -> None:
    # Queries that derive embedding-LSH params from the LIVE row count use
    # an oracle whose params came from the oracle-dir count; if a scale
    # mismatch ever crosses a 2^16 boundary the two silently diverge and
    # the only symptom is a red row. Log the derived params so that row is
    # diagnosable from the run output (ADVICE r3).
    import logging

    logging.getLogger("pdf2doi_spark").info(
        "%s: derived embedding LSH params n_bands=%d planes_per_band=%d",
        query, n_bands, planes_per_band,
    )


def _ensure_shipped(spark: SparkSession) -> None:
    from pdf2doi_spark.session import ship_package

    # applicationId is unique per context; id() of a GC'd-and-reallocated
    # SparkContext can collide and silently skip the ship
    key = spark.sparkContext.applicationId
    if key not in _SHIPPED:
        ship_package(spark)
        _SHIPPED.add(key)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# Deterministic SQL-expressible synthesis helpers (Spark side). The DuckDB
# oracle mirrors each with the same arithmetic.
# --------------------------------------------------------------------------

def _doi_col() -> F.Column:
    reg = (F.lit(1000) + (F.col("doc_id") * 7919) % 9000).cast("string")
    return F.concat(F.lit("10."), reg, F.lit("/j.test."), F.col("doc_id").cast("string"))


_DOI_SQL = "'10.' || CAST(1000 + (doc_id*7919)%9000 AS VARCHAR) || '/j.test.' || CAST(doc_id AS VARCHAR)"


def _arxiv_col() -> F.Column:
    yymm = (F.lit(1501) + (F.col("doc_id") * 37) % 900).cast("string")
    num = (F.lit(10000) + F.col("doc_id") % 80000).cast("string")
    return F.concat(yymm, F.lit("."), num)


_ARXIV_SQL = (
    "CAST(1501 + (doc_id*37)%900 AS VARCHAR) || '.' || "
    "CAST(10000 + doc_id%80000 AS VARCHAR)"
)


def _extract(col: F.Column, pattern: str) -> F.Column:
    hit = F.regexp_extract(F.lower(col), pattern, 1)
    return F.when(hit == "", F.lit(None)).otherwise(hit)


def _sql_extract(expr: str, pattern: str) -> str:
    p = pattern.replace("'", "''")
    return f"NULLIF(regexp_extract(lower({expr}), '{p}', 1), '')"


# --------------------------------------------------------------------------
# Regex tier queries (F3/F6, F4/F7): every third document gets an embedded
# identifier in the tier's shape; the rest stay misses.
# --------------------------------------------------------------------------

def _tier_query(tier: int, mk_text: Callable[[F.Column], F.Column],
                mk_text_sql: str) -> tuple:
    pattern = doi_regexp[tier]

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        inp = F.when(F.col("doc_id") % 3 == 0, mk_text(_doi_col())).otherwise(
            F.col("text")
        )
        return d.select(
            F.col("doc_id"), _extract(inp, pattern).alias("doi_found")
        )

    sql = f"""
        SELECT doc_id,
               {_sql_extract(f"CASE WHEN doc_id % 3 = 0 THEN {mk_text_sql} ELSE text END", pattern)} AS doi_found
        FROM documents
    """
    return q, sql


def _q_doi_tier0():
    return _tier_query(
        0,
        lambda doi: F.concat(F.lit("see doi: "), doi, F.lit(" end")),
        f"'see doi: ' || {_DOI_SQL} || ' end'",
    )


def _q_doi_tier1():
    return _tier_query(
        1,
        lambda doi: F.concat(F.lit("bare "), doi, F.lit(" follows")),
        f"'bare ' || {_DOI_SQL} || ' follows'",
    )


def _q_doi_tier2():
    return _tier_query(
        2,
        lambda doi: F.concat(F.lit("runon "), doi, F.lit("and more")),
        f"'runon ' || {_DOI_SQL} || 'and more'",
    )


def _q_doi_tier3():
    return _tier_query(
        3,
        lambda doi: F.concat(F.lit("at https://doi.org/"), doi, F.lit(" now")),
        f"'at https://doi.org/' || {_DOI_SQL} || ' now'",
    )


def _q_doi_tier4():
    return _tier_query(4, lambda doi: doi, _DOI_SQL)


def _q_tier_rank():
    """First-match-wins tier semantics re-expressed RELATIONALLY: one
    extraction column per tier → explode to (doc, tier, candidate) rows →
    ``Window.partitionBy(doc).orderBy(tier)`` → rank-1 row per doc. This is
    the pure-SQL alternative SURVEY F3/§2.6 describes; the engine of record
    stays the sequential kernel, and
    tests/test_operators.py::test_tier_rank_matches_kernel proves the two
    formulations pick the same winning tier on validated inputs (the
    synthetic texts deliberately overlap: a ``doi:``-prefixed hit also
    matches the looser bare tier, a URL-form hit also matches tier 1)."""
    def mk_inp_spark():
        doi = _doi_col()
        return (
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit("see doi: "), doi, F.lit(" end")))
            .when(F.col("doc_id") % 4 == 1,
                  F.concat(F.lit("bare "), doi, F.lit(" follows")))
            .when(F.col("doc_id") % 4 == 2,
                  F.concat(F.lit("at https://doi.org/"), doi, F.lit(" now")))
            .otherwise(F.col("text"))
        )

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        d = _docs(spark, sf_dir)
        tiers = F.array(*[
            F.struct(
                F.lit(t).alias("tier"),
                _extract(mk_inp_spark(), doi_regexp[t]).alias("cand"),
            )
            for t in range(5)
        ])
        hits = (
            d.select(F.col("doc_id"), F.explode(tiers).alias("h"))
            .select("doc_id", F.col("h.tier").alias("tier"),
                    F.col("h.cand").alias("doi_found"))
            .filter(F.col("doi_found").isNotNull())
        )
        w = Window.partitionBy("doc_id").orderBy("tier")
        return (
            hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .orderBy("doc_id")
        )

    inp_sql = (
        f"CASE WHEN doc_id % 4 = 0 THEN 'see doi: ' || {_DOI_SQL} || ' end' "
        f"WHEN doc_id % 4 = 1 THEN 'bare ' || {_DOI_SQL} || ' follows' "
        f"WHEN doc_id % 4 = 2 THEN 'at https://doi.org/' || {_DOI_SQL} || ' now' "
        f"ELSE text END"
    )
    unions = "\n          UNION ALL\n".join(
        f"          SELECT doc_id, {t} AS tier, "
        f"{_sql_extract(inp_sql, doi_regexp[t])} AS doi_found FROM documents"
        for t in range(5)
    )
    sql = f"""
        WITH hits AS (
{unions}
        )
        SELECT doc_id, tier, doi_found FROM (
          SELECT doc_id, tier, doi_found,
                 row_number() OVER (PARTITION BY doc_id ORDER BY tier) AS rn
          FROM hits WHERE doi_found IS NOT NULL
        ) WHERE rn = 1
        ORDER BY doc_id
    """
    return q, sql


def _q_arxiv_tier0():
    pattern = arxiv_regexp[0]

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        inp = F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("preprint arxiv: "), _arxiv_col(), F.lit(" online")),
        ).otherwise(F.col("text"))
        return d.select(F.col("doc_id"), _extract(inp, pattern).alias("arxiv_found"))

    sql = f"""
        SELECT doc_id,
               {_sql_extract(f"CASE WHEN doc_id % 3 = 0 THEN 'preprint arxiv: ' || {_ARXIV_SQL} || ' online' ELSE text END", arxiv_regexp[0])} AS arxiv_found
        FROM documents
    """
    return q, sql


# --------------------------------------------------------------------------
# standardise_doi (F2): engine of record is the Python kernel (pandas UDF);
# oracle reproduces it for single-DOI inputs via group extraction.
# --------------------------------------------------------------------------

def _q_standardise():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)

        @pandas_udf("string")
        def std(s: pd.Series) -> pd.Series:
            from pdf2doi_spark.core.patterns import standardise_doi

            return s.map(lambda x: standardise_doi(x) if x is not None else None)

        d = _docs(spark, sf_dir)
        sep = F.when(F.col("doc_id") % 4 == 0, F.lit(":")).when(
            F.col("doc_id") % 4 == 1, F.lit(" ")
        ).when(F.col("doc_id") % 4 == 2, F.lit("]")).otherwise(F.lit("/"))
        reg = (F.lit(1000) + (F.col("doc_id") * 7919) % 9000).cast("string")
        suspected = F.concat(
            F.lit("10."), reg, sep, F.lit("j.test."), F.col("doc_id").cast("string")
        )
        return d.select(
            F.col("doc_id"), std(suspected).alias("doi_standard")
        )

    # Single-DOI inputs by construction: registrant + '/' + suffix.
    sql = """
        SELECT doc_id,
               '10.' || CAST(1000 + (doc_id*7919)%9000 AS VARCHAR) || '/j.test.' || CAST(doc_id AS VARCHAR) AS doi_standard
        FROM documents
    """
    return q, sql


# --------------------------------------------------------------------------
# Filename stage primitives (F9/F10): URL-decode + tier extraction.
# --------------------------------------------------------------------------

def _q_filename_extract():
    pattern = doi_regexp[1]

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        url = F.concat(
            F.lit("https://repo.org/p/"),
            F.regexp_replace(_doi_col(), "/", "%2F"),
            F.lit(".pdf"),
        )
        basename = F.element_at(F.split(url, "/"), -1)
        decoded = F.url_decode(basename)
        return d.select(
            F.col("doc_id"), _extract(decoded, pattern).alias("doi_found")
        )

    sql = f"""
        SELECT doc_id,
               {_sql_extract(f"replace(replace({_DOI_SQL}, '/', '%2F') || '.pdf', '%2F', '/')", pattern)} AS doi_found
        FROM documents
    """
    return q, sql


# --------------------------------------------------------------------------
# Flagship: fused extraction cascade over the synthesised pages table.
# Exact oracle: the synthetic pages are a pure function of doc_id, so the
# expected (url, identifier, identifier_type, method) is closed-form SQL.
# --------------------------------------------------------------------------

_HOSTS_SQL = (
    "CASE WHEN (doc_id*2654435761)%100 < 20 THEN 'archive-hub.org' "
    "WHEN (doc_id*2654435761)%100 < 35 THEN 'openpapers.net' "
    "WHEN (doc_id*2654435761)%100 < 45 THEN 'scholarmirror.com' "
    "WHEN (doc_id*2654435761)%100 < 52 THEN 'crawlcache.io' "
    "ELSE (['webtext.example','docs-depot.org','paperstash.net','mirror-a.org',"
    "'mirror-b.org','mirror-c.org','longtail-1.org','longtail-2.org','longtail-3.org',"
    "'longtail-4.org','longtail-5.org','longtail-6.org','longtail-7.org',"
    "'longtail-8.org','longtail-9.org','longtail-10.org'])[1 + (doc_id*40503)%16] END"
)

_CASCADE_EXPECT_SQL = f"""
    WITH base AS (
        SELECT doc_id, source,
               doc_id % 16 AS cat,
               {_DOI_SQL} AS doi,
               {_ARXIV_SQL} AS axv,
               {_HOSTS_SQL} AS host
        FROM documents
    )
    SELECT
        CASE WHEN cat = 3 THEN 'https://' || host || '/' || source || '/' || replace(doi, '/', '%2F') || '.pdf'
             WHEN cat = 4 THEN 'https://' || host || '/files/' || replace(doi, '/', '%2F') || '.html'
             ELSE 'https://' || host || '/' || source || '/page-' || CAST(doc_id AS VARCHAR) || '.html'
        END AS url,
        CASE WHEN cat IN (14, 15) THEN NULL
             WHEN cat = 3 THEN doi || '.pdf'
             WHEN cat = 4 THEN doi || '.html'
             WHEN cat = 7 THEN doi || 'and'
             WHEN cat = 10 THEN '10.48550/arXiv.' || axv
             ELSE doi
        END AS identifier,
        CASE WHEN cat IN (14, 15) THEN NULL
             WHEN cat = 10 THEN 'arxiv DOI'
             ELSE 'DOI'
        END AS identifier_type,
        CASE WHEN cat IN (14, 15) THEN NULL
             WHEN cat IN (0, 2) THEN 'document_infos'
             WHEN cat IN (3, 4) THEN 'filename'
             WHEN cat = 10 THEN 'document_text + arxiv2doi'
             ELSE 'document_text'
        END AS method
    FROM base
"""


def _q_extract_cascade():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.extract import extract_identifiers
        from pdf2doi_spark.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir)
        return extract_identifiers(pages, with_text=False).select(
            "url", "identifier", "identifier_type", "method"
        )

    return q, _CASCADE_EXPECT_SQL


def _q_extract_cascade_noarxiv():
    """Strict reference-offline parity mode (``-no_arxiv2doi``): arXiv IDs
    are kept, never rewritten to synthetic DOIs (SURVEY.md V4)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.extract import extract_identifiers
        from pdf2doi_spark.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir)
        return extract_identifiers(
            pages, replace_arxiv=False, with_text=False
        ).select("url", "identifier", "identifier_type", "method")

    sql = _CASCADE_EXPECT_SQL.replace(
        "WHEN cat = 10 THEN '10.48550/arXiv.' || axv", "WHEN cat = 10 THEN axv"
    ).replace(
        "WHEN cat = 10 THEN 'arxiv DOI'", "WHEN cat = 10 THEN 'arxiv ID'"
    ).replace(
        "WHEN cat = 10 THEN 'document_text + arxiv2doi'",
        "WHEN cat = 10 THEN 'document_text'",
    )
    return q, sql


def _q_method_metrics():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.extract import extract_identifiers, method_metrics
        from pdf2doi_spark.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir)
        return method_metrics(extract_identifiers(pages, with_text=False))

    sql = f"""
        SELECT coalesce(method, 'miss') AS method,
               coalesce(identifier_type, 'none') AS identifier_type,
               count(*) AS n_docs
        FROM ({_CASCADE_EXPECT_SQL})
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    return q, sql


def _q_main_content():
    """Main-content extraction over the synthetic pages. The tokenizer is
    not SQL-expressible over ARBITRARY HTML (byte parity there is enforced
    against the vendored Python spec, tests/test_extract_spark.py), but on
    the synthetic pages its output IS closed-form: head/script are
    stripped, the link-dense nav/footer blocks fail the link-density gate,
    and the one surviving ``<p>`` block's visible text is the known
    template — so the oracle reconstructs it exactly (whitespace-fold +
    trim; the document texts contain no entities or control whitespace,
    asserted in the fixtures)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.extract import extract_identifiers
        from pdf2doi_spark.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir)
        return extract_identifiers(pages).select("url", "extracted_text")

    doi3 = ("'10.' || CAST(1000 + ((doc_id+3)*7919)%9000 AS VARCHAR) || "
            "'/j.test.' || CAST(doc_id+3 AS VARCHAR)")
    sql = rf"""
        WITH base AS (
            SELECT doc_id, source, text,
                   doc_id % 16 AS cat,
                   {_DOI_SQL} AS doi,
                   {_ARXIV_SQL} AS axv,
                   {_HOSTS_SQL} AS host,
                   {doi3} AS doi3
            FROM documents
        )
        SELECT
            CASE WHEN cat = 3 THEN 'https://' || host || '/' || source || '/' || replace(doi, '/', '%2F') || '.pdf'
                 WHEN cat = 4 THEN 'https://' || host || '/files/' || replace(doi, '/', '%2F') || '.html'
                 ELSE 'https://' || host || '/' || source || '/page-' || CAST(doc_id AS VARCHAR) || '.html'
            END AS url,
            trim(regexp_replace(
                'Main content for document ' || CAST(doc_id AS VARCHAR) || ': '
                || substr(text, 1, 400)
                || CASE cat
                     WHEN 1 THEN ' Cited as doi: ' || doi || ' in this work.'
                     WHEN 5 THEN ' See doi: ' || doi || ' for the published version.'
                     WHEN 6 THEN ' The identifier ' || doi || ' appears bare here.'
                     WHEN 7 THEN ' run-on form ' || doi || 'and continues.'
                     WHEN 8 THEN ' Available at https://doi.org/' || doi || ' online.'
                     WHEN 9 THEN ' First ' || doi || ' then ' || doi3 || ' in one unit.'
                     WHEN 10 THEN ' Preprint arXiv:' || axv || 'v2 available.'
                     WHEN 11 THEN ' doi: ' || replace(doi, '/', ':') || ' with colon.'
                     WHEN 12 THEN ' Sentence ends with ' || doi || '.'
                     WHEN 13 THEN ' résumé — doi: ' || doi || ' — end.'
                     ELSE ''
                   END,
                '\s+', ' ', 'g')) AS extracted_text
        FROM base
    """
    return q, sql


def _q_report_format():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.extract import (
            extract_identifiers,
            format_report,
        )
        from pdf2doi_spark.pages import pages_from_documents

        pages = pages_from_documents(spark, sf_dir)
        return format_report(extract_identifiers(pages, with_text=False))

    sql = f"""
        SELECT printf('%-15s %-40s %-10s',
                      coalesce(identifier_type, 'n.a.'),
                      coalesce(identifier, 'n.a.'),
                      url) AS report_line
        FROM ({_CASCADE_EXPECT_SQL})
    """
    return q, sql


# --------------------------------------------------------------------------
# Native scalar ops (F11 scrub, token/quality/lang/fingerprint).
# --------------------------------------------------------------------------

def _q_ascii_scrub():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import ascii_scrub

        d = _docs(spark, sf_dir)
        noisy = d.withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" café\tnoise\nrésumé—"),
                     F.col("doc_id").cast("string")),
        )
        return ascii_scrub(noisy)

    sql = r"""
        SELECT doc_id,
               substring(
                 translate(
                   regexp_replace(text || ' café' || chr(9) || 'noise' || chr(10) || 'résumé—' || CAST(doc_id AS VARCHAR),
                                  '[^\x00-\x7f]', ' ', 'g'),
                   chr(10) || chr(13) || chr(9), '   '),
                 1, 1000) AS scrubbed_text
        FROM documents
    """
    return q, sql


def _q_token_count():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import token_count

        return token_count(_docs(spark, sf_dir))

    sql = r"""
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
               len(regexp_extract_all(trim(text), '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
               CAST(ceil(length(regexp_replace(trim(text), '\s+', '', 'g')) / 4.0) AS BIGINT) AS n_subword_est
        FROM documents
    """
    return q, sql


def _q_lang_id():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import lang_id

        return lang_id(_docs(spark, sf_dir))

    banks = {
        "en": "['the','a','and','of','to']",
        "fr": "['le','la','et','les','des']",
        "es": "['el','los','que','y','las']",
        "de": "['der','die','das','und','nicht']",
        "zh": "['的','是','了','在','我']",
    }
    ratio_exprs = ",\n               ".join(
        f"CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> list_contains({b}, x))) * 1.0 / len(toks) ELSE 0.0 END AS r_{lang}"
        for lang, b in banks.items()
    )
    case_arms = " ".join(
        f"WHEN r_{lang} >= best AND best > 0.02 THEN '{lang}'" for lang in banks
    )
    sql = rf"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks
          FROM documents
        ), r AS (
          SELECT doc_id,
               {ratio_exprs}
          FROM t
        ), b AS (
          SELECT *, greatest(r_en, r_fr, r_es, r_de, r_zh) AS best FROM r
        )
        SELECT doc_id,
               round(r_en, 6) AS en_marker_ratio,
               round(best, 6) AS best_marker_ratio,
               CASE {case_arms} ELSE 'other' END AS lang_pred
        FROM b
    """
    return q, sql


def _q_quality_score():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import quality_score

        return quality_score(_docs(spark, sf_dir))

    sql = r"""
        WITH t AS (
          SELECT doc_id, text,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[\.,;:!\?\)\(]', '', 'g')) AS punct,
                 length(regexp_replace(trim(text), '\s+', '', 'g')) AS nospace
          FROM documents
        ), m AS (
          SELECT doc_id, n_chars, len(toks) AS n_tokens,
                 CASE WHEN len(toks) > 0 THEN nospace * 1.0 / len(toks) ELSE 0.0 END AS mean_wl,
                 CASE WHEN len(toks) > 0
                      THEN len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) * 1.0 / len(toks)
                      ELSE 0.0 END AS stop_ratio,
                 CASE WHEN n_chars > 0 THEN punct * 1.0 / n_chars ELSE 0.0 END AS punct_ratio
          FROM t
        )
        SELECT doc_id,
               n_chars AS n_chars_seen,
               n_tokens,
               round(mean_wl, 6) AS mean_word_len,
               round(stop_ratio, 6) AS stopword_ratio,
               round(punct_ratio, 6) AS punct_ratio,
               round((CASE WHEN n_tokens >= 10 AND mean_wl >= 2.0 AND mean_wl <= 12.0 THEN 0.5 ELSE 0.0 END)
                   + (CASE WHEN stop_ratio > 0.01 THEN 0.3 ELSE 0.0 END)
                   + (CASE WHEN punct_ratio < 0.2 THEN 0.2 ELSE 0.0 END), 2) AS quality_score
        FROM m
    """
    return q, sql


def _q_fingerprint():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import fingerprint

        return fingerprint(_docs(spark, sf_dir))

    sql = r"""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
    """
    return q, sql


def _q_quality_suite():
    """All five scalar quality signals (token counts, lang-ID, quality
    score, fingerprint, ASCII scrub) fused into ONE projection over ONE
    scan — the production shape (quality.quality_suite) and the driver-
    checked one; the per-signal queries stay in the pytest-only registry.
    The scrub runs over a deliberately non-ASCII-noised variant of
    ``text`` (as the standalone ascii_scrub query did) so that check stays
    non-vacuous."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import quality_suite

        noisy = F.concat(
            F.col("text"), F.lit(" café\tnoise\nrésumé—"),
            F.col("doc_id").cast("string"),
        )
        return quality_suite(_docs(spark, sf_dir), scrub_col=noisy)

    banks = {
        "en": "['the','a','and','of','to']",
        "fr": "['le','la','et','les','des']",
        "es": "['el','los','que','y','las']",
        "de": "['der','die','das','und','nicht']",
        "zh": "['的','是','了','在','我']",
    }
    ratio_exprs = ",\n                 ".join(
        f"CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> list_contains({b}, x))) * 1.0 / len(toks) ELSE 0.0 END AS r_{lang}"
        for lang, b in banks.items()
    )
    case_arms = " ".join(
        f"WHEN r_{lang} >= best AND best > 0.02 THEN '{lang}'" for lang in banks
    )
    sql = rf"""
        WITH t AS (
          SELECT doc_id, text,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[\.,;:!\?\)\(]', '', 'g')) AS punct,
                 length(regexp_replace(trim(text), '\s+', '', 'g')) AS nospace
          FROM documents
        ), r AS (
          SELECT *,
                 {ratio_exprs}
          FROM t
        ), b AS (
          SELECT *, greatest(r_en, r_fr, r_es, r_de, r_zh) AS best FROM r
        ), m AS (
          SELECT *,
                 CASE WHEN len(toks) > 0 THEN nospace * 1.0 / len(toks) ELSE 0.0 END AS mean_wl,
                 CASE WHEN n_chars > 0 THEN punct * 1.0 / n_chars ELSE 0.0 END AS pratio
          FROM b
        )
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
               len(regexp_extract_all(trim(text), '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
               CAST(ceil(nospace / 4.0) AS BIGINT) AS n_subword_est,
               round(r_en, 6) AS en_marker_ratio,
               round(best, 6) AS best_marker_ratio,
               CASE {case_arms} ELSE 'other' END AS lang_pred,
               n_chars AS n_chars_seen,
               round(mean_wl, 6) AS mean_word_len,
               round(r_en, 6) AS stopword_ratio,
               round(pratio, 6) AS punct_ratio,
               round((CASE WHEN len(toks) >= 10 AND mean_wl >= 2.0 AND mean_wl <= 12.0 THEN 0.5 ELSE 0.0 END)
                   + (CASE WHEN r_en > 0.01 THEN 0.3 ELSE 0.0 END)
                   + (CASE WHEN pratio < 0.2 THEN 0.2 ELSE 0.0 END), 2) AS quality_score,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               substring(
                 translate(
                   regexp_replace(text || ' café' || chr(9) || 'noise' || chr(10) || 'résumé—' || CAST(doc_id AS VARCHAR),
                                  '[^\x00-\x7f]', ' ', 'g'),
                   chr(10) || chr(13) || chr(9), '   '),
                 1, 1000) AS scrubbed_text
        FROM m
    """
    return q, sql


def _q_winnowing_sketch():
    """Sketch serialized to a '|'-joined string: the driver's canonicalizer
    cannot hash array cells (round-1 ERR), so the query emits the scalar
    form; the array-valued operator itself is pinned by pytest."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import winnowing_sketch

        out = winnowing_sketch(_docs(spark, sf_dir))
        return out.select(
            "doc_id", F.array_join("sketch", "|").alias("sketch")
        )

    sql = r"""
        WITH words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM documents
        )
        SELECT doc_id,
               coalesce(array_to_string(
                 CASE WHEN len(w) >= 3
                      THEN list_sort(list_distinct([md5(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]))[1:8]
                      ELSE [] END, '|'), '') AS sketch
        FROM words
    """
    return q, sql


# --------------------------------------------------------------------------
# Dedup family.
# --------------------------------------------------------------------------

def _dup_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Guaranteed duplicates: the table unioned with a shifted copy of itself.
    d = _docs(spark, sf_dir).select("doc_id", "text")
    twin = d.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    return d.unionByName(twin)


_DUP_INPUT_SQL = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 10000000 AS doc_id, text FROM documents"
)


def _q_exact_dup_groups():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import exact_duplicates

        return exact_duplicates(_dup_input(spark, sf_dir))

    sql = rf"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               count(*) AS n_docs,
               min(doc_id) AS keeper_doc_id
        FROM ({_DUP_INPUT_SQL})
        GROUP BY 1 HAVING count(*) > 1 ORDER BY fp
    """
    return q, sql


_SHINGLE_SQL = r"""
        WITH words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
          FROM words WHERE len(w) >= 3
        )
"""


def _q_minhash_bands():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import minhash_bands

        return minhash_bands(_docs(spark, sf_dir))

    sql = _SHINGLE_SQL + r"""
        , sig AS (
          SELECT doc_id,
                 [list_aggregate(list_transform(s, x -> md5(CAST(k AS VARCHAR) || ':' || x)), 'min')
                  for k in range(0, 12)] AS mh
          FROM sh
        )
        SELECT doc_id, CAST(b AS INT) AS band_idx,
               md5(array_to_string(mh[b*3+1 : b*3+3], '|')) AS band_hash
        FROM sig, (SELECT unnest(range(0, 4)) AS b)
    """
    return q, sql


def _q_simhash():
    """64-bit SimHash. The numpy bit-vote kernel IS SQL-expressible after
    all — per token the hash is the big-endian first 8 md5 bytes, so the
    oracle unnests (token × bit) pairs, majority-votes each bit, and
    reassembles the signed 64-bit value (two's-complement conversion via
    HUGEINT)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.dedup import simhash

        return simhash(_docs(spark, sf_dir))

    sql = r"""
        WITH toks AS (
          -- empty tokens filtered instead of a trim() gate: DuckDB trim()
          -- strips spaces only, so whitespace-only text would otherwise
          -- contribute a bogus '' token the Python kernel never sees
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                   x -> x <> '')) AS tk
          FROM documents
        ), th AS (
          SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, len(tk) AS n
          FROM toks, unnest(tk) AS u(tok)
        ), bits AS (
          SELECT doc_id, j, sum(CAST((h >> j) & 1 AS INT)) AS ones, any_value(n) AS n
          FROM th, (SELECT unnest(range(0, 64)) AS j)
          GROUP BY doc_id, j
        ), v AS (
          SELECT doc_id,
                 sum(CASE WHEN 2 * ones > n THEN CAST(1::UBIGINT << j AS HUGEINT) ELSE 0 END) AS val
          FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(CASE WHEN v.val >= 9223372036854775808
                                  THEN v.val - 18446744073709551616
                                  ELSE v.val END, 0) AS BIGINT) AS simhash
        FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
        ORDER BY d.doc_id
    """
    return q, sql


def _q_simhash_near_dups():
    """SimHash near-dup pairs (Hamming ≤ 3) via 16-bit-chunk pigeonhole
    banding — candidates shuffle on the banded key only, never all-pairs.
    ``max_bucket`` is the round-2-review skew guard (each band has only
    65,536 possible chunks, so hot chunks are a certainty at crawl scale);
    the oracle applies the IDENTICAL cap, so the row stays exact whether
    or not the cap fires at this scale. Exact oracle: the SQL rebuilds the
    bit votes, bands the UBIGINT value, drops over-cap chunk buckets, and
    bit-counts the XOR (dedup.py:240)."""
    MAX_BUCKET = 50

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.dedup import simhash_near_duplicates

        return simhash_near_duplicates(
            _docs(spark, sf_dir), max_hamming=3, max_bucket=MAX_BUCKET
        )

    sql = rf"""
        WITH toks AS (
          -- empty tokens filtered instead of a trim() gate: DuckDB trim()
          -- strips spaces only, so whitespace-only text would otherwise
          -- contribute a bogus '' token the Python kernel never sees
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                   x -> x <> '')) AS tk
          FROM documents
        ), th AS (
          SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, len(tk) AS n
          FROM toks, unnest(tk) AS u(tok)
        ), bits AS (
          SELECT doc_id, j, sum(CAST((h >> j) & 1 AS INT)) AS ones, any_value(n) AS n
          FROM th, (SELECT unnest(range(0, 64)) AS j)
          GROUP BY doc_id, j
        ), v AS (
          SELECT doc_id,
                 sum(CASE WHEN 2 * ones > n THEN CAST(1::UBIGINT << j AS HUGEINT) ELSE 0 END) AS val
          FROM bits GROUP BY doc_id
        ), sh AS (
          SELECT d.doc_id, CAST(coalesce(v.val, 0) AS UBIGINT) AS u
          FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
        ), bands AS (
          SELECT doc_id, u, b.band_idx,
                 CAST((u >> (16 * b.band_idx)) & 65535 AS INT) AS chunk
          FROM sh, (SELECT unnest(range(0, 4)) AS band_idx) b
        ), ok AS (
          SELECT band_idx, chunk FROM bands
          GROUP BY band_idx, chunk HAVING count(*) <= {MAX_BUCKET}
        ), fb AS (
          SELECT b.* FROM bands b JOIN ok USING (band_idx, chunk)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.u, b.u)) AS INT) AS hamming
        FROM fb a
        JOIN fb b ON a.band_idx = b.band_idx AND a.chunk = b.chunk
                 AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.u, b.u)) <= 3
        ORDER BY doc_a, doc_b
    """
    return q, sql


def _q_minhash_near_dups():
    """Faithful oracle: the SQL replays the WHOLE pipeline — keyed-min-md5
    signatures, band hashes, band-collision candidate pairs, exact shingle
    Jaccard, threshold — rather than shortcutting via fingerprint equality
    (which would miss pairs landing in the [0.99, 1) jaccard window on
    other data)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import minhash_near_duplicates

        return minhash_near_duplicates(_dup_input(spark, sf_dir), threshold=0.99)

    sql = rf"""
        WITH inp AS ({_DUP_INPUT_SQL}),
        words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM inp
        ), sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
          FROM words WHERE len(w) >= 3
        ), sig AS (
          SELECT doc_id,
                 [list_aggregate(list_transform(s, x -> md5(CAST(k AS VARCHAR) || ':' || x)), 'min')
                  for k in range(0, 12)] AS mh
          FROM sh
        ), bands AS (
          SELECT doc_id, b.band_idx,
                 md5(array_to_string(mh[3*b.band_idx + 1 : 3*b.band_idx + 3], '|')) AS band_hash
          FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
        ), cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a
          JOIN bands b ON a.band_idx = b.band_idx
                      AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               round(len(list_intersect(sa.s, sb.s)) * 1.0
                     / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(list_intersect(sa.s, sb.s)) * 1.0
              / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.99
        ORDER BY doc_a, doc_b
    """
    return q, sql


def _q_incremental_near_dups():
    """Persisted incremental near-dup index (operators/dedup_index.py):
    docs with doc_id % 3 != 0 are indexed, the rest arrive as the "new
    dump" and are probed + best-matched by signature agreement. The
    builder materializes the index in a fresh temp dir per call — the
    persisted side-state IS the operator, which is why this lives in the
    pytest-oracle family rather than the self-contained 50-row driver
    gate. The SQL replays the ENTIRE flow (md5 keyed-min signatures,
    banding, index/batch collision arms, agreement estimate, best-match
    ranking) on the same split."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        import hashlib
        import os
        import tempfile

        from pdf2doi_spark.operators.dedup_index import (
            build_minhash_index,
            incremental_near_dups,
        )

        docs = _docs(spark, sf_dir)
        # deterministic per-(input, user) dir, NOT mkdtemp and NOT
        # pid-keyed (ADVICE r4): build overwrites it, so every process —
        # each pytest run, each bench invocation — reuses ONE index tree
        # per input instead of leaking a near-full copy per pid into /tmp
        # on long-lived hosts. The user in the key keeps two users on a
        # shared host from racing one tree; two processes of the SAME
        # user probing the same sf_dir concurrently would race the
        # overwrite — the same documented operating contract as the
        # bench/soak rituals (never run them beside another Spark job).
        tag = hashlib.md5(
            f"{sf_dir}|{os.environ.get('USER', '')}".encode("utf-8")
        ).hexdigest()[:12]
        idx = os.path.join(tempfile.gettempdir(), "pdf2doi_incr_idx_" + tag)
        build_minhash_index(
            spark, docs.filter(F.col("doc_id") % 3 != 0), idx
        )
        out = incremental_near_dups(
            spark, idx, docs.filter(F.col("doc_id") % 3 == 0), threshold=0.5
        )
        return out.orderBy("doc_id")

    sql = _SHINGLE_SQL + r"""
        , sig AS (
          SELECT doc_id,
                 [list_aggregate(list_transform(s, x -> md5(CAST(k AS VARCHAR) || ':' || x)), 'min')
                  for k in range(0, 12)] AS mh
          FROM sh
        ), bands AS (
          SELECT doc_id, (doc_id % 3 = 0) AS is_batch, CAST(b AS INT) AS band_idx,
                 md5(array_to_string(mh[b*3+1 : b*3+3], '|')) AS band_hash
          FROM sig, (SELECT unnest(range(0, 4)) AS b)
        ), coll AS (
          SELECT n.doc_id AS doc_id, o.doc_id AS dup_of, 'index' AS source
          FROM bands n JOIN bands o USING (band_idx, band_hash)
          WHERE n.is_batch AND NOT o.is_batch
          UNION
          SELECT n.doc_id, o.doc_id, 'batch'
          FROM bands n JOIN bands o USING (band_idx, band_hash)
          WHERE n.is_batch AND o.is_batch AND o.doc_id < n.doc_id
        ), est AS (
          SELECT c.doc_id, c.dup_of, c.source,
                 list_sum([CASE WHEN sn.mh[k+1] = so.mh[k+1] THEN 1 ELSE 0 END
                           for k in range(0, 12)]) / 12.0 AS est_jaccard
          FROM coll c
          JOIN sig sn ON sn.doc_id = c.doc_id
          JOIN sig so ON so.doc_id = c.dup_of
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY est_jaccard DESC, source DESC, dup_of ASC) AS rk
          FROM est WHERE est_jaccard >= 0.5
        )
        SELECT doc_id, dup_of, CAST(est_jaccard AS DOUBLE) AS est_jaccard,
               source
        FROM ranked WHERE rk = 1 ORDER BY doc_id
    """
    return q, sql


def _q_minhash_bucket_profile():
    """The LSH skew audit (dedup.py minhash_bucket_profile): bucket-size
    histogram of the band join's shuffle key — what you run BEFORE picking
    a max_bucket cap at crawl scale."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import minhash_bucket_profile

        return minhash_bucket_profile(_dup_input(spark, sf_dir))

    sql = rf"""
        WITH inp AS ({_DUP_INPUT_SQL}),
        words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM inp
        ), sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
          FROM words WHERE len(w) >= 3
        ), sig AS (
          SELECT doc_id,
                 [list_aggregate(list_transform(s, x -> md5(CAST(k AS VARCHAR) || ':' || x)), 'min')
                  for k in range(0, 12)] AS mh
          FROM sh
        ), bands AS (
          SELECT doc_id, b.band_idx,
                 md5(array_to_string(mh[3*b.band_idx + 1 : 3*b.band_idx + 3], '|')) AS band_hash
          FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
        ), sizes AS (
          SELECT band_idx, band_hash, count(*) AS bucket_size
          FROM bands GROUP BY band_idx, band_hash
        )
        SELECT bucket_size, count(*) AS n_buckets
        FROM sizes GROUP BY bucket_size ORDER BY bucket_size DESC
    """
    return q, sql


def _q_dedup_survivors():
    """Survivor set after exact dedup on the doubled input (min doc_id per
    fingerprint; null-text docs all survive — dedup.distinct_documents)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import distinct_documents

        return distinct_documents(_dup_input(spark, sf_dir)).orderBy("doc_id")

    sql = rf"""
        WITH inp AS ({_DUP_INPUT_SQL}),
        fp AS (
          SELECT doc_id,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM inp
        )
        SELECT min(doc_id) AS doc_id, fp FROM fp
        WHERE fp IS NOT NULL GROUP BY fp
        UNION ALL
        SELECT doc_id, fp FROM fp WHERE fp IS NULL
        ORDER BY doc_id
    """
    return q, sql


def _q_exact_dedup():
    """Groups + survivors of exact dedup in ONE driver row (the standalone
    exact_dup_groups / dedup_survivors queries stay pytest-pinned): per
    surviving doc, its fingerprint and the size of the duplicate group it
    survived (1 for unique / null-text docs — NULL fingerprints never join,
    by design: NULL text means content-not-materialized, not identical)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import (
            distinct_documents, exact_duplicates,
        )

        inp = _dup_input(spark, sf_dir)
        surv = distinct_documents(inp)
        groups = exact_duplicates(inp).select("fp", "n_docs")
        return (
            surv.join(groups, "fp", "left")
            .select(
                "doc_id", "fp",
                F.coalesce("n_docs", F.lit(1)).alias("n_copies"),
            )
            .orderBy("doc_id")
        )

    sql = rf"""
        WITH inp AS ({_DUP_INPUT_SQL}),
        fp AS (
          SELECT doc_id,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM inp
        ), surv AS (
          SELECT min(doc_id) AS doc_id, fp FROM fp
          WHERE fp IS NOT NULL GROUP BY fp
          UNION ALL
          SELECT doc_id, fp FROM fp WHERE fp IS NULL
        ), grp AS (
          SELECT fp, count(*) AS n_docs FROM fp
          WHERE fp IS NOT NULL GROUP BY fp HAVING count(*) > 1
        )
        SELECT s.doc_id, s.fp,
               CAST(coalesce(g.n_docs, 1) AS BIGINT) AS n_copies
        FROM surv s LEFT JOIN grp g ON s.fp = g.fp
        ORDER BY s.doc_id
    """
    return q, sql


def _q_dedup_bucket_profile():
    """ONE skew-audit row for all three bucketed candidate-join families —
    MinHash LSH bands, SimHash pigeonhole chunks, and embedding hyperplane
    signatures: (family, bucket_size, n_buckets). This is what you run at
    crawl scale BEFORE picking each family's ``max_bucket`` cap (round-2
    review: SimHash and the embedding signature had no audit)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import (
            minhash_bucket_profile, simhash_bucket_profile,
        )
        from pdf2doi_spark.operators.similarity import (
            embedding_lsh_params, lsh_bucket_profile,
        )

        _ensure_shipped(spark)
        mh = minhash_bucket_profile(_dup_input(spark, sf_dir))
        sh = simhash_bucket_profile(_docs(spark, sf_dir))
        base = _emb(spark, sf_dir).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        nb, ppb = embedding_lsh_params(base.count())
        _log_lsh_params("dedup_bucket_profile", nb, ppb)
        em = lsh_bucket_profile(base, nb, ppb, 64, "v")
        out = (
            mh.select(F.lit("minhash").alias("family"), "bucket_size", "n_buckets")
            .unionByName(sh.select(F.lit("simhash").alias("family"),
                                   "bucket_size", "n_buckets"))
            .unionByName(em.select(F.lit("embedding").alias("family"),
                                   "bucket_size", "n_buckets"))
        )
        return out.orderBy("family", F.desc("bucket_size"))

    emb_params = _emb_oracle_lsh_params()
    if emb_params is None:
        return q, None  # testdata absent: rows-only fallback
    nb, ppb = emb_params
    sql = rf"""
        WITH inp AS ({_DUP_INPUT_SQL}),
        words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM inp
        ), sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
          FROM words WHERE len(w) >= 3
        ), sig AS (
          SELECT doc_id,
                 [list_aggregate(list_transform(s, x -> md5(CAST(k AS VARCHAR) || ':' || x)), 'min')
                  for k in range(0, 12)] AS mh
          FROM sh
        ), mh_bands AS (
          SELECT doc_id, b.band_idx,
                 md5(array_to_string(mh[3*b.band_idx + 1 : 3*b.band_idx + 3], '|')) AS band_hash
          FROM sig, (SELECT unnest(range(0, 4)) AS band_idx) b
        ), mh_sizes AS (
          SELECT band_idx, band_hash, count(*) AS bucket_size
          FROM mh_bands GROUP BY band_idx, band_hash
        ),
        toks AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                   x -> x <> '')) AS tk
          FROM documents
        ), th AS (
          SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, len(tk) AS n
          FROM toks, unnest(tk) AS u(tok)
        ), bits AS (
          SELECT doc_id, j, sum(CAST((h >> j) & 1 AS INT)) AS ones, any_value(n) AS n
          FROM th, (SELECT unnest(range(0, 64)) AS j)
          GROUP BY doc_id, j
        ), v AS (
          SELECT doc_id,
                 sum(CASE WHEN 2 * ones > n THEN CAST(1::UBIGINT << j AS HUGEINT) ELSE 0 END) AS val
          FROM bits GROUP BY doc_id
        ), sh_vals AS (
          SELECT d.doc_id, CAST(coalesce(v.val, 0) AS UBIGINT) AS u
          FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
        ), sh_bands AS (
          SELECT doc_id, b.band_idx,
                 CAST((u >> (16 * b.band_idx)) & 65535 AS INT) AS chunk
          FROM sh_vals, (SELECT unnest(range(0, 4)) AS band_idx) b
        ), sh_sizes AS (
          SELECT band_idx, chunk, count(*) AS bucket_size
          FROM sh_bands GROUP BY band_idx, chunk
        ),
        ebase AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), planes AS (
          SELECT p, d,
                 CASE WHEN ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 2))::INT & 1 = 1
                      THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range(0, {nb * ppb})) AS p), (SELECT unnest(range(0, 64)) AS d)
        ), pl AS (
          SELECT p, list(s ORDER BY d) AS sv FROM planes GROUP BY p
        ), esig AS (
          SELECT a.vec_id, CAST(pl.p // {ppb} AS INT) AS band_idx,
                 string_agg(CASE WHEN list_dot_product(a.v, pl.sv) >= 0
                                 THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS sig
          FROM ebase a, pl
          GROUP BY a.vec_id, pl.p // {ppb}
        ), e_sizes AS (
          SELECT band_idx, sig, count(*) AS bucket_size
          FROM esig GROUP BY band_idx, sig
        ),
        unioned AS (
          SELECT 'minhash' AS family, bucket_size, count(*) AS n_buckets
          FROM mh_sizes GROUP BY bucket_size
          UNION ALL
          SELECT 'simhash' AS family, bucket_size, count(*) AS n_buckets
          FROM sh_sizes GROUP BY bucket_size
          UNION ALL
          SELECT 'embedding' AS family, bucket_size, count(*) AS n_buckets
          FROM e_sizes GROUP BY bucket_size
        )
        SELECT family, CAST(bucket_size AS BIGINT) AS bucket_size,
               CAST(n_buckets AS BIGINT) AS n_buckets
        FROM unioned
        ORDER BY family, bucket_size DESC
    """
    return q, sql


def _q_canonical_urls():
    """URL canonicalization over deterministically messy synthetic urls
    (case-shifted scheme/host, explicit default port, unsorted query,
    fragment) — each doc also gets the variant-collapse count."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.urls import canonical_url

        raw = F.concat(
            F.lit("HTTP://Example"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".ORG:80/Path"), F.col("doc_id").cast("string"),
            F.lit("?b=2&a="), (F.col("doc_id") % 3).cast("string"),
            F.lit("#frag"),
        )
        return _docs(spark, sf_dir).select(
            F.col("doc_id"),
            raw.alias("raw_url"),
            canonical_url(raw).alias("canonical_url"),
        )

    raw_sql = ("'HTTP://Example' || CAST(doc_id % 7 AS VARCHAR) || "
               "'.ORG:80/Path' || CAST(doc_id AS VARCHAR) || "
               "'?b=2&a=' || CAST(doc_id % 3 AS VARCHAR) || '#frag'")
    sql = f"""
        WITH u AS (SELECT doc_id, {raw_sql} AS raw_url FROM documents)
        SELECT doc_id, raw_url,
               lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
               || '://'
               || regexp_replace(
                    lower(regexp_extract(regexp_replace(raw_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^([^/?#]+)', 1)),
                    ':80$', '')
               || CASE WHEN regexp_extract(regexp_replace(raw_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^[^/?#]+([^?#]*)', 1) = ''
                       THEN '/' ELSE regexp_extract(regexp_replace(raw_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^[^/?#]+([^?#]*)', 1) END
               || CASE WHEN regexp_extract(raw_url, '\\?([^#]*)', 1) = '' THEN ''
                       ELSE '?' || array_to_string(list_sort(string_split(regexp_extract(raw_url, '\\?([^#]*)', 1), '&')), '&') END
               AS canonical_url
        FROM u
    """
    return q, sql


def _q_hash_sample():
    """Deterministic stratified hash sampling — membership is a pure
    function of the key, so the sample is identical across engines, runs,
    and cluster sizes (the reproducibility contract seeded Bernoulli
    sampling cannot give)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import stratified_hash_sample

        d = _docs(spark, sf_dir).select("doc_id", "lang")
        return (
            stratified_hash_sample(
                d, {"en": 25.0, "fr": 60.0, "zh": 100.0}
            )
            .orderBy("doc_id")
        )

    sql = """
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100
              < CASE lang WHEN 'en' THEN 25.0 WHEN 'fr' THEN 60.0
                          WHEN 'zh' THEN 100.0 ELSE 0.0 END
        ORDER BY doc_id
    """
    return q, sql


def _q_repetition_signals():
    """Gopher-style repetition quality signals over synthesized multi-line
    docs (every third doc repeats its own head line — known duplicate-line
    fraction)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import repetition_signals

        seg = F.substring(F.col("text"), 1, 60)
        inp = F.concat(
            F.col("text"), F.lit("\n"),
            F.when(F.col("doc_id") % 3 == 0, seg).otherwise(
                F.concat(F.lit("tail "), F.col("doc_id").cast("string"))
            ),
            F.lit("\n"), seg,
        )
        d = _docs(spark, sf_dir).select("doc_id", inp.alias("text"))
        return repetition_signals(d)

    sql = r"""
        WITH inp AS (
          SELECT doc_id,
                 text || chr(10) ||
                 CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 60)
                      ELSE 'tail ' || CAST(doc_id AS VARCHAR) END ||
                 chr(10) || substr(text, 1, 60) AS t
          FROM documents
        ), feats AS (
          SELECT doc_id, t,
                 string_split(t, chr(10)) AS lines,
                 CASE WHEN length(trim(t)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(t)), '\s+') END AS toks
          FROM inp
        ), w AS (
          SELECT doc_id, unnest(toks) AS tok FROM feats
        ), topw AS (
          SELECT doc_id, max(cnt) AS top FROM (
            SELECT doc_id, tok, count(*) AS cnt FROM w GROUP BY 1, 2
          ) GROUP BY 1
        )
        SELECT f.doc_id,
               round(CASE WHEN len(lines) > 0
                          THEN 1 - len(list_distinct(lines)) * 1.0 / len(lines)
                          ELSE 0.0 END, 6) AS dup_line_frac,
               round(CASE WHEN len(toks) > 0
                          THEN coalesce(topw.top, 0) * 1.0 / len(toks)
                          ELSE 0.0 END, 6) AS top_word_frac,
               round(CASE WHEN len(toks) > 0
                          THEN 1 - len(list_distinct(toks)) * 1.0 / len(toks)
                          ELSE 0.0 END, 6) AS dup_word_frac
        FROM feats f LEFT JOIN topw ON f.doc_id = topw.doc_id
        ORDER BY f.doc_id
    """
    return q, sql


def _q_redact_pii():
    """PII scrub over synthetic PII-bearing text (deterministic emails,
    IPs, phone numbers appended per doc) — exact oracle pins the Java↔
    POSIX regex equivalence."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import redact_pii

        inp = F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.org or 192.168."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".1 or call +1 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit(" 999 now."),
        )
        d = _docs(spark, sf_dir).select("doc_id", inp.alias("text"))
        return redact_pii(d)

    sql = r"""
        WITH inp AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.org or 192.168.'
                      || CAST(doc_id % 256 AS VARCHAR) || '.1 or call +1 555-01'
                      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                      || ' 999 now.' AS t
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                 '\+?\d(?:[\- ]?\d){6,13}', '<PHONE>', 'g') AS redacted_text
        FROM inp
    """
    return q, sql


import os as _os

# The driver's oracle scale is fixed at sf0.01; tools/drivercheck.py can
# point elsewhere — the precomputed-values oracle must follow it or every
# other scale becomes a guaranteed false red.
_ORACLE_SF_DIR = _os.environ.get(
    "SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01"
)
_COMPRESSION_ORACLE_CACHE: dict = {}
_EMB_LSH_CACHE: dict = {}


def _emb_oracle_lsh_params():
    """(n_bands, planes_per_band) for the embedding-LSH oracles, derived
    from the oracle-scale embeddings row count via the same
    ``similarity.embedding_lsh_params`` formula the Spark queries apply to
    the live table — identical whenever the check runs at the oracle scale
    (which the driver pins). None when the testdata is absent. Memoized:
    build_queries()/build_oracles() each invoke every builder."""
    if _ORACLE_SF_DIR not in _EMB_LSH_CACHE:
        params = None
        try:
            import duckdb

            from pdf2doi_spark.operators.similarity import embedding_lsh_params

            n = duckdb.connect().execute(
                f"SELECT count(*) FROM read_parquet("
                f"'{_ORACLE_SF_DIR}/embeddings.parquet')"
            ).fetchone()[0]
            params = embedding_lsh_params(int(n))
        except Exception:
            params = None
        _EMB_LSH_CACHE[_ORACLE_SF_DIR] = params
    return _EMB_LSH_CACHE[_ORACLE_SF_DIR]


def _compression_oracle_values() -> str | None:
    """``(VALUES ...) v(doc_id, compression_ratio)`` fragment holding the
    expected zlib ratios for the oracle-scale documents, precomputed by the
    SAME ``zlib_ratio`` function OUTSIDE Spark (plain duckdb read + python
    map). Memoized per process: the precompute zlib-compresses every
    document, and build_queries()/build_oracles() each invoke every
    builder. None when the testdata is absent (rows-only fallback)."""
    if _ORACLE_SF_DIR not in _COMPRESSION_ORACLE_CACHE:
        frag = None
        try:
            import duckdb

            from pdf2doi_spark.operators.quality import zlib_ratio

            rows = duckdb.connect().execute(
                f"SELECT doc_id, text FROM read_parquet("
                f"'{_ORACLE_SF_DIR}/documents.parquet') ORDER BY doc_id"
            ).fetchall()
            vals = ",".join(
                f"({d},CAST({zlib_ratio(t)!r} AS DOUBLE))" for d, t in rows
            )
            frag = f"(VALUES {vals}) v(doc_id, compression_ratio)"
        except Exception:
            frag = None
        _COMPRESSION_ORACLE_CACHE[_ORACLE_SF_DIR] = frag
    return _COMPRESSION_ORACLE_CACHE[_ORACLE_SF_DIR]


def _q_compression_ratio():
    """zlib compression ratio. DuckDB has no zlib, but the expected ratios
    are a pure function of the deterministic synthetic docs — so the oracle
    inlines values precomputed by the SAME ``zlib_ratio`` function (see
    ``_compression_oracle_values``); the join against the live
    ``documents`` view keeps the check honest (wrong scale → row-count
    red, never a false pass). This pins the distributed plumbing (UDF
    batching, row alignment) with exact values instead of round 1's
    rows-only check."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import compression_ratio

        return compression_ratio(_docs(spark, sf_dir))

    vals = _compression_oracle_values()
    sql = None
    if vals is not None:
        sql = (
            "SELECT d.doc_id, v.compression_ratio "
            f"FROM documents d JOIN {vals} ON v.doc_id = d.doc_id"
        )
    return q, sql


def _q_doc_signals():
    """Repetition signals + compression ratio fused into one projection
    (quality.doc_signals) — repetition over the synthesized multi-line
    variant (known duplicate-line fraction, as the standalone query had),
    compression over the plain text (so the precomputed zlib oracle values
    still apply)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import doc_signals

        seg = F.substring(F.col("text"), 1, 60)
        rep_inp = F.concat(
            F.col("text"), F.lit("\n"),
            F.when(F.col("doc_id") % 3 == 0, seg).otherwise(
                F.concat(F.lit("tail "), F.col("doc_id").cast("string"))
            ),
            F.lit("\n"), seg,
        )
        return doc_signals(_docs(spark, sf_dir), rep_col=rep_inp)

    vals = _compression_oracle_values()
    if vals is None:
        return q, None  # testdata absent: rows-only fallback
    sql = rf"""
        WITH inp AS (
          SELECT doc_id,
                 text || chr(10) ||
                 CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 60)
                      ELSE 'tail ' || CAST(doc_id AS VARCHAR) END ||
                 chr(10) || substr(text, 1, 60) AS t
          FROM documents
        ), feats AS (
          SELECT doc_id, t,
                 string_split(t, chr(10)) AS lines,
                 CASE WHEN length(trim(t)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(t)), '\s+') END AS toks
          FROM inp
        ), w AS (
          SELECT doc_id, unnest(toks) AS tok FROM feats
        ), topw AS (
          SELECT doc_id, max(cnt) AS top FROM (
            SELECT doc_id, tok, count(*) AS cnt FROM w GROUP BY 1, 2
          ) GROUP BY 1
        )
        SELECT f.doc_id,
               round(CASE WHEN len(lines) > 0
                          THEN 1 - len(list_distinct(lines)) * 1.0 / len(lines)
                          ELSE 0.0 END, 6) AS dup_line_frac,
               round(CASE WHEN len(toks) > 0
                          THEN coalesce(topw.top, 0) * 1.0 / len(toks)
                          ELSE 0.0 END, 6) AS top_word_frac,
               round(CASE WHEN len(toks) > 0
                          THEN 1 - len(list_distinct(toks)) * 1.0 / len(toks)
                          ELSE 0.0 END, 6) AS dup_word_frac,
               v.compression_ratio
        FROM feats f
        LEFT JOIN topw ON f.doc_id = topw.doc_id
        JOIN {vals} ON v.doc_id = f.doc_id
        ORDER BY f.doc_id
    """
    return q, sql


def _q_corpus_pipeline():
    """End-to-end training-corpus pipeline in ONE fused plan: quality
    features (narrow map) → quality gate → exact dedup (first doc per
    fingerprint via one window shuffle on fp) → per-language corpus stats
    (one agg shuffle). The shape a 100 TB pre-training data job actually
    runs; expressions mirror quality_score/fingerprint exactly so the plan
    is a single select + window + agg rather than operator-to-operator
    joins."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        from pdf2doi_spark.operators.quality import EN_MARKERS, PUNCT_CLASS

        # The score feeds a FILTER, and higher-order-function expressions
        # inside a Filter evaluate ~60x slower than in a projection on this
        # build (see dedup.has_min_words) — so every component here is a
        # codegen-able scalar form: token count = size(split) on the
        # space-collapsed text, stopword hits = regexp_count with word
        # boundaries (provably equal to counting matching tokens).
        t = F.col("text")
        norm = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
        n_tok = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
            F.size(F.split(norm, " "))
        )
        n_chars = F.length(t)
        punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
        stop_re = "(?:^| )(?:" + "|".join(EN_MARKERS) + ")(?= |$)"
        stop_ratio = F.when(
            n_tok > 0, F.regexp_count(norm, F.lit(stop_re)) / n_tok
        ).otherwise(F.lit(0.0))
        mean_wl = F.when(
            n_tok > 0,
            F.length(F.regexp_replace(F.trim(t), r"\s+", "")) / n_tok,
        ).otherwise(F.lit(0.0))
        punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
        score = (
            F.when((n_tok >= 10) & (mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(0.5)).otherwise(F.lit(0.0))
            + F.when(stop_ratio > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
            + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        )
        fp = F.md5(norm)

        scored = _docs(spark, sf_dir).select(
            "doc_id", "lang",
            n_tok.alias("n_tokens"),
            F.round(score, 2).alias("score"),
            fp.alias("fp"),
        ).filter((F.round(score, 2) >= 0.7) & (F.col("n_tokens") >= 20))
        w = Window.partitionBy("fp").orderBy("doc_id")
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.round(F.avg("score"), 6).alias("avg_score"),
            )
            .orderBy("lang")
        )

    sql = r"""
        WITH t AS (
          SELECT doc_id, lang, text,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[\.,;:!\?\)\(]', '', 'g')) AS punct,
                 length(regexp_replace(trim(text), '\s+', '', 'g')) AS nospace,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM documents
        ), m AS (
          SELECT doc_id, lang, fp, len(toks) AS n_tokens,
                 round((CASE WHEN len(toks) >= 10
                              AND (nospace * 1.0 / len(toks)) >= 2.0
                              AND (nospace * 1.0 / len(toks)) <= 12.0 THEN 0.5 ELSE 0.0 END)
                     + (CASE WHEN len(toks) > 0 AND
                             len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) * 1.0 / len(toks) > 0.01
                        THEN 0.3 ELSE 0.0 END)
                     + (CASE WHEN n_chars > 0 AND punct * 1.0 / n_chars < 0.2 THEN 0.2 ELSE 0.0 END), 2) AS score
          FROM t WHERE len(toks) > 0
        ), kept AS (
          SELECT * FROM m WHERE score >= 0.7 AND n_tokens >= 20
        ), dedup AS (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM kept
        )
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               round(avg(score), 6) AS avg_score
        FROM dedup WHERE rn = 1
        GROUP BY lang ORDER BY lang
    """
    return q, sql


def _q_domain_profile():
    """Grouped-map applyInPandas percentile profile (per-source text
    lengths): numpy's linear-interpolation percentile equals DuckDB's
    quantile_cont, giving the grouped-map plumbing an exact oracle."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.quality import grouped_percentile_profile

        d = _docs(spark, sf_dir).select(
            "source", F.length("text").alias("n_chars_text")
        )
        return grouped_percentile_profile(d, "source", "n_chars_text")

    sql = """
        SELECT source,
               count(*) AS n_rows,
               round(quantile_cont(CAST(length(text) AS DOUBLE), 0.50), 5) AS p50,
               round(quantile_cont(CAST(length(text) AS DOUBLE), 0.95), 5) AS p95
        FROM documents
        GROUP BY source ORDER BY source
    """
    return q, sql


def _q_decontaminate():
    """Eval-set decontamination: docs 0..9 play the benchmark; every
    doc_id % 50 == 0 training doc carries an exact copy of eval doc
    (doc_id/50 % 10)'s text (known full-overlap contamination), the rest
    only collide by chance."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import contamination_overlap

        d = _docs(spark, sf_dir).select("doc_id", "text")
        evalset = d.filter(F.col("doc_id") < 10)
        eval_texts = evalset.select(
            F.col("doc_id").alias("_eid"), F.col("text").alias("_etext")
        )
        train = (
            d.filter(F.col("doc_id") >= 10)
            .withColumn("_eid", F.floor(F.col("doc_id") / 50).cast("long") % 10)
            .join(F.broadcast(eval_texts), "_eid", "left")
            .select(
                "doc_id",
                F.when(F.col("doc_id") % 50 == 0, F.col("_etext"))
                .otherwise(F.col("text")).alias("text"),
            )
        )
        return contamination_overlap(train, evalset, min_overlap_frac=0.5)

    sql = r"""
        WITH evalset AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 10
        ), train AS (
          SELECT d.doc_id,
                 CASE WHEN d.doc_id % 50 = 0 THEN e.text ELSE d.text END AS text
          FROM documents d
          LEFT JOIN evalset e ON e.doc_id = CAST(floor(d.doc_id / 50) AS BIGINT) % 10
          WHERE d.doc_id >= 10
        ), tsh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
          FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM train)
          WHERE len(w) >= 3
        ), esh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)]) AS s
          FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM evalset)
          WHERE len(w) >= 3
        ), tp AS (
          SELECT doc_id AS train_doc_id, unnest(s) AS g FROM tsh
        ), ep AS (
          SELECT doc_id AS eval_doc_id, len(s) AS n_eval_sh, unnest(s) AS g FROM esh
        )
        SELECT train_doc_id, eval_doc_id,
               round(count(*) * 1.0 / n_eval_sh, 6) AS overlap_frac
        FROM tp JOIN ep USING (g)
        GROUP BY train_doc_id, eval_doc_id, n_eval_sh
        HAVING round(count(*) * 1.0 / n_eval_sh, 6) >= 0.5
        ORDER BY train_doc_id, eval_doc_id
    """
    return q, sql


def _q_line_dedup():
    """Global line dedup over synthesized multi-line docs where every doc
    carries the same boilerplate line: it must survive only in the first
    document (and every doc keeps its own unique lines)."""
    BOILER = "subscribe to our newsletter for weekly updates and offers"

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import global_line_dedup

        inp = F.concat(
            F.substring(F.col("text"), 1, 80), F.lit("\n"),
            F.lit(BOILER), F.lit("\n"),
            F.lit("unique line for document "), F.col("doc_id").cast("string"),
            F.lit(" with enough characters"),
        )
        d = _docs(spark, sf_dir).select("doc_id", inp.alias("text"))
        return global_line_dedup(d)

    sql = rf"""
        WITH inp AS (
          SELECT doc_id,
                 substr(text, 1, 80) || chr(10) ||
                 '{BOILER}' || chr(10) ||
                 'unique line for document ' || CAST(doc_id AS VARCHAR)
                 || ' with enough characters' AS t
          FROM documents
        ), lines AS (
          SELECT doc_id,
                 generate_subscripts(string_split(t, chr(10)), 1) - 1 AS pos,
                 unnest(string_split(t, chr(10))) AS line
          FROM inp
        ), keyed AS (
          SELECT doc_id, pos, line,
                 CASE WHEN length(trim(line)) >= 20
                      THEN md5(trim(lower(line)))
                      ELSE CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)
                 END AS fp
          FROM lines
        ), kept AS (
          SELECT doc_id, pos, line FROM (
            SELECT doc_id, pos, line,
                   row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
            FROM keyed
          ) WHERE rn = 1
        )
        , rebuilt AS (
          SELECT doc_id,
                 array_to_string(list(line ORDER BY pos), chr(10)) AS deduped_text
          FROM kept GROUP BY doc_id
        )
        SELECT i.doc_id, coalesce(r.deduped_text, '') AS deduped_text
        FROM inp i LEFT JOIN rebuilt r ON i.doc_id = r.doc_id
        ORDER BY i.doc_id
    """
    return q, sql


def _q_near_dup_clusters():
    """The dedup loop closed end-to-end: MinHash-LSH candidates → exact
    Jaccard verify (threshold 0.99) → connected components → one cluster id
    per duplicated doc. On the doubled input the verified pairs are the
    fingerprint-collision graph, so the oracle is a recursive CTE over that
    closed-form edge set."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import (
            connected_components, minhash_near_duplicates,
        )

        pairs = minhash_near_duplicates(_dup_input(spark, sf_dir), threshold=0.99)
        return connected_components(
            pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        )

    sql = rf"""
        WITH RECURSIVE inp AS ({_DUP_INPUT_SQL}),
        fp AS (
          SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
                 len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS nw
          FROM inp
        ),
        edges AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
          WHERE a.nw >= 3
        ),
        sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        reach(node, r) AS (
          SELECT DISTINCT a AS node, a AS r FROM sym
          UNION
          SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
        )
        SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node
    """
    return q, sql


def _q_sketch_overlap():
    """Sketch-posting-list candidate pairs on the doubled dup input: every
    doc shares its full sketch with its twin, so expected pairs are
    closed-form; unrelated docs share elements only on text collision."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import sketch_overlap_pairs

        return sketch_overlap_pairs(_dup_input(spark, sf_dir), min_shared=4)

    sql = r"""
        WITH inp AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 10000000 AS doc_id, text FROM documents
        ), words AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
          FROM inp
        ), sk AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= 3
                      THEN list_sort(list_distinct([md5(array_to_string(w[i:i+2], ' ')) for i in range(1, len(w) - 1)]))[1:8]
                      ELSE [] END AS sketch
          FROM words
        ), posts AS (
          SELECT doc_id, unnest(sketch) AS h FROM sk
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM posts a JOIN posts b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 4
        ORDER BY doc_a, doc_b
    """
    return q, sql


def _q_dup_components_star():
    """Same candidate graph and recursive-CTE oracle as ``dup_components``,
    computed with the large-star/small-star alternating algorithm
    (O(log diameter) rounds) — both variants must reach the identical
    min-label fixpoint."""
    base_q, sql = _q_dup_components()

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import connected_components_star

        d = _docs(spark, sf_dir).select("doc_id")
        ids = d.select(F.col("doc_id").alias("b"))
        chain = (
            d.filter(F.col("doc_id") % 5 < 2)
            .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
            .join(ids, "b")
        )
        longr = (
            d.filter(F.col("doc_id") % 11 == 0)
            .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 7).alias("b"))
            .join(ids, "b")
        )
        return connected_components_star(chain.unionByName(longr))

    return q, sql


def _q_media_features():
    """Multimodal plumbing under the driver gate: a media table derived
    from documents (payload = utf-8 bytes of text, kind by doc_id%3) runs
    the REAL batched mapInPandas feature extractor (multimodal.py:78);
    the fake_decode features are md5-byte-derived, so the oracle rebuilds
    them in SQL. Feature values are float32(byte/255); comparing them
    through the lossless inverse transform round(val*255) pins every value
    exactly without tripping the 3-of-256 byte cases where float32 and
    double round differently at 6 dp."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.multimodal import extract_features

        kind = (
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
        )
        media = _docs(spark, sf_dir).select(
            F.col("doc_id").alias("media_id"),
            kind.alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
        )
        feats = extract_features(media)
        return feats.select(
            "media_id", "kind", "n_bytes",
            F.posexplode("feature").alias("dim", "val"),
        ).select(
            "media_id", "kind", "n_bytes", "dim",
            F.round(F.col("val").cast("double") * 255).cast("int").alias("feat_byte"),
        ).orderBy("media_id", "dim")

    sql = """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                      ELSE 'video' END AS kind,
                 md5(text) AS hx,  -- DuckDB md5(VARCHAR) hashes the utf-8 bytes = the payload
                 CAST(octet_length(encode(text)) AS INT) AS n_bytes
          FROM documents
        )
        SELECT media_id, kind, n_bytes, CAST(d.dim AS INT) AS dim,
               ('0x' || substr(hx, 2 * d.dim + 1, 2))::INT AS feat_byte
        FROM m, (SELECT unnest(range(0, 16)) AS dim) d
        ORDER BY media_id, dim
    """
    return q, sql


def _q_frame_samples():
    """Video frame-sampling plan (multimodal.py:153): metadata-only native
    expressions compute the per-video sample timestamps — exploded to
    scalar rows for the driver compare."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.multimodal import frame_sample_plan

        media = _docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 2).select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            (F.lit(1000) + F.col("doc_id") * 10).cast("int").alias("duration_ms"),
        )
        plan = frame_sample_plan(media, every_ms=500)
        return plan.select(
            "media_id", F.posexplode("sample_ts_ms").alias("frame_idx", "ts_ms")
        ).orderBy("media_id", "frame_idx")

    sql = """
        WITH v AS (
          SELECT doc_id AS media_id, 1000 + doc_id * 10 AS duration_ms
          FROM documents WHERE doc_id % 3 = 2
        )
        SELECT media_id, CAST(f.i AS INT) AS frame_idx,
               CAST(f.i * 500 AS INT) AS ts_ms
        FROM v, LATERAL (SELECT unnest(range(0, duration_ms // 500 + 1)) AS i) f
        ORDER BY media_id, frame_idx
    """
    return q, sql


def _q_dup_components():
    """Connected components over a deterministic near-dup candidate graph
    (chain edges doc→doc+1 where doc%5<2, long-range edges doc→doc+7 where
    doc%11==0 — components that genuinely merge across edge kinds). Spark:
    iterative min-label propagation; oracle: DuckDB recursive CTE computing
    min reachable id — the same fixpoint by definition."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import connected_components

        d = _docs(spark, sf_dir).select("doc_id")
        ids = d.select(F.col("doc_id").alias("b"))
        chain = (
            d.filter(F.col("doc_id") % 5 < 2)
            .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
            .join(ids, "b")
        )
        longr = (
            d.filter(F.col("doc_id") % 11 == 0)
            .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 7).alias("b"))
            .join(ids, "b")
        )
        return connected_components(chain.unionByName(longr))

    sql = """
        WITH RECURSIVE d AS (SELECT doc_id FROM documents),
        edges AS (
          SELECT doc_id AS a, doc_id + 1 AS b FROM d
          WHERE doc_id % 5 < 2 AND doc_id + 1 IN (SELECT doc_id FROM d)
          UNION ALL
          SELECT doc_id AS a, doc_id + 7 AS b FROM d
          WHERE doc_id % 11 = 0 AND doc_id + 7 IN (SELECT doc_id FROM d)
        ),
        sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
        reach(node, r) AS (
          SELECT DISTINCT a AS node, a AS r FROM sym
          UNION
          SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
        )
        SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node
    """
    return q, sql


# --------------------------------------------------------------------------
# Similarity family.
# --------------------------------------------------------------------------

def _q_cosine_topk():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.similarity import cosine_topk

        e = _emb(spark, sf_dir)
        qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
        return cosine_topk(e, qvec, k=10)

    sql = """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
               round(
                 list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(q.qv, x -> CAST(x AS DOUBLE)))
                 / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                          list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                    * sqrt(list_dot_product(list_transform(q.qv, x -> CAST(x AS DOUBLE)),
                                            list_transform(q.qv, x -> CAST(x AS DOUBLE))))),
                 6) AS cosine
        FROM embeddings e, q
        ORDER BY cosine DESC, e.vec_id
        LIMIT 10
    """
    return q, sql


def _q_ann_lsh_topk():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.similarity import ann_lsh_topk

        e = _emb(spark, sf_dir)
        qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
        return ann_lsh_topk(e, qvec, k=10, n_planes=6)

    # The hash-derived hyperplanes are md5-deterministic, so even this is
    # exactly SQL-expressible: rebuild the ±1 planes from md5 parity, sign
    # the projections into signature strings, bucket-match, cosine-rerank.
    sql = r"""
        WITH planes AS (
          SELECT p, d,
                 CASE WHEN ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 2))::INT & 1 = 1
                      THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range(0, 6)) AS p), (SELECT unnest(range(0, 64)) AS d)
        ), pl AS (
          -- ordered plane vectors -> ORDERED list_dot_product projection,
          -- matching Spark's left-to-right fold (see embedding_near_dups)
          SELECT p, list(s ORDER BY d) AS sv FROM planes GROUP BY p
        ), sig AS (
          SELECT e.vec_id,
                 string_agg(CASE WHEN list_dot_product(
                                     list_transform(e.embedding, x -> CAST(x AS DOUBLE)), pl.sv) >= 0
                                 THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS lsh_sig
          FROM embeddings e, pl
          GROUP BY e.vec_id
        ), q AS (
          SELECT s.lsh_sig AS qsig,
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM sig s JOIN embeddings e ON e.vec_id = s.vec_id
          WHERE e.vec_id = 0
        )
        SELECT e.vec_id,
               round(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv)
                     / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                              list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
        FROM embeddings e JOIN sig s ON s.vec_id = e.vec_id, q
        WHERE s.lsh_sig = q.qsig
        ORDER BY cosine DESC, e.vec_id
        LIMIT 10
    """
    return q, sql


_CENTROID_CTE = """
        e AS (
          SELECT label,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding) AS val
          FROM embeddings
        ),
        cents AS (
          SELECT label, list(round(mean_val, 6) ORDER BY pos) AS c
          FROM (
            SELECT label, pos, avg(CAST(val AS DOUBLE)) AS mean_val
            FROM e GROUP BY label, pos
          )
          GROUP BY label
        ),
        q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0
        )
"""


def _q_ann_ivf_topk():
    """IVF ANN: nearest-centroid cell assignment (map-only, inlined
    codebook), probe the 3 cells nearest the query, exact cosine rerank
    within them. Exact DuckDB oracle: every step (centroid means, rounded
    cosines, DESC/label tie-breaks) is replicated in SQL."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.similarity import ann_ivf_topk

        e = _emb(spark, sf_dir)
        qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
        return ann_ivf_topk(e, qvec, k=10, nprobe=3)

    sql = f"""
        WITH {_CENTROID_CTE},
        probe AS (
          SELECT c.label FROM cents c, q
          ORDER BY round(list_dot_product(c.c, q.qv)
                         / (sqrt(list_dot_product(c.c, c.c))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                   c.label
          LIMIT 3
        ),
        v AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        assign AS (
          SELECT vec_id, v, label FROM (
            SELECT v.vec_id, v.v, c.label,
                   row_number() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY round(list_dot_product(v.v, c.c)
                                    / (sqrt(list_dot_product(v.v, v.v))
                                       * sqrt(list_dot_product(c.c, c.c))), 6) DESC,
                              c.label DESC
                   ) AS rn
            FROM v, cents c
          ) WHERE rn = 1
        )
        SELECT a.vec_id,
               round(list_dot_product(a.v, q.qv)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine
        FROM assign a, q
        WHERE a.label IN (SELECT label FROM probe)
        ORDER BY cosine DESC, a.vec_id
        LIMIT 10
    """
    return q, sql


def _q_length_percentiles():
    """Exact grouped quantiles of document length per language — the
    statistical profile a quality-threshold pass needs before filtering at
    scale (one shuffle on the tiny lang key; Spark's exact ``percentile``
    and DuckDB's ``quantile_cont`` share linear-interpolation semantics)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir).select(
            "lang", F.length("text").alias("len")
        )
        return (
            d.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                *[
                    F.round(F.percentile(F.col("len"), F.lit(p)), 5).alias(a)
                    for p, a in ((0.25, "p25"), (0.5, "p50"),
                                 (0.75, "p75"), (0.95, "p95"))
                ],
            )
            .orderBy("lang")
        )

    sql = """
        SELECT lang,
               count(*) AS n_docs,
               round(quantile_cont(length(text), 0.25), 5) AS p25,
               round(quantile_cont(length(text), 0.50), 5) AS p50,
               round(quantile_cont(length(text), 0.75), 5) AS p75,
               round(quantile_cont(length(text), 0.95), 5) AS p95
        FROM documents
        GROUP BY lang ORDER BY lang
    """
    return q, sql


def _q_approx_stats():
    """Sketch operators under an EXACT driver oracle (round-2 directive —
    this row was the gate's one ``no_oracle``): the query computes BOTH the
    exact per-source statistics (countDistinct, interpolated median) and
    the sketch estimates (``approx_count_distinct`` HLL,
    ``percentile_approx`` t-digest-style) in one aggregation pass, then
    emits the exact values plus boolean within-tolerance verdicts for the
    sketches (HLL within 15%+1 of exact; approx median inside the discrete
    sketch p25–p75 band — see the inline rank-separation note for why an
    interpolated exact band would falsely flag tiny groups). A healthy
    sketch makes every verdict TRUE — which is
    what the oracle pins — so the driver hash now checks the exact stats
    AND that the sketches work; the raw estimates stay tolerance-pinned by
    pytest via ``approx_stats_sketch``."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        agg = d.groupBy("source").agg(
            F.count_distinct("text").alias("n_distinct_texts"),
            F.count_distinct("doc_id").alias("n_distinct_ids"),
            F.round(F.expr("percentile(length(text), 0.5)"), 5).alias("median_len"),
            F.approx_count_distinct("text").alias("_hll_t"),
            F.approx_count_distinct("doc_id").alias("_hll_i"),
            F.percentile_approx(
                F.length("text"), F.lit(0.5), F.lit(1000)
            ).cast("double").alias("_ap_med"),
            # Band bounds are DISCRETE sketch quantiles at the same
            # accuracy, not interpolated exact percentiles: percentile_approx
            # returns an actual data value whose rank error is ≤ n/accuracy,
            # so for a 2-doc group the returned median is one of the two
            # lengths while interpolated p25/p75 sit strictly between them —
            # the old band declared a healthy sketch broken (round-3
            # review). With all three quantiles from the same algorithm the
            # verdict is spec-true by rank separation: the median's rank
            # interval [n/2−n/1000, n/2+n/1000] lies inside [n/4+n/1000,
            # 3n/4−n/1000] for every n, and in the ≤1000-row regime all
            # three are exact discrete quantiles, monotone in p.
            F.percentile_approx(
                F.length("text"), F.lit(0.25), F.lit(1000)
            ).cast("double").alias("_p25"),
            F.percentile_approx(
                F.length("text"), F.lit(0.75), F.lit(1000)
            ).cast("double").alias("_p75"),
        )
        return agg.select(
            "source", "n_distinct_texts", "n_distinct_ids", "median_len",
            (F.abs(F.col("_hll_t") - F.col("n_distinct_texts"))
             <= 0.15 * F.col("n_distinct_texts") + 1).alias("hll_texts_ok"),
            (F.abs(F.col("_hll_i") - F.col("n_distinct_ids"))
             <= 0.15 * F.col("n_distinct_ids") + 1).alias("hll_ids_ok"),
            ((F.col("_ap_med") >= F.col("_p25"))
             & (F.col("_ap_med") <= F.col("_p75"))).alias("approx_median_ok"),
        ).orderBy("source")

    sql = """
        SELECT source,
               count(DISTINCT text) AS n_distinct_texts,
               count(DISTINCT doc_id) AS n_distinct_ids,
               round(quantile_cont(length(text), 0.5), 5) AS median_len,
               TRUE AS hll_texts_ok,
               TRUE AS hll_ids_ok,
               TRUE AS approx_median_ok
        FROM documents GROUP BY source ORDER BY source
    """
    return q, sql


def _q_approx_stats_sketch():
    """The raw sketch estimates (HLL distinct counts, approx percentile) —
    engine-specific values, so no SQL oracle; pinned within tolerance of
    exact by tests/test_operators.py::test_approx_stats_tolerance and
    value-checked indirectly through ``approx_stats``'s verdict booleans.
    Fixed-size sketch state, map-side mergeable — THE 100 TB statistics
    shape."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        return (
            d.groupBy("source")
            .agg(
                F.approx_count_distinct("text").alias("approx_distinct_texts"),
                F.approx_count_distinct("doc_id").alias("approx_distinct_ids"),
                F.round(
                    F.percentile_approx(F.length("text"), F.lit(0.5), F.lit(1000)),
                    5,
                ).alias("approx_median_len"),
            )
            .orderBy("source")
        )

    return q, None  # sketch estimates are engine-specific: rows-only check


def _q_label_centroids():
    """Centroids in exploded (label, pos, centroid_val) form: scalar doubles
    per row, which the driver's canonicalizer can hash (the array-per-label
    shape crashed it in round 1). Same aggregation, same rounding."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.similarity import pairwise_label_centroids

        cents = pairwise_label_centroids(_emb(spark, sf_dir))
        return cents.select(
            "label", F.posexplode("centroid").alias("pos", "centroid_val")
        ).orderBy("label", "pos")

    sql = """
        WITH e AS (
          SELECT label,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding) AS val
          FROM embeddings
        )
        SELECT label, CAST(pos AS INTEGER) AS pos,
               round(avg(CAST(val AS DOUBLE)), 6) AS centroid_val
        FROM e GROUP BY label, pos
        ORDER BY label, pos
    """
    return q, sql


def _q_ngram_jaccard():
    """Exact n-gram Jaccard on deterministic candidate pairs (doc, doc+1):
    pins the shingle/set algebra without the LSH layer."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import has_min_words, jaccard_pairs

        # both pair members need >=3 words, mirroring the oracle's sh CTE —
        # otherwise a short doc emits a jaccard=0.0 row the oracle's
        # filtered join never produces
        d = _docs(spark, sf_dir).select("doc_id", "text").filter(
            has_min_words(F.col("text"))
        )
        pairs = (
            d.select(F.col("doc_id").alias("doc_a"))
            .withColumn("doc_b", F.col("doc_a") + 1)
            .join(d.select(F.col("doc_id").alias("doc_b")), "doc_b")
        )
        return jaccard_pairs(d, pairs.select("doc_a", "doc_b"), threshold=0.0)

    sql = rf"""
        {_SHINGLE_SQL}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.s, b.s)) * 1.0
                     / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """
    return q, sql


def _emb_near_dups_spark(base: DataFrame, n_bands: int, ppb: int,
                         dim: int = 64, twin_off: int = 10_000_000,
                         threshold: float = 0.95) -> DataFrame:
    """The parameterized Spark plan behind ``embedding_near_dups``:
    plant twins, band the hyperplane signatures, candidate equi-join on
    (band_idx, sig), exact-cosine verify. Split out from the builder so
    the WIDE multi-band regime (n_bands > 1, which the formula only
    selects above 2^16 vectors) is pytest-exercisable against the same
    oracle SQL at small scale (tests/test_operators.py::
    test_embedding_near_dups_multiband_oracle)."""
    from pdf2doi_spark.operators.similarity import (
        _dot, _norm, banded_lsh_signatures,
    )

    twins = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + twin_off).alias("vec_id"),
        F.transform(
            "v",
            lambda x, i: x * F.when(i % 2 == 0, F.lit(1.02)).otherwise(F.lit(0.98)),
        ).alias("v"),
    )
    aug = base.unionByName(twins)
    bands = banded_lsh_signatures(aug, n_bands, ppb, dim, "v")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va = aug.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = aug.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (_norm(F.col("va")) * _norm(F.col("vb"))), 6
    )
    return (
        cand.join(va, "vec_a").join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def _emb_near_dups_sql(nb: int, ppb: int, dim: int = 64,
                       twin_off: int = 10_000_000,
                       threshold: float = 0.95) -> str:
    """The parameterized DuckDB oracle for ``_emb_near_dups_spark`` (same
    params => same result set)."""
    return f"""
        WITH base AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ), aug AS (
          SELECT vec_id, v FROM base
          UNION ALL
          SELECT vec_id + {twin_off} AS vec_id,
                 [v[i] * (CASE WHEN (i-1)%2 = 0 THEN 1.02 ELSE 0.98 END)
                  for i in range(1, len(v)+1)] AS v
          FROM base WHERE vec_id % 10 = 0
        ), planes AS (
          SELECT p, d,
                 CASE WHEN ('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 2))::INT & 1 = 1
                      THEN 1.0 ELSE -1.0 END AS s
          FROM (SELECT unnest(range(0, {nb * ppb})) AS p), (SELECT unnest(range(0, {dim})) AS d)
        ), pl AS (
          -- ordered plane vectors: the projection below is an ORDERED
          -- list_dot_product, matching Spark's left-to-right fold exactly
          -- (an unordered GROUP BY sum could land a near-zero projection on
          -- the other side of >= 0 and flip a signature bit)
          SELECT p, list(s ORDER BY d) AS sv FROM planes GROUP BY p
        ), sig AS (
          SELECT a.vec_id, CAST(pl.p // {ppb} AS INT) AS band_idx,
                 string_agg(CASE WHEN list_dot_product(a.v, pl.sv) >= 0
                                 THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS sig
          FROM aug a, pl
          GROUP BY a.vec_id, pl.p // {ppb}
        ), cand AS (
          SELECT DISTINCT sa.vec_id AS vec_a, sb.vec_id AS vec_b
          FROM sig sa
          JOIN sig sb ON sb.band_idx = sa.band_idx AND sb.sig = sa.sig
                     AND sb.vec_id > sa.vec_id
        ), scored AS (
          SELECT c.vec_a, c.vec_b,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
          FROM cand c
          JOIN aug a ON a.vec_id = c.vec_a
          JOIN aug b ON b.vec_id = c.vec_b
        )
        SELECT vec_a, vec_b, cosine FROM scored
        WHERE cosine >= {threshold}
        ORDER BY vec_a, vec_b
    """


def _q_embedding_near_dups():
    """Embedding-cosine near-duplicate pairs, MinHash-shaped at scale:
    hyperplane-signature buckets generate candidates (equi-join on
    (band_idx, sig) — never an all-pairs or per-label quadratic join),
    exact cosine verifies, threshold filters.

    Round-2 review fix: the signature WIDTH now scales with corpus size
    via ``similarity.embedding_lsh_params`` — log2(n)-scaled planes keep
    expected bucket occupancy ~2^8 per band at any scale (the fixed
    8-plane/256-bucket signature went O(bucket²) at 10^12 vectors), and
    past 8 planes the scheme goes 4-band (candidate on ANY band match) to
    restore pair recall. At the driver scale the formula yields the same
    (1 band, 8 planes) signature round 2 ran — the WIDE regime is pinned
    separately against the same parameterized oracle by
    tests/test_operators.py::test_embedding_near_dups_multiband_oracle —
    and the oracle derives the SAME params from the oracle-dir row count.
    Bucket sizes are audited by ``dedup_bucket_profile``.

    Near-dups are PLANTED deterministically so the check is non-vacuous
    (round 1 compared 0 rows to 0 rows): every 10th vector gets a twin
    scaled ±2% on alternating dims — cosine ≥ 0.999 by construction, and
    both engines build the twin with identical double arithmetic."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.similarity import embedding_lsh_params

        base = _emb(spark, sf_dir).select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        n_bands, ppb = embedding_lsh_params(base.count())
        _log_lsh_params("embedding_near_dups", n_bands, ppb)
        return _emb_near_dups_spark(base, n_bands, ppb)

    emb_params = _emb_oracle_lsh_params()
    if emb_params is None:
        return q, None  # testdata absent: rows-only fallback
    nb, ppb = emb_params
    return q, _emb_near_dups_sql(nb, ppb)


def _q_sessionize():
    """Gap-based sessionization over the events stream (30-minute idle gap)
    — lag window + running session counter, the classic stateful-analytics
    shape (fully native; one shuffle on user_id)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        w = Window.partitionBy("user_id").orderBy("ts")
        # Gap in MICROSECONDS directly on the TIMESTAMP_NTZ values:
        # fractional-second exact (a whole-seconds cast truncates — a gap in
        # (1800, 1801) would split sessions differently from a
        # fractional-second engine) AND timezone-free (routing through
        # TIMESTAMP would absorb/add an hour across a DST transition on a
        # non-UTC session zone, silently diverging from the oracle's
        # tz-free epoch_us).
        gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
        marked = e.select(
            "user_id", "ts",
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("is_new"),
        )
        sess = marked.withColumn(
            "session_idx",
            F.sum("is_new").over(
                Window.partitionBy("user_id").orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        return (
            sess.groupBy("user_id", "session_idx")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
            .orderBy("user_id", "session_idx")
        )

    sql = """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
        ), sess AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM marked
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM sess GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """
    return q, sql


def _q_metrics_cube():
    """Grouping-sets coverage: CUBE(lang, source) document counts — the
    multi-dimensional rollup shape for extraction audit dashboards."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        return (
            d.cube("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("lang", "source")
        )

    sql = """
        SELECT lang, source, count(*) AS n_docs
        FROM documents GROUP BY CUBE (lang, source)
        ORDER BY lang, source
    """
    return q, sql


def _q_distinct_counts():
    """Distinct aggregation: per-source distinct fingerprints + doc counts
    (two-pass distinct agg, map-side partial)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import norm_text

        d = _docs(spark, sf_dir)
        fp = F.md5(norm_text(F.col("text")))  # THE shared fingerprint contract
        return (
            d.select("source", fp.alias("fp"))
            .groupBy("source")
            .agg(
                F.countDistinct("fp").alias("n_distinct_docs"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .orderBy("source")
        )

    sql = r"""
        SELECT source,
               count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct_docs,
               count(*) AS n_docs
        FROM documents GROUP BY source ORDER BY source
    """
    return q, sql


def _q_tpch_q1():
    """TPC-H Q1 (pricing summary) over the provided lineitem table — the
    canonical scan-heavy aggregate: date-filtered, map-side partial agg on
    a 4-value group key, fully whole-stage-codegen."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        return (
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                F.round(F.sum(charge), 2).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    sql = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    return q, sql


def _q_tpch_q3():
    """TPC-H Q3 (shipping priority): the canonical 3-way join + top-k —
    selective dimension filters reach both scans, the join keys are the
    natural shuffle keys, and the global top-10 runs as per-partition
    top-k + merge."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        cutoff = F.lit("1995-03-15").cast("date")
        return (
            c.filter(F.col("c_mktsegment") == "BUILDING")
            .join(o, F.col("c_custkey") == F.col("o_custkey"))
            .filter(F.col("o_orderdate") < cutoff)
            .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter(F.col("l_shipdate") > cutoff)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(10)
        )

    sql = """
        SELECT l_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1995-03-15'
          AND l_shipdate > DATE '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """
    return q, sql


def _q_domain_curation():
    """Domain-level curation audit (quality.domain_curation): per-source
    doc count, mean quality, mean tokens, exact-dup rate, keep verdict —
    one shared projection + ONE aggregation on source. The SQL replays
    the per-doc quality kernel (same CTEs as the quality_score oracle),
    the md5 fingerprint, and the aggregate arithmetic."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.quality import domain_curation

        return domain_curation(_docs(spark, sf_dir)).orderBy("source")

    sql = r"""
        WITH t AS (
          SELECT doc_id, source, text,
                 CASE WHEN length(trim(text)) = 0 THEN []
                      ELSE regexp_split_to_array(lower(trim(text)), '\s+') END AS toks,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[\.,;:!\?\)\(]', '', 'g')) AS punct,
                 length(regexp_replace(trim(text), '\s+', '', 'g')) AS nospace,
                 md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
          FROM documents
        ), m AS (
          SELECT source, fp, len(toks) AS n_tokens,
                 CASE WHEN len(toks) > 0 THEN nospace * 1.0 / len(toks) ELSE 0.0 END AS mean_wl,
                 CASE WHEN len(toks) > 0
                      THEN len(list_filter(toks, x -> list_contains(['the','a','and','of','to'], x))) * 1.0 / len(toks)
                      ELSE 0.0 END AS stop_ratio,
                 CASE WHEN n_chars > 0 THEN punct * 1.0 / n_chars ELSE 0.0 END AS punct_ratio
          FROM t
        ), s AS (
          SELECT source, fp, n_tokens,
                 round((CASE WHEN n_tokens >= 10 AND mean_wl >= 2.0 AND mean_wl <= 12.0 THEN 0.5 ELSE 0.0 END)
                     + (CASE WHEN stop_ratio > 0.01 THEN 0.3 ELSE 0.0 END)
                     + (CASE WHEN punct_ratio < 0.2 THEN 0.2 ELSE 0.0 END), 2) AS q
          FROM m
        ), g AS (
          SELECT source, count(*) AS n_docs,
                 round(avg(q), 6) AS avg_quality,
                 round(avg(n_tokens), 6) AS avg_tokens,
                 count(fp) AS nfp, count(DISTINCT fp) AS dfp
          FROM s GROUP BY source
        )
        SELECT source, n_docs, avg_quality, avg_tokens,
               CASE WHEN nfp > 0 THEN round(1.0 - dfp * 1.0 / nfp, 6)
                    ELSE 0.0 END AS dup_rate,
               (coalesce(avg_quality >= 0.5, false)
                AND (CASE WHEN nfp > 0 THEN round(1.0 - dfp * 1.0 / nfp, 6)
                          ELSE 0.0 END) <= 0.2) AS keep
        FROM g ORDER BY source
    """
    return q, sql


def _q_chunk_documents():
    """Context-length chunking (packing.chunk_documents): 64-token windows
    with 16-token overlap over the documents table — zero-shuffle narrow
    map + explode. The SQL replays the window arithmetic with range() +
    list slicing; both sides strip edge whitespace with the same explicit
    regex so the split semantics agree exactly."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.packing import chunk_documents

        return chunk_documents(
            _docs(spark, sf_dir), chunk_tokens=64, overlap=16
        ).orderBy("doc_id", "chunk_idx")

    sql = r"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_split_to_array(
                   regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS t
          FROM documents
          WHERE text IS NOT NULL
            AND length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0
        ), sized AS (
          SELECT doc_id, t, len(t) AS n FROM toks
        ), st AS (
          SELECT doc_id, t, n, CAST(unnest(range(0, n, 48)) AS INT) AS s
          FROM sized
        )
        SELECT doc_id,
               CAST(s / 48 AS INT) AS chunk_idx,
               array_to_string(t[s + 1 : s + 64], ' ') AS chunk_text,
               CAST(least(64, n - s) AS INT) AS n_tokens
        FROM st
        WHERE s = 0 OR s + 16 < n
        ORDER BY doc_id, chunk_idx
    """
    return q, sql


def _q_latest_capture():
    """CDX-style revisit resolution (dedup.latest_capture): newest row per
    (user_id, event_type), ties broken by the remaining columns
    descending. One partial-agg shuffle — max(struct) — instead of a
    window sort over every capture's full payload; the SQL replays the
    identical ordering contract (ts DESC NULLS LAST, then payload fields
    DESC NULLS LAST in struct order)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.dedup import latest_capture

        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        return latest_capture(
            e, keys=["user_id", "event_type"], ts_col="ts"
        ).orderBy("user_id", "event_type")

    sql = """
        SELECT user_id, event_type, ts, event_id, value, props
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST,
                     value DESC NULLS LAST, props DESC NULLS LAST) AS rn
          FROM events
        ) WHERE rn = 1
        ORDER BY user_id, event_type
    """
    return q, sql


def _q_funnel():
    """Ordered funnel conversion over the events stream: per user, the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that — the classic sequential-pattern query
    (three min-aggregations + user-key joins; each stage's timestamp
    anchors the next, so out-of-order events never count)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        # ts stays TIMESTAMP_NTZ throughout: min/compare work natively and
        # a TIMESTAMP cast would drag the session zone (and its DST edge
        # cases) into an otherwise tz-free query
        e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "user_id", "event_type", "ts"
        )
        v = (
            e.filter(F.col("event_type") == "view")
            .groupBy("user_id").agg(F.min("ts").alias("t_view"))
        )
        c = (
            e.filter(F.col("event_type") == "click")
            .join(v, "user_id")
            .filter(F.col("ts") > F.col("t_view"))
            .groupBy("user_id").agg(F.min("ts").alias("t_click"))
        )
        p = (
            e.filter(F.col("event_type") == "purchase")
            .join(c, "user_id")
            .filter(F.col("ts") > F.col("t_click"))
            .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
        )
        funnel = (
            v.join(c, "user_id", "left").join(p, "user_id", "left")
            .select(
                "user_id",
                F.when(F.col("t_purchase").isNotNull(), "view>click>purchase")
                .when(F.col("t_click").isNotNull(), "view>click")
                .otherwise("view").alias("stage"),
            )
        )
        return (
            funnel.groupBy("stage")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy("stage")
        )

    sql = """
        WITH v AS (
          SELECT user_id, min(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY e.user_id
        ), p AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY e.user_id
        )
        SELECT CASE WHEN p.t_purchase IS NOT NULL THEN 'view>click>purchase'
                    WHEN c.t_click IS NOT NULL THEN 'view>click'
                    ELSE 'view' END AS stage,
               count(*) AS n_users
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
        GROUP BY 1 ORDER BY 1
    """
    return q, sql


def _q_topk_per_group():
    """Per-language top-3 longest documents — window row_number + filter,
    the generic top-k-per-group shape (rank shuffle on the group key only)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        d = _docs(spark, sf_dir)
        w = Window.partitionBy("lang").orderBy(
            F.desc("n_chars"), F.col("doc_id")
        )
        return (
            d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= 3)
            .orderBy("lang", "rank")
        )

    sql = """
        SELECT lang, doc_id, n_chars, rank FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents
        ) WHERE rank <= 3 ORDER BY lang, rank
    """
    return q, sql


# --------------------------------------------------------------------------
# Skew-defused domain metrics + event-time windowing.
# --------------------------------------------------------------------------

def _q_domain_counts():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        from pdf2doi_spark.operators.extract import domain_counts_salted
        from pdf2doi_spark.pages import pages_from_documents

        return domain_counts_salted(pages_from_documents(spark, sf_dir))

    sql = f"""
        WITH base AS (
            SELECT doc_id, {_HOSTS_SQL} AS domain FROM documents
        )
        SELECT domain, count(*) AS n_docs
        FROM base GROUP BY domain ORDER BY n_docs DESC, domain
    """
    return q, sql


def _q_events_windowed():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        return (
            e.groupBy(
                F.window("ts", "10 minutes").alias("w"),
                F.col("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .orderBy("window_start", "event_type")
        )

    sql = """
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    return q, sql


# --------------------------------------------------------------------------
# Title selection (T5/T6 + F13/F14/F15 pipeline as native array ops).
# --------------------------------------------------------------------------

def _q_title_select():
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        # F13 -> F14 -> F15 live in operators/extract.select_title (lifted
        # there in round 4 so the §2 row is importable as a library op)
        from pdf2doi_spark.operators.extract import select_title

        d = _docs(spark, sf_dir)
        cands = F.array(
            F.substring(F.col("text"), 1, 8),
            F.substring(F.col("text"), 1, 40),
            F.substring(F.col("text"), 1, 40),
            F.substring(F.col("text"), 1, 25),
            F.lit("tiny"),
        )
        sel = select_title(cands)
        return d.select(
            F.col("doc_id"),
            sel["n_candidates"].alias("n_candidates"),
            sel["best_title"].alias("best_title"),
        )

    sql = """
        WITH c AS (
          SELECT doc_id, unnest(list_distinct_preserve) AS title
          FROM (
            SELECT doc_id,
                   list_filter(
                     list_distinct([substring(text,1,8), substring(text,1,40),
                                    substring(text,1,40), substring(text,1,25), 'tiny']),
                     x -> length(trim(x)) > 12) AS list_distinct_preserve
            FROM documents
          )
        ), ranked AS (
          SELECT doc_id, title,
                 row_number() OVER (PARTITION BY doc_id ORDER BY length(title) DESC, title ASC) AS rn,
                 count(*) OVER (PARTITION BY doc_id) AS n_candidates
          FROM c
        )
        SELECT d.doc_id,
               coalesce(r.n_candidates, 0) AS n_candidates,
               r.title AS best_title
        FROM documents d LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (doc_id)
    """
    return q, sql


def _q_pack_sequences():
    """Greedy token-budget sequence packing (training-batch construction):
    docs packed first-fit in doc_id order into ≤160-token sequences inside
    bounded (lang, bin) units — the parallel decomposition that survives
    10^12 docs (operators/packing.py). Oracle: the same greedy recursion as
    an ordered recursive CTE."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.packing import pack_sequences
        from pdf2doi_spark.operators.quality import tokens

        d = _docs(spark, sf_dir)
        # token count inlined (same whitespace contract as token_count) —
        # a join against token_count's output would add a shuffle for
        # nothing
        inp = d.select(
            "doc_id", "lang",
            F.size(tokens(F.col("text"))).alias("n_tokens"),
        )
        return pack_sequences(
            inp, budget=160, group_col="lang", order_col="doc_id",
            bin_size=64,
        ).orderBy("doc_id")

    sql = r"""
        WITH RECURSIVE t AS (
          SELECT doc_id, lang, doc_id // 64 AS bin,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+'))
                 END AS n_tokens
          FROM documents
        ), o AS (
          SELECT *, row_number() OVER (
                   PARTITION BY lang, bin ORDER BY doc_id) AS rn
          FROM t
        ), packed AS (
          SELECT doc_id, lang, bin, n_tokens, rn,
                 CAST(0 AS BIGINT) AS chunk_in_bin, n_tokens AS cum
          FROM o WHERE rn = 1
          UNION ALL
          SELECT o.doc_id, o.lang, o.bin, o.n_tokens, o.rn,
                 CASE WHEN p.cum + o.n_tokens > 160
                      THEN p.chunk_in_bin + 1 ELSE p.chunk_in_bin END,
                 CASE WHEN p.cum + o.n_tokens > 160
                      THEN o.n_tokens ELSE p.cum + o.n_tokens END
          FROM o JOIN packed p
            ON o.lang = p.lang AND o.bin = p.bin AND o.rn = p.rn + 1
        )
        SELECT doc_id, lang, bin, chunk_in_bin, n_tokens
        FROM packed ORDER BY doc_id
    """
    return q, sql


def _q_mixture_sample():
    """Source-mixture downsampling to a target token-share per source:
    keep-fractions derived from per-source token totals (binding source
    kept whole), membership a pure md5 function of doc_id — reproducible
    across engines/runs/cluster sizes (operators/packing.py)."""
    targets = {"src1": 0.5, "src2": 0.3, "src3": 0.2}

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pdf2doi_spark.operators.packing import mixture_sample

        d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
        return (
            mixture_sample(d, targets, token_col="n_chars")
            .select("doc_id", "source", "n_chars")
            .orderBy("doc_id")
        )

    shares = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in targets.items()
    )
    sql = f"""
        WITH totals AS (
          SELECT source,
                 CAST(sum(n_chars) AS DOUBLE) AS src_tokens,
                 CASE source {shares} ELSE NULL END AS share
          FROM documents GROUP BY source
        ), bound AS (
          SELECT min(src_tokens / share) AS t FROM totals
          WHERE share IS NOT NULL
        ), fracs AS (
          SELECT source, share * t / src_tokens AS keep_frac
          FROM totals, bound WHERE share IS NOT NULL
        )
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d JOIN fracs f USING (source)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
              / 4294967296.0 < f.keep_frac
        ORDER BY d.doc_id
    """
    return q, sql


# --------------------------------------------------------------------------
# Registry.
# --------------------------------------------------------------------------

# Every builder, including the pytest-only ones. A builder returns
# (query_fn, oracle_sql_or_None).
_BUILDERS = {
    "extract_cascade": _q_extract_cascade,
    "extract_cascade_noarxiv": _q_extract_cascade_noarxiv,
    "method_metrics": _q_method_metrics,
    "main_content": _q_main_content,
    "report_format": _q_report_format,
    "doi_tier0": _q_doi_tier0,
    "doi_tier1": _q_doi_tier1,
    "doi_tier2": _q_doi_tier2,
    "doi_tier3": _q_doi_tier3,
    "doi_tier4": _q_doi_tier4,
    "arxiv_tier0": _q_arxiv_tier0,
    "tier_rank": _q_tier_rank,
    "standardise_doi": _q_standardise,
    "filename_extract": _q_filename_extract,
    "ascii_scrub": _q_ascii_scrub,
    "token_count": _q_token_count,
    "lang_id": _q_lang_id,
    "quality_score": _q_quality_score,
    "doc_fingerprint": _q_fingerprint,
    "quality_suite": _q_quality_suite,
    "winnowing_sketch": _q_winnowing_sketch,
    "exact_dup_groups": _q_exact_dup_groups,
    "exact_dedup": _q_exact_dedup,
    "minhash_bands": _q_minhash_bands,
    "minhash_near_dups": _q_minhash_near_dups,
    "minhash_bucket_profile": _q_minhash_bucket_profile,
    "incremental_near_dups": _q_incremental_near_dups,
    "dedup_bucket_profile": _q_dedup_bucket_profile,
    "dedup_survivors": _q_dedup_survivors,
    "dup_components": _q_dup_components,
    "dup_components_star": _q_dup_components_star,
    "media_features": _q_media_features,
    "frame_samples": _q_frame_samples,
    "sketch_overlap": _q_sketch_overlap,
    "near_dup_clusters": _q_near_dup_clusters,
    "line_dedup": _q_line_dedup,
    "decontaminate": _q_decontaminate,
    "grouped_profile": _q_domain_profile,
    "corpus_pipeline": _q_corpus_pipeline,
    "hash_sample": _q_hash_sample,
    "canonical_urls": _q_canonical_urls,
    "repetition_signals": _q_repetition_signals,
    "compression_ratio": _q_compression_ratio,
    "doc_signals": _q_doc_signals,
    "redact_pii": _q_redact_pii,
    "simhash": _q_simhash,
    "simhash_near_dups": _q_simhash_near_dups,
    "cosine_topk": _q_cosine_topk,
    "ann_lsh_topk": _q_ann_lsh_topk,
    "ann_ivf_topk": _q_ann_ivf_topk,
    "label_centroids": _q_label_centroids,
    "length_percentiles": _q_length_percentiles,
    "approx_stats": _q_approx_stats,
    "approx_stats_sketch": _q_approx_stats_sketch,
    "title_select": _q_title_select,
    "domain_counts_salted": _q_domain_counts,
    "events_windowed": _q_events_windowed,
    "ngram_jaccard": _q_ngram_jaccard,
    "embedding_near_dups": _q_embedding_near_dups,
    "sessionize": _q_sessionize,
    "latest_capture": _q_latest_capture,
    "chunk_documents": _q_chunk_documents,
    "domain_curation": _q_domain_curation,
    "topk_per_group": _q_topk_per_group,
    "funnel": _q_funnel,
    "tpch_q1": _q_tpch_q1,
    "tpch_q3": _q_tpch_q3,
    "metrics_cube": _q_metrics_cube,
    "distinct_counts": _q_distinct_counts,
    "pack_sequences": _q_pack_sequences,
    "mixture_sample": _q_mixture_sample,
}

# The driver-facing registry: EXACTLY the queries the driver's correctness
# gate records, consolidated to fit its 50-row cap so every entry gets a
# CORRECTNESS row (round-2 verdict: 62 registered queries left 12 with no
# driver row at all). The names NOT in this list remain in _BUILDERS and
# keep their full DuckDB-oracle comparison in pytest
# (tests/test_driver_contract.py runs build_all_queries); each is subsumed
# by a driver-checked superset:
#   doi_tier1..4            -> tier_rank extracts with all 5 tier patterns
#                              (hash-exact per tier); doi_tier0 stays as
#                              the representative single-tier query
#   ascii_scrub, token_count, lang_id, quality_score, doc_fingerprint
#                           -> quality_suite (same column expressions,
#                              fused into one projection)
#   exact_dup_groups, dedup_survivors -> exact_dedup (both operators in
#                              one row: survivors + group sizes)
#   minhash_bands           -> minhash_near_dups replays the whole
#                              signature->band->verify pipeline in its
#                              oracle
#   minhash_bucket_profile  -> dedup_bucket_profile (minhash + simhash +
#                              embedding families)
#   dup_components          -> dup_components_star (equivalence pinned by
#                              tests/test_operators.py)
#   repetition_signals, compression_ratio -> doc_signals (fused)
#   approx_stats_sketch     -> approx_stats emits within-tolerance
#                              verdicts for the same sketches
_DRIVER_QUERIES = (
    "extract_cascade",
    "extract_cascade_noarxiv",
    "method_metrics",
    "main_content",
    "report_format",
    "doi_tier0",
    "arxiv_tier0",
    "tier_rank",
    "standardise_doi",
    "filename_extract",
    "quality_suite",
    "winnowing_sketch",
    "exact_dedup",
    "minhash_near_dups",
    "dedup_bucket_profile",
    "dup_components_star",
    "media_features",
    "frame_samples",
    "sketch_overlap",
    "near_dup_clusters",
    "line_dedup",
    "decontaminate",
    "grouped_profile",
    "corpus_pipeline",
    "hash_sample",
    "canonical_urls",
    "doc_signals",
    "redact_pii",
    "simhash",
    "simhash_near_dups",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "label_centroids",
    "length_percentiles",
    "approx_stats",
    "title_select",
    "domain_counts_salted",
    "events_windowed",
    "ngram_jaccard",
    "embedding_near_dups",
    "sessionize",
    "topk_per_group",
    "funnel",
    "tpch_q1",
    "tpch_q3",
    "metrics_cube",
    "distinct_counts",
    "pack_sequences",
    "mixture_sample",
)
# Explicit raise, not assert: asserts vanish under `python -O`, and this
# invariant must hold at import time in production, not only under pytest.
if len(_DRIVER_QUERIES) > 50:
    raise ValueError(
        "driver registry exceeds the correctness gate's 50-row cap: "
        f"{len(_DRIVER_QUERIES)} entries"
    )


def build_queries() -> Dict[str, QueryFn]:
    """The driver-facing registry (<=50 entries; see _DRIVER_QUERIES)."""
    return {name: _BUILDERS[name]()[0] for name in _DRIVER_QUERIES}


def build_oracles() -> Dict[str, str]:
    out = {}
    for name in _DRIVER_QUERIES:
        sql = _BUILDERS[name]()[1]
        if sql is not None:
            out[name] = sql
    return out


def build_all_queries() -> Dict[str, QueryFn]:
    """EVERY builder, including the pytest-only consolidated-away queries —
    the set tests/test_driver_contract.py and bench.py draw from."""
    return {name: builder()[0] for name, builder in _BUILDERS.items()}


def build_all_oracles() -> Dict[str, str]:
    out = {}
    for name, builder in _BUILDERS.items():
        sql = builder()[1]
        if sql is not None:
            out[name] = sql
    return out
