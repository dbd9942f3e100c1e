"""URL canonicalization — the crawl-dedup precursor.

The same page commonly appears under many url spellings (case-shifted
scheme/host, explicit default port, unsorted query params, fragments).
Canonicalizing BEFORE url-keyed operations (exact dedup, the identifier
cache join, domain grouping) collapses those variants; the reference's
only url handling is percent-decoding of the filename (finders.py:745-747)
— this generalizes it to the whole url, as a crawl-scale engine must.

Pure native expressions (whole-stage codegen, narrow map, no shuffle) with
an exact DuckDB oracle. Steps, all semantics-preserving per RFC 3986:

1. scheme and host lowercased (path/query stay case-sensitive);
2. default port stripped (``:80`` for http, ``:443`` for https);
3. empty path → ``/``;
4. query parameters sorted bytewise (param order is almost never
   semantic); empty query dropped;
5. fragment dropped (never sent to the server).

Deliberately NOT done (lossy): www-stripping, percent-decode of unreserved
characters, path ``..`` resolution — callers opt into those per corpus.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonical_url(col: Column) -> Column:
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    # strip the fragment FIRST: everything after '#' (including any '?' the
    # fragment contains — SPA routes like /#/search?q=x must not fabricate
    # a query string the server never saw)
    rest = F.regexp_extract(F.regexp_replace(col, _SCHEME_RE, ""), r"^([^#]*)", 1)
    # userinfo is case-SENSITIVE per RFC 3986 — preserve it verbatim;
    # only scheme and host are case-insensitive
    userinfo = F.regexp_extract(rest, r"^([^/?#@]*@)", 1)
    hostport = F.lower(
        F.regexp_extract(rest, r"^(?:[^/?#@]*@)?([^/?#]+)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(rest, r"^(?:[^/?#@]*@)?[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)", 1)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(
        scheme == "", col  # not an absolute http(s)-style url: pass through
    ).otherwise(
        F.concat(
            scheme, F.lit("://"), userinfo, host, path,
            F.when(query != "", F.concat(F.lit("?"), sorted_query)).otherwise(
                F.lit("")
            ),
        )
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url`` next to the raw url (keep the raw one — it is
    the provenance key; the canonical one is the dedup/join key)."""
    return df.withColumn("canonical_url", canonical_url(F.col(url_col)))
