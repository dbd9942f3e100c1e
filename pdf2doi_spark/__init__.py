"""pdf2doi_spark — a PySpark-native identifier-and-content extraction engine.

From-scratch rebuild of the query/data-processing capabilities of
MicheleCotrufo/pdf2doi (reference read-only at /root/reference) as a
distributed extraction pipeline over Common-Crawl-style pages tables
(url, warc_ts, html, text, lang). Architecture is Spark-first: DataFrame
plans optimized by Catalyst, with the sequential first-match-wins
extraction semantics confined to Arrow-batched pandas UDFs that import
the pure-Python core in ``pdf2doi_spark.core``.
"""

__version__ = "0.1.0"
