"""Spark-side operators: extraction kernel, dedup, similarity, text quality,
report/metrics — each module documents its reference parity and its
100 TB-scale physical plan choices."""
