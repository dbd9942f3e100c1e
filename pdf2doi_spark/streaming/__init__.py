"""Structured Streaming path for incremental crawls."""
