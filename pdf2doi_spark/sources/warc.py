"""WARC ingestion: Common Crawl's native archive format → pages table.

The reference ingests a directory of PDFs (``main.py:60-82``); the 100 TB
analogue ingests WARC archives. This module is a dependency-free reader:

* ``iter_warc_records`` — pure-Python parser for WARC/1.0 ``response``
  records. Handles the three layouts that occur in the wild: uncompressed,
  whole-file gzip, and **per-record gzip members** (Common Crawl's actual
  layout — each record is its own gzip member, which is what makes a
  petabyte ``.warc.gz`` splittable at member boundaries).
* ``read_warc`` — ``binaryFile`` scan → batched ``mapInPandas`` parse →
  pages-shaped DataFrame ``(url, warc_ts, html, text, lang)``.

Scale note: here one task parses one WARC file (CC files are ~1 GB — a
fine task size); an offset-indexed variant (tasks = member ranges from the
``.warc.gz`` index files CC publishes) drops in by replacing the
``binaryFile`` listing, with the member parser below unchanged.

Parsing is total: malformed records are skipped, never raised — one bad
archive must not fail a task.
"""
from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF2 = b"\r\n\r\n"


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress each gzip member of ``data`` in turn (CC layout: one
    record per member). Non-gzip input yields itself once."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(data[pos:])
        except zlib.error:
            return
        yield member
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", errors="replace"
            )
    return headers


def _parse_ts(warc_date: Optional[str]):
    """WARC-Date → aware UTC datetime. WARC/1.0 mandates whole seconds;
    WARC/1.1 explicitly allows fractional seconds — both must parse, or
    standard-compliant archives get NULL warc_ts and silently fall out of
    every event-time consumer (watermarked dedup, windowed metrics)."""
    if not warc_date:
        return None
    try:
        # fromisoformat handles optional fractional seconds; normalize the
        # trailing Z (not accepted before Python 3.11's parser on 3.10-)
        dt = datetime.fromisoformat(warc_date.strip().replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc)
    except ValueError:
        return None


def iter_warc_records(payload: bytes) -> Iterator[Tuple[str, object, bytes]]:
    """Yield ``(target_uri, warc_ts, body_bytes)`` for every WARC
    ``response`` record in ``payload`` (any of the three compressions)."""
    for chunk in _gzip_members(payload or b""):
        offset = 0
        while True:
            start = chunk.find(b"WARC/", offset)
            if start < 0:
                break
            head_end = chunk.find(_CRLF2, start)
            if head_end < 0:
                break
            headers = _parse_headers(chunk[start:head_end])
            try:
                length = int(headers.get("content-length", ""))
                if length < 0:
                    # negative length would step the scan offset BACKWARD
                    # (bytes.find clamps negative starts to 0), re-finding
                    # this same record forever
                    raise ValueError("negative Content-Length")
            except ValueError:
                # Framing is unrecoverable without Content-Length: scanning
                # onward for the next 'WARC/' would re-parse this record's
                # BODY, letting page content that happens to embed WARC
                # header text fabricate records with attacker-controlled
                # provenance. Drop the rest of this chunk instead.
                break
            body_start = head_end + len(_CRLF2)
            record = chunk[body_start : body_start + length]
            offset = body_start + length
            if headers.get("warc-type") != "response":
                continue
            uri = headers.get("warc-target-uri")
            if not uri:
                continue
            # response payload is an HTTP message: strip its status+headers
            http_end = record.find(_CRLF2)
            body = record[http_end + len(_CRLF2):] if http_end >= 0 else record
            yield uri, _parse_ts(headers.get("warc-date")), body


def build_warc_bytes(records: List[Tuple[str, str, bytes]],
                     compression: str = "none") -> bytes:
    """Serialize ``(uri, iso_ts, html_body)`` triples as a WARC/1.0 archive
    (test/writer helper; ``compression``: none | file | member)."""
    out = []
    for uri, ts, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {ts}\r\nContent-Length: {len(http)}\r\n"
        ).encode()
        out.append(head + b"\r\n" + http + _CRLF2)
    if compression == "member":
        return b"".join(gzip.compress(r) for r in out)
    raw = b"".join(out)
    if compression == "file":
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
            gz.write(raw)
        return buf.getvalue()
    return raw


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*") -> DataFrame:
    """WARC archives → pages-shaped DataFrame.

    One Arrow crossing per file batch; the parser runs batched inside
    ``mapInPandas`` and fans each archive out into its response records
    (``text``/``lang`` are NULL — populated downstream exactly as with
    ``read_raw_files``).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            urls, tss, bodies = [], [], []
            for payload in b["content"]:
                try:
                    for uri, ts, body in iter_warc_records(
                        bytes(payload) if payload is not None else b""
                    ):
                        urls.append(uri)
                        tss.append(ts)
                        bodies.append(body)
                except Exception:
                    continue  # malformed archive: skip, never fail the task
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": bodies}
            )

    parsed = raw.mapInPandas(
        run, schema="url string, warc_ts timestamp, html binary"
    )
    return parsed.select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
