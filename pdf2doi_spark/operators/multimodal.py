"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Driver mandate: image/audio/video are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as pandas
UDFs over ``mapInPandas``. The actual codecs are NOT in this container, so
the decode step is a clearly-marked stub (`NotImplementedError`) plus a
deterministic fake used by tests — but the Spark-side plumbing (schema,
batch shape, partitioning, UDF signatures) is real and tested.

Design points that survive 100 TB:
* media rows are wide — the Arrow batch cap in ``session.py`` bounds
  worker memory no matter the payload size;
* metadata lives in typed columns (not inside the blob), so filters like
  ``width >= 64`` push down to the scan without touching bytes;
* per-batch numpy work only; no per-row Python UDF calls.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"

_FEATURE_DIM = 16


def decode_image(payload: bytes):
    """Real decode hook — requires an image codec (PIL/opencv), which is
    not available in this environment. STUB: see ``fake_decode``."""
    raise NotImplementedError(
        "image codecs are not installed in this container; "
        "use fake_decode() for deterministic plumbing tests"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: expands bytes into a pseudo-pixel
    array seeded by the payload digest. Same bytes → same 'pixels' on every
    executor; lets the full pipeline (batching, schema, feature shape) be
    exercised without codecs."""
    digest = hashlib.md5(payload or b"").digest()
    seed_arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(_FEATURE_DIM / len(seed_arr))) if len(seed_arr) else 1
    return np.tile(seed_arr, reps)[:_FEATURE_DIM]


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 8) * 32 if kind != "audio" else None,
                64 + (i % 5) * 32 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Batched feature extraction over the opaque payload column.

    ``mapInPandas`` keeps one Arrow crossing per batch; the loop body is
    numpy over the fake decoder (real deployments swap ``fake_decode`` for
    the codec call — the surrounding plumbing is identical).
    """
    cols = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [
                (fake_decode(bytes(p) if p is not None else b"") / 255.0)
                .astype(np.float32)
                .tolist()
                for p in b["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in b["payload"]],
                    "feature": feats,
                }
            )

    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, pixels array<float>"


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Batched image resize over opaque payloads.

    The decode step is the stub (``fake_decode`` pseudo-pixels tiled to the
    row's true ``width × height``); the resize itself is a REAL
    nearest-neighbor resample (vectorized numpy index mapping) — exactly the
    kernel a codec-equipped deployment would run after a real decode. The
    metadata filter (``kind = 'image'`` and non-null dims) is native, so the
    scan prunes non-image rows before any payload bytes move to Python.
    """
    # degenerate dims (0 or negative — corrupt-but-typed metadata) are
    # excluded natively: one bad row must never fail a task, and a
    # zero-area resize has no defined output anyway
    cols = media.filter(
        (F.col("kind") == "image")
        & (F.col("width") > 0)
        & (F.col("height") > 0)
    ).select("media_id", "payload", "width", "height")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pixels = []
            for p, w, h in zip(b["payload"], b["width"], b["height"]):
                w, h = int(w), int(h)
                seed = fake_decode(bytes(p) if p is not None else b"")
                reps = int(np.ceil(w * h / len(seed)))
                src = np.tile(seed, reps)[: w * h].reshape(h, w)
                ys = np.arange(out_h) * h // out_h
                xs = np.arange(out_w) * w // out_w
                dst = src[np.ix_(ys, xs)]
                pixels.append((dst / 255.0).astype(np.float32).ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "pixels": pixels,
                }
            )

    return cols.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling *plan* for video rows: native expressions compute the
    sample timestamps (no decode needed — metadata-only, fully pushed
    down); the decode of each frame would run in extract_features."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor(F.col("duration_ms") / every_ms).cast("int"),
                ),
                lambda i: i * every_ms,
            ).alias("sample_ts_ms"),
        )
    )
