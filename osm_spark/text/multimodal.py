"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with mapInPandas plumbing for decode/feature-extract stages.

The container has no image/audio codecs, so the decode kernels are
STUBS: ``decode_image_stub`` produces a deterministic fake feature
vector from the bytes (so the Spark-side plumbing — schema, batching,
partitioning — is real and testable end-to-end), and raises with a
clear message when ``strict=True`` (production wiring point for
PIL/ffmpeg).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes int, features array<float>"


def attach_media(
    df: DataFrame, payload_col: str, kind: str, keep: list[str] | None = None
) -> DataFrame:
    """Normalize an arbitrary binary column into the media schema.
    ``keep``: passthrough columns (e.g. the source url) carried along
    for downstream joins / oracle keys."""
    return df.select(
        *[F.col(c) for c in (keep or [])],
        F.xxhash64(payload_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, dim: int = 16, strict: bool = False) -> np.ndarray:
    """Deterministic fake 'decoder': md5-seeded feature vector.

    Production: replace with PIL decode + resize + channel stats. The
    signature (bytes -> float32[dim]) is the wiring contract."""
    if strict:
        raise NotImplementedError(
            "no image codec in this environment; plug PIL/opencv here"
        )
    h = hashlib.md5(payload or b"").digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(dim / len(seed)))
    return (np.tile(seed, reps)[:dim] / 255.0).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary
    payloads — the real distributed shape of a decode stage (batch
    size bounded by arrow maxRecordsPerBatch, payloads never collected
    to the driver)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_image_stub(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)
