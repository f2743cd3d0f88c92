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


# ---------------------------------------------------------------------------
# Video frame sampling (1 row in -> N frame rows out)
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = (
    "media_id long, kind string, frame_idx int, ts_ms int, "
    "features array<float>"
)


def decode_frame_stub(
    payload: bytes, frame_idx: int, dim: int = 16, strict: bool = False
) -> np.ndarray:
    """Deterministic fake frame decoder: md5(payload ':' idx)-seeded
    feature vector. Production: replace with ffmpeg seek+decode at the
    frame timestamp; the signature (bytes, frame_idx) -> float32[dim]
    is the wiring contract."""
    if strict:
        raise NotImplementedError(
            "no video codec in this environment; plug ffmpeg here"
        )
    h = hashlib.md5((payload or b"") + b":" + str(frame_idx).encode()).digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(dim / len(seed)))
    return (np.tile(seed, reps)[:dim] / 255.0).astype(np.float32)


def sample_frames(
    media: DataFrame,
    interval_ms: int = 100,
    max_frames: int = 8,
    dim: int = 16,
) -> DataFrame:
    """Frame-sampling plumbing: one media row fans out to
    min(max_frames, duration//interval + 1) frame rows, each with the
    frame's (stub-)decoded features — the Spark shape of a video
    pre-processing stage (fan-out INSIDE the Arrow batch, no explode /
    shuffle; output batches stay bounded because max_frames caps the
    multiplier).

    duration comes from meta.duration_ms when present; a NULL duration
    falls back to the payload byte length (deterministic, so the q58
    oracle can reproduce the fan-out count in SQL)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, kinds, idxs, tss, feats = [], [], [], [], []
            durations = [
                m["duration_ms"] if m is not None and m["duration_ms"] is not None
                else len(p or b"")
                for m, p in zip(pdf["meta"], pdf["payload"])
            ]
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], durations
            ):
                n = min(max_frames, int(dur) // interval_ms + 1)
                for i in range(max(n, 1)):
                    ids.append(mid)
                    kinds.append(kind)
                    idxs.append(i)
                    tss.append(i * interval_ms)
                    feats.append(decode_frame_stub(payload, i, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)
