"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The decode step is STUBBED (image/audio libraries are not available in this
environment): ``decode_mode="fake"`` produces a deterministic feature
vector from the bytes (so the whole pipeline — schema, batching,
partitioning, UDF signatures — is real and testable end-to-end), while
``decode_mode="real"`` raises ``NotImplementedError`` at the exact seam
where PIL/ffmpeg would plug in.

Schema contract::

    media(media_id: long, kind: string,          -- 'image'|'audio'|'video'
          payload: binary, mime: string,
          meta: struct<width int, height int, duration_ms int>)

Scale notes: binary payloads dominate row size — batch size is controlled
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` and payloads never
round-trip through Python objects row-at-a-time; ``mapInPandas`` streams
Arrow record batches.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "meta struct<width: int, height: int, duration_ms: int>"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = repeated id bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8"
        ).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            (F.pmod(F.col("id"), F.lit(64)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("id"), F.lit(48)) + 1).cast("int").alias("height"),
            (F.col("id") * 100).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded vector."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(
    media: DataFrame, decode_mode: str = "fake", dim: int = FEATURE_DIM
) -> DataFrame:
    """``[media_id, kind, features: array<float>]`` via ``mapInPandas``.

    The Arrow batch shape is the real contract: each Python invocation sees
    a pandas DataFrame of whole rows; features come from one vectorized
    pass over the batch, never per-row Python in a ``udf()``.
    """
    if decode_mode == "real":
        raise NotImplementedError(
            "real decoders (PIL/torchaudio/ffmpeg) are not available in this "
            "environment; plug them in here — the Spark-side plumbing is "
            "identical to decode_mode='fake'"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        batches, schema="media_id long, kind string, features array<float>"
    )


def resize_images(
    media: DataFrame, width: int, height: int, decode_mode: str = "fake"
) -> DataFrame:
    """Image resize seam: returns payloads with updated metadata.  Fake mode
    passes bytes through and rewrites ``meta`` (the Spark-side contract);
    real mode is the PIL seam."""
    if decode_mode == "real":
        raise NotImplementedError("PIL resize goes here")
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "kind",
        "payload",
        "mime",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ).alias("meta"),
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode_mode: str = "fake"
) -> DataFrame:
    """Video frame sampling seam: one output row per sampled timestamp.
    Fake mode synthesizes frame rows from duration metadata (real ffmpeg
    seam marked); the explode/fan-out shape is the real contract."""
    if decode_mode == "real":
        raise NotImplementedError("ffmpeg frame extraction goes here")
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
        F.sha2(F.concat(F.col("media_id").cast("string"), F.lit("@")), 256)
        .substr(1, 16)
        .alias("frame_id"),
    )
