"""Multimodal column processing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

``decode_mode="real"`` is REAL as of round 4: the container ships no
PIL/ffmpeg, but 24-bit BMP, 8-bit RGB(A) PNG, 16-bit PCM WAV and
uncompressed-DIB AVI are standards-decodable with stdlib + numpy
(functions/codecs.py — round-trip-exact, CRC-checked, malformed input
rejected per row).  ``synth_media`` emits REAL files in those formats, so
decode → transform → re-encode is exercised end-to-end in tests.
``decode_mode="fake"`` (sha256-seeded features, payload passthrough)
remains for plumbing-only tests and for payloads in formats outside the
stdlib-decodable set — swapping in PIL/ffmpeg-backed codecs is a per-row
function change, not a pipeline change.

Schema contract::

    media(media_id: long, kind: string,          -- 'image'|'audio'|'video'
          payload: binary, mime: string,
          meta: struct<width int, height int, duration_ms int>)

Undecodable payloads in real mode yield NULL features / are dropped from
resize/sampling output (per-row, never failing the batch) — at corpus
scale a poisoned row must not kill the job.

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

from parallel_louvain_method_spark.functions import codecs

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "meta struct<width: int, height: int, duration_ms: int>"
)

FEATURE_DIM = 16

_IMG_W, _IMG_H = 32, 24
_VID_W, _VID_H, _VID_FRAMES, _VID_FPS = 16, 12, 4, 10
_AUD_RATE, _AUD_MS = 8000, 200


def _synth_image(media_id: int) -> tuple[bytes, str, int, int]:
    y, x, c = np.ogrid[:_IMG_H, :_IMG_W, :3]
    arr = ((x * 3 + y * 5 + c * 11 + media_id * 7) % 256).astype(np.uint8)
    if media_id % 2 == 0:
        return codecs.encode_bmp(arr), "image/bmp", _IMG_W, _IMG_H
    return codecs.encode_png(arr), "image/png", _IMG_W, _IMG_H


def _synth_audio(media_id: int) -> bytes:
    n = _AUD_RATE * _AUD_MS // 1000
    t = np.arange(n) / _AUD_RATE
    freq = 100.0 + (media_id % 50) * 17.0
    return codecs.encode_wav(
        (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16), _AUD_RATE
    )


def _synth_video(media_id: int) -> bytes:
    y, x, c = np.ogrid[:_VID_H, :_VID_W, :3]
    frames = np.stack(
        [
            ((x * 5 + y * 3 + c * 7 + media_id * 11 + k * 31) % 256).astype(np.uint8)
            for k in range(_VID_FRAMES)
        ]
    )
    return codecs.encode_avi(frames, fps=_VID_FPS)


def synth_media(
    spark: SparkSession, n: int = 100, real_payloads: bool = True
) -> DataFrame:
    """Deterministic media table.  ``real_payloads=True`` (default) emits
    genuine BMP/PNG/WAV/AVI bytes (formats alternate per id for images);
    ``False`` keeps the round-1 opaque byte strings."""
    base = spark.range(n)
    if not real_payloads:
        kinds = F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        )
        return base.select(
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

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                if kind == "image":
                    payload, mime, w, h = _synth_image(mid)
                    meta = {"width": w, "height": h, "duration_ms": 0}
                elif kind == "audio":
                    payload, mime = _synth_audio(mid), "audio/wav"
                    meta = {"width": 0, "height": 0, "duration_ms": _AUD_MS}
                else:
                    payload, mime = _synth_video(mid), "video/avi"
                    meta = {
                        "width": _VID_W,
                        "height": _VID_H,
                        "duration_ms": _VID_FRAMES * 1000 // _VID_FPS,
                    }
                rows.append((mid, kind, payload, mime, meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "meta"]
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image(payload: bytes) -> np.ndarray:
    if payload[:2] == b"BM":
        return codecs.decode_bmp(payload)
    return codecs.decode_png(payload)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in decoder: sha256-seeded vector."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def _real_features(kind: str, payload: bytes, dim: int) -> np.ndarray | None:
    try:
        if kind == "image":
            return codecs.image_features(_decode_image(payload), dim)
        if kind == "audio":
            samples, rate = codecs.decode_wav(payload)
            return codecs.audio_features(samples, rate, dim)
        if kind == "video":
            frames, _fps = codecs.decode_avi(payload)
            return codecs.image_features(frames[0], dim)
    except ValueError:
        return None
    return None


def extract_features(
    media: DataFrame, decode_mode: str = "real", dim: int = FEATURE_DIM
) -> DataFrame:
    """``[media_id, kind, features: array<float>]`` via ``mapInPandas``.

    Real mode: 4×4 mean-pooled grayscale grid for images / first video
    frame, RMS + zero-crossing + spectral band energies for audio —
    genuine content descriptors from the real decoders.  Undecodable
    payloads yield NULL features.  The Arrow batch shape is the contract:
    each Python invocation sees a pandas DataFrame of whole rows; features
    come from one pass over the batch, never per-row Python in a ``udf()``.
    """
    if decode_mode not in ("real", "fake"):
        raise ValueError(f"unknown decode_mode {decode_mode!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_mode == "fake":
                feats = [_fake_features(p, dim) for p in pdf["payload"]]
            else:
                feats = [
                    _real_features(k, p, dim)
                    for k, p in zip(pdf["kind"], pdf["payload"])
                ]
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
    media: DataFrame, width: int, height: int, decode_mode: str = "real"
) -> DataFrame:
    """Image resize.  Real mode: decode (BMP/PNG by magic), REAL bilinear
    resample, re-encode in the SAME format, metadata updated — undecodable
    rows are dropped (observably: output count < input count).  Fake mode
    passes bytes through and rewrites ``meta`` only."""
    imgs = media.filter(F.col("kind") == "image")
    if decode_mode == "fake":
        return imgs.select(
            "media_id", "kind", "payload", "mime",
            F.struct(
                F.lit(width).cast("int").alias("width"),
                F.lit(height).cast("int").alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
            ).alias("meta"),
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    arr = _decode_image(r.payload)
                except ValueError:
                    continue
                resized = codecs.bilinear_resize(arr, width, height)
                out = (
                    codecs.encode_bmp(resized)
                    if r.payload[:2] == b"BM"
                    else codecs.encode_png(resized)
                )
                rows.append(
                    (
                        r.media_id, r.kind, out, r.mime,
                        {
                            "width": width,
                            "height": height,
                            "duration_ms": r.meta["duration_ms"],
                        },
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "meta"]
            )

    return imgs.mapInPandas(batches, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, decode_mode: str = "real"
) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.

    Real mode decodes the AVI and emits the ACTUAL frame nearest each
    sampled timestamp, re-encoded as PNG, with a content-derived frame id
    (sha256 of the frame bytes).  Fake mode synthesizes frame rows from
    duration metadata (the explode/fan-out shape without decode).
    """
    vids = media.filter(F.col("kind") == "video")
    if decode_mode == "fake":
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
            F.lit(None).cast("binary").alias("frame"),
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    frames, fps = codecs.decode_avi(r.payload)
                except ValueError:
                    continue
                fps = fps or _VID_FPS
                duration_ms = len(frames) * 1000 // fps
                for ts in range(0, max(duration_ms, 1), every_ms):
                    idx = min(ts * fps // 1000, len(frames) - 1)
                    png = codecs.encode_png(frames[idx])
                    rows.append(
                        (
                            r.media_id, ts,
                            hashlib.sha256(png).hexdigest()[:16], png,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_ts_ms", "frame_id", "frame"]
            )

    return vids.mapInPandas(
        batches,
        schema="media_id long, frame_ts_ms long, frame_id string, frame binary",
    )
