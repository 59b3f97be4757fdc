"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` (per-partition batch iteration — the
amortized-setup pattern the reference uses for its shared
AudioSegmentExtractor, ref: transcription/audio_enrichment.py:327-333).

The container has no image/audio codecs, so the decode kernel is STUBBED:
``decoder="fake"`` produces deterministic metadata derived from the bytes
(stable for tests); ``decoder="pillow"``/``"ffmpeg"`` raise
NotImplementedError until the real libs are present. Everything around the
kernel — schema, batch shape, partitioning, UDF signature — is real and
tested; swapping in a real decoder changes ONE function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: dims/duration derived from the content
    hash so tests are stable; marks format from magic bytes when present."""
    h = hashlib.sha256(payload).digest()
    fmt = "png" if payload[:4] == b"\x89PNG" else ("jpeg" if payload[:2] == b"\xff\xd8" else "bin")
    return {
        "media_type": "image",
        "format": fmt,
        "n_bytes": len(payload),
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "duration_sec": 0.0,
        "sha256": hashlib.sha256(payload).hexdigest(),
    }


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: normalized bytes of the content hash."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_media(
    df: DataFrame,
    *,
    key_col: str = "url",
    binary_col: str = "html",
    decoder: str = "fake",
    feature_dim: int = 8,
) -> DataFrame:
    """mapInPandas decode + feature-extract over a binary column.

    Arrow batches in, arrow batches out; per-partition the decoder is
    constructed ONCE (amortized init), then applied per batch. Only the
    key + binary columns are read (column pruning keeps the scan narrow).
    """
    if decoder not in ("fake", "pillow", "ffmpeg"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder {decoder!r} requires media libraries not present in this "
            "environment; use decoder='fake' (deterministic stub) — the Spark "
            "plumbing (schema/batching/partitioning) is identical"
        )

    dim = feature_dim

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition one-time decoder setup would go here
        for pdf in batches:
            metas, feats = [], []
            for payload in pdf[binary_col]:
                b = bytes(payload) if payload is not None else b""
                metas.append(_fake_decode(b))
                feats.append(_fake_feature(b, dim))
            yield pd.DataFrame({"url": pdf[key_col], "meta": metas, "feature": feats})

    narrow = df.select(key_col, binary_col)
    return narrow.mapInPandas(decode_batches, schema=DECODE_OUTPUT_SCHEMA)


def frame_sample_plan(n_frames_expr: str = "cast(meta.duration_sec as int)"):
    """Placeholder for video frame sampling: the plan-side contract (explode
    frame indices, one row per sampled frame) without a codec."""
    from pyspark.sql import functions as F

    def apply(decoded: DataFrame, fps: float = 1.0) -> DataFrame:
        n = F.greatest(F.expr(n_frames_expr), F.lit(0))
        return decoded.select(
            "url", F.explode(F.sequence(F.lit(0), n)).alias("frame_idx")
        )

    return apply
