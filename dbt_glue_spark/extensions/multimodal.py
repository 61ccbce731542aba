"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode step is STUBBED (image/audio libraries are not available in this
container — see ``DecodeUnavailable``); everything Spark-side is real:
schemas, Arrow-batched pandas UDF signatures, ``mapInPandas`` streaming
iteration (bounded memory per batch), and partition sizing. Swapping the
fake decoder for Pillow/torchaudio changes one function body, not the plan.

Scale notes: media bytes dominate row size, so `spark.sql.files.
maxPartitionBytes` should be raised (512 MB+) and the decode stage must
never shuffle raw bytes — all functions here keep binary columns out of
wide transformations; derived features (small, fixed-width) are what flows
into joins/aggregations downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: media codecs are not installed."""


def _fake_feature(data: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256 scaled to [-1, 1]. Replaced by a real model/codec in production."""
    if data is None:
        return [0.0] * dim
    h = hashlib.sha256(data).digest()
    return [h[i] / 127.5 - 1.0 for i in range(dim)]


def decode_image(data: bytes):  # pragma: no cover - by design
    """Real decode stub — would return (width, height, pixel array)."""
    raise DecodeUnavailable("image codecs not installed in this environment")


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for testing the plumbing."""
    rows = [
        (
            i,
            ("image", "audio", "video")[i % 3],
            hashlib.sha256(str(i).encode()).digest() * 4,
            ("image/png", "audio/wav", "video/mp4")[i % 3],
            64 + i % 32,
            64 + (i * 7) % 32,
            1000 * (1 + i % 10),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary media content.

    The iterator contract keeps peak memory to one Arrow batch of binary
    rows; the returned frame carries only small fixed-width features, so
    downstream stages never shuffle raw media bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": pdf["content"].map(_fake_feature),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp.

    The frame decode itself is stubbed (content passthrough of the sha);
    the explode + timestamp arithmetic — the part Spark owns — is real.
    """
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )
    return frames
