"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes / clearly-marked stubs — but the Spark-side contract is
real and tested: schema, Arrow-batched mapInPandas signature, partitioning
behavior, and batch shapes are exactly what a production decoder would use
(swap `_fake_decode_image` for PIL/libvips and nothing else changes).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image | audio | video
    StructField("content", BinaryType(), False),       # opaque payload
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("byte_len", IntegerType(), False),
    StructField("sha_prefix", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),  # pooled embedding
])


def documents_as_media(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary plumbing is exercised against real test tables."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        F.col(text_col).cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decode: a real deployment calls PIL/turbojpeg here.
    Deterministic fake: md5-seeded pseudo-pixels pooled to `dim` floats —
    stable across executors/retries, which is what the tests verify."""
    digest = hashlib.md5(payload).digest()
    vals = struct.unpack(">4I", digest)
    return [round((vals[i % 4] % 1000) / 1000.0 + i * 0.001, 6) for i in range(dim)]


def extract_image_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas receives whole Arrow batches (not rows); at scale the input
    should be repartitioned so one batch ≈ one GPU/decoder-friendly chunk —
    callers control that with `media.repartition(n)` before this."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                b = bytes(payload)
                rows.append((int(mid), len(b), hashlib.sha256(b).hexdigest()[:16],
                             _fake_decode_image(b, dim)))
            yield pd.DataFrame(rows, columns=["media_id", "byte_len", "sha_prefix", "feature"])

    return media.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: raises when actually asked to decode — the plumbing
    (schema + partition shape) is real; the kernel needs an image lib."""
    def gen(batches):
        raise NotImplementedError(
            "image resize requires an image codec (PIL/libvips) not present "
            "in this container; wire it into this mapInPandas kernel")
        yield  # pragma: no cover

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampler — same contract as resize_stub."""
    def gen(batches):
        raise NotImplementedError(
            "video frame sampling requires an AV codec (pyav/ffmpeg) not "
            "present in this container; wire it into this mapInPandas kernel")
        yield  # pragma: no cover

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata over opaque payloads — JVM-side only (no decode):
    byte length + md5, the minimum viable audit columns for a media lake."""
    return media.select(
        "media_id", "media_type",
        F.length("content").cast("int").alias("byte_len"),
        F.md5("content").alias("content_md5"),
    )
