"""Multimodal columns: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns with
a metadata struct (media_type, width/height or sample_rate/duration,
codec). Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested; the actual
codec call is STUBBED (this container has no image/audio libraries):
``decode_media`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case features derive from md5 of
the payload — stable, testable, and exercising the exact batch shapes the
real implementation would.

Scale notes: binary payloads dominate bytes, so the plan keeps them in
one pass (scan → mapInPandas → write) with metadata-only predicates
pushed to the scan (media_type, size) — column pruning means a
metadata-only query never reads payload bytes from Parquet/Iceberg.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def media_from_docs(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents corpus (text
    bytes as fake payloads) — the engine-side schema/partitioning is what
    matters; payloads are opaque by design."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.pmod(F.col("doc_id"), F.lit(64)) * 16 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(48)) * 16 + 64).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        F.lit("synthetic/v1").alias("codec"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list:
    """Deterministic stand-in for a real encoder: md5-seeded floats in
    [0, 1). Replace with the real model call on a GPU cluster.

    The per-dimension salt byte is 1-based (1..dim, no NUL) so that for
    text-derived payloads the whole recipe is reproducible as plain SQL
    (``md5(text || chr(i))``) — which is what makes the driver's
    hash-exact DuckDB oracle for multimodal_features possible."""
    out = []
    h = payload or b""
    for i in range(dim):
        d = hashlib.md5(h + bytes([i + 1])).digest()
        out.append(int.from_bytes(d[:4], "big") / 2**32)
    return out


def extract_features(
    media: DataFrame, deterministic_fake: bool = False, dim: int = FEATURE_DIM
) -> DataFrame:
    """Batched media → feature vectors. Real decode is stubbed: without
    ``deterministic_fake`` this raises NotImplementedError (no PIL/ffmpeg
    in this container) — the mapInPandas plumbing is the deliverable."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if not deterministic_fake:
            raise NotImplementedError(
                "real media decode needs image/audio libs absent from this "
                "container; pass deterministic_fake=True for the plumbing path"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": [
                        [float(x) for x in _fake_features(bytes(p) if p is not None else b"", dim)]
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("payload", MEDIA_SCHEMA["payload"].dataType),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize plan: target dims computed JVM-side (pure
    arithmetic, no Python); the pixel transform itself is the stubbed
    decode step — payload passes through untouched here."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"),
        F.lit(float(max_side)) / F.col("height"),
        F.lit(1.0),
    )
    return media.filter(F.col("media_type") == "image").select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
        "payload",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp
    (sequence + explode — JVM-side); frame decode itself is the stub."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            "duration_ms",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
