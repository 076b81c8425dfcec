"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The actual decoders (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a *deterministic* fake feature vector
is derived from the bytes (so tests exercise the real Spark plumbing —
schema, Arrow batching, partitioning — end to end).

Scale design: mapInPandas streams Arrow record batches through Python, so
peak executor memory is one batch (spark.sql.execution.arrow.maxRecordsPerBatch),
not one partition; binary payloads never materialize on the driver.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_crc", LongType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: text bytes act
    as the opaque payload (the container has no real image/audio data)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_image(content: bytes) -> "object":
    """Real decoder entry point — not available in this container."""
    raise NotImplementedError("image decoding requires PIL/cv2, not present in this environment")


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: sha256 bytes -> dim doubles in [0,1)."""
    digest = hashlib.sha256(content).digest()
    return [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    With ``fake=False`` this calls the (stubbed) real decoder and raises;
    with ``fake=True`` it computes a deterministic digest-based feature
    vector — identical Spark plumbing either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            feats = []
            for raw in content:
                raw = bytes(raw) if raw is not None else b""
                if not fake:
                    decode_image(raw)
                feats.append(_fake_features(raw, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_crc": content.map(lambda b: zlib.crc32(bytes(b)) if b is not None else 0).astype("int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Arrow-batched image resize over binary payloads.

    Same mapInPandas shape as feature extraction: with ``fake=True`` the
    "resized" payload is a deterministic truncation/pad of the original
    bytes to width*height (so schema, batching, and size accounting are
    exercised for real); ``fake=False`` reaches the stubbed decoder and
    raises — swap in PIL's ``Image.resize`` when the library exists.
    Output keeps MEDIA_SCHEMA with width/height stamped, so resize
    composes with extract_features / frame_sample_plan.
    """
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_content = []
            for raw in pdf["content"]:
                raw = bytes(raw) if raw is not None else b""
                if not fake:
                    decode_image(raw)
                out_content.append(raw[:target].ljust(target, b"\0"))
            out = pdf.copy()
            out["content"] = out_content
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(batches, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan* (timestamps to decode): pure-SQL
    sequence expansion; the decode itself is the stubbed kernel above."""
    return (
        media.filter(F.col("modality") == "video")
        .withColumn("duration_ms", F.coalesce(F.col("duration_ms"), F.octet_length("content").cast("long")))
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))).alias(
                "frame_ts_ms"
            ),
        )
    )
