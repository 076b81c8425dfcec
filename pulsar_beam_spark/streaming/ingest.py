"""G1 — streaming ingest: raw rows -> Message-envelope stream (S1).

Reference parity (src/route/handlers.go:83-139 + pulsar-producer.go:71-106):
- event_time stamped at produce time (producer.go:91) -> here the source
  row's ts; publish_time = processing timestamp.
- a unique PulsarBeamId property per message (producer.go:80-87)
  -> uuid() column in the properties map.
- optional header envelope (?includeHeaders=true, handlers.go:108-120)
  -> payload becomes to_json(struct(headers, body)).
- gzip bodies (handlers.go:86-100) -> gunzip kernel in an Arrow-batched
  pandas UDF (no JVM built-in exists; cold path only).

The file-based `events` fixture stands in for the Pulsar topic
(SURVEY.md §0); at production scale the same plan reads
``spark.readStream.format("pulsar"|"kafka")`` — only the source line
changes, the envelope logic is identical.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..model.message import MESSAGE_SCHEMA


def gunzip_udf():
    """Arrow-batched gunzip kernel (built lazily — pandas_udf needs an
    active session to parse its return type)."""

    @pandas_udf("binary")
    def _gunzip(b: pd.Series) -> pd.Series:
        def _un(x):
            if x is None:
                return None
            raw = bytes(x)
            return gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw

        return b.map(_un)

    return _gunzip


def events_as_messages(events: DataFrame, topic_expr: F.Column) -> DataFrame:
    """Normalize the events fixture into the Message envelope schema."""
    return events.select(
        F.concat(F.lit("msg-"), F.col("event_id").cast("string")).alias("message_id"),
        topic_expr.alias("topic"),
        F.col("user_id").cast("string").alias("key"),
        F.encode(F.to_json(F.struct("event_type", "value", "props")), "UTF-8").alias("payload"),
        F.col("ts").alias("event_time"),
        F.current_timestamp().alias("publish_time"),
        F.create_map(F.lit("PulsarBeamId"), F.expr("uuid()")).alias("properties"),
    )


def envelope_with_headers(df: DataFrame, headers_col: str = "properties") -> DataFrame:
    """?includeHeaders=true envelope: payload := json({headers, body})
    (reference InfoRichMessage, src/route/handlers.go:77-80)."""
    return df.withColumn(
        "payload",
        F.encode(
            F.to_json(
                F.struct(
                    F.col(headers_col).alias("headers"),
                    F.decode("payload", "UTF-8").alias("body"),
                )
            ),
            "UTF-8",
        ),
    )


def ingest_stream(
    spark: SparkSession,
    source_dir: str,
    topic: str = "persistent://public/default/ingest",
    include_headers: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming read normalized to the Message envelope.

    maxFilesPerTrigger is the admission-control knob standing in for the
    reference's 200-request semaphore (G11): it bounds per-microbatch work.
    """
    reader = spark.readStream.schema(MESSAGE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(source_dir)
    if include_headers:
        df = envelope_with_headers(df)
    return df
