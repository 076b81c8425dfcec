"""S2-S6 — watermarked window aggregations and stateful dedup over the
Message/event stream. Thin declarative wrappers: the point is pinning the
watermark/window/output-mode contract (documented per SURVEY.md §7 risk
register: bounded state keys, explicit watermark choices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(stream: DataFrame, ts: str = "event_time", width: str = "5 minutes",
                    watermark: str = "10 minutes", key: str = "topic") -> DataFrame:
    """S3: tumbling window counts; late rows beyond the watermark drop (S2)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, width).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), key, "n")
    )


def sliding_counts(stream: DataFrame, ts: str = "event_time", width: str = "10 minutes",
                   slide: str = "5 minutes", watermark: str = "10 minutes", key: str = "topic") -> DataFrame:
    """S4: sliding window counts."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, width, slide).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "n")
    )


def session_counts(stream: DataFrame, ts: str = "event_time", gap: str = "5 minutes",
                   watermark: str = "10 minutes", key: str = "key") -> DataFrame:
    """S5: session windows with a fixed inactivity gap. State is bounded
    by (key x open sessions); the watermark closes sessions."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(ts, gap).alias("w"), key)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), key, "n")
    )


def dedup_stream(stream: DataFrame, ts: str = "event_time", watermark: str = "10 minutes",
                 id_col: str = "message_id") -> DataFrame:
    """S6: stateful dedup on message id. dropDuplicatesWithinWatermark
    bounds state to the watermark horizon — at 100 TB/day an unbounded
    dropDuplicates would OOM the state store; within-watermark is the
    only scalable contract (matches the reference's effective guarantee:
    Pulsar broker dedup is likewise time-bounded)."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark([id_col])
