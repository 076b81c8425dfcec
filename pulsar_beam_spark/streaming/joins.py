"""Stream-stream joins — a capability the reference cannot express (its
consumers are independent loops over single topics; correlating two
streams requires the reply-loop round-trip through an external webhook).

Structured Streaming does this natively with watermarks bounding the
join state on both sides: each side buffers only rows newer than its
watermark, and the interval condition lets the engine evict state as
event time advances (state is O(windows in flight), not O(stream)).

The golden test (tests/test_streaming.py) checks stream⋈stream output
against the identical batch join — the same equivalence contract the
windowed aggregations use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner join rows sharing ``key`` whose event times fall within
    ``within`` of each other (right.ts in [left.ts, left.ts + within]).

    Both sides get watermarks so the join state is evictable; column
    names are prefixed to keep the output schema unambiguous. Works
    identically on batch DataFrames (watermark is a no-op there), which
    is what the golden equivalence test exploits.
    """
    l = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    if l.isStreaming:
        l = l.withWatermark(f"{left_prefix}{left_ts}", watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_prefix}{right_ts}", watermark)
    lt, rt = F.col(f"{left_prefix}{left_ts}"), F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(f"{left_prefix}{key}") == F.col(f"{right_prefix}{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")


def interval_join_left_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every left row appears;
    unmatched ones carry nulls on the right.

    The subtle Structured Streaming semantics this pins: an outer null
    result for a left row can only be EMITTED once the watermark proves
    no matching right row can still arrive (left.ts + within < right
    watermark), so outer rows trail the inner rows by up to the
    watermark delay — but the eventual output equals the batch left
    join exactly, which is what the golden test asserts after the
    stream drains. Both watermarks are REQUIRED for outer joins (the
    engine refuses unbounded outer state).
    """
    l = left.select([F.col(c).alias(f"{left_prefix}{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    if l.isStreaming:
        l = l.withWatermark(f"{left_prefix}{left_ts}", watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_prefix}{right_ts}", watermark)
    lt, rt = F.col(f"{left_prefix}{left_ts}"), F.col(f"{right_prefix}{right_ts}")
    cond = (
        (F.col(f"{left_prefix}{key}") == F.col(f"{right_prefix}{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "leftOuter")
