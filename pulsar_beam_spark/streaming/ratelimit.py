"""G11 at stream level — per-key sliding-log rate limiting on the
Spark 4.x ``transformWithStateInPandas`` API (typed state variables),
the successor to streaming/stateful.py's ``applyInPandasWithState``.

Semantics (sliding-log limiter over ARRIVALS): an event is admitted iff
the number of arrivals for its key in the trailing window (t - W, t],
including itself, is <= K. This is the reference's admission-control
idea (src/middleware/middleware.go:70-81 semaphore + 429 shed; the
per-tenant quota variant) expressed over event time, and — because the
decision depends only on the arrival log, not on prior admissions — it
has a CLOSED-FORM batch equivalent: a RANGE-frame window count. The
golden test pins stream == batch regardless of micro-batch slicing;
the batch form doubles as the DuckDB oracle (a hash-checkable contract
for a stateful streaming operator).

State: one ListState row per arrival inside the window per key — pruned
every batch to the window width, so state is bounded by K-ish per key
(the rate itself bounds it), never by stream length.

Ordering contract: event-time order within a key across micro-batches
(the test feeds time-ordered files). Out-of-order input at scale is
handled upstream by a watermark + sort-within-batch stage, exactly like
every sliding-log limiter deployed behind a log broker.

Runtime note: transformWithStateInPandas spawns a state-server driver
worker that imports ``google.protobuf`` (a pyspark extra). Where that
is absent the stream path fails at query start; the batch form (and
its s_rate_limit_sliding oracle entry) carries the semantics, and the
stream==batch golden auto-runs wherever protobuf is installed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "key string, event_id bigint, ts_s bigint, admitted boolean"


class SlidingLogRateLimiter(StatefulProcessor):
    """Admit iff arrivals-in-window (inclusive) <= limit."""

    def __init__(self, window_s: int, limit: int):
        self.window_s = window_s
        self.limit = limit

    def init(self, handle: StatefulProcessorHandle) -> None:
        # arrival log (epoch seconds) for the trailing window
        self.log = handle.getListState("arrivals", "ts_s long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (k,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts_s", "event_id"], kind="mergesort")
        arrivals = [t for (t,) in self.log.get()]
        out_admitted = []
        for ts in pdf["ts_s"]:
            ts = int(ts)
            lo = ts - self.window_s
            # prune strictly-older-than-window arrivals (window is (t-W, t])
            while arrivals and arrivals[0] <= lo:
                arrivals.pop(0)
            arrivals.append(ts)
            out_admitted.append(len(arrivals) <= self.limit)
        self.log.put([(t,) for t in arrivals])
        yield pd.DataFrame(
            {
                "key": k,
                "event_id": pdf["event_id"].astype("int64"),
                "ts_s": pdf["ts_s"].astype("int64"),
                "admitted": out_admitted,
            }
        )

    def close(self) -> None:
        pass


def rate_limit_stream(
    stream: DataFrame,
    window_s: int,
    limit: int,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Wire the processor over a keyed stream: per-event admit/shed
    decisions in append mode. ``ts`` may be a timestamp (converted to
    epoch seconds) or already integral seconds."""
    prepped = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        F.unix_timestamp(ts_col).cast("long").alias("ts_s"),
    )
    return prepped.groupBy("key").transformWithStateInPandas(
        statefulProcessor=SlidingLogRateLimiter(window_s, limit),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def rate_limit_batch(
    df: DataFrame,
    window_s: int,
    limit: int,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Closed-form batch equivalent. The in-window-count up to the
    current arrival under (ts, id) lexicographic order is
    ``row_number() - count(arrivals with ts0 <= t - W)``: a ROWS
    cumulative count minus an unbounded-to-(-W) RANGE count. This
    matches the stream's tie handling exactly (an arrival only counts
    predecessors, even within the same second), unlike a plain
    RANGE-frame count which would see same-second successors too.
    The golden contract is rate_limit_stream == rate_limit_batch on
    ordered input; this is also the shape the DuckDB oracle runs."""
    from pyspark.sql import Window

    ts_s = F.unix_timestamp(ts_col).cast("long")
    base = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        ts_s.alias("ts_s"),
    )
    w_upto = Window.partitionBy("key").orderBy("ts_s", "event_id")
    w_older = (
        Window.partitionBy("key")
        .orderBy("ts_s")
        .rangeBetween(Window.unboundedPreceding, -window_s)
    )
    in_window = F.row_number().over(w_upto) - F.count("*").over(w_older)
    return base.select(
        "key", "event_id", "ts_s", (in_window <= limit).alias("admitted")
    )
