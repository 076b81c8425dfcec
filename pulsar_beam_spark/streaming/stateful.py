"""Custom stateful streaming operator (SURVEY.md §2.3) built on
``applyInPandasWithState`` — the escape hatch for semantics the built-in
windowed aggregations can't express.

Models the reference's per-connection TTL bookkeeping
(``src/util/ttlcache.go:12-137``, producer cache TTL 900 s at
``src/pulsardriver/pulsar-producer.go:15``): one state row per key
(topic), carrying a running message count + byte total + last-seen
timestamp, evicted on a processing-time TTL exactly like the cache's
close-on-expire callback.

Scale contract: state is one tiny fixed-width row per *distinct key*
(topic), not per message — bounded by topic cardinality, never by
throughput. The TTL eviction keeps abandoned topics from accumulating
state forever, which is what makes this safe on an unbounded stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_messages bigint, total_bytes bigint, expired boolean"
STATE_SCHEMA = "n_messages bigint, total_bytes bigint"

DEFAULT_TTL_MS = 900_000  # reference producer-cache TTL: 900 s


def running_counts_with_ttl(
    stream: DataFrame,
    key_col: str = "topic",
    payload_col: str = "payload",
    ttl_ms: int = DEFAULT_TTL_MS,
) -> DataFrame:
    """Per-key running message count + byte total with TTL eviction.

    Emits one updated row per key per micro-batch (update mode); a final
    ``expired=true`` tombstone row when the key has been idle past
    ``ttl_ms``. Arrow-batched: each group's rows arrive as pandas frames,
    never row-at-a-time Python.
    """

    def update_fn(key, pdfs, state):
        (k,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [k], "n_messages": [n], "total_bytes": [total], "expired": [True]}
            )
            return
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["n_bytes"].sum())
        state.update((n, total))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"key": [k], "n_messages": [n], "total_bytes": [total], "expired": [False]}
        )

    prepped = stream.select(
        F.col(key_col).alias("key"), F.octet_length(payload_col).cast("long").alias("n_bytes")
    )
    return prepped.groupBy("key").applyInPandasWithState(
        update_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
