"""Batch MERGE/upsert: apply a changelog delta to a materialized snapshot.

The incremental sibling of the full changelog->snapshot materialization
(SURVEY.md G8; reference compacted-topic last-write-wins,
src/db/pulsardb.go:92-96 and the Update/Delete semantics of
src/db/interface.go:15-39): given a BASE snapshot (one row per key) and
a DELTA changelog slice (many rows per key, possibly tombstones), emit
the next snapshot — exactly what ``MERGE INTO`` does in SQL engines that
have it, expressed as a full outer join so it runs on plain parquet.

Invariant (and the oracle): because every delta row is strictly newer
than every base row, ``merge_upsert(snapshot(log < t), log >= t)`` must
equal ``snapshot(log)`` — the merge is verified against the one-shot
materialization of the whole log.

Scale design: the join shuffles both sides on the key — unavoidable in
general, but (a) the delta is normally a tiny fraction of the base, so
AQE broadcasts it and the base is NOT shuffled; (b) a bucketed base
table (sources/layout.write_bucketed) makes the periodic re-merge
shuffle-free on the base side at any size; (c) the delta is pre-shrunk
to latest-per-key BEFORE the join (window over the delta only), so the
join width is one row per touched key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup_latest


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: str,
    tombstone: Column,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Next snapshot = base upserted/deleted by the latest delta per key.

    ``base`` has one live row per key (no tombstones). ``delta`` is a raw
    changelog slice; only its latest row per key wins. A winning
    tombstone deletes the key; a winning upsert replaces the payload;
    keys untouched by the delta pass through.
    """
    latest = exact_dedup_latest(
        delta.withColumn("__dead", tombstone.cast("int")), keys, order_col, tiebreak
    ).select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col("__dead"),
        *[F.col(c).alias(f"__d_{c}") for c in payload_cols],
    )
    cond = [base[k] == latest[f"__k_{k}"] for k in keys]
    joined = base.join(latest, cond, "full_outer")
    touched = F.col("__dead").isNotNull()
    return (
        joined.filter(~touched | (F.col("__dead") == 0))
        .select(
            *[
                F.coalesce(base[k], F.col(f"__k_{k}")).alias(k)
                for k in keys
            ],
            *[
                F.when(touched, F.col(f"__d_{c}")).otherwise(base[c]).alias(c)
                for c in payload_cols
            ],
        )
    )
