"""Streaming snapshot maintenance: a ``foreachBatch`` sink that keeps a
materialized latest-per-key snapshot up to date as changelog micro-batches
arrive — the streaming completion of G8 (one-shot changelog->snapshot)
and the streaming driver of the batch MERGE (operators/merge.py).

Reference parity: the compacted-topic model (src/db/pulsardb.go:86-127) —
consumers read the latest value per key while tombstones persist until
compaction. Here the "compacted topic" is a versioned parquet snapshot.

Semantics (arrival-order robust): each micro-batch is unioned with the
current snapshot and reduced by ``exact_dedup_latest`` on
(order_col, tiebreak) — so a late-arriving OLDER row can never clobber a
newer snapshot row, regardless of how the source splits or orders
micro-batches. Tombstones are RETAINED in the stored snapshot (they must
win recency contests against stale upserts) and filtered only in
``read_snapshot`` — exactly the compacted-topic rule.

Exactly-once: each epoch writes ``v{epoch}`` and then atomically flips a
LATEST pointer file (os.replace). A crash between write and flip leaves
the pointer on the previous consistent version; foreachBatch re-runs the
epoch and overwrites the same v-dir — idempotent.

Scale notes: the union+window shuffles base+delta on the key. For a
100 TB snapshot, store it bucketed by the key (sources/layout.
write_bucketed) so the window reuses the layout and only the delta
shuffles; when the source is an ordered log (Kafka/Pulsar offsets) whose
batches are strictly newer than the snapshot, the cheaper full-outer
MERGE (operators/merge.merge_upsert, delta pre-shrunk + AQE broadcast)
is the drop-in optimization.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup_latest

_POINTER = "LATEST"


def _latest_version(snapshot_dir: str) -> str | None:
    p = os.path.join(snapshot_dir, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        v = f.read().strip()
    return v or None


def _flip_pointer(snapshot_dir: str, version: str) -> None:
    tmp = os.path.join(snapshot_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(snapshot_dir, _POINTER))


def read_snapshot(spark: SparkSession, snapshot_dir: str, with_tombstones: bool = False) -> DataFrame | None:
    """Current snapshot view (tombstones filtered unless asked for)."""
    v = _latest_version(snapshot_dir)
    if v is None:
        return None
    df = spark.read.parquet(os.path.join(snapshot_dir, v))
    return df if with_tombstones else df.filter(F.col("__dead") == 0).drop("__dead")


def snapshot_merge_stream(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str,
    tiebreak: str,
    tombstone: Column,
    payload_cols: list[str],
    query_name: str = "snapshot-merge",
):
    """Start the maintenance query (caller awaits/stops it). State rows:
    keys + payload + (order_col, tiebreak) recency + __dead flag."""
    os.makedirs(snapshot_dir, exist_ok=True)
    cols = [*keys, *payload_cols, order_col, tiebreak]
    spark = stream.sparkSession

    def handle(batch_df: DataFrame, epoch: int) -> None:
        delta = batch_df.withColumn("__dead", tombstone.cast("int")).select(*cols, "__dead")
        base = read_snapshot(spark, snapshot_dir, with_tombstones=True)
        merged = exact_dedup_latest(
            delta if base is None else base.select(*cols, "__dead").unionByName(delta),
            keys, order_col, tiebreak,
        )
        vdir = f"v{epoch}"
        merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, vdir))
        _flip_pointer(snapshot_dir, vdir)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def read_sketch_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """Current sketch-table view: keys + sketch + approx_distinct."""
    v = _latest_version(snapshot_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(snapshot_dir, v))


def sketch_merge_stream(
    stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
    query_name: str = "sketch-merge",
):
    """Incremental per-key distinct-count maintenance: each micro-batch is
    sketched (hll_sketch_agg), merged with the stored sketches
    (hll_union_agg), and re-estimated — the streaming completion of
    r13_hll_mergeable.

    State is ONE row per key with a fixed-size sketch (~2^lg_k bytes):
    bounded regardless of how many distinct values flow through — the
    only way to keep streaming COUNT(DISTINCT) at 100 TB, where exact
    per-key value sets are unbounded state. HLL union is associative and
    order-insensitive, so the maintained estimate equals the single-pass
    batch sketch exactly (asserted in tests), regardless of micro-batch
    slicing. Same versioned-parquet + atomic pointer-flip exactly-once
    scheme as snapshot_merge_stream.
    """
    os.makedirs(snapshot_dir, exist_ok=True)
    spark = stream.sparkSession

    def handle(batch_df: DataFrame, epoch: int) -> None:
        delta = batch_df.groupBy(*keys).agg(
            F.hll_sketch_agg(value_col, lg_k).alias("sk")
        )
        base = read_sketch_snapshot(spark, snapshot_dir)
        merged = (
            delta if base is None else base.select(*keys, "sk").unionByName(delta)
        ).groupBy(*keys).agg(F.hll_union_agg("sk").alias("sk"))
        out = merged.withColumn(
            "approx_distinct", F.hll_sketch_estimate("sk").cast("long")
        )
        vdir = f"v{epoch}"
        out.write.mode("overwrite").parquet(os.path.join(snapshot_dir, vdir))
        _flip_pointer(snapshot_dir, vdir)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
