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
epoch and overwrites the same v-dir — idempotent. A crash AFTER the flip
but before the stream checkpoint commits replays an epoch whose v-dir is
already current — that replay is SKIPPED outright (pointer == v{epoch}
proves write+flip completed, and a replayed epoch carries the same batch
data), because re-running it would read the base snapshot from the very
directory the overwrite is deleting — behavior Spark does not define for
a path that is simultaneously being read. Corollary: ``snapshot_dir``
and ``checkpoint_dir`` are a PAIR — reusing a populated snapshot dir
with a fresh checkpoint restarts epoch numbering against leftover
higher-numbered v-dirs and is unsupported.

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
import re
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup_latest

_POINTER = "LATEST"
_VDIR = re.compile(r"^v(\d+)$")


def _gc_versions(snapshot_dir: str, current: str, keep: int) -> None:
    """Retention GC, called strictly AFTER the pointer flip: keep the
    ``keep`` newest v-dirs (the flipped ``current`` is always among
    them), delete the rest. Delete-after-flip ordering means a reader
    that resolved LATEST to the PREVIOUS version before the flip still
    has its directory (keep >= 2 retains it until the NEXT flip); the
    documented read contract is that a snapshot read must complete
    within ``keep - 1`` subsequent epochs."""
    vdirs = []
    for name in os.listdir(snapshot_dir):
        m = _VDIR.match(name)
        if m and os.path.isdir(os.path.join(snapshot_dir, name)):
            vdirs.append((int(m.group(1)), name))
    vdirs.sort(reverse=True)
    survivors = {name for _, name in vdirs[:keep]} | {current}
    for _, name in vdirs:
        if name not in survivors:
            shutil.rmtree(os.path.join(snapshot_dir, name), ignore_errors=True)


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
    keep_versions: int = 3,
):
    """Start the maintenance query (caller awaits/stops it). State rows:
    keys + payload + (order_col, tiebreak) recency + __dead flag.

    ``keep_versions`` bounds disk: after each pointer flip, only the
    newest N v-dirs survive (min 2, so the previously-current version
    always outlives the flip for in-flight readers; a read must finish
    within ``keep_versions - 1`` subsequent epochs). Size bound: each
    epoch rewrites the FULL snapshot, so disk ≈ keep_versions x snapshot
    size and epoch cost is O(snapshot + delta) — right for config-sized
    and dimension-sized tables (the G8 use). For a 100 TB fact snapshot
    use the batch MERGE (operators/merge.merge_upsert) over a bucketed
    base instead; this sink's rewrite would be the bottleneck."""
    os.makedirs(snapshot_dir, exist_ok=True)
    cols = [*keys, *payload_cols, order_col, tiebreak]
    spark = stream.sparkSession
    keep = max(2, int(keep_versions))

    def handle(batch_df: DataFrame, epoch: int) -> None:
        vdir = f"v{epoch}"
        if _latest_version(snapshot_dir) == vdir:
            # crash-after-flip replay: write+flip already completed and a
            # replayed epoch re-delivers the same batch, so re-merging
            # would only read base from the v-dir the overwrite deletes
            # (undefined in Spark). Idempotent no-op.
            return
        delta = batch_df.withColumn("__dead", tombstone.cast("int")).select(*cols, "__dead")
        base = read_snapshot(spark, snapshot_dir, with_tombstones=True)
        merged = exact_dedup_latest(
            delta if base is None else base.select(*cols, "__dead").unionByName(delta),
            keys, order_col, tiebreak,
        )
        merged.write.mode("overwrite").parquet(os.path.join(snapshot_dir, vdir))
        _flip_pointer(snapshot_dir, vdir)
        _gc_versions(snapshot_dir, vdir, keep)

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
    keep_versions: int = 3,
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
    scheme and keep-N retention GC as snapshot_merge_stream (state is
    one fixed-size sketch per key, so keep_versions x that is tiny).
    """
    os.makedirs(snapshot_dir, exist_ok=True)
    spark = stream.sparkSession
    keep = max(2, int(keep_versions))

    def handle(batch_df: DataFrame, epoch: int) -> None:
        vdir = f"v{epoch}"
        if _latest_version(snapshot_dir) == vdir:
            # crash-after-flip replay already committed — skip (see
            # snapshot_merge_stream.handle)
            return
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
        out.write.mode("overwrite").parquet(os.path.join(snapshot_dir, vdir))
        _flip_pointer(snapshot_dir, vdir)
        _gc_versions(snapshot_dir, vdir, keep)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
