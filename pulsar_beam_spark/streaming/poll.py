"""G5/S7 — bounded batch poll: collect up to batchSize earliest messages
and return the reference's JSON batch envelope.

Reference parity (src/route/handlers.go:151-185 + sse-broker.go:34-61):
- always earliest position (sse-broker.go:36)
- batchSize default 10 (handlers.go:163)
- returns {"limit": N, "size": n, "messages": [...]}
  (PulsarMessages, src/model/message.go:21-52); empty -> 204 ≙ None here.
- **ack-on-delivery**: the reference acks ONLY the messages it actually
  returned (sse-broker.go:48-57, ``consumer.Ack(msg)`` per received
  message inside the size loop), so a durable subscription's NEXT poll
  resumes at the first un-delivered message — overflow beyond batchSize
  stays in the backlog.

Spark shape: Trigger.AvailableNow bounded read. The durable-subscription
cursor is ROW-granular, not stream-checkpoint-granular: a Spark stream
checkpoint commits whole source offsets (every file AvailableNow read),
which would silently ack the undelivered overflow. Instead each resumable
poll re-reads the available backlog through a throwaway stream checkpoint,
filters ``(event_time, message_id) > cursor`` (a plain column predicate,
so parquet row-group min/max pruning skips already-delivered history),
and atomically persists the last DELIVERED row as the new cursor — the
exact analogue of per-message ack.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.message import MESSAGE_SCHEMA

_CURSOR = "CURSOR"


def _read_cursor(checkpoint_dir: str) -> tuple[int, str] | None:
    """Last delivered (event_time unix-micros, message_id), or None."""
    p = os.path.join(checkpoint_dir, _CURSOR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    return int(d["event_time_us"]), str(d["message_id"])


def _write_cursor(checkpoint_dir: str, event_time_us: int, message_id: str) -> None:
    # tmp + os.replace: a crash mid-write leaves the previous cursor
    # intact -> the batch redelivers (at-least-once, same as the
    # reference's unacked-redelivery behavior).
    tmp = os.path.join(checkpoint_dir, _CURSOR + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"event_time_us": event_time_us, "message_id": message_id}, f)
    os.replace(tmp, os.path.join(checkpoint_dir, _CURSOR))


def bounded_poll(
    spark: SparkSession,
    source_dir: str,
    batch_size: int = 10,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> dict | None:
    """One bounded poll: read what is available now, keep the earliest
    ``batch_size`` messages by (event_time, message_id), return the JSON
    envelope dict (None ≙ reference's 204 No Content).

    A non-None ``checkpoint_dir`` makes successive polls resume — the
    subscription-name semantics of G6 (resumable vs NonResumable*): only
    the DELIVERED rows advance the cursor, so overflow beyond
    ``batch_size`` is returned by the next poll, exactly like the
    reference's per-message ack (sse-broker.go:48-57). The cursor is the
    (event_time, message_id) total order used for delivery; a message
    appended later with an event_time at or before the cursor is
    considered already-consumed history (earliest-position subscriptions
    deliver in event order, and the order key is monotone for a live
    topic whose producers stamp arrival time).

    With ``checkpoint_dir=None`` the poll is stateless always-earliest —
    the reference's auto-named NonResumable subscription, which
    unsubscribes after each poll.
    """
    cursor = _read_cursor(checkpoint_dir) if checkpoint_dir else None

    sink_rows: list[dict] = []

    def take_batch(df: DataFrame, _epoch: int) -> None:
        rows = (
            df.orderBy("event_time", "message_id")
            .limit(batch_size)
            .select(
                "message_id",
                "topic",
                "key",
                F.decode("payload", "UTF-8").alias("payload"),
                F.date_format("event_time", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("event_time"),
                F.unix_micros("event_time").alias("_us"),
            )
            .collect()
        )
        sink_rows.extend(r.asDict() for r in rows)

    reader = spark.readStream.schema(MESSAGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    if cursor is not None:
        c_us, c_id = cursor
        c_ts = F.timestamp_micros(F.lit(c_us))
        # plain column comparison -> pushed to the parquet scan, so row
        # groups wholly before the cursor are skipped via footer min/max
        stream = stream.where(
            (F.col("event_time") > c_ts)
            | ((F.col("event_time") == c_ts) & (F.col("message_id") > F.lit(c_id)))
        )

    # The stream checkpoint is ALWAYS throwaway: it only fences this one
    # AvailableNow run. Durability lives in the row-granular CURSOR file —
    # reusing the stream checkpoint as the poll cursor would commit (ack)
    # the entire backlog while delivering only batch_size rows.
    stream_ckpt = tempfile.mkdtemp(prefix="pbs-poll-stream-")
    try:
        q = (
            stream.writeStream.foreachBatch(take_batch)
            .option("checkpointLocation", stream_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(stream_ckpt, ignore_errors=True)

    # AvailableNow may split the backlog into several micro-batches (e.g.
    # maxFilesPerTrigger); each batch contributed its own earliest rows, so
    # re-sort the union before truncating to the globally earliest batch.
    sink_rows.sort(key=lambda r: (r["_us"], r["message_id"]))
    batch = sink_rows[:batch_size]
    if not batch:
        return None
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        _write_cursor(checkpoint_dir, batch[-1]["_us"], batch[-1]["message_id"])
    for r in batch:
        del r["_us"]
    return {"limit": batch_size, "size": len(batch), "messages": batch}


def poll_json(spark: SparkSession, source_dir: str, batch_size: int = 10) -> str | None:
    out = bounded_poll(spark, source_dir, batch_size)
    return None if out is None else json.dumps(out)
