"""G5/S7 — bounded batch poll: collect up to batchSize earliest messages
and return the reference's JSON batch envelope.

Reference parity (src/route/handlers.go:151-185 + sse-broker.go:34-61):
- always earliest position (sse-broker.go:36)
- batchSize default 10 (handlers.go:163)
- returns {"limit": N, "size": n, "messages": [...]}
  (PulsarMessages, src/model/message.go:21-52); empty -> 204 ≙ None here.

Spark shape: Trigger.AvailableNow bounded read; the per-message timeout
becomes the trigger deadline (the batch returns whatever arrived).
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.message import MESSAGE_SCHEMA


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
    subscription-name semantics of G6 (resumable vs NonResumable*).
    """
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="pbs-poll-")
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
            )
            .collect()
        )
        sink_rows.extend(r.asDict() for r in rows)

    reader = spark.readStream.schema(MESSAGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(take_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # AvailableNow may split the backlog into several micro-batches (e.g.
    # maxFilesPerTrigger); each batch contributed its own earliest rows, so
    # re-sort the union before truncating to the globally earliest batch.
    sink_rows.sort(key=lambda r: (r["event_time"], r["message_id"]))
    batch = sink_rows[:batch_size]
    if not batch:
        return None
    return {"limit": batch_size, "size": len(batch), "messages": batch}


def poll_json(spark: SparkSession, source_dir: str, batch_size: int = 10) -> str | None:
    out = bounded_poll(spark, source_dir, batch_size)
    return None if out is None else json.dumps(out)
