"""TopicConfig store: CRUD upsert (G7) + changelog->snapshot
materialization (G8).

The reference offers three backends behind one Crud interface
(src/db/interface.go:15-39): Mongo, in-memory, and *a compacted Pulsar
topic used as a table* (src/db/pulsardb.go). The Spark-native shape is a
single **changelog parquet table** (append-only) with a keyed last-write-
wins snapshot view — exactly what the compacted-topic reader
(src/db/pulsardb.go:86-127, ReadCompacted last-value-per-key, Deleted as
tombstone :272-297) computes imperatively.

At scale the changelog is partitioned by date and the snapshot window is
a single shuffle on ``key``; with Delta available the same logic is a
``MERGE INTO`` (noted, not required here — plain parquet keeps this repo
dependency-free).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .message import TOPIC_CONFIG_SCHEMA
from .topic import TopicStatus, Webhook, validate_topic_config


def changelog_snapshot(changelog: DataFrame, key: str = "key", version_col: str = "updated_at",
                       status_col: str = "topic_status", deleted: int = int(TopicStatus.DELETED)) -> DataFrame:
    """Last write per key, dropping keys whose last write is a tombstone.

    Equivalent SQL (the R29 pattern):
        ROW_NUMBER() OVER (PARTITION BY key ORDER BY updated_at DESC) = 1
        ... WHERE topic_status != 3
    """
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(status_col) != deleted))
        .drop("__rn")
    )


class ConfigStore:
    """Append-only changelog on disk + snapshot reads.

    API parity with the reference Crud interface (src/db/interface.go:15-25):
    GetByKey / Update (upsert) / DeleteByKey / Load.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _append(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [self._to_row(r) for r in rows], schema=TOPIC_CONFIG_SCHEMA
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    @staticmethod
    def _to_row(r: dict) -> tuple:
        return tuple(r.get(f.name) for f in TOPIC_CONFIG_SCHEMA.fields)

    def _changelog(self) -> DataFrame:
        return self.spark.read.schema(TOPIC_CONFIG_SCHEMA).parquet(self.path)

    def snapshot(self) -> DataFrame:
        return changelog_snapshot(self._changelog())

    # -- Crud parity ------------------------------------------------------
    def update(
        self,
        topic_full_name: str,
        pulsar_url: str,
        webhooks: list[Webhook] | None = None,
        token: str = "",
        tenant: str = "",
        notes: str | None = None,
        topic_status: int = int(TopicStatus.ACTIVATED),
    ) -> str:
        """Upsert (reference Update is create-or-replace,
        src/db/in-memory.go:99-121). Returns the SHA-1 key."""
        webhooks = webhooks or []
        key = validate_topic_config(topic_full_name, pulsar_url, webhooks)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        self._append(
            [
                {
                    "key": key,
                    "topic_full_name": topic_full_name,
                    "pulsar_url": pulsar_url,
                    "token": token,
                    "tenant": tenant,
                    "notes": notes,
                    "topic_status": topic_status,
                    "webhooks": [
                        tuple(
                            [w.url, w.headers, w.subscription, w.subscription_type, w.initial_position,
                             w.webhook_status, now, now, None]
                        )
                        for w in webhooks
                    ],
                    "created_at": now,
                    "updated_at": now,
                }
            ]
        )
        time.sleep(0.002)  # keep updated_at strictly monotone at test speed
        return key

    def get_by_key(self, key: str) -> dict | None:
        rows = self.snapshot().filter(F.col("key") == key).collect()
        return rows[0].asDict(recursive=True) if rows else None

    def delete_by_key(self, key: str) -> None:
        """Tombstone append (reference delete-as-status-Deleted,
        src/db/pulsardb.go:272-297)."""
        existing = self.get_by_key(key)
        if existing is None:
            raise KeyError(key)
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        existing.update({"topic_status": int(TopicStatus.DELETED), "updated_at": now, "webhooks": [
            tuple(w.values()) for w in existing.get("webhooks") or []
        ]})
        self._append([existing])
        time.sleep(0.002)

    def load(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.snapshot().collect()]


_ = asdict  # (dataclass helper retained for API users)
