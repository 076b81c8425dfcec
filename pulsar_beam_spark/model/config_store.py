"""TopicConfig store: CRUD upsert (G7) + changelog->snapshot
materialization (G8), with two pluggable backends.

The reference offers three backends behind one Crud interface
(src/db/interface.go:15-39): Mongo, in-memory, and *a compacted Pulsar
topic used as a table* (src/db/pulsardb.go). Here:

- ``ConfigStore`` — the Spark-native shape: an append-only **changelog
  parquet table** with a keyed last-write-wins snapshot view, exactly
  what the compacted-topic reader (src/db/pulsardb.go:86-127,
  ReadCompacted last-value-per-key, Deleted as tombstone :272-297)
  computes imperatively.
- ``InMemoryConfigStore`` — the dict backend (src/db/in-memory.go:53-140)
  for tests/ephemeral runs; same API, same semantics.

Ordering: last-write-wins is decided by ``(updated_at, version)`` where
``version`` is a monotonic per-store sequence — the analogue of the
compacted topic's ledger ordering — so writes inside one clock tick (or
under a coarse/backwards clock) still resolve deterministically.

At scale the changelog is partitioned by date and the snapshot window is
a single shuffle on ``key``; with Delta available the same logic is a
``MERGE INTO`` (noted, not required here — plain parquet keeps this repo
dependency-free).
"""

from __future__ import annotations

import copy
import os
from dataclasses import asdict
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .message import TOPIC_CONFIG_SCHEMA
from .topic import TopicStatus, Webhook, validate_topic_config


def changelog_snapshot(changelog: DataFrame, key: str = "key", version_col: str = "updated_at",
                       seq_col: str | None = "version",
                       status_col: str = "topic_status", deleted: int = int(TopicStatus.DELETED)) -> DataFrame:
    """Last write per key, dropping keys whose last write is a tombstone.

    Equivalent SQL (the R29 pattern):
        ROW_NUMBER() OVER (PARTITION BY key ORDER BY updated_at DESC, version DESC) = 1
        ... WHERE topic_status != 3
    """
    order = [F.col(version_col).desc()]
    if seq_col is not None and seq_col in changelog.columns:
        order.append(F.col(seq_col).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(status_col) != deleted))
        .drop("__rn")
    )


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def _config_doc(key: str, topic_full_name: str, pulsar_url: str, webhooks: list[Webhook],
                token: str, tenant: str, notes: str | None, topic_status: int,
                now: datetime, version: int) -> dict:
    return {
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
        "version": version,
    }


class ConfigStore:
    """Append-only changelog on disk + snapshot reads.

    API parity with the reference Crud interface (src/db/interface.go:15-25):
    GetByKey / Update (upsert) / DeleteByKey / Load.
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._version = self._max_version()

    def _max_version(self) -> int:
        """Resume the sequence after reopen: max version in the changelog."""
        try:
            row = self._changelog().agg(F.max("version").alias("v")).head()
            return int(row["v"]) if row and row["v"] is not None else 0
        except Exception:  # empty dir: no parquet yet
            return 0

    def _next_version(self) -> int:
        self._version += 1
        return self._version

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
        self._append(
            [_config_doc(key, topic_full_name, pulsar_url, webhooks, token, tenant,
                         notes, topic_status, _now(), self._next_version())]
        )
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
        existing.update({
            "topic_status": int(TopicStatus.DELETED),
            "updated_at": _now(),
            "version": self._next_version(),
            "webhooks": [tuple(w.values()) for w in existing.get("webhooks") or []],
        })
        self._append([existing])

    def load(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.snapshot().collect()]


class InMemoryConfigStore:
    """Dict-backed Crud backend (reference src/db/in-memory.go:53-140):
    same API and last-write-wins/tombstone semantics as ConfigStore, no
    Spark session needed. The reference keeps tombstones implicit (the
    map entry is removed); we do the same."""

    def __init__(self):
        self._docs: dict[str, dict] = {}
        self._version = 0

    def _next_version(self) -> int:
        self._version += 1
        return self._version

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
        webhooks = webhooks or []
        key = validate_topic_config(topic_full_name, pulsar_url, webhooks)
        doc = _config_doc(key, topic_full_name, pulsar_url, webhooks, token, tenant,
                          notes, topic_status, _now(), self._next_version())
        self._docs[key] = doc
        return key

    def get_by_key(self, key: str) -> dict | None:
        doc = self._docs.get(key)
        return copy.deepcopy(doc) if doc is not None else None

    def delete_by_key(self, key: str) -> None:
        if key not in self._docs:
            raise KeyError(key)
        del self._docs[key]

    def load(self) -> list[dict]:
        return [copy.deepcopy(d) for d in self._docs.values()]


_ = asdict  # (dataclass helper retained for API users)
