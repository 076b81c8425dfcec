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
- ``FileConfigStore`` — a document store: one JSON document per key in a
  directory, atomic replace per write.  The structural analogue of the
  reference's Mongo backend (src/db/mongo.go:92-258 — a keyed document
  collection with InsertOne/FindOne/$set-upsert/DeleteOne), completing
  the reference's three-backend plurality behind one Crud API.
- ``DbApiConfigStore`` — the same keyed-document model on a real server
  database through any PEP 249 driver (sqlite3 bundled, Postgres/MySQL
  by injection) — the *network-database* analogue of Mongo.
- ``RemoteConfigStore`` (model/remote_store.py) — a TCP client to a
  ``ConfigStoreServer`` wrapping any of these backends, mirroring the
  reference's client/server split (app -> mongod over the wire).

All backends also expose the reference's full Crud surface
(src/db/interface.go:15-25): ``create`` (dup-create fails, the
DocAlreadyExisted contract from in-memory.go:61-62 / Mongo's unique-key
insert), ``get_by_topic`` / ``delete`` (name-pair addressing via the
SHA-1 key), alongside upsert ``update`` / ``get_by_key`` /
``delete_by_key`` / ``load``.

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
from .topic import TopicStatus, Webhook, gen_key_from_names, validate_topic_config


class DocAlreadyExisted(ValueError):
    """create() on an existing key (reference src/db/in-memory.go:61-62)."""


class _CrudByNamesMixin:
    """Name-pair addressing on top of the keyed primitives — the
    reference's GetByTopic/Delete half of the Crud interface
    (src/db/interface.go:16,20), which just re-derives the SHA-1 key
    (src/db/mongo.go:119-125)."""

    def create(self, topic_full_name: str, pulsar_url: str, webhooks=None, **kw) -> str:
        key = gen_key_from_names(topic_full_name, pulsar_url)
        if self.get_by_key(key) is not None:
            raise DocAlreadyExisted(key)
        return self.update(topic_full_name, pulsar_url, webhooks, **kw)

    def get_by_topic(self, topic_full_name: str, pulsar_url: str) -> dict | None:
        return self.get_by_key(gen_key_from_names(topic_full_name, pulsar_url))

    def delete(self, topic_full_name: str, pulsar_url: str) -> None:
        self.delete_by_key(gen_key_from_names(topic_full_name, pulsar_url))


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


class ConfigStore(_CrudByNamesMixin):
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


class InMemoryConfigStore(_CrudByNamesMixin):
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


class FileConfigStore(_CrudByNamesMixin):
    """Document-store Crud backend: one ``<key>.json`` file per config in
    a directory — the structural analogue of the reference's Mongo
    backend (src/db/mongo.go:92-258: keyed document collection,
    InsertOne / FindOne{key} / $set upsert / DeleteOne{key}).

    Like Mongo (and the in-memory map), deletion REMOVES the document —
    there is no tombstone row; the changelog/tombstone discipline is
    ConfigStore's domain.  Writes are atomic (tmp file + ``os.replace``)
    so a crashed writer never leaves a torn document, and the monotonic
    version sequence is recovered from the surviving documents on
    reopen — same recovery rule as ConfigStore._max_version.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._version = max(
            (d.get("version", 0) for d in self._iter_docs()), default=0)

    def _doc_path(self, key: str) -> str:
        if not key.isalnum():  # SHA-1 hex — refuse path traversal
            raise ValueError(f"malformed key: {key!r}")
        return os.path.join(self.path, f"{key}.json")

    def _iter_docs(self):
        import json

        for fn in sorted(os.listdir(self.path)):
            if fn.endswith(".json"):
                with open(os.path.join(self.path, fn)) as f:
                    yield self._from_json(json.load(f))

    @staticmethod
    def _to_json(doc: dict) -> dict:
        out = dict(doc)
        for c in ("created_at", "updated_at"):
            out[c] = doc[c].isoformat()
        out["webhooks"] = [
            list(w[:6]) + [w[6].isoformat(), w[7].isoformat(),
                           w[8].isoformat() if w[8] is not None else None]
            for w in doc.get("webhooks") or []
        ]
        return out

    @staticmethod
    def _from_json(doc: dict) -> dict:
        out = dict(doc)
        for c in ("created_at", "updated_at"):
            out[c] = datetime.fromisoformat(doc[c])
        out["webhooks"] = [
            tuple(w[:6]) + (datetime.fromisoformat(w[6]), datetime.fromisoformat(w[7]),
                            datetime.fromisoformat(w[8]) if w[8] is not None else None)
            for w in doc.get("webhooks") or []
        ]
        return out

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
        import json

        webhooks = webhooks or []
        key = validate_topic_config(topic_full_name, pulsar_url, webhooks)
        doc = _config_doc(key, topic_full_name, pulsar_url, webhooks, token, tenant,
                          notes, topic_status, _now(), self._next_version())
        target = self._doc_path(key)
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._to_json(doc), f)
        os.replace(tmp, target)
        return key

    def get_by_key(self, key: str) -> dict | None:
        import json

        try:
            with open(self._doc_path(key)) as f:
                return self._from_json(json.load(f))
        except FileNotFoundError:
            return None
        except ValueError:  # malformed (non-SHA-1) key cannot exist
            return None

    def delete_by_key(self, key: str) -> None:
        try:
            os.remove(self._doc_path(key))
        except FileNotFoundError:
            raise KeyError(key) from None
        except ValueError:  # malformed key: nothing stored under it
            raise KeyError(key) from None

    def load(self) -> list[dict]:
        return list(self._iter_docs())


class DbApiConfigStore(_CrudByNamesMixin):
    """Server-database Crud backend over any PEP 249 (DB-API 2.0) driver —
    the functional analogue of the reference's Mongo backend
    (src/db/mongo.go:98-258: a network database holding one document per
    key, unique-key insert, $set upsert, DeleteOne).  Documents are stored
    as one JSON row per key in a ``topic_config`` table, so the backend
    works unchanged against sqlite3 (bundled; used in tests), Postgres
    (psycopg), MySQL, or anything else DB-API-shaped — the driver is
    injected, never imported here.

    Same semantics as the other backends: upsert replaces, delete removes
    the row (no tombstone), and the monotonic version sequence resumes
    from ``max(version)`` on reopen (ConfigStore._max_version analogue,
    here computed by the database itself).  Writes run in a transaction;
    the per-store lock serializes writers within this process, and the
    table's PRIMARY KEY enforces one-doc-per-key across processes.
    """

    def __init__(self, conn, paramstyle: str = "qmark", table: str = "topic_config"):
        import threading

        if not table.replace("_", "").isalnum():
            raise ValueError(f"malformed table name: {table!r}")
        self._conn = conn
        self._table = table
        self._ph = "?" if paramstyle == "qmark" else "%s"
        self._lock = threading.Lock()
        cur = conn.cursor()
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            "key VARCHAR PRIMARY KEY, version BIGINT NOT NULL, doc TEXT NOT NULL)"
        )
        conn.commit()

    @classmethod
    def sqlite(cls, path: str) -> "DbApiConfigStore":
        """Convenience constructor over the bundled sqlite3 driver.
        ``check_same_thread=False`` + the store lock lets the gateway's
        worker threads share the connection (sqlite3 default refuses)."""
        import sqlite3

        return cls(sqlite3.connect(path, check_same_thread=False))

    def _next_version(self, cur) -> int:
        cur.execute(f"SELECT coalesce(max(version), 0) FROM {self._table}")
        return int(cur.fetchone()[0]) + 1

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
        import json

        webhooks = webhooks or []
        key = validate_topic_config(topic_full_name, pulsar_url, webhooks)
        with self._lock:
            cur = self._conn.cursor()
            doc = _config_doc(key, topic_full_name, pulsar_url, webhooks, token,
                              tenant, notes, topic_status, _now(),
                              self._next_version(cur))
            payload = json.dumps(FileConfigStore._to_json(doc))
            ph = self._ph
            # portable upsert: DELETE + INSERT in one transaction (Mongo's
            # $set-upsert; avoids dialect-specific ON CONFLICT syntax)
            cur.execute(f"DELETE FROM {self._table} WHERE key = {ph}", (key,))
            cur.execute(
                f"INSERT INTO {self._table} (key, version, doc) VALUES ({ph}, {ph}, {ph})",
                (key, doc["version"], payload),
            )
            self._conn.commit()
        return key

    def get_by_key(self, key: str) -> dict | None:
        import json

        cur = self._conn.cursor()
        cur.execute(f"SELECT doc FROM {self._table} WHERE key = {self._ph}", (key,))
        row = cur.fetchone()
        return FileConfigStore._from_json(json.loads(row[0])) if row else None

    def delete_by_key(self, key: str) -> None:
        with self._lock:
            cur = self._conn.cursor()
            cur.execute(f"DELETE FROM {self._table} WHERE key = {self._ph}", (key,))
            n = cur.rowcount
            self._conn.commit()
        if n == 0:
            raise KeyError(key)

    def load(self) -> list[dict]:
        import json

        cur = self._conn.cursor()
        cur.execute(f"SELECT doc FROM {self._table} ORDER BY key")
        return [FileConfigStore._from_json(json.loads(r[0])) for r in cur.fetchall()]


class MongoConfigStore(_CrudByNamesMixin):
    """Mongo-backed Crud backend — the reference's primary production
    store (src/db/mongo.go:98-258): one document per key in a collection
    with a unique index on ``key`` (mongo.go:110-117), ``ReplaceOne``
    upsert (mongo.go:176-194), ``DeleteOne`` that errors on a missing key
    (mongo.go:215-227), ``Find({})`` load (mongo.go:139-154).

    ``pymongo`` is NOT in this container, so the import is guarded the
    same way icrypto.cipher guards ``cryptography``; the class carries
    the full contract and is exercised by the same 6-way CRUD lifecycle
    test (tests/test_model.py), skip-gated until a driver + server exist:

        pip install pymongo && docker run -p 27017:27017 mongo:7 \\
            && PBS_MONGO_URI=mongodb://localhost:27017 pytest tests/test_model.py

    A pre-built ``client`` (e.g. mongomock) can be injected for tests.
    """

    def __init__(self, client=None, uri: str = "mongodb://localhost:27017",
                 database: str = "beam", collection: str = "topics"):
        if client is None:
            try:
                from pymongo import MongoClient
            except ImportError as e:  # pragma: no cover - env-gated
                raise ImportError(
                    "MongoConfigStore needs pymongo (pip install pymongo); "
                    "use DbApiConfigStore/FileConfigStore for driverless setups"
                ) from e
            client = MongoClient(uri)
        self._col = client[database][collection]
        self._counters = client[database][collection + "_counters"]
        self._col.create_index("key", unique=True)
        # seed the atomic version counter at/above any pre-existing max
        # (migration from the old read-max scheme; $max is safe under
        # concurrent seeding — the largest seed wins, never a regression)
        doc = self._col.find_one(sort=[("version", -1)], projection={"version": 1})
        self._counters.update_one(
            {"_id": "version"},
            {"$max": {"seq": int(doc["version"]) if doc else 0}},
            upsert=True,
        )

    def _next_version(self) -> int:
        """Server-side atomic sequence (ADVICE r06): the old
        read-max-then-write let two concurrent clients mint the SAME
        version, weakening the (updated_at, version) last-write-wins
        tiebreak on the one backend positioned as the multi-client
        production store. ``$inc`` inside ``find_one_and_update`` is a
        single atomic read-modify-write on the counter document — the
        standard Mongo sequence pattern. ``return_document=True`` ≙
        ``pymongo.ReturnDocument.AFTER`` (a bool subclass), avoiding a
        module-scope pymongo import (the dependency is guarded)."""
        doc = self._counters.find_one_and_update(
            {"_id": "version"}, {"$inc": {"seq": 1}},
            upsert=True, return_document=True,
        )
        return int(doc["seq"])

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
        doc = _config_doc(key, topic_full_name, pulsar_url, webhooks, token,
                          tenant, notes, topic_status, _now(),
                          self._next_version())
        self._col.replace_one(
            {"key": key}, FileConfigStore._to_json(doc), upsert=True
        )
        return key

    def get_by_key(self, key: str) -> dict | None:
        got = self._col.find_one({"key": key}, projection={"_id": 0})
        return FileConfigStore._from_json(got) if got else None

    def delete_by_key(self, key: str) -> None:
        if self._col.delete_one({"key": key}).deleted_count == 0:
            raise KeyError(key)

    def load(self) -> list[dict]:
        return [
            FileConfigStore._from_json(d)
            for d in self._col.find({}, projection={"_id": 0}, sort=[("key", 1)])
        ]


def snapshot_df(spark: SparkSession, store) -> DataFrame:
    """Build the TOPIC_CONFIG_SCHEMA snapshot DataFrame from ANY Crud
    backend's ``load()`` — so the reconciler (streaming/reconciler.py)
    can run off the in-memory or file-backed stores (the gateway's
    default) exactly as it does off ConfigStore.snapshot()."""
    rows = []
    for doc in store.load():
        doc = dict(doc)
        doc["webhooks"] = [tuple(w.values()) if isinstance(w, dict) else tuple(w)
                           for w in doc.get("webhooks") or []]
        rows.append(doc)
    return spark.createDataFrame(rows, TOPIC_CONFIG_SCHEMA)


_ = asdict  # (dataclass helper retained for API users)
