"""Parity micro-tests ported from the reference's unit tests
(SURVEY.md §5.2 item 4): SHA-1 golden key, topic-FN build/tokenize
matrix, subscription validation matrix, tenant predicate truth table,
config-store CRUD lifecycle."""

from __future__ import annotations

import os

import pytest

from pulsar_beam_spark.model.topic import (
    TopicStatus,
    Webhook,
    build_topic_fn,
    gen_key_from_names,
    get_initial_position,
    get_subscription_type,
    tokenize_topic_full_name,
    validate_topic_config,
    validate_webhook_config,
)


def test_sha1_golden_key():
    # golden from reference src/unit-test/handlers_test.go:68-77
    key = gen_key_from_names(
        "persistent://picasso/local-useast1-gcp/yet-another-test-topic",
        "pulsar+ssl://useast1.gcp.kafkaesque.io:6651",
    )
    assert key == "075fcf0870662590aa4b24939287f193a697ab26"


def test_build_topic_fn_matrix():
    # reference src/unit-test/util_test.go:381-411 semantics
    assert build_topic_fn("p", "t", "ns", "top") == "persistent://t/ns/top"
    assert build_topic_fn("persistent", "t", "ns", "top") == "persistent://t/ns/top"
    assert build_topic_fn("np", "t", "ns", "top") == "non-persistent://t/ns/top"
    with pytest.raises(ValueError):
        build_topic_fn("x", "t", "ns", "top")
    with pytest.raises(ValueError):
        build_topic_fn("p", "", "ns", "top")


def test_tokenize_topic_full_name():
    assert tokenize_topic_full_name("persistent://a/b/c") == ("persistent", "a", "b", "c")
    assert tokenize_topic_full_name("non-persistent://a/b/c")[0] == "non-persistent"
    for bad in ("persistent://a/b", "a/b/c", "persistent://a/b/c/d", ""):
        with pytest.raises(ValueError):
            tokenize_topic_full_name(bad)


def test_subscription_type_matrix():
    # reference src/unit-test/handlers_test.go:243-338 semantics;
    # reference lowercases before matching (topic.go ToLower), so mixed
    # case like 'Shared' is valid.
    assert get_subscription_type("") == "exclusive"
    for t in ("exclusive", "shared", "keyshared", "failover"):
        assert get_subscription_type(t) == t
    assert get_subscription_type("Shared") == "shared"
    assert get_subscription_type("KeyShared") == "keyshared"
    with pytest.raises(ValueError):
        get_subscription_type("bogus")
    assert get_initial_position("") == "latest"
    for p in ("latest", "earliest"):
        assert get_initial_position(p) == p
    assert get_initial_position("Earliest") == "earliest"
    with pytest.raises(ValueError):
        get_initial_position("middle")


def test_consumer_params_five_char_rule():
    # the >=5-char subscription-name rule lives ONLY in the consumer path
    # (reference handlers.go:457); webhook-config validation is non-empty.
    from pulsar_beam_spark.streaming.sse import consumer_params

    name, st, pos = consumer_params("", "Shared", "Earliest")
    assert name.startswith("NonResumable") and st == "shared" and pos == "earliest"
    assert consumer_params("mysub01")[0] == "mysub01"
    with pytest.raises(ValueError):
        consumer_params("abc")


def test_webhook_validation():
    ok = [Webhook("http://h1.example.com/cb", "subone"), Webhook("https://h2.example.com/cb", "subtwo")]
    validate_webhook_config(ok)
    # short-but-non-empty names are VALID here (reference topic.go:164
    # only requires non-empty; the 5-char rule is the consumer path's)
    validate_webhook_config([Webhook("http://h.example.com", "abc")])
    with pytest.raises(ValueError):  # empty/whitespace subscription name
        validate_webhook_config([Webhook("http://h.example.com", "  ")])
    with pytest.raises(ValueError):  # invalid url
        validate_webhook_config([Webhook("not a url", "subone")])
    with pytest.raises(ValueError):  # duplicate exclusive subscription
        validate_webhook_config(
            [Webhook("http://a.example.com", "samesub"), Webhook("http://b.example.com", "samesub")]
        )
    # duplicate names fine when shared
    validate_webhook_config(
        [
            Webhook("http://a.example.com", "samesub", subscription_type="shared"),
            Webhook("http://b.example.com", "samesub", subscription_type="shared"),
        ]
    )


def test_validate_topic_config_returns_key():
    key = validate_topic_config(
        "persistent://picasso/local-useast1-gcp/yet-another-test-topic",
        "pulsar+ssl://useast1.gcp.kafkaesque.io:6651",
        [],
    )
    assert key == "075fcf0870662590aa4b24939287f193a697ab26"
    with pytest.raises(ValueError):
        validate_topic_config("persistent://a/b/c", "http://not-pulsar", [])


class _FakeMongoCollection:
    """Minimal in-memory stand-in for the pymongo collection surface
    MongoConfigStore uses (find_one/replace_one/delete_one/find/
    create_index), so the REAL store logic runs in-container; the
    'mongo' fixture param below still exercises a live server when
    PBS_MONGO_URI is set."""

    def __init__(self):
        self._docs: dict[str, dict] = {}

    def create_index(self, field, unique=False):
        return field

    def find_one(self, flt=None, sort=None, projection=None):
        docs = list(self._docs.values())
        if flt:
            docs = [d for d in docs if all(d.get(k) == v for k, v in flt.items())]
        if sort:
            field, direction = sort[0]
            docs.sort(key=lambda d: d.get(field), reverse=direction < 0)
        return dict(docs[0]) if docs else None

    def replace_one(self, flt, doc, upsert=False):
        self._docs[flt["key"]] = dict(doc)

    def delete_one(self, flt):
        class R:
            deleted_count = 0
        r = R()
        if flt["key"] in self._docs:
            del self._docs[flt["key"]]
            r.deleted_count = 1
        return r

    def find(self, flt=None, projection=None, sort=None):
        docs = [dict(d) for d in self._docs.values()]
        if sort:
            field, direction = sort[0]
            docs.sort(key=lambda d: d.get(field), reverse=direction < 0)
        return docs

    # counter-document surface (MongoConfigStore._next_version)
    @staticmethod
    def _key_of(flt):
        return flt.get("key", flt.get("_id"))

    def update_one(self, flt, update, upsert=False):
        k = self._key_of(flt)
        doc = self._docs.get(k)
        if doc is None:
            if not upsert:
                return None
            doc = dict(flt)
            self._docs[k] = doc
        for op, fields in update.items():
            for f, v in fields.items():
                if op == "$inc":
                    doc[f] = doc.get(f, 0) + v
                elif op == "$max":
                    doc[f] = max(doc.get(f, v), v)
                elif op == "$set":
                    doc[f] = v
                else:
                    raise NotImplementedError(op)
        return doc

    def find_one_and_update(self, flt, update, upsert=False, return_document=False):
        k = self._key_of(flt)
        before = dict(self._docs[k]) if k in self._docs else None
        after = self.update_one(flt, update, upsert=upsert)
        return (dict(after) if after else None) if return_document else before


class _FakeMongoClient:
    def __init__(self):
        self._dbs: dict[str, dict] = {}

    def __getitem__(self, db):
        cols = self._dbs.setdefault(db, {})

        class _Db:
            def __getitem__(_self, col):
                return cols.setdefault(col, _FakeMongoCollection())
        return _Db()


@pytest.fixture(params=["parquet", "memory", "file", "dbapi", "remote",
                        "mongo-fake", "mongo"])
def config_store(request, spark, tmp_path):
    from pulsar_beam_spark.model.config_store import (
        ConfigStore, DbApiConfigStore, FileConfigStore, InMemoryConfigStore)

    if request.param == "mongo-fake":
        from pulsar_beam_spark.model.config_store import MongoConfigStore

        return MongoConfigStore(client=_FakeMongoClient())
    if request.param == "mongo":
        import os

        uri = os.environ.get("PBS_MONGO_URI")
        if not uri:
            pytest.skip(
                "MongoConfigStore needs a live server + driver: pip install "
                "pymongo, run mongod (docker run -p 27017:27017 mongo:7), then "
                "PBS_MONGO_URI=mongodb://localhost:27017 pytest tests/test_model.py"
            )
        pytest.importorskip("pymongo")
        from pulsar_beam_spark.model.config_store import MongoConfigStore

        store = MongoConfigStore(uri=uri, database="beam_test")
        store._col.delete_many({})
        return store
    if request.param == "parquet":
        return ConfigStore(spark, str(tmp_path / "cfg"))
    if request.param == "file":
        return FileConfigStore(str(tmp_path / "docs"))
    if request.param == "dbapi":
        return DbApiConfigStore.sqlite(str(tmp_path / "cfg.db"))
    if request.param == "remote":
        from pulsar_beam_spark.model.remote_store import (
            ConfigStoreServer, RemoteConfigStore)

        srv = ConfigStoreServer(InMemoryConfigStore()).start_background()
        client = RemoteConfigStore(*srv.address)
        request.addfinalizer(client.close)
        request.addfinalizer(srv.shutdown)
        return client
    return InMemoryConfigStore()


def test_config_store_crud_lifecycle(config_store):
    """Mirrors reference src/unit-test/db_test.go:19-105 over BOTH
    backends (parquet changelog / in-memory dict — the reference's
    pluggable Crud interface, src/db/interface.go:15-39):
    create -> get -> update -> load -> delete -> get-fails.
    No sleeps: same-clock-tick writes must resolve by the monotonic
    version sequence, not wall-clock luck."""
    store = config_store
    key = store.update(
        "persistent://tenant1/ns/topicA",
        "pulsar://cluster:6650",
        [Webhook("http://hook.example.com/cb", "mysub01")],
        tenant="tenant1",
    )
    got = store.get_by_key(key)
    assert got is not None and got["topic_full_name"] == "persistent://tenant1/ns/topicA"
    assert len(got["webhooks"]) == 1

    # upsert replaces (last-write-wins snapshot); burst of same-tick
    # writes must land on the LAST one via the version tiebreak
    for i in range(2, 6):
        store.update("persistent://tenant1/ns/topicA", "pulsar://cluster:6650", [], notes=f"v{i}")
    got2 = store.get_by_key(key)
    assert got2["notes"] == "v5" and got2["webhooks"] in ([], None)

    assert len(store.load()) == 1
    store.delete_by_key(key)
    assert store.get_by_key(key) is None
    with pytest.raises(KeyError):
        store.delete_by_key(key)


def test_config_store_full_crud_surface(config_store):
    """The reference Crud interface's other half (src/db/interface.go:15-25):
    Create (dup fails, DocAlreadyExisted — in-memory.go:61-62), GetByTopic
    and Delete by (topicFullName, pulsarURL) name pair."""
    from pulsar_beam_spark.model.config_store import DocAlreadyExisted

    store = config_store
    tfn, url = "persistent://tenant2/ns/topicB", "pulsar://cluster:6650"
    key = store.create(tfn, url, [Webhook("http://hook.example.com/cb", "mysub02")])
    with pytest.raises(DocAlreadyExisted):
        store.create(tfn, url, [])
    got = store.get_by_topic(tfn, url)
    assert got is not None and got["key"] == key
    store.delete(tfn, url)
    assert store.get_by_topic(tfn, url) is None
    with pytest.raises(KeyError):
        store.delete(tfn, url)


def test_file_config_store_reopen_resumes_version(tmp_path):
    """Document-store persistence: a reopened store sees prior documents
    and resumes the monotonic version sequence (the reference's Mongo
    docs survive process restart; ConfigStore._max_version analogue)."""
    from pulsar_beam_spark.model.config_store import FileConfigStore

    p = str(tmp_path / "docs")
    s1 = FileConfigStore(p)
    k = s1.update("persistent://t/ns/a", "pulsar://c:6650", [], notes="first")
    s1.update("persistent://t/ns/b", "pulsar://c:6650", [], notes="second")

    s2 = FileConfigStore(p)
    assert len(s2.load()) == 2
    assert s2.get_by_key(k)["notes"] == "first"
    s2.update("persistent://t/ns/a", "pulsar://c:6650", [], notes="third")
    doc = s2.get_by_key(k)
    assert doc["notes"] == "third" and doc["version"] == 3


def test_file_store_malformed_key_is_absent_not_error(tmp_path):
    """A traversal-looking key can never exist: get -> None, delete ->
    KeyError — the gateway maps both to 404, never a 500 (and never a
    filesystem access outside the store dir)."""
    from pulsar_beam_spark.model.config_store import FileConfigStore

    s = FileConfigStore(str(tmp_path / "docs"))
    assert s.get_by_key("../../etc/passwd") is None
    with pytest.raises(KeyError):
        s.delete_by_key("../../etc/passwd")


def test_dbapi_store_reopen_resumes_version(tmp_path):
    """Server-DB persistence: a second connection to the same database
    sees prior documents and resumes the version sequence — the Mongo
    restart contract, here enforced by the database's max(version)."""
    from pulsar_beam_spark.model.config_store import DbApiConfigStore

    p = str(tmp_path / "cfg.db")
    s1 = DbApiConfigStore.sqlite(p)
    k = s1.update("persistent://t/ns/a", "pulsar://c:6650", [], notes="first")
    s1.update("persistent://t/ns/b", "pulsar://c:6650", [], notes="second")

    s2 = DbApiConfigStore.sqlite(p)
    assert len(s2.load()) == 2
    s2.update("persistent://t/ns/a", "pulsar://c:6650", [], notes="third")
    doc = s2.get_by_key(k)
    assert doc["notes"] == "third" and doc["version"] == 3


def test_mongo_version_counter_atomic_across_clients():
    """ADVICE r06: versions come from a server-side $inc counter document
    (find_one_and_update), not client-side max(version)+1 — two store
    instances sharing one server mint strictly increasing, never-equal
    versions, and the counter seeds at/above any pre-existing max."""
    from pulsar_beam_spark.model.config_store import MongoConfigStore

    client = _FakeMongoClient()
    s1 = MongoConfigStore(client=client)
    s2 = MongoConfigStore(client=client)
    for i in range(6):
        s = s1 if i % 2 == 0 else s2
        s.update(f"persistent://t/ns/v{i}", "pulsar://c:6650", [])
    minted = sorted(d["version"] for d in s1.load())
    assert minted == list(range(1, 7))  # unique, gapless, client-independent
    # a THIRD client joining later seeds its counter from the stored max
    # and continues the sequence instead of reusing low versions
    s3 = MongoConfigStore(client=client)
    s3.update("persistent://t/ns/late", "pulsar://c:6650", [])
    vals = sorted(d["version"] for d in s3.load())
    assert vals == sorted(set(vals)) and vals[-1] == max(minted) + 1


def test_remote_store_concurrent_create_one_winner(tmp_path):
    """Two clients racing create() on one key: exactly one wins — the
    dup-key check runs under the server's lock (the reference relies on
    Mongo's unique-index insert for this, src/db/mongo.go:150-160)."""
    import threading

    from pulsar_beam_spark.model.config_store import (
        DbApiConfigStore, DocAlreadyExisted)
    from pulsar_beam_spark.model.remote_store import (
        ConfigStoreServer, RemoteConfigStore)

    srv = ConfigStoreServer(
        DbApiConfigStore.sqlite(str(tmp_path / "cfg.db"))).start_background()
    try:
        outcomes = []

        def racer():
            c = RemoteConfigStore(*srv.address)
            try:
                c.create("persistent://t/ns/race", "pulsar://c:6650", [])
                outcomes.append("won")
            except DocAlreadyExisted:
                outcomes.append("dup")
            finally:
                c.close()

        threads = [threading.Thread(target=racer) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(outcomes) == ["dup", "dup", "dup", "won"]

        # webhook round-trip fidelity over the wire
        c = RemoteConfigStore(*srv.address)
        c.update("persistent://t/ns/race", "pulsar://c:6650",
                 [Webhook("http://hook.example.com/cb", "mysub03",
                          subscription_type="shared", headers=["X-A: 1"])])
        doc = c.get_by_topic("persistent://t/ns/race", "pulsar://c:6650")
        assert doc["webhooks"][0][0] == "http://hook.example.com/cb"
        assert doc["webhooks"][0][1] == ["X-A: 1"]
        assert doc["webhooks"][0][3] == "shared"
        c.close()
    finally:
        srv.shutdown()


def test_tenant_predicate_truth_table(spark):
    """Reference handlers_test.go:221-240 semantics via the Column expr."""
    from pyspark.sql import functions as F

    from pulsar_beam_spark.model.topic import tenant_allowed_col

    df = spark.createDataFrame(
        [("persistent://alice/ns/t",), ("persistent://bob/ns/t",)], ["topic"]
    )
    got = {
        r["topic"]: r["ok"]
        for r in df.select("topic", tenant_allowed_col(F.col("topic"), "alice").alias("ok")).collect()
    }
    assert got["persistent://alice/ns/t"] is True
    assert got["persistent://bob/ns/t"] is False
    # superrole sees everything
    got2 = df.select(tenant_allowed_col(F.col("topic"), "admin", ("admin",)).alias("ok")).collect()
    assert all(r["ok"] for r in got2)
    # ExtractEvalTenant: subject minus its LAST dash-segment must equal
    # the tenant exactly (reference handlers_test.go:226-232 vectors:
    # 'picasso-1234' -> picasso OK; 'picasso-monet-1234' -> picasso-monet
    # OK but NOT picasso; misspelled 'picaso-1234' rejected).
    def check(subject: str, topic: str) -> bool:
        one = spark.createDataFrame([(topic,)], ["topic"])
        return one.select(tenant_allowed_col(F.col("topic"), subject).alias("ok")).head()["ok"]

    assert check("alice-1234", "persistent://alice/ns/t") is True
    assert check("alice-client-7", "persistent://alice/ns/t") is False  # belongs to 'alice-client'
    assert check("alice-client-7", "persistent://alice-client/ns/t") is True
    assert check("alic-1234", "persistent://alice/ns/t") is False
    # comma-separated multi-subject: any match grants (handlers.go:391)
    assert check("alice-1234,myadmin", "persistent://alice/ns/t") is True
    assert check("alic-1234,myadmin", "persistent://alice/ns/t") is False


def test_kafka_normalization_and_connector_options(spark):
    """Connector seam (SURVEY §4.3): option builders map G6 subscription
    semantics onto source options, and the Kafka wire schema normalizes
    to MESSAGE_SCHEMA — verified on batch rows (no broker in-container)."""
    from datetime import datetime

    from pulsar_beam_spark.model.message import MESSAGE_SCHEMA
    from pulsar_beam_spark.sources.connectors import (
        kafka_source_options,
        normalize_kafka,
        pulsar_source_options,
    )

    opts = kafka_source_options("b:9092", "events", "Earliest", max_offsets_per_trigger=500)
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "500"
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "events", "middle")
    assert pulsar_source_options("pulsar://c:6650", "http://c:8080", "t")["startingOffsets"] == "latest"

    wire = spark.createDataFrame(
        [
            (b"k1", b'{"v":1}', "persistent://t/ns/a", 0, 42,
             datetime(2024, 1, 1), 0, [("PulsarBeamId", b"uuid-1")]),
            (None, b"x", "persistent://t/ns/a", 1, 7, datetime(2024, 1, 2), 0, None),
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int, "
        "headers array<struct<key:string,value:binary>>",
    )
    out = normalize_kafka(wire)
    assert [f.name for f in out.schema.fields] == [f.name for f in MESSAGE_SCHEMA.fields]
    rows = {r["message_id"]: r for r in out.collect()}
    r1 = rows["persistent://t/ns/a-0-42"]
    assert bytes(r1["payload"]) == b'{"v":1}' and r1["key"] == "k1"
    assert r1["properties"] == {"PulsarBeamId": "uuid-1"}
    assert rows["persistent://t/ns/a-1-7"]["properties"] == {}


def test_connector_option_goldens():
    """Full-dict goldens against the DOCUMENTED option schemas (VERDICT
    r03 item 5): spark-sql-kafka-0-10 and StreamNative pulsar-spark
    option names exactly — a typo'd option name fails silently at a real
    broker (Spark sources ignore unknown options), so pin every key."""
    from pulsar_beam_spark.sources.connectors import (
        kafka_source_options, pulsar_source_options)

    assert kafka_source_options(
        "b1:9092,b2:9092", "events,audit", "Earliest",
        max_offsets_per_trigger=10000, subscription_name="mysub01",
    ) == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events,audit",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "10000",
        "kafka.group.id": "mysub01",
    }
    assert kafka_source_options("b:9092", "events") == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
    }
    assert pulsar_source_options(
        "pulsar+ssl://c:6651", "http://c:8080",
        "persistent://tenant/ns/topic", "Latest", subscription_name="mysub01",
    ) == {
        "service.url": "pulsar+ssl://c:6651",
        "admin.url": "http://c:8080",
        "topics": "persistent://tenant/ns/topic",
        "startingOffsets": "latest",
        "predefinedSubscription": "mysub01",
    }


def test_open_kafka_stream_clear_error_without_connector(spark):
    """No broker/JAR in this container: the open_* path must degrade to a
    CLEAR error naming the missing package — the analogue of the
    reference's live-Pulsar tests degrading to error-path checks when
    secrets are absent (src/unit-test/pulsar_test.go:12-55)."""
    from pulsar_beam_spark.sources.connectors import open_kafka_stream

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        open_kafka_stream(spark, "localhost:9092", "events")


@pytest.mark.skipif(
    not os.environ.get("PBS_KAFKA_BOOTSTRAP"),
    reason="live-broker smoke: set PBS_KAFKA_BOOTSTRAP=host:port (and add "
           "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages) "
           "to run against a real Kafka — see README 'Real brokers'",
)
def test_open_kafka_stream_live_broker(spark):
    """Skipped-not-silent end-to-end connector smoke (runs where a broker
    exists; the skip reason documents exactly how)."""
    from pulsar_beam_spark.sources.connectors import open_kafka_stream

    df = open_kafka_stream(spark, os.environ["PBS_KAFKA_BOOTSTRAP"], "events",
                           initial_position="earliest")
    assert df.isStreaming
    from pulsar_beam_spark.model.message import MESSAGE_SCHEMA
    assert [f.name for f in df.schema.fields] == [f.name for f in MESSAGE_SCHEMA.fields]
