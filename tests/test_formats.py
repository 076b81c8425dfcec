"""Wire-format matrix goldens (sources/formats.py): the Message
envelope must survive parquet/orc/json/csv round-trips byte-for-byte —
including binary payloads with non-UTF8 bytes, null keys/payloads, and
map properties."""

from __future__ import annotations

import datetime as dt

import pytest

from pulsar_beam_spark.model.message import MESSAGE_SCHEMA
from pulsar_beam_spark.sources.formats import FORMATS, load_messages, save_messages


def _rows():
    t0 = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    return [
        ("m-1", "persistent://t/ns/a", "k1", b"plain text", t0, t0,
         {"PulsarBeamId": "u-1", "x": "y"}),
        ("m-2", "persistent://t/ns/a", None, bytes([0, 255, 137, 80, 78, 71]), t0,
         t0 + dt.timedelta(seconds=1), {"PulsarBeamId": "u-2"}),
        ("m-3", "persistent://t/ns/b", "k3", None,
         t0 + dt.timedelta(milliseconds=7), t0, None),
    ]


@pytest.mark.parametrize("fmt", FORMATS)
def test_envelope_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(_rows(), MESSAGE_SCHEMA)
    path = str(tmp_path / fmt)
    save_messages(df, path, fmt)
    back = load_messages(spark, path, fmt)
    assert back.schema == MESSAGE_SCHEMA or [
        (f.name, f.dataType) for f in back.schema
    ] == [(f.name, f.dataType) for f in MESSAGE_SCHEMA]

    def norm(rows):
        return sorted(
            (
                r["message_id"], r["topic"], r["key"],
                bytes(r["payload"]) if r["payload"] is not None else None,
                r["event_time"], r["publish_time"],
                dict(r["properties"]) if r["properties"] is not None else None,
            )
            for r in rows
        )

    assert norm(back.collect()) == norm(df.collect())


def test_unsupported_format_raises(spark, tmp_path):
    df = spark.createDataFrame(_rows(), MESSAGE_SCHEMA)
    with pytest.raises(ValueError):
        save_messages(df, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError):
        load_messages(spark, str(tmp_path / "x"), "xml")


def test_gateway_store_readable_via_matrix(spark, tmp_path):
    """The TopicDirStore's parquet files load through the same matrix."""
    from pulsar_beam_spark.server.store import TopicDirStore

    store = TopicDirStore(str(tmp_path / "topics"))
    store.append("persistent://t/ns/m", b"via-store", key="kk")
    back = load_messages(spark, store.topic_dir("persistent://t/ns/m"), "parquet")
    row = back.collect()[0]
    assert bytes(row["payload"]) == b"via-store" and row["key"] == "kk"
    assert dict(row["properties"]).get("PulsarBeamId")


def test_documents_fixture_is_pure_ascii():
    """The m_media_features / m_resize_media oracles reconstruct binary
    payloads from documents.text via char-indexed substr, which equals
    byte-indexed slicing ONLY for ASCII text. Pin that property for every
    fixture scale the driver or bench can read (a non-ASCII regeneration
    of the fixture must fail here, not as an opaque oracle hash mismatch)."""
    import os

    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n_total, n_multibyte = con.execute(
            "SELECT count(*), "
            "sum(CASE WHEN octet_length(encode(text)) <> length(text) THEN 1 ELSE 0 END) "
            f"FROM read_parquet('{path}')"
        ).fetchone()
        assert n_total > 0 and n_multibyte == 0, (sf, n_total, n_multibyte)


def test_nanos_events_fallback_reads_ntz(spark, tmp_path):
    """The legacy TIMESTAMP(NANOS) events path must land on the SAME
    type the direct micros read infers (timestamp_ntz): timestamp_micros
    alone yields the LTZ type, which would flip the date family from
    wall-clock math to session-tz math on nanos-written fixtures
    (round-9 DST gate)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from pulsar_beam_spark.sources.tables import load_table

    d = str(tmp_path / "nanos-sf")
    os.makedirs(d)
    stamps = [datetime(2024, 3, 10, 6, 30, i) for i in range(4)]
    t = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array(stamps, pa.timestamp("ns")),
        "user_id": pa.array([1, 2, 1, 2], pa.int64()),
        "event_type": pa.array(["click"] * 4),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        "props": pa.array(['{"k": 1}'] * 4),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == stamps, "nanos -> micros truncation must keep wall-clock values"
