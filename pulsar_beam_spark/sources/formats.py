"""Wire-format matrix for the Message envelope — save/load the
MESSAGE_SCHEMA losslessly across the formats Spark ships readers and
writers for (parquet, orc, json, csv).

Why it exists: the reference's consumers receive messages as JSON
envelopes over HTTP (src/model/message.go:21-52), and a user switching
to this repo will land topic data in whatever format their lake uses.
Columnar formats round-trip the envelope natively; the text formats
need a documented encode/decode convention, implemented here so every
path converges back to the exact MESSAGE_SCHEMA:

- json: binary columns are base64 text on the wire (Spark's JSON writer
  emits base64 for BinaryType but the reader will NOT infer it back —
  we decode explicitly against the declared schema); map columns
  round-trip natively.
- csv: no nested types at all — the properties map goes through
  to_json, payload through base64; both decoded on read.
- timestamps: written as microsecond-precision ISO strings in text
  formats; the parquet/orc binary encodings are exact.

Everything is schema-first (explicit MESSAGE_SCHEMA on read; no
inference) — inference on a 100 TB lake is both slow (a full extra
pass) and drift-prone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.message import MESSAGE_SCHEMA

FORMATS = ("parquet", "orc", "json", "csv")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

# csv/json text projection of the envelope
_TEXT_SCHEMA = (
    "message_id string, topic string, key string, payload_b64 string, "
    "event_time string, publish_time string, properties_json string"
)


def save_messages(df: DataFrame, path: str, fmt: str) -> None:
    """Write a MESSAGE_SCHEMA frame to ``path`` in ``fmt``."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt in ("parquet", "orc"):
        df.write.mode("overwrite").format(fmt).save(path)
        return
    text = df.select(
        "message_id", "topic", "key",
        F.base64("payload").alias("payload_b64"),
        F.date_format("event_time", _TS_FMT).alias("event_time"),
        F.date_format("publish_time", _TS_FMT).alias("publish_time"),
        F.to_json("properties").alias("properties_json"),
    )
    writer = text.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)


def load_messages(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """Read messages written by :func:`save_messages` back into the
    exact MESSAGE_SCHEMA (explicit schema, no inference)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt in ("parquet", "orc"):
        return spark.read.schema(MESSAGE_SCHEMA).format(fmt).load(path)
    reader = spark.read.schema(_TEXT_SCHEMA).format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True)
    text = reader.load(path)
    return text.select(
        "message_id", "topic", "key",
        F.unbase64("payload_b64").alias("payload"),
        F.to_timestamp("event_time", _TS_FMT).alias("event_time"),
        F.to_timestamp("publish_time", _TS_FMT).alias("publish_time"),
        F.from_json("properties_json", "map<string,string>").alias("properties"),
    )
