"""Real-broker connector surface: Kafka / Pulsar source wiring for the
same Message envelope the engine processes everywhere else.

The sandbox has no broker and no connector JARs, so per SURVEY §4.3 the
file-based `events` stand-in powers all tests; this module is the thin,
fully-specified seam a deployment flips on:

- option builders map the reference's subscription semantics (G6:
  SubscriptionInitialPosition latest/earliest -> startingOffsets;
  per-trigger admission -> maxOffsetsPerTrigger, mirroring G11) onto the
  Structured Streaming Kafka source / StreamNative pulsar-spark options.
- ``normalize_kafka`` rewrites the Kafka wire schema (key/value/topic/
  partition/offset/timestamp/headers) into MESSAGE_SCHEMA — pure column
  expressions, unit-tested on batch rows without any broker.
- ``open_kafka_stream`` / ``open_pulsar_stream`` compose the two; they
  raise a clear error when the connector package is absent.

Reference trace: the Pulsar consumer loop (src/broker/webhook.go:171-241)
delivers {payload, topic, event/publish time, message id, properties} —
exactly the normalized columns here; message_id mirrors Kafka's
(topic, partition, offset) identity the way PulsarMessage.MessageID
carries the ledger id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.topic import get_initial_position


def kafka_source_options(
    bootstrap_servers: str,
    topics: str,
    initial_position: str = "latest",
    max_offsets_per_trigger: int | None = None,
    subscription_name: str | None = None,
) -> dict[str, str]:
    """G6/G11 knob mapping for the built-in Kafka source.

    Option names are the spark-sql-kafka-0-10 documented set:
    kafka.bootstrap.servers / subscribe / startingOffsets /
    maxOffsetsPerTrigger / kafka.group.id.  A durable subscription name
    (reference: resumable non-NonResumable subs, src/model/topic.go:94)
    maps to kafka.group.id — the broker-side consumer identity."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": get_initial_position(initial_position),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if subscription_name is not None:
        opts["kafka.group.id"] = subscription_name
    return opts


def pulsar_source_options(
    service_url: str,
    admin_url: str,
    topics: str,
    initial_position: str = "latest",
    subscription_name: str | None = None,
) -> dict[str, str]:
    """Options for the StreamNative pulsar-spark connector
    (format 'pulsar'): service.url / admin.url / topics /
    startingOffsets / predefinedSubscription per its documented option
    schema.  predefinedSubscription is the G6 durable-subscription
    mapping (the connector resumes the named Pulsar subscription, the
    way the reference resumes user-named subs and auto-unsubscribes
    NonResumable* ones — src/route/handlers.go:216-220)."""
    opts = {
        "service.url": service_url,
        "admin.url": admin_url,
        "topics": topics,
        "startingOffsets": get_initial_position(initial_position),
    }
    if subscription_name is not None:
        opts["predefinedSubscription"] = subscription_name
    return opts


def normalize_kafka(df: DataFrame) -> DataFrame:
    """Kafka wire schema -> MESSAGE_SCHEMA columns.

    message_id = topic-partition-offset (the source's stable identity);
    event_time = broker timestamp; publish_time = ingestion stamp;
    headers (array<struct<key,binary value>>) -> properties map.
    Works on the streaming source and on batch rows alike (unit-tested
    on the latter)."""
    return df.select(
        F.concat_ws(
            "-", F.col("topic"), F.col("partition").cast("string"), F.col("offset").cast("string")
        ).alias("message_id"),
        F.col("topic"),
        F.col("key").cast("string").alias("key"),
        F.col("value").alias("payload"),
        F.col("timestamp").alias("event_time"),
        F.current_timestamp().alias("publish_time"),
        F.map_from_entries(
            F.transform(
                F.coalesce("headers", F.array()),
                lambda h: F.struct(
                    h["key"].alias("key"), h["value"].cast("string").alias("value")
                ),
            )
        ).alias("properties"),
    )


def open_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    initial_position: str = "latest",
    max_offsets_per_trigger: int | None = None,
    subscription_name: str | None = None,
) -> DataFrame:
    """readStream from Kafka, normalized to the Message envelope.
    Requires the spark-sql-kafka package on the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers, topics, initial_position, max_offsets_per_trigger,
        subscription_name,
    ).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # missing connector package, unreachable broker
        raise RuntimeError(
            "Kafka source unavailable — add org.apache.spark:spark-sql-kafka-0-10 "
            f"to spark.jars.packages ({e})"
        ) from e
    return normalize_kafka(raw)


def open_pulsar_stream(
    spark: SparkSession,
    service_url: str,
    admin_url: str,
    topics: str,
    initial_position: str = "latest",
    subscription_name: str | None = None,
) -> DataFrame:
    """readStream from Pulsar via the StreamNative connector; the
    connector already emits Pulsar's message metadata columns."""
    reader = spark.readStream.format("pulsar")
    for k, v in pulsar_source_options(
        service_url, admin_url, topics, initial_position, subscription_name
    ).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        raise RuntimeError(
            "Pulsar source unavailable — add io.streamnative.connectors:pulsar-spark-connector "
            f"to spark.jars.packages ({e})"
        ) from e
