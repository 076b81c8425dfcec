"""Spark schemas for the reference's core entities.

- MESSAGE_SCHEMA mirrors PulsarMessage (reference src/model/message.go:11-18)
  plus the free-form properties map stamped at produce time
  (src/pulsardriver/pulsar-producer.go:80-91).
- TOPIC_CONFIG_SCHEMA / WEBHOOK_SCHEMA mirror TopicConfig / WebhookConfig
  (src/model/topic.go:48-59 / :33-43).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MESSAGE_SCHEMA = StructType(
    [
        StructField("message_id", StringType(), False),
        StructField("topic", StringType(), False),
        StructField("key", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("event_time", TimestampType(), False),
        StructField("publish_time", TimestampType(), False),
        StructField("properties", MapType(StringType(), StringType()), True),
    ]
)

WEBHOOK_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("headers", ArrayType(StringType()), True),
        StructField("subscription", StringType(), True),
        StructField("subscription_type", StringType(), True),
        StructField("initial_position", StringType(), True),
        StructField("webhook_status", IntegerType(), False),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
        StructField("deleted_at", TimestampType(), True),
    ]
)

TOPIC_CONFIG_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("topic_full_name", StringType(), False),
        StructField("pulsar_url", StringType(), False),
        StructField("token", StringType(), True),
        StructField("tenant", StringType(), True),
        StructField("notes", StringType(), True),
        StructField("topic_status", IntegerType(), False),
        StructField("webhooks", ArrayType(WEBHOOK_SCHEMA), True),
        StructField("created_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
        # monotonic per-store sequence: last-write-wins is decided by
        # (updated_at, version), so two writes inside one clock tick (or
        # from a coarse clock) still order deterministically — the role
        # Pulsar's ledger/entry id plays for the reference's compacted
        # topic (src/db/pulsardb.go:92-96)
        StructField("version", LongType(), True),
    ]
)
