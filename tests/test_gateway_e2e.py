"""Full gateway⇄Spark dataflow over real sockets, zero mocks:

    HTTP POST /v1/firehose (topic A)
      -> TopicDirStore parquet
      -> Structured Streaming delivery query (streaming/delivery.py)
      -> executor-side HTTP POST back into the gateway (webhook target
         is the gateway's own firehose with a TopicFn header for B)
      -> TopicDirStore parquet (topic B)
      -> HTTP GET /v2/poll (topic B)

This is the reference's production loop (receive -> broker webhook
fan-out -> produce -> consume; src/route/handlers.go + broker/webhook.go)
with every hop exercised end-to-end: two HTTP ingress calls, a real
Spark streaming job, and an HTTP egress poll.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from pulsar_beam_spark.icrypto import RSAKeyPair
from pulsar_beam_spark.model.config_store import InMemoryConfigStore
from pulsar_beam_spark.model.message import MESSAGE_SCHEMA
from pulsar_beam_spark.server import GatewayApp, TopicDirStore, make_server
from pulsar_beam_spark.streaming.delivery import WebhookSink, deliver_stream

try:
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    HAVE_CRYPTO = True
except Exception:  # pragma: no cover
    HAVE_CRYPTO = False

pytestmark = pytest.mark.skipif(not HAVE_CRYPTO, reason="needs cryptography for test keygen")

PULSAR_URL = "pulsar://localhost:6650"
TOPIC_A = "persistent://tenant1/ns1/ingress"
TOPIC_B = "persistent://tenant1/ns1/egress"


def test_reply_loop_through_live_gateway(spark, tmp_path):
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    keypair = RSAKeyPair.from_pem(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        ).decode(),
        key.public_key()
        .public_bytes(
            serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
        )
        .decode(),
    )
    app = GatewayApp(
        config_store=InMemoryConfigStore(),
        message_store=TopicDirStore(str(tmp_path / "topics")),
        keys=keypair,
        allowed_clusters=[PULSAR_URL],
        mode="hybrid",
    )
    httpd = make_server(app)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        # 1. ingress: two messages into topic A over HTTP
        for payload in (b'{"n": 1}', b'{"n": 2}'):
            req = urllib.request.Request(
                base + "/v1/firehose", data=payload, method="POST",
                headers={"TopicFn": TOPIC_A, "PulsarUrl": PULSAR_URL},
            )
            assert urllib.request.urlopen(req, timeout=10).status == 200

        # 2. delivery: Spark streams topic A's directory; the webhook
        #    target is the gateway itself, re-producing onto topic B
        #    (the reference's beam-to-beam chaining deployment)
        sink = WebhookSink(
            url=base + "/v1/firehose",
            headers=[f"TopicFn: {TOPIC_B}", f"PulsarUrl: {PULSAR_URL}"],
            retry_max=2,
        )
        stream = (
            spark.readStream.schema(MESSAGE_SCHEMA)
            .parquet(app.message_store.topic_dir(TOPIC_A))
        )
        q = deliver_stream(stream, sink, str(tmp_path / "ckpt"))
        q.processAllAvailable()
        q.stop()

        # 3. egress: the delivered bodies poll out of topic B over HTTP
        req = urllib.request.Request(
            base + "/v2/poll/persistent/tenant1/ns1/egress",
            headers={"Authorization": "Bearer " + keypair.generate_token("tenant1")},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
            out = json.loads(resp.read())
        assert out["size"] == 2
        bodies = sorted(json.loads(m["payload"])["n"] for m in out["messages"])
        assert bodies == [1, 2]
        # producer parity survives the chain: fresh PulsarBeamId stamped
        rows, _ = app.message_store.scan(TOPIC_B)
        assert all(dict(r["properties"]).get("PulsarBeamId") for r in rows)
    finally:
        httpd.shutdown()
