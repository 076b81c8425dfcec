"""Gateway robustness: malformed inputs must map to the reference's
4xx/5xx codes (never an unhandled 500), topic names must not escape the
store root, and the threaded server + locked store must survive
concurrent producers."""

from __future__ import annotations

import gzip
import json
import os
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

from pulsar_beam_spark.model.config_store import InMemoryConfigStore
from pulsar_beam_spark.server import GatewayApp, TopicDirStore, make_server

PULSAR_URL = "pulsar://localhost:6650"


@pytest.fixture()
def gw(tmp_path):
    app = GatewayApp(
        config_store=InMemoryConfigStore(),
        message_store=TopicDirStore(str(tmp_path / "topics")),
        keys=None,
        allowed_clusters=[PULSAR_URL],
        mode="http",
        auth_impl="noauth",  # exercise handlers, not auth
    )
    httpd = make_server(app)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield app, f"http://127.0.0.1:{httpd.server_address[1]}", str(tmp_path / "topics")
    httpd.shutdown()


def call(base, path, method="GET", body=None, headers=None):
    req = urllib.request.Request(base + path, data=body, method=method, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_malformed_topic_json_422(gw):
    _, base, _ = gw
    for bad in (b"{not json", b"[]", b'{"TopicFullName": 42}'):
        code, _ = call(base, "/v2/topic", "POST", bad)
        assert code == 422, bad


def test_bad_gzip_body_500(gw):
    _, base, _ = gw
    code, _ = call(base, "/v1/firehose", "POST", b"\x1f\x8bnot-really-gzip",
                   {"TopicFn": "persistent://t/ns/a", "PulsarUrl": PULSAR_URL,
                    "Content-Encoding": "gzip"})
    assert code == 500  # reference: gzip.NewReader error -> 500 (handlers.go:88-91)


def test_valid_gzip_trailing_garbage_not_500(gw):
    app, base, _ = gw
    body = gzip.compress(b"ok") + b""  # clean
    code, _ = call(base, "/v1/firehose", "POST", body,
                   {"TopicFn": "persistent://t/ns/gz", "PulsarUrl": PULSAR_URL,
                    "Content-Encoding": "gzip"})
    assert code == 200


def test_non_numeric_batch_size_defaults(gw):
    app, base, _ = gw
    app.message_store.append("persistent://t/ns/b", b"x")
    code, body = call(base, "/v2/poll/persistent/t/ns/b?batchSize=abc")
    assert code == 200
    assert json.loads(body)["limit"] == 10  # QueryParamInt default (util parity)


def test_binary_payload_roundtrip(gw):
    app, base, _ = gw
    payload = bytes(range(256))
    code, _ = call(base, "/v1/firehose", "POST", payload,
                   {"TopicFn": "persistent://t/ns/bin", "PulsarUrl": PULSAR_URL})
    assert code == 200
    rows, _ = app.message_store.scan("persistent://t/ns/bin")
    assert bytes(rows[0]["payload"]) == payload


def test_topic_name_cannot_escape_store_root(gw):
    app, base, root = gw
    evil = "persistent://t/ns/../../../../etc/passwd"
    code, _ = call(base, "/v1/firehose", "POST", b"x",
                   {"TopicFn": evil, "PulsarUrl": PULSAR_URL})
    assert code == 200
    # every file the store created lives under the root
    for dirpath, _dirs, files in os.walk(root):
        assert os.path.realpath(dirpath).startswith(os.path.realpath(root))
    # and the evil name maps to a single flat directory, slashes encoded
    assert any("etc" in d and ".." in d for d in os.listdir(root))
    out = app.message_store.poll(evil)
    assert out["size"] == 1


def test_concurrent_producers(gw):
    app, base, _ = gw
    topic = "persistent://t/ns/conc"

    def post(i):
        return call(base, "/v1/firehose", "POST", f"msg-{i}".encode(),
                    {"TopicFn": topic, "PulsarUrl": PULSAR_URL})[0]

    with ThreadPoolExecutor(16) as ex:
        codes = list(ex.map(post, range(60)))
    assert codes == [200] * 60
    rows, _ = app.message_store.scan(topic)
    assert len(rows) == 60
    assert len({r["message_id"] for r in rows}) == 60  # unique ids under contention
    assert len({dict(r["properties"])["PulsarBeamId"] for r in rows}) == 60


def test_get_topic_with_empty_body_422(gw):
    _, base, _ = gw
    assert call(base, "/v2/topic", "GET", b"")[0] == 422
    assert call(base, "/v2/topic", "DELETE", b"")[0] == 422


def test_async_append_flushes_on_timer(tmp_path):
    import time

    store = TopicDirStore(str(tmp_path / "t"), flush_interval_s=0.1)
    store.append("persistent://t/ns/timer", b"later", asynchronous=True)
    assert store.poll("persistent://t/ns/timer") is None  # still buffered
    deadline = time.time() + 3
    while time.time() < deadline:
        out = store.poll("persistent://t/ns/timer")
        if out is not None:
            break
        time.sleep(0.05)
    assert out is not None and out["size"] == 1  # timer drained the buffer
