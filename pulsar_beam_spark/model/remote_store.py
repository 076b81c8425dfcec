"""Network config store: a TCP JSON-RPC server wrapping any Crud backend,
plus the matching client.

The reference's production config backend is a network database — the app
talks to mongod over a socket (src/db/mongo.go:98-118 ``mongo.Connect`` /
``client.Ping``) and every Crud call is a remote round-trip
(GetByKey/Update/Delete: src/db/mongo.go:127-258).  The in-process
backends in ``config_store.py`` cover the storage semantics; this module
covers the *wire* half: ``ConfigStoreServer`` exposes any backend over a
newline-delimited JSON protocol, and ``RemoteConfigStore`` is a drop-in
Crud client, so a gateway fleet can share one config database exactly as
the reference's beam instances share one Mongo.

Protocol (one JSON object per line, UTF-8):

    -> {"op": "update", "args": {...}}
    <- {"ok": <result>}                      | {"err": "KeyError", "msg": "..."}

Documents cross the wire in ``FileConfigStore``'s JSON form (ISO
datetimes, webhook tuples as lists), so both ends share one codec and the
client returns exactly what an in-process backend would.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading

from .config_store import DocAlreadyExisted, FileConfigStore
from .topic import Webhook

_ERRORS = {
    "DocAlreadyExisted": DocAlreadyExisted,
    "KeyError": KeyError,
    "ValueError": ValueError,
}


def _decode_webhooks(raw) -> list[Webhook]:
    return [
        Webhook(url=w["url"], subscription=w["subscription"],
                subscription_type=w.get("subscription_type", "exclusive"),
                initial_position=w.get("initial_position", "latest"),
                webhook_status=w.get("webhook_status", 1),
                headers=w.get("headers") or [])
        for w in raw or []
    ]


def encode_webhooks(webhooks: list[Webhook] | None) -> list[dict]:
    return [
        {"url": w.url, "subscription": w.subscription,
         "subscription_type": w.subscription_type,
         "initial_position": w.initial_position,
         "webhook_status": w.webhook_status, "headers": list(w.headers)}
        for w in webhooks or []
    ]


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        store = self.server.store  # type: ignore[attr-defined]
        lock = self.server.store_lock  # type: ignore[attr-defined]
        for line in self.rfile:
            try:
                req = json.loads(line)
                op, args = req["op"], req.get("args", {})
                with lock:
                    if op == "update" or op == "create":
                        fn = store.update if op == "update" else store.create
                        out = fn(args["topic_full_name"], args["pulsar_url"],
                                 _decode_webhooks(args.get("webhooks")),
                                 token=args.get("token", ""),
                                 tenant=args.get("tenant", ""),
                                 notes=args.get("notes"),
                                 topic_status=args.get("topic_status", 1))
                    elif op == "get_by_key":
                        doc = store.get_by_key(args["key"])
                        out = None if doc is None else FileConfigStore._to_json(doc)
                    elif op == "delete_by_key":
                        store.delete_by_key(args["key"])
                        out = None
                    elif op == "load":
                        out = [FileConfigStore._to_json(d) for d in store.load()]
                    else:
                        raise ValueError(f"unknown op: {op!r}")
                resp = {"ok": out}
            except Exception as e:  # noqa: BLE001 — every error crosses the wire typed
                resp = {"err": type(e).__name__, "msg": str(e)}
            self.wfile.write(json.dumps(resp).encode() + b"\n")
            self.wfile.flush()


class ConfigStoreServer(socketserver.ThreadingTCPServer):
    """Serve any Crud backend on a TCP port.  ``store_lock`` serializes
    Crud calls across client threads — the atomicity the reference gets
    from mongod's per-document operations."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, store, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self.store = store
        self.store_lock = threading.Lock()

    def start_background(self) -> "ConfigStoreServer":
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return self

    @property
    def address(self) -> tuple[str, int]:
        return self.server_address[:2]


class RemoteConfigStore:
    """Crud client for a ``ConfigStoreServer`` — same surface as the
    in-process backends (update/get_by_key/delete_by_key/load plus the
    name-pair half), every call one request/response round-trip on a
    persistent connection (the reference's pooled Mongo client,
    src/db/mongo.go:98-118)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")
        self._lock = threading.Lock()

    def close(self) -> None:
        self._rfile.close()
        self._sock.close()

    def _call(self, op: str, **args):
        with self._lock:
            self._sock.sendall(json.dumps({"op": op, "args": args}).encode() + b"\n")
            line = self._rfile.readline()
        if not line:
            raise ConnectionError("config store server closed the connection")
        resp = json.loads(line)
        if "err" in resp:
            raise _ERRORS.get(resp["err"], RuntimeError)(resp.get("msg", ""))
        return resp["ok"]

    def update(self, topic_full_name: str, pulsar_url: str, webhooks=None,
               token: str = "", tenant: str = "", notes=None,
               topic_status: int = 1) -> str:
        return self._call("update", topic_full_name=topic_full_name,
                          pulsar_url=pulsar_url, webhooks=encode_webhooks(webhooks),
                          token=token, tenant=tenant, notes=notes,
                          topic_status=topic_status)

    def create(self, topic_full_name: str, pulsar_url: str, webhooks=None,
               token: str = "", tenant: str = "", notes=None,
               topic_status: int = 1) -> str:
        # create is forwarded (not composed client-side from get+update) so
        # the dup-key check runs under the SERVER's lock — two racing
        # clients cannot both create (the reference gets this from Mongo's
        # unique-index insert, src/db/mongo.go:150-160).
        return self._call("create", topic_full_name=topic_full_name,
                          pulsar_url=pulsar_url, webhooks=encode_webhooks(webhooks),
                          token=token, tenant=tenant, notes=notes,
                          topic_status=topic_status)

    def get_by_key(self, key: str) -> dict | None:
        doc = self._call("get_by_key", key=key)
        return None if doc is None else FileConfigStore._from_json(doc)

    def delete_by_key(self, key: str) -> None:
        self._call("delete_by_key", key=key)

    def load(self) -> list[dict]:
        return [FileConfigStore._from_json(d) for d in self._call("load")]

    # name-pair half (client-side re-derivation, same as _CrudByNamesMixin;
    # get/delete are single keyed calls so no added race window)
    def get_by_topic(self, topic_full_name: str, pulsar_url: str) -> dict | None:
        from .topic import gen_key_from_names

        return self.get_by_key(gen_key_from_names(topic_full_name, pulsar_url))

    def delete(self, topic_full_name: str, pulsar_url: str) -> None:
        from .topic import gen_key_from_names

        self.delete_by_key(gen_key_from_names(topic_full_name, pulsar_url))
