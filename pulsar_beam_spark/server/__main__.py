"""Run the HTTP gateway: ``python -m pulsar_beam_spark.server``.

Flag parity with the reference launcher (main.go:39-66 + the `-mode`
run modes of src/util/main_control.go): pick a mode, a port, a config
backend, and an auth impl; print the bound routes; serve until SIGINT.

Examples:
    python -m pulsar_beam_spark.server --mode hybrid --port 8085 \
        --topics-dir /tmp/pbs-topics --noauth
    python -m pulsar_beam_spark.server --mode tokenserver \
        --private-key key.pem --public-key key.pub
"""

from __future__ import annotations

import argparse
import sys

from ..model.config_store import FileConfigStore, InMemoryConfigStore
from .gateway import GatewayApp, make_server
from .store import TopicDirStore


def build_app(argv=None) -> tuple[GatewayApp, argparse.Namespace]:
    ap = argparse.ArgumentParser(prog="pulsar_beam_spark.server")
    ap.add_argument("--mode", default="hybrid",
                    choices=["hybrid", "receiver", "http", "http2", "tokenserver", "rest"],
                    help="route set, reference -mode (default hybrid)")
    ap.add_argument("--port", type=int, default=8085)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--topics-dir", default="/tmp/pulsar-beam-spark/topics",
                    help="topic message store root (MESSAGE_SCHEMA parquet)")
    ap.add_argument("--config-dir", default=None,
                    help="FileConfigStore dir; omit for in-memory")
    ap.add_argument("--allowed-cluster", action="append", default=[],
                    help="allowed PulsarUrl values (repeatable); first is the default")
    ap.add_argument("--superrole", action="append", default=["superuser"])
    ap.add_argument("--noauth", action="store_true",
                    help="HTTPAuthImpl=noauth: inject the first superrole")
    ap.add_argument("--private-key", default=None, help="PEM RSA private key (mint)")
    ap.add_argument("--public-key", default=None, help="PEM RSA public key (verify)")
    ap.add_argument("--rate", type=int, default=200, help="global request semaphore")
    args = ap.parse_args(argv)

    keys = None
    if args.public_key:
        from ..icrypto import RSAKeyPair

        priv = open(args.private_key).read() if args.private_key else None
        keys = RSAKeyPair.from_pem(priv, open(args.public_key).read())
    elif not args.noauth:
        ap.error("--public-key is required unless --noauth is set")

    store = (
        FileConfigStore(args.config_dir) if args.config_dir else InMemoryConfigStore()
    )
    app = GatewayApp(
        config_store=store,
        message_store=TopicDirStore(args.topics_dir),
        keys=keys,
        superroles=tuple(args.superrole),
        allowed_clusters=args.allowed_cluster,
        mode=args.mode,
        auth_impl="noauth" if args.noauth else "jwt",
        rate=args.rate,
    )
    return app, args


def main(argv=None) -> int:
    app, args = build_app(argv)
    httpd = make_server(app, args.host, args.port)
    host, port = httpd.server_address[:2]
    print(f"pulsar-beam-spark gateway [{args.mode}] on http://{host}:{port}")
    for r in app.routes:
        print(f"  {r.method:6s} {r.pattern}  ({r.auth})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
