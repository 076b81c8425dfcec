"""Run the HTTP gateway: ``python -m pulsar_beam_spark.server``.

Flag parity with the reference launcher (main.go:39-66 + the `-mode`
run modes of src/util/main_control.go): pick a mode, a port, a config
backend, and an auth impl; print the bound routes; serve until SIGINT.

Configuration layering follows the reference (src/util/config.go:104-152):
**env > config file > CLI flag/default**.  The file path comes from
``--config`` or the ``PULSAR_BEAM_CONFIG`` env var; every field of the
reference's Configuration struct is overridable by an env var of the
same name (PORT, SuperRoles, CertFile, HTTPAuthImpl, ...).  CLI flags
occupy the *default* tier: the reference launcher has no flags, so
anything it configures via env/file must keep winning here too.

TLS: set CertFile/KeyFile (env, file, or --tls-cert/--tls-key) to serve
HTTPS; certs hot-reload on file change per handshake and on SIGHUP
(reference src/util/cert-loader.go:63-125).

Examples:
    python -m pulsar_beam_spark.server --mode hybrid --port 8085 \
        --topics-dir /tmp/pbs-topics --noauth
    PORT=9090 HTTPAuthImpl=noauth python -m pulsar_beam_spark.server
    python -m pulsar_beam_spark.server --mode tokenserver \
        --private-key key.pem --public-key key.pub
"""

from __future__ import annotations

import argparse
import sys

from .config import load_config, split_csv
from .gateway import GatewayApp, make_server
from .store import TopicDirStore


def _make_store(db_type: str, conn_str: str, file_fallback: str | None):
    """PbDbType -> Crud backend (reference src/db/dbutil.go NewDb
    dispatch: mongo | inmemory | pulsar as table).  Here: inmemory |
    file (document dir) | sqlite (server-DB via DB-API) | remote
    (TCP config-store server, host:port)."""
    from ..model.config_store import (
        DbApiConfigStore, FileConfigStore, InMemoryConfigStore)

    if db_type in ("", "inmemory", "memory"):
        if file_fallback:
            return FileConfigStore(file_fallback)
        return InMemoryConfigStore()
    if db_type == "file":
        return FileConfigStore(conn_str or file_fallback or "/tmp/pulsar-beam-spark/config")
    if db_type in ("sqlite", "dbapi"):
        return DbApiConfigStore.sqlite(conn_str or "/tmp/pulsar-beam-spark/config.db")
    if db_type == "remote":
        from ..model.remote_store import RemoteConfigStore

        host, _, port = conn_str.rpartition(":")
        return RemoteConfigStore(host or "127.0.0.1", int(port))
    raise SystemExit(f"unknown PbDbType: {db_type!r}")


def build_app(argv=None) -> tuple[GatewayApp, argparse.Namespace]:
    ap = argparse.ArgumentParser(prog="pulsar_beam_spark.server")
    ap.add_argument("--mode", default="hybrid",
                    choices=["hybrid", "receiver", "http", "http2", "tokenserver", "rest"],
                    help="route set, reference -mode (default hybrid)")
    ap.add_argument("--config", default=None,
                    help="YAML/JSON config file (reference pulsar_beam.yml); "
                         "PULSAR_BEAM_CONFIG env var overrides this path")
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
    ap.add_argument("--tls-cert", default=None, help="TLS cert chain PEM (CertFile)")
    ap.add_argument("--tls-key", default=None, help="TLS private key PEM (KeyFile)")
    ap.add_argument("--rate", type=int, default=200, help="global request semaphore")
    args = ap.parse_args(argv)

    # flags form the DEFAULT tier; file then env override (config.go
    # precedence).  Only flags the user actually set differ from the
    # parser defaults, so untouched flags never shadow the file layer.
    cfg = load_config(args.config, defaults={
        "PORT": str(args.port),
        "SuperRoles": ",".join(args.superrole),
        "PulsarClusters": ",".join(args.allowed_cluster),
        "PulsarPublicKey": args.public_key or "",
        "PulsarPrivateKey": args.private_key or "",
        "HTTPAuthImpl": "noauth" if args.noauth else "",
        "CertFile": args.tls_cert or "",
        "KeyFile": args.tls_key or "",
        "DbConnectionStr": args.config_dir or "",
        "PbDbType": "file" if args.config_dir else "inmemory",
    })
    args.port = int(cfg["PORT"])
    args.tls_cert, args.tls_key = cfg["CertFile"] or None, cfg["KeyFile"] or None
    noauth = cfg["HTTPAuthImpl"] == "noauth"

    keys = None
    if cfg["PulsarPublicKey"]:
        from ..icrypto import RSAKeyPair

        priv = (open(cfg["PulsarPrivateKey"]).read()
                if cfg["PulsarPrivateKey"] else None)
        keys = RSAKeyPair.from_pem(priv, open(cfg["PulsarPublicKey"]).read())
    elif not noauth:
        ap.error("--public-key (or PulsarPublicKey) is required unless noauth is set")

    # AllowedPulsarURLs: PulsarBrokerURL leads, then PulsarClusters
    # (config.go:154-159)
    clusters = split_csv(cfg["PulsarClusters"])
    if cfg["PulsarBrokerURL"]:
        clusters = [cfg["PulsarBrokerURL"]] + clusters

    def access_log(method: str, uri: str, name: str, seconds: float) -> None:
        # Logger middleware format parity (src/route/logger.go:17-23)
        print(f"{method}\t{uri}\t{name}\t{seconds * 1000:.2f}ms", file=sys.stderr)

    app = GatewayApp(
        config_store=_make_store(cfg["PbDbType"], cfg["DbConnectionStr"],
                                 args.config_dir),
        message_store=TopicDirStore(args.topics_dir),
        keys=keys,
        superroles=tuple(split_csv(cfg["SuperRoles"]) or ["superuser"]),
        allowed_clusters=clusters,
        mode=args.mode,
        auth_impl="noauth" if noauth else "jwt",
        rate=args.rate,
        access_log=access_log,
    )
    return app, args


def main(argv=None) -> int:
    app, args = build_app(argv)
    httpd = make_server(app, args.host, args.port,
                        certfile=args.tls_cert, keyfile=args.tls_key)
    if httpd.cert_reloader is not None:
        import signal

        signal.signal(signal.SIGHUP,
                      lambda *_: httpd.cert_reloader.reload())
    host, port = httpd.server_address[:2]
    scheme = "https" if httpd.cert_reloader else "http"
    print(f"pulsar-beam-spark gateway [{args.mode}] on {scheme}://{host}:{port}")
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
