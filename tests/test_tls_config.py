"""TLS serving + hot cert reload (reference src/util/cert-loader.go:63-125)
and env>file>default config layering (src/util/config.go:104-152)."""

from __future__ import annotations

import datetime
import json
import ssl
import threading
import urllib.request

import pytest

try:
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    HAVE_CRYPTO = True
except ImportError:  # pragma: no cover
    HAVE_CRYPTO = False

pytestmark = pytest.mark.skipif(not HAVE_CRYPTO, reason="cryptography not installed")

PULSAR_URL = "pulsar://localhost:6650"
TOPIC_FN = "persistent://tenant1/ns1/topic1"


def _self_signed(tmp_path, stem: str, cn: str = "localhost"):
    """Write a self-signed localhost cert/key pair; return (cert, key, serial)."""
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name).public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.DNSName("localhost"),
                 x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    cert_p, key_p = tmp_path / f"{stem}.pem", tmp_path / f"{stem}.key"
    cert_p.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_p.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return str(cert_p), str(key_p), cert.serial_number


def _noauth_app(tmp_path):
    from pulsar_beam_spark.model.config_store import InMemoryConfigStore
    from pulsar_beam_spark.server import GatewayApp, TopicDirStore

    return GatewayApp(
        config_store=InMemoryConfigStore(),
        message_store=TopicDirStore(str(tmp_path / "topics")),
        keys=None, superroles=("superuser",),
        allowed_clusters=[PULSAR_URL], mode="hybrid", auth_impl="noauth",
    )


def _serve(app, cert, key):
    from pulsar_beam_spark.server import make_server

    httpd = make_server(app, certfile=cert, keyfile=key)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def _peer_serial(port: int, ca_file: str | None) -> int:
    """Handshake (SNI=localhost) and return the served cert's serial."""
    ctx = ssl.create_default_context(cafile=ca_file)
    if ca_file is None:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    import socket

    with socket.create_connection(("127.0.0.1", port), timeout=10) as raw:
        with ctx.wrap_socket(raw, server_hostname="localhost") as s:
            der = s.getpeercert(binary_form=True)
    return x509.load_der_x509_certificate(der).serial_number


def test_https_end_to_end(tmp_path):
    """The gateway serves its routes over https:// — the reference's
    ListenAndServeTLS path (cert-loader.go:63-77)."""
    cert, key, _ = _self_signed(tmp_path, "srv")
    httpd = _serve(_noauth_app(tmp_path), cert, key)
    try:
        port = httpd.server_address[1]
        ctx = ssl.create_default_context(cafile=cert)
        req = urllib.request.Request(
            f"https://localhost:{port}/v1/firehose", data=b"tls-msg", method="POST",
            headers={"TopicFn": TOPIC_FN, "PulsarUrl": PULSAR_URL})
        with urllib.request.urlopen(req, context=ctx, timeout=10) as r:
            assert r.status == 200
        req2 = urllib.request.Request(
            f"https://localhost:{port}/status",
            headers={"Authorization": "Bearer anything"})
        with urllib.request.urlopen(req2, context=ctx, timeout=10) as r:
            assert r.status == 200
    finally:
        httpd.shutdown()


def test_cert_hot_reload_on_file_change(tmp_path):
    """Overwrite cert+key on disk; the NEXT handshake serves the new
    cert with no listener restart (GetCertificate-per-handshake parity,
    cert-loader.go:105-117 — here via the SNI callback's mtime check)."""
    cert, key, serial1 = _self_signed(tmp_path, "srv")
    httpd = _serve(_noauth_app(tmp_path), cert, key)
    try:
        port = httpd.server_address[1]
        assert _peer_serial(port, cert) == serial1

        cert2, key2, serial2 = _self_signed(tmp_path, "next")
        import os, shutil, time

        retired = str(tmp_path / "retired.pem")
        shutil.copyfile(cert, retired)
        # ensure the mtime actually moves even on coarse filesystems
        shutil.copyfile(cert2, cert)
        shutil.copyfile(key2, key)
        future = time.time() + 2
        os.utime(cert, (future, future))
        os.utime(key, (future, future))

        assert serial2 != serial1
        assert _peer_serial(port, cert) == serial2
        # clients still pinning the retired cert now fail verification
        with pytest.raises(ssl.SSLError):
            _peer_serial(port, retired)
    finally:
        httpd.shutdown()


def test_cert_reload_sighup_path(tmp_path):
    """Explicit reload() — what main() wires to SIGHUP for clients that
    connect by bare IP and send no SNI."""
    cert, key, serial1 = _self_signed(tmp_path, "srv")
    httpd = _serve(_noauth_app(tmp_path), cert, key)
    try:
        port = httpd.server_address[1]
        assert _peer_serial(port, None) == serial1
        cert2, key2, serial2 = _self_signed(tmp_path, "next")
        import shutil

        shutil.copyfile(cert2, cert)
        shutil.copyfile(key2, key)
        httpd.cert_reloader.reload()
        assert _peer_serial(port, None) == serial2
    finally:
        httpd.shutdown()


def test_half_rotated_pair_keeps_old_cert(tmp_path):
    """Cert updated but key not yet: the handshake hook must keep serving
    the OLD pair (cert-loader.go:84-101 waits for both files)."""
    cert, key, serial1 = _self_signed(tmp_path, "srv")
    httpd = _serve(_noauth_app(tmp_path), cert, key)
    try:
        port = httpd.server_address[1]
        cert2, _, _ = _self_signed(tmp_path, "next")
        import os, shutil, time

        shutil.copyfile(cert2, cert)  # mismatched with old key on disk
        future = time.time() + 2
        os.utime(cert, (future, future))
        # load_cert_chain(cert2, key1) fails -> old context stays active
        assert _peer_serial(port, None) == serial1
    finally:
        httpd.shutdown()


# -- config layering ----------------------------------------------------


def test_config_precedence_env_over_file_over_default(tmp_path):
    from pulsar_beam_spark.server.config import load_config

    cfg_file = tmp_path / "beam.yml"
    cfg_file.write_text("PORT: 7001\nSuperRoles: filerole\nLogLevel: debug\n")
    cfg = load_config(str(cfg_file), env={"SuperRoles": "envrole,other\n"})
    assert cfg["PORT"] == "7001"            # file beats default
    assert cfg["SuperRoles"] == "envrole,other"  # env beats file; \n stripped
    assert cfg["LogLevel"] == "debug"
    assert cfg["PbDbType"] == "inmemory"    # untouched default
    # empty env var does NOT override (config.go:146 len(envV) > 0)
    cfg2 = load_config(str(cfg_file), env={"SuperRoles": ""})
    assert cfg2["SuperRoles"] == "filerole"


def test_config_json_and_env_file_path(tmp_path):
    from pulsar_beam_spark.server.config import load_config

    jf = tmp_path / "beam.json"
    jf.write_text(json.dumps({"PORT": "7002", "HTTPAuthImpl": "noauth"}))
    # PULSAR_BEAM_CONFIG env var wins over the passed path (config.go:104-106)
    other = tmp_path / "other.yml"
    other.write_text("PORT: 9999\n")
    cfg = load_config(str(other), env={"PULSAR_BEAM_CONFIG": str(jf)})
    assert cfg["PORT"] == "7002" and cfg["HTTPAuthImpl"] == "noauth"


def test_build_app_env_overrides(tmp_path, monkeypatch):
    """End-to-end through the CLI: env vars reshape the effective app
    (the reference's k8s deployment path — no flags, all env)."""
    from pulsar_beam_spark.server.__main__ import build_app

    monkeypatch.setenv("PORT", "7003")
    monkeypatch.setenv("HTTPAuthImpl", "noauth")
    monkeypatch.setenv("SuperRoles", "admin1,admin2")
    monkeypatch.setenv("PulsarClusters", f"{PULSAR_URL},pulsar://other:6650")
    monkeypatch.setenv("PulsarBrokerURL", "pulsar://primary:6650")
    app, args = build_app(["--topics-dir", str(tmp_path / "t")])
    assert args.port == 7003
    assert app.auth_impl == "noauth"
    assert app.superroles == ("admin1", "admin2")
    assert app.allowed_clusters[0] == "pulsar://primary:6650"
    assert PULSAR_URL in app.allowed_clusters


def test_build_app_file_config_sqlite_backend(tmp_path, monkeypatch):
    """PbDbType=sqlite via config file selects the DB-API backend."""
    from pulsar_beam_spark.model.config_store import DbApiConfigStore
    from pulsar_beam_spark.server.__main__ import build_app

    cfg = tmp_path / "beam.yml"
    cfg.write_text(
        "HTTPAuthImpl: noauth\n"
        "PbDbType: sqlite\n"
        f"DbConnectionStr: {tmp_path / 'cfg.db'}\n")
    monkeypatch.setenv("PULSAR_BEAM_CONFIG", str(cfg))
    app, _ = build_app(["--topics-dir", str(tmp_path / "t")])
    assert isinstance(app.config_store, DbApiConfigStore)
    k = app.config_store.update("persistent://t/ns/x", PULSAR_URL, [])
    assert app.config_store.get_by_key(k) is not None
