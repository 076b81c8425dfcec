"""JWT RS256 parity tests (reference src/unit-test/crypto_test.go:
sign/verify with PEM keys, subject round-trip, middleware accept/reject,
superrole-only mint).

The implementation under test is dependency-free (hashlib + pow); where
the `cryptography` package is importable we ALSO cross-validate both
directions against its RSASSA-PKCS1-v1_5 — deterministic padding means
signatures must match byte-for-byte.
"""

from __future__ import annotations

import os

import pytest

from pulsar_beam_spark.icrypto import (
    RSAKeyPair,
    auth_verify_jwt,
    generate_token,
    load_pem_private_key,
    load_pem_public_key,
    mint_token,
    rs256_sign,
    rs256_verify,
)
from pulsar_beam_spark.icrypto.jwt_rs256 import InvalidToken

try:
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    HAVE_CRYPTO = True
except Exception:  # pragma: no cover
    HAVE_CRYPTO = False

REF_KEYS = "/root/reference/src/unit-test"


@pytest.fixture(scope="module")
def keypair() -> RSAKeyPair:
    if HAVE_CRYPTO:
        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        priv_pem = key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        ).decode()
        pub_pem = key.public_key().public_bytes(
            serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
        ).decode()
        return RSAKeyPair.from_pem(priv_pem, pub_pem)
    pytest.skip("no key source available")


def test_token_subject_roundtrip(keypair):
    token = keypair.generate_token("picasso")
    assert token.count(".") == 2
    assert keypair.get_token_subject(token) == "picasso"
    assert keypair.verify_token_subject(token, "picasso") is True
    with pytest.raises(InvalidToken, match="incorrect sub"):
        keypair.verify_token_subject(token, "someone-else")


def test_tampered_token_rejected(keypair):
    token = keypair.generate_token("picasso")
    h, c, s = token.split(".")
    # flip the subject without re-signing
    import base64
    import json

    claims = json.loads(base64.urlsafe_b64decode(c + "=" * (-len(c) % 4)))
    claims["sub"] = "superuser"
    forged = base64.urlsafe_b64encode(json.dumps(claims).encode()).rstrip(b"=").decode()
    with pytest.raises(InvalidToken):
        keypair.get_token_subject(f"{h}.{forged}.{s}")
    with pytest.raises(InvalidToken):
        keypair.get_token_subject("garbage")
    with pytest.raises(InvalidToken):
        keypair.get_token_subject(f"{h}.{c}.")


@pytest.mark.skipif(not HAVE_CRYPTO, reason="cryptography unavailable")
def test_rs256_cross_validates_with_cryptography(keypair):
    """PKCS1-v1_5 is deterministic: our pow()-based signature must equal
    the cryptography package's byte-for-byte, and each side must verify
    the other's."""
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    priv_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption(),
    ).decode()
    pub_pem = key.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    ).decode()
    ours_priv = load_pem_private_key(priv_pem)
    ours_pub = load_pem_public_key(pub_pem)
    msg = b"header.payload"

    ours = rs256_sign(msg, ours_priv)
    theirs = key.sign(msg, padding.PKCS1v15(), hashes.SHA256())
    assert ours == theirs
    assert rs256_verify(msg, theirs, ours_pub)
    key.public_key().verify(ours, msg, padding.PKCS1v15(), hashes.SHA256())  # raises if bad
    assert not rs256_verify(b"other message", ours, ours_pub)


@pytest.mark.skipif(not os.path.isdir(REF_KEYS), reason="reference keys unavailable")
def test_parses_pulsar_example_keys():
    """The reference's example key is PKCS#8 DER under a 'BEGIN RSA
    PRIVATE KEY' label — the parser must detect the structure, not trust
    the label; and the pair must sign/verify a token end to end."""
    with open(os.path.join(REF_KEYS, "example_private_key")) as f:
        priv_pem = f.read()
    with open(os.path.join(REF_KEYS, "example_public_key.pub")) as f:
        pub_pem = f.read()
    pair = RSAKeyPair.from_pem(priv_pem, pub_pem)
    assert pair.private_key.n == pair.public_key.n
    token = pair.generate_token("dummy2")
    assert pair.get_token_subject(token) == "dummy2"


def test_auth_middleware_and_mint(keypair):
    token = keypair.generate_token("tenant1")
    # Bearer prefix stripped, subject injected (middleware.go:33-41)
    assert auth_verify_jwt(f"Bearer {token}", keypair) == "tenant1"
    assert auth_verify_jwt(token, keypair) == "tenant1"
    assert auth_verify_jwt("Bearer bad.token.sig", keypair) is None
    assert auth_verify_jwt(None, keypair) is None
    # noauth injects the first superrole (middleware.go:27-31)
    assert auth_verify_jwt(None, keypair, ("thisisroot", "x"), noauth=True) == "thisisroot"

    # G12 mint: superrole-only (handlers.go:41-68)
    minted = mint_token("new-tenant", keypair, "admin", superroles=("admin",))
    assert keypair.get_token_subject(minted) == "new-tenant"
    with pytest.raises(PermissionError, match="incorrect subject"):
        mint_token("new-tenant", keypair, "tenant1", superroles=("admin",))


def test_auth_feeds_tenant_predicate(spark, keypair):
    """End to end G10: token -> subject -> row-level tenant filter."""
    from pyspark.sql import functions as F

    from pulsar_beam_spark.model.topic import tenant_allowed_col

    subject = auth_verify_jwt(f"Bearer {keypair.generate_token('alice')}", keypair)
    df = spark.createDataFrame(
        [("persistent://alice/ns/t",), ("persistent://bob/ns/t",)], ["topic"]
    )
    kept = df.filter(tenant_allowed_col(F.col("topic"), subject)).collect()
    assert [r["topic"] for r in kept] == ["persistent://alice/ns/t"]
