"""G10/G12 — JWT RS256 sign/verify and the auth middleware analogue,
dependency-free (hashlib + integer pow; no `cryptography` package in this
container).

Reference parity:
- token shape: RS256, claims ``{"sub": subject}`` (no exp — the reference
  comments the exp claim out), src/icrypto/pulsar-jwt.go:45-57.
- DecodeToken / GetTokenSubject / VerifyTokenSubject error behavior,
  src/icrypto/pulsar-jwt.go:60-108.
- AuthVerifyJWT middleware: Bearer token -> subject injected as
  ``injectedSubs``; noauth mode injects the first superrole,
  src/middleware/middleware.go:24-46.
- TokenSubjectHandler (G12 mint): superrole-only, "incorrect subject"
  otherwise, src/route/handlers.go:41-68.

Crypto scope: RSASSA-PKCS1-v1_5 with SHA-256 over RSA keys parsed from
PEM (PKCS#1 or PKCS#8 DER, auto-detected — Pulsar's own example keys use
a PKCS#8 body under a "BEGIN RSA PRIVATE KEY" label). Signing is
``pow(m, d, n)``; verification is ``pow(s, e, n)`` — the two sides share
no code path beyond padding, so a sign/verify round-trip genuinely
exercises the math. This is a *verification/minting* utility for the
gateway layer; it is not a general-purpose crypto library.
"""

from __future__ import annotations

import base64
import hashlib
import json
from dataclasses import dataclass

# == minimal DER (read-only) =============================================

_SEQUENCE = 0x30
_INTEGER = 0x02
_BIT_STRING = 0x03
_OCTET_STRING = 0x04


def _read_tlv(data: bytes, pos: int) -> tuple[int, bytes, int]:
    tag = data[pos]
    length = data[pos + 1]
    pos += 2
    if length & 0x80:
        n = length & 0x7F
        length = int.from_bytes(data[pos : pos + n], "big")
        pos += n
    return tag, data[pos : pos + length], pos + length


def _der_children(body: bytes) -> list[tuple[int, bytes]]:
    out, pos = [], 0
    while pos < len(body):
        tag, value, pos = _read_tlv(body, pos)
        out.append((tag, value))
    return out


def _der_int(value: bytes) -> int:
    return int.from_bytes(value, "big")


# == PEM / key parsing ===================================================


@dataclass
class RSAPublicKey:
    n: int
    e: int

    @property
    def byte_len(self) -> int:
        return (self.n.bit_length() + 7) // 8


@dataclass
class RSAPrivateKey:
    n: int
    e: int
    d: int

    def public(self) -> RSAPublicKey:
        return RSAPublicKey(self.n, self.e)

    @property
    def byte_len(self) -> int:
        return (self.n.bit_length() + 7) // 8


def _pem_to_der(pem: str) -> bytes:
    lines = [ln.strip() for ln in pem.strip().splitlines() if "-----" not in ln]
    return base64.b64decode("".join(lines))


def load_pem_public_key(pem: str) -> RSAPublicKey:
    """SubjectPublicKeyInfo (BEGIN PUBLIC KEY) or bare PKCS#1
    RSAPublicKey (BEGIN RSA PUBLIC KEY) — detected from the DER."""
    der = _pem_to_der(pem)
    tag, body, _ = _read_tlv(der, 0)
    if tag != _SEQUENCE:
        raise ValueError("not a DER sequence")
    kids = _der_children(body)
    if len(kids) == 2 and kids[0][0] == _SEQUENCE and kids[1][0] == _BIT_STRING:
        # SubjectPublicKeyInfo: [algorithm, BIT STRING{RSAPublicKey}]
        bitstr = kids[1][1]
        if bitstr[0] != 0:
            raise ValueError("unsupported bit string padding")
        _, inner, _ = _read_tlv(bitstr[1:], 0)
        kids = _der_children(inner)
    if len(kids) != 2 or any(t != _INTEGER for t, _ in kids):
        raise ValueError("not an RSAPublicKey")
    return RSAPublicKey(_der_int(kids[0][1]), _der_int(kids[1][1]))


def load_pem_private_key(pem: str) -> RSAPrivateKey:
    """PKCS#1 RSAPrivateKey or PKCS#8 PrivateKeyInfo — detected from the
    DER structure, NOT the PEM label (Pulsar's example key is PKCS#8
    under a PKCS#1 label)."""
    der = _pem_to_der(pem)
    tag, body, _ = _read_tlv(der, 0)
    if tag != _SEQUENCE:
        raise ValueError("not a DER sequence")
    kids = _der_children(body)
    if (
        len(kids) >= 3
        and kids[0][0] == _INTEGER
        and kids[1][0] == _SEQUENCE
        and kids[2][0] == _OCTET_STRING
    ):
        # PKCS#8: [version, AlgorithmIdentifier, OCTET STRING{RSAPrivateKey}]
        _, inner_body, _ = _read_tlv(kids[2][1], 0)
        kids = _der_children(inner_body)
    if len(kids) < 4 or any(t != _INTEGER for t, _ in kids[:4]):
        raise ValueError("not an RSAPrivateKey")
    # RSAPrivateKey: [version, n, e, d, p, q, ...]
    return RSAPrivateKey(_der_int(kids[1][1]), _der_int(kids[2][1]), _der_int(kids[3][1]))


# == RSASSA-PKCS1-v1_5 / SHA-256 =========================================

# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1)
_SHA256_DIGEST_INFO = bytes.fromhex("3031300d060960864801650304020105000420")


def _emsa_pkcs1_v15(message: bytes, k: int) -> bytes:
    t = _SHA256_DIGEST_INFO + hashlib.sha256(message).digest()
    if k < len(t) + 11:
        raise ValueError("key too short for RS256")
    return b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t


def rs256_sign(message: bytes, priv: RSAPrivateKey) -> bytes:
    em = _emsa_pkcs1_v15(message, priv.byte_len)
    return pow(int.from_bytes(em, "big"), priv.d, priv.n).to_bytes(priv.byte_len, "big")


def rs256_verify(message: bytes, signature: bytes, pub: RSAPublicKey) -> bool:
    if len(signature) != pub.byte_len:
        return False
    em = pow(int.from_bytes(signature, "big"), pub.e, pub.n).to_bytes(pub.byte_len, "big")
    return em == _emsa_pkcs1_v15(message, pub.byte_len)


# == JWT =================================================================


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class InvalidToken(Exception):
    pass


def generate_token(subject: str, priv: RSAPrivateKey) -> str:
    """GenerateToken parity (pulsar-jwt.go:45-57): RS256, claims carry
    only the subject."""
    header = _b64url(json.dumps({"alg": "RS256", "typ": "JWT"}, separators=(",", ":")).encode())
    claims = _b64url(json.dumps({"sub": subject}, separators=(",", ":")).encode())
    signing_input = f"{header}.{claims}".encode("ascii")
    return f"{header}.{claims}." + _b64url(rs256_sign(signing_input, priv))


def decode_token(token: str, pub: RSAPublicKey) -> dict:
    """DecodeToken parity: parse + verify signature; raises InvalidToken
    on any malformation or signature mismatch."""
    parts = token.split(".")
    if len(parts) != 3:
        raise InvalidToken("token must have 3 segments")
    try:
        header = json.loads(_b64url_decode(parts[0]))
        claims = json.loads(_b64url_decode(parts[1]))
        sig = _b64url_decode(parts[2])
    except Exception as e:  # malformed base64/json
        raise InvalidToken(f"malformed token: {e}") from e
    if header.get("alg") != "RS256":
        raise InvalidToken(f"unexpected alg {header.get('alg')!r}")
    if not rs256_verify(f"{parts[0]}.{parts[1]}".encode("ascii"), sig, pub):
        raise InvalidToken("invalid token")
    return claims


def get_token_subject(token: str, pub: RSAPublicKey) -> str:
    claims = decode_token(token, pub)
    if "sub" not in claims:
        raise InvalidToken("missing subjects")
    return claims["sub"]


def verify_token_subject(token: str, subject: str, pub: RSAPublicKey) -> bool:
    """VerifyTokenSubject parity (pulsar-jwt.go:93-105): sub must equal
    exactly; mismatch raises ('incorrect sub')."""
    if decode_token(token, pub).get("sub") == subject:
        return True
    raise InvalidToken("incorrect sub")


@dataclass
class RSAKeyPair:
    """NewRSAKeyPair analogue holding both halves (pulsar-jwt.go:20-42)."""

    private_key: RSAPrivateKey | None
    public_key: RSAPublicKey

    @classmethod
    def from_pem(cls, private_pem: str | None, public_pem: str) -> "RSAKeyPair":
        return cls(
            load_pem_private_key(private_pem) if private_pem else None,
            load_pem_public_key(public_pem),
        )

    def generate_token(self, subject: str) -> str:
        if self.private_key is None:
            raise InvalidToken("no private key loaded")
        return generate_token(subject, self.private_key)

    def get_token_subject(self, token: str) -> str:
        return get_token_subject(token, self.public_key)

    def verify_token_subject(self, token: str, subject: str) -> bool:
        return verify_token_subject(token, subject, self.public_key)


# == middleware / mint parity ===========================================


def auth_verify_jwt(
    authorization: str | None,
    keys: RSAKeyPair,
    superroles: tuple[str, ...] = (),
    noauth: bool = False,
) -> str | None:
    """AuthVerifyJWT analogue (middleware.go:24-46): returns the subject
    to inject as ``injectedSubs`` (feed it to
    model.topic.tenant_allowed_col), or None ≙ 401. noauth mode injects
    the first superrole."""
    if noauth:
        return superroles[0] if superroles else None
    token = (authorization or "").replace("Bearer", "", 1).strip()
    try:
        return keys.get_token_subject(token)
    except InvalidToken:
        return None


def mint_token(
    subject: str, keys: RSAKeyPair, requester_subject: str, superroles: tuple[str, ...]
) -> str:
    """TokenSubjectHandler parity (G12, handlers.go:41-68): only a
    superrole may mint; anyone else gets 'incorrect subject'."""
    if requester_subject not in superroles:
        raise PermissionError("incorrect subject")
    return keys.generate_token(subject)
