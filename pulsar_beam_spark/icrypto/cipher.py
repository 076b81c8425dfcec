"""AES-GCM and RSA utility crypto — reference parity for
src/icrypto/icrypto.go:44-180.

Wire-format parity notes:
- AES: AES-GCM with the 12-byte nonce PREPENDED to the sealed output
  (icrypto.go:55-60 ``gcm.Seal(nonce, nonce, plaintext, nil)``);
  decrypt splits nonce/ciphertext the same way (icrypto.go:80-87).
  The "default key" variant keys the cipher with the configured salt
  bytes verbatim (icrypto.go:63-66) — so the salt must be a valid AES
  key length (16/24/32 bytes), mirroring the reference's behavior of
  erroring otherwise.
- RSA: 2048-bit keys (icrypto.go:127), PKCS1 DER serialization for both
  halves (icrypto.go:139-148 MarshalPKCS1PublicKey/PrivateKey), and
  PKCS#1 v1.5 encryption padding (icrypto.go:157-179
  EncryptPKCS1v15/DecryptPKCS1v15). The keyed Encrypt/Decrypt overloads
  are "unsupported" in the reference (icrypto.go:150-169) — we raise the
  same way so a ported caller sees identical behavior.

Backed by the ``cryptography`` package (import-gated: everything in this
module raises a clear ImportError at call time when it is absent —
nothing else in the repo depends on it).
"""

from __future__ import annotations

import os

try:
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    _HAVE_CRYPTO = True
except Exception:  # pragma: no cover
    _HAVE_CRYPTO = False

_NONCE_SIZE = 12  # Go's cipher.NewGCM standard nonce size


def _require_crypto() -> None:
    if not _HAVE_CRYPTO:  # pragma: no cover
        raise ImportError(
            "the 'cryptography' package is required for AES/RSA utility "
            "crypto (JWT RS256 in jwt_rs256.py is dependency-free and "
            "unaffected)"
        )


class AESCipher:
    """AES-GCM seal/open with nonce-prefixed ciphertext (icrypto.go:38-92)."""

    def __init__(self, default_salt: str = ""):
        self.default_salt = default_salt

    def encrypt(self, plaintext: bytes, key: bytes) -> bytes:
        _require_crypto()
        if len(key) not in (16, 24, 32):
            raise ValueError(f"invalid AES key size {len(key)}")
        nonce = os.urandom(_NONCE_SIZE)
        return nonce + AESGCM(key).encrypt(nonce, plaintext, None)

    def decrypt(self, ciphertext: bytes, key: bytes) -> bytes:
        _require_crypto()
        if len(key) not in (16, 24, 32):
            raise ValueError(f"invalid AES key size {len(key)}")
        if len(ciphertext) < _NONCE_SIZE:
            raise ValueError("ciphertext too short")
        nonce, sealed = ciphertext[:_NONCE_SIZE], ciphertext[_NONCE_SIZE:]
        return AESGCM(key).decrypt(nonce, sealed, None)

    def encrypt_with_default_key(self, plaintext: bytes) -> bytes:
        return self.encrypt(plaintext, self.default_salt.encode())

    def decrypt_with_default_key(self, ciphertext: bytes) -> bytes:
        return self.decrypt(ciphertext, self.default_salt.encode())


class RSACipher:
    """RSA keypair utility (icrypto.go:95-180): 2048-bit generate, PKCS1
    DER (de)serialization, PKCS#1 v1.5 encrypt/decrypt with the own key."""

    def __init__(self, private_key=None, public_key=None):
        self.private_key = private_key
        self.public_key = public_key

    @classmethod
    def generate(cls) -> "RSACipher":
        _require_crypto()
        priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        return cls(private_key=priv, public_key=priv.public_key())

    @classmethod
    def from_der(cls, priv_der: bytes | None, pub_der: bytes | None) -> "RSACipher":
        """NewRSAWithKeys parity (icrypto.go:102-123): PKCS1 DER inputs,
        either half optional."""
        _require_crypto()
        priv = pub = None
        if priv_der is not None:
            priv = serialization.load_der_private_key(priv_der, password=None)
        if pub_der is not None:
            pub = serialization.load_der_public_key(pub_der)
        if priv is not None and pub is None:
            pub = priv.public_key()
        return cls(private_key=priv, public_key=pub)

    def get_public_key(self) -> bytes:
        _require_crypto()
        return self.public_key.public_bytes(
            serialization.Encoding.DER, serialization.PublicFormat.PKCS1
        )

    def get_private_key(self) -> bytes:
        _require_crypto()
        return self.private_key.private_bytes(
            serialization.Encoding.DER,
            serialization.PrivateFormat.TraditionalOpenSSL,  # PKCS1
            serialization.NoEncryption(),
        )

    def encrypt(self, plaintext: bytes, key: bytes) -> bytes:
        raise NotImplementedError("unsupported")  # icrypto.go:151-155

    def decrypt(self, ciphertext: bytes, key: bytes) -> bytes:
        raise NotImplementedError("unsupported")  # icrypto.go:166-170

    def encrypt_with_default_key(self, plaintext: bytes) -> bytes:
        _require_crypto()
        return self.public_key.encrypt(plaintext, padding.PKCS1v15())

    def decrypt_with_default_key(self, ciphertext: bytes) -> bytes:
        _require_crypto()
        return self.private_key.decrypt(ciphertext, padding.PKCS1v15())
