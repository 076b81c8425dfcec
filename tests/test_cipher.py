"""AES-GCM / RSA utility crypto parity tests (reference
src/icrypto/icrypto.go:44-180 and src/unit-test/crypto_test.go)."""

from __future__ import annotations

import pytest

from pulsar_beam_spark.icrypto import AESCipher, RSACipher
from pulsar_beam_spark.icrypto.cipher import _HAVE_CRYPTO, _NONCE_SIZE

pytestmark = pytest.mark.skipif(not _HAVE_CRYPTO, reason="needs cryptography")


def test_aes_roundtrip_and_wire_format():
    a = AESCipher()
    key = b"0123456789abcdef"  # 16-byte AES-128
    sealed = a.encrypt(b"secret payload", key)
    # nonce prepended (icrypto.go:55-60): total = 12 + len + 16-byte tag
    assert len(sealed) == _NONCE_SIZE + len(b"secret payload") + 16
    assert a.decrypt(sealed, key) == b"secret payload"
    # fresh nonce every call
    assert a.encrypt(b"secret payload", key) != sealed


def test_aes_default_salt_key():
    a = AESCipher(default_salt="a-32-byte-salt-for-aes-256-keys!")
    assert len(a.default_salt) == 32
    sealed = a.encrypt_with_default_key(b"x")
    assert a.decrypt_with_default_key(sealed) == b"x"


def test_aes_bad_key_and_short_ciphertext():
    a = AESCipher()
    with pytest.raises(ValueError):
        a.encrypt(b"x", b"short-key")
    with pytest.raises(ValueError):
        a.decrypt(b"tiny", b"0123456789abcdef")
    with pytest.raises(Exception):  # tag mismatch
        a.decrypt(a.encrypt(b"x", b"0123456789abcdef")[:-1] + b"\x00", b"0123456789abcdef")


def test_rsa_roundtrip_pkcs1v15():
    r = RSACipher.generate()
    ct = r.encrypt_with_default_key(b"hello rsa")
    assert len(ct) == 256  # 2048-bit modulus
    assert r.decrypt_with_default_key(ct) == b"hello rsa"


def test_rsa_keyed_overloads_unsupported():
    r = RSACipher.generate()
    with pytest.raises(NotImplementedError):
        r.encrypt(b"x", b"key")
    with pytest.raises(NotImplementedError):
        r.decrypt(b"x", b"key")


def test_rsa_pkcs1_der_serialization_roundtrip():
    r = RSACipher.generate()
    priv_der, pub_der = r.get_private_key(), r.get_public_key()
    # PKCS1 DER starts with a SEQUENCE tag
    assert priv_der[0] == 0x30 and pub_der[0] == 0x30
    r2 = RSACipher.from_der(priv_der, pub_der)
    assert r2.decrypt_with_default_key(r.encrypt_with_default_key(b"der")) == b"der"
    # public-only half can encrypt, private-only can decrypt
    enc_only = RSACipher.from_der(None, pub_der)
    dec_only = RSACipher.from_der(priv_der, None)
    assert dec_only.decrypt_with_default_key(enc_only.encrypt_with_default_key(b"y")) == b"y"
