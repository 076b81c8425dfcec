"""Property-based tests (hypothesis) for the pure/portable kernels —
the closed-form formulas and cross-engine primitives whose correctness
the oracle entries lean on. No SparkSession needed; runs in seconds.

Reference test-strategy parity (SURVEY.md §5): the reference unit-tests
its model/util layer exhaustively (src/unit-test/*_test.go); these
properties cover the same layer plus the formula rewrites the SQL
entries rely on (business days, Gini, largest remainder, sliding-log
admission).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# -- topic model --------------------------------------------------------


@given(
    st.sampled_from(["persistent", "p", "non-persistent", "np"]),
    st.text(alphabet="abcdefghij-", min_size=1, max_size=12).filter(lambda s: "/" not in s),
    st.text(alphabet="abcdefghij", min_size=1, max_size=12),
    st.text(alphabet="abcdefghij", min_size=1, max_size=12),
)
def test_topic_fn_build_tokenize_roundtrip(persistent, tenant, ns, topic):
    from pulsar_beam_spark.model.topic import build_topic_fn, tokenize_topic_full_name

    fn = build_topic_fn(persistent, tenant, ns, topic)
    proto, t, n, tp = tokenize_topic_full_name(fn)
    assert (t, n, tp) == (tenant, ns, topic)
    assert proto in ("persistent", "non-persistent")


@given(st.text(min_size=1, max_size=30), st.text(min_size=1, max_size=30))
def test_gen_key_is_stable_and_order_sensitive(a, b):
    from pulsar_beam_spark.model.topic import gen_key_from_names

    k1 = gen_key_from_names(a, b)
    assert k1 == gen_key_from_names(a, b)
    assert len(k1) == 40 and all(c in "0123456789abcdef" for c in k1)
    if a != b:
        assert k1 != gen_key_from_names(b, a)


@given(st.text(alphabet="abc-", min_size=1, max_size=16))
@settings(deadline=None)
def test_eval_tenant_prefix_drops_exactly_last_segment(sub):
    from pulsar_beam_spark.model.topic import eval_tenant_prefix

    prefix = eval_tenant_prefix(sub)
    parts = sub.split("-")
    assert prefix == "-".join(parts[:-1])
    # a subject always matches its own tenant prefix plus one segment
    if prefix:
        from pulsar_beam_spark.server.gateway import verify_subject

        assert verify_subject(prefix, sub, superroles=())


# -- stable bucket: python/duckdb engine parity -------------------------


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30, unique=True))
@settings(max_examples=25, deadline=None)
def test_stable_bucket_duckdb_parity(keys):
    import duckdb

    from pulsar_beam_spark.operators.sampling import _HEX_CHARS, stable_bucket_sql

    # python reimplementation of the documented contract
    import hashlib

    def py_bucket(k, n=100):
        h = hashlib.md5(str(k).encode()).hexdigest()[:_HEX_CHARS]
        return int(h, 16) % n

    con = duckdb.connect()
    expr = stable_bucket_sql("k", 100)
    got = dict(
        con.execute(
            f"SELECT k, {expr} FROM (SELECT unnest(?) AS k)", [keys]
        ).fetchall()
    )
    for k in keys:
        assert got[k] == py_bucket(k), k


# -- business days closed form vs day-walk ------------------------------


def _bdays_formula(start: dt.date, end: dt.date) -> int:
    nd = (end - start).days
    w = start.weekday()  # 0=Mon, parity with Spark weekday()/isodow-1
    return (nd // 7) * 5 + min(max(5 - w, 0), nd % 7) + max(nd % 7 - (7 - w), 0)


def _bdays_walk(start: dt.date, end: dt.date) -> int:
    return sum(1 for i in range((end - start).days) if (start + dt.timedelta(days=i)).weekday() < 5)


@given(
    st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 12, 31)),
    st.integers(min_value=0, max_value=800),
)
def test_business_days_closed_form(start, span):
    end = start + dt.timedelta(days=span)
    assert _bdays_formula(start, end) == _bdays_walk(start, end)


# -- Gini rank-weighted formula vs mean-absolute-difference -------------


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=2, max_size=60))
def test_gini_formula_equals_mad_definition(ys):
    from statistics import mean

    if sum(ys) == 0:
        return
    ys_sorted = sorted(ys)
    n = len(ys_sorted)
    siy = sum((i + 1) * y for i, y in enumerate(ys_sorted))
    gini_formula = 2 * siy / (n * sum(ys_sorted)) - (n + 1) / n
    mad = sum(abs(a - b) for a in ys for b in ys) / (n * n)
    gini_mad = mad / (2 * mean(ys))
    assert gini_formula == pytest.approx(gini_mad, abs=1e-9)


# -- largest remainder apportionment ------------------------------------


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=5000),
)
def test_largest_remainder_sums_and_quota(counts, seats):
    tot = sum(counts)
    base = [seats * c // tot for c in counts]
    rem = [seats * c % tot for c in counts]
    leftover = seats - sum(base)
    # deterministic: remainder desc, then index asc
    order = sorted(range(len(counts)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    assert sum(alloc) == seats
    for i, c in enumerate(counts):
        exact = seats * c / tot
        assert exact - 1 < alloc[i] < exact + 1  # quota property


# -- sliding-log admission vs brute force -------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=80),
    st.integers(min_value=1, max_value=600),
    st.integers(min_value=1, max_value=6),
)
def test_sliding_log_matches_bruteforce(ts_list, window, limit):
    arrivals = sorted(ts_list)
    # incremental log (the StatefulProcessor algorithm)
    log, decisions = [], []
    for t in arrivals:
        lo = t - window
        while log and log[0] <= lo:
            log.pop(0)
        log.append(t)
        decisions.append(len(log) <= limit)
    # brute force: count predecessors (inclusive) within (t-W, t] under
    # lexicographic order — equals the batch-form window algebra
    for idx, t in enumerate(arrivals):
        in_win = sum(1 for j in range(idx + 1) if arrivals[j] > t - window)
        assert decisions[idx] == (in_win <= limit)


# -- crypto round-trips --------------------------------------------------

try:
    from pulsar_beam_spark.icrypto.cipher import _HAVE_CRYPTO
except Exception:  # pragma: no cover
    _HAVE_CRYPTO = False


@pytest.mark.skipif(not _HAVE_CRYPTO, reason="needs cryptography")
@given(st.binary(min_size=0, max_size=512), st.sampled_from([16, 24, 32]))
@settings(max_examples=20, deadline=None)
def test_aes_roundtrip_property(payload, keylen):
    import os

    from pulsar_beam_spark.icrypto import AESCipher

    a = AESCipher()
    key = os.urandom(keylen)
    assert a.decrypt(a.encrypt(payload, key), key) == payload


@given(subject=st.text(alphabet="abcdefghijklmnop-0123456789", min_size=1, max_size=40))
@settings(max_examples=15, deadline=None)
def test_jwt_subject_roundtrip_property(subject, rsa_keypair_session):
    assert rsa_keypair_session.get_token_subject(
        rsa_keypair_session.generate_token(subject)
    ) == subject


@pytest.fixture(scope="session")
def rsa_keypair_session():
    if not _HAVE_CRYPTO:
        pytest.skip("needs cryptography for keygen")
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    from pulsar_beam_spark.icrypto import RSAKeyPair

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    return RSAKeyPair.from_pem(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        ).decode(),
        key.public_key()
        .public_bytes(serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo)
        .decode(),
    )
