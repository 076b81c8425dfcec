"""Topic naming, keying, validation — reference-parity semantics.

Python-level helpers mirror the Go logic; the ``*_col`` variants are the
same semantics as Spark Column expressions so they run row-level inside
codegen (the form used by the engine's filters/joins).

Reference traces:
- build/tokenize topic full name: src/util/util.go:78-86, :156-176
- SHA-1 identity key:             src/model/topic.go:119-123
  (golden: sha1('persistent://picasso/local-useast1-gcp/yet-another-test-topic'
   + 'pulsar+ssl://useast1.gcp.kafkaesque.io:6651')
   = '075fcf0870662590aa4b24939287f193a697ab26',
   asserted at src/unit-test/handlers_test.go:68-77)
- status enum:                    src/model/topic.go:18-30
- subscription type / position:   src/model/topic.go:138-151, :126-135
- validation:                     src/model/topic.go:157-192
- tenant extraction for auth:     src/route/handlers.go:375-421
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F


class TopicStatus(IntEnum):
    DEACTIVATED = 0
    ACTIVATED = 1
    SUSPENDED = 2
    DELETED = 3


# reference src/model/topic.go:111
_URL_RE = re.compile(r"^(pulsar|pulsar\+ssl|http|https)://[A-Za-z0-9\-\.]+(:\d+)?$")
SUBSCRIPTION_TYPES = ("exclusive", "shared", "keyshared", "failover")
INITIAL_POSITIONS = ("latest", "earliest")


def build_topic_fn(persistent: str, tenant: str, namespace: str, topic: str) -> str:
    """reference src/util/util.go:78-86 — only 'p'/'persistent' vs 'np'/'non-persistent'."""
    if persistent in ("p", "persistent"):
        prefix = "persistent"
    elif persistent in ("np", "non-persistent"):
        prefix = "non-persistent"
    else:
        raise ValueError(f"invalid persistent segment {persistent!r}")
    if not (tenant and namespace and topic):
        raise ValueError("tenant/namespace/topic must be non-empty")
    return f"{prefix}://{tenant}/{namespace}/{topic}"


def tokenize_topic_full_name(topic_fn: str) -> tuple[str, str, str, str]:
    """reference src/util/util.go:156-176 — returns (persistent, tenant, ns, topic)."""
    m = re.match(r"^(persistent|non-persistent)://([^/]+)/([^/]+)/([^/]+)$", topic_fn)
    if not m:
        raise ValueError(f"invalid topic full name {topic_fn!r}")
    return m.group(1), m.group(2), m.group(3), m.group(4)


def gen_key_from_names(topic_full_name: str, pulsar_url: str) -> str:
    """reference src/model/topic.go:119-123 — SHA-1 hex of name+url."""
    return hashlib.sha1((topic_full_name + pulsar_url).encode("utf-8")).hexdigest()


def topic_key_col(topic_fn: Column | str = "topic_full_name", url: Column | str = "pulsar_url") -> Column:
    """Same digest as gen_key_from_names, as a codegen'd Column (F.sha1)."""
    t = F.col(topic_fn) if isinstance(topic_fn, str) else topic_fn
    u = F.col(url) if isinstance(url, str) else url
    return F.sha1(F.concat(t, u))


def tenant_from_topic_col(topic: Column | str = "topic") -> Column:
    """Tenant = 3rd '/'-segment of the fully-qualified topic name, i.e.
    split()[2] 0-based: ['persistent:', '', tenant, ns, topic]
    (reference src/route/handlers.go:398-409 ExtractEvalTenant)."""
    c = F.col(topic) if isinstance(topic, str) else topic
    return F.split(c, "/").getItem(2)


def eval_tenant_prefix(token_sub: str) -> str:
    """The tenant a dash-nested subject belongs to: the subject minus its
    LAST '-'-segment (reference ExtractEvalTenant,
    src/route/handlers.go:406-420).  'tenant1-foo-bar' -> 'tenant1-foo';
    a subject with no dash has no tenant prefix ('')."""
    parts = token_sub.split("-")
    return "-".join(parts[:-1])


def tenant_allowed_col(topic: Column | str, subject: str, superroles: tuple[str, ...] = ()) -> Column:
    """Row-level tenant-isolation predicate (reference G10,
    src/route/handlers.go:375-421 VerifySubjectBasedOnTopic/VerifySubject):
    the token may carry several comma-separated subjects; access is granted
    iff ANY subject is a superrole, equals the tenant exactly, or — per
    ExtractEvalTenant — its prefix up to the last '-'-segment equals the
    tenant exactly (so 'tenant1-foo-bar' matches tenant 'tenant1-foo',
    NOT tenant 'tenant1')."""
    tenant = tenant_from_topic_col(topic)
    allowed = F.lit(False)
    for sub in subject.split(","):
        branch = (tenant == F.lit(sub)) | F.lit(sub in superroles)
        prefix = eval_tenant_prefix(sub)
        if prefix:
            branch = branch | (tenant == F.lit(prefix))
        allowed = allowed | branch
    return allowed


@dataclass
class Webhook:
    url: str
    subscription: str
    subscription_type: str = "exclusive"
    initial_position: str = "latest"
    webhook_status: int = int(TopicStatus.ACTIVATED)
    headers: list[str] = field(default_factory=list)


def get_subscription_type(s: str) -> str:
    """reference src/model/topic.go:138-151 (case-insensitive, empty ->
    exclusive; the reference lowercases before matching)."""
    s = s.lower()
    if s == "":
        return "exclusive"
    if s not in SUBSCRIPTION_TYPES:
        raise ValueError(f"unsupported subscription type {s!r}")
    return s


def get_initial_position(s: str) -> str:
    """reference src/model/topic.go:126-135 (case-insensitive, empty ->
    latest)."""
    s = s.lower()
    if s == "":
        return "latest"
    if s not in INITIAL_POSITIONS:
        raise ValueError(f"unsupported initial position {s!r}")
    return s


def validate_webhook_config(webhooks: list[Webhook]) -> None:
    """reference src/model/topic.go:157-183: URL shape, subscription name
    non-empty (the >=5-char rule belongs to the consumer-subscription
    path only — handlers.go:457, see streaming/sse.py consumer_params),
    exclusive subscription names unique."""
    seen_exclusive: set[str] = set()
    for wh in webhooks:
        if not re.match(r"^(http|https|pulsar|pulsar\+ssl)://[A-Za-z0-9\-\.]+(:\d+)?(/.*)?$", wh.url):
            raise ValueError(f"invalid webhook url {wh.url!r}")
        if not wh.subscription.strip():
            raise ValueError("subscription name is missing")
        st = get_subscription_type(wh.subscription_type)
        get_initial_position(wh.initial_position)
        if st == "exclusive":
            if wh.subscription in seen_exclusive:
                raise ValueError(f"duplicate exclusive subscription {wh.subscription!r}")
            seen_exclusive.add(wh.subscription)


def validate_topic_config(topic_full_name: str, pulsar_url: str, webhooks: list[Webhook]) -> str:
    """Validate and return the SHA-1 identity key (reference
    src/model/topic.go:157-192 + :119-123)."""
    tokenize_topic_full_name(topic_full_name)
    if not re.match(r"^(pulsar|pulsar\+ssl)://", pulsar_url):
        raise ValueError(f"invalid pulsar url {pulsar_url!r}")
    validate_webhook_config(webhooks)
    return gen_key_from_names(topic_full_name, pulsar_url)
