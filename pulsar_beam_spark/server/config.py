"""Gateway configuration loading — reference src/util/config.go parity.

The reference builds its ``Configuration`` struct (config.go:25-85, all
string fields) in three layers:

1. built-in defaults,
2. a YAML-or-JSON config file, whose *path* comes from the
   ``PULSAR_BEAM_CONFIG`` env var (config.go:104-106, default
   ``../config/pulsar_beam.yml``),
3. an env-var override per field, named EXACTLY like the struct field
   (config.go:136-152 walks the struct with reflection; values have a
   trailing newline stripped because k8s secret files introduce one).

So effective precedence is **env > file > default**.  This module
reproduces that: ``FIELDS`` carries the reference's field names and our
defaults, ``load_config`` applies file then env, and ``__main__`` maps
the result onto the gateway (CLI flags sit in the *default* tier — the
reference launcher has no flags, so anything it could configure, env and
file must continue to win over).
"""

from __future__ import annotations

import json
import os

# Field names are the reference's Configuration struct tags
# (src/util/config.go:25-85) — the same names double as env-var keys.
FIELDS: dict[str, str] = {
    "PORT": "8085",
    "CLUSTER": "",
    "LogLevel": "info",
    "DbName": "",
    "DbPassword": "",
    "DbConnectionStr": "",
    "PbDbType": "inmemory",
    "PulsarPublicKey": "",
    "PulsarPrivateKey": "",
    "SuperRoles": "superuser",
    "PulsarBrokerURL": "",
    "PulsarTLSAllowInsecureConnection": "",
    "PulsarTLSValidateHostname": "",
    "PbDbInterval": "180s",
    "TrustStore": "",
    "CertFile": "",
    "KeyFile": "",
    "PulsarClusters": "",
    "HTTPAuthImpl": "",
}


def _parse_file(path: str) -> dict:
    """YAML or JSON by content sniff — the reference accepts both from
    one path (config.go:125-135 ``hasJSONPrefix``)."""
    with open(path) as f:
        raw = f.read()
    if raw.lstrip().startswith(("{", "[")):
        return json.loads(raw)
    import yaml

    return yaml.safe_load(raw) or {}


def load_config(path: str | None = None,
                env: dict[str, str] | None = None,
                defaults: dict[str, str] | None = None) -> dict[str, str]:
    """Resolve the effective configuration: env > file > defaults.

    ``path`` is the fallback config-file location; the
    ``PULSAR_BEAM_CONFIG`` env var overrides it (config.go:104-106).
    Unlike the reference, a missing/None file is not fatal — the gateway
    has working built-in defaults.  Unknown file keys are ignored;
    unknown env vars are never read (only FIELDS names are consulted, so
    a stray ``PORT``-unrelated variable can't leak in).
    """
    env = os.environ if env is None else env
    cfg = dict(FIELDS)
    if defaults:
        cfg.update({k: str(v) for k, v in defaults.items() if k in FIELDS})
    path = env.get("PULSAR_BEAM_CONFIG") or path
    if path:
        for k, v in (_parse_file(path) or {}).items():
            if k in FIELDS and v is not None:
                cfg[k] = str(v)
    for k in FIELDS:
        v = env.get(k)
        if v:  # len(envV) > 0 — empty env var does NOT override (config.go:146)
            cfg[k] = v.removesuffix("\n")  # k8s-secret trailing-newline parity
    return cfg


def split_csv(s: str) -> list[str]:
    """Comma-separated list fields (SuperRoles, PulsarClusters —
    config.go:154-162), empty entries dropped."""
    return [p.strip() for p in s.split(",") if p.strip()]
