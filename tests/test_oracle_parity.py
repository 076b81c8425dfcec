"""t2-style correctness: every registry entry with an oracle must match
DuckDB exactly at sf0.001 (fast inner loop; the driver re-checks at 0.01).
Entries without an oracle are smoke-run (rows >= 0, stable schema)."""

from __future__ import annotations

import os

import pytest

from pulsar_beam_spark.queries import REGISTRY

from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_run

# override with PBS_TEST_SF_DIR=/root/testdata/sf0.01 for driver-scale runs
SF_SMOKE = os.environ.get("PBS_TEST_SF_DIR", SF_SMOKE)

ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, SF_SMOKE).toPandas()
    ddf = duck_run(spec.oracle, SF_SMOKE)
    errs = compare(sdf, ddf)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(spark, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
