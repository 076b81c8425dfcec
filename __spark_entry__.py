"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``pulsar_beam_spark`` (see SURVEY.md §2 for the
operator inventory each registry entry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pulsar_beam_spark import queries as _registry  # noqa: E402
from pulsar_beam_spark.session import tune_for_oracle  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation: 4-way join + broadcast dims +
    integerized agg) on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_oracle(spark)
    return _registry.REGISTRY["flagship_revenue_by_nation"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {}
    for name, fn in _registry.queries().items():
        def wrapped(spark: SparkSession, sf_dir: str, _fn=fn) -> DataFrame:
            tune_for_oracle(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted for
    approximate / hash-function-dependent operators -> rows-only check)."""
    return _registry.oracle_sql()
