"""Vector math over ``array<float/double>`` columns using only JVM-side
higher-order functions — no Python UDF in the hot path, so whole-stage
codegen keeps the loop on the JVM and the plan scales to 100 TB without
Arrow round-trips.

``F.aggregate`` performs a *sequential left fold*, which makes the double
accumulation order deterministic — required for bit-exact comparison with
the DuckDB oracle (which folds with ``list_reduce`` in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """cosine = dot(a,b) / (||a||*||b||); inputs assumed non-zero vectors."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
