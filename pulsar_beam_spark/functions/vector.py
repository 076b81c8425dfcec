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


_MAX_DOUBLE = 1.7976931348623157e308


def valid_vector(c: Column | str) -> Column:
    """True iff ``c`` is a VALID embedding: non-NULL, every component
    non-NULL and finite (no NaN/±Inf), and squared norm > 0 (which also
    rejects empty vectors and all-subnormal vectors whose x*x underflows
    to 0 — those crash ANSI cosine with DIVIDE_BY_ZERO just like exact
    zeros). The uniform domain contract for the whole vector family
    (similarity / range search / near-dup / quantize): one poisoned
    vector in a 100 TB corpus must not abort the query (Spark ANSI
    throws on x/0 where DuckDB yields NULL — an engine asymmetry), and
    non-finite components make driver-side Python disagree with both
    engines on comparisons (Python: NaN > 0 is False; Spark SQL and
    DuckDB: True), so invalid vectors are dropped from every candidate
    corpus and an invalid QUERY vector yields an empty result.

    Mirrored in every vector-family oracle by the same three-clause SQL
    guard (the ``queries._finite_vec_sql`` builder, spliced into each
    oracle's corpus and query CTEs). ``x*x > 0`` on non-negative terms is
    order-independent, so the sum-of-squares > 0 condition reduces to
    an EXISTS — no fold-order coupling between the engines.
    """
    c = F.col(c) if isinstance(c, str) else c
    v = c.cast("array<double>")
    return (
        c.isNotNull()
        & F.forall(v, lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) <= F.lit(_MAX_DOUBLE)))
        & F.exists(v, lambda x: x * x > 0)
    )
