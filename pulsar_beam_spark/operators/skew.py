"""Skew mitigation for hot keys (SURVEY.md §4.2 "salting guidance").

AQE's skew-join split handles most cases at runtime; these helpers cover
the two shapes AQE can't fix:

- ``salted_agg``: a single dominant group key bottlenecks the final
  reduce task even with map-side partial aggregation (one reducer owns
  the hot key). Salting splits the hot key across ``n_salts`` reducers,
  then a second (tiny) aggregation merges the partials. Only valid for
  decomposable aggregates (sum/count/min/max — avg must be expressed as
  sum+count by the caller).
- ``salted_broadcast_fallback_join``: a skewed-key equi-join where the
  small side is too big to broadcast whole. The big side gets a
  deterministic salt in ``[0, n_salts)``; the small side is replicated
  ``n_salts``× (explode), so each (key, salt) pair co-locates exactly one
  copy of the small row. Shuffle volume: big side unchanged, small side
  ×n_salts — the classic trade.

Both are pure DataFrame compositions — Catalyst still plans the joins
and partial aggs; salting only changes the shuffle key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _salt_col(cols: list[str], n_salts: int) -> Column:
    """Deterministic per-row salt from non-key columns: pmod(xxhash64, n).

    Deterministic (vs ``rand()``) so retried tasks re-produce the same
    salt — required for exactly-once sinks and reproducible tests.
    """
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def skewed_fixture(spark, n_rows: int = 2_000_000, n_keys: int = 50_000,
                   hot_every: int = 2):
    """Synthetic hot-key tables for skew stress (VERDICT r03 item 7):
    ``big`` has every ``hot_every``-th row on key 0 (so 1/hot_every of
    the table lands in ONE join/agg partition unsalted) and the rest
    uniform over ``n_keys-1`` keys; ``dim`` covers all keys.  Generated
    from ``spark.range`` — deterministic, no fixture files, any size.
    """
    big = spark.range(n_rows).select(
        F.when(F.pmod("id", F.lit(hot_every)) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1)
        .cast("long").alias("key"),
        F.col("id").alias("val"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("key"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    return big, dim


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_source_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> ("sum"|"count"|"min"|"max", input col).
    Phase 1 groups by (keys + salt) — the hot key fans out over
    ``n_salts`` reduce tasks; phase 2 re-aggregates the ≤n_salts partial
    rows per key (count partials merge via sum).
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial = df.withColumn(SALT, _salt_col(salt_source_cols, n_salts)).groupBy(
        *keys, SALT
    )
    p1 = partial.agg(
        *[fns[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[merge[fn](out).alias(out) for out, (fn, _col) in aggs.items()]
    )


def salted_broadcast_fallback_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated per salt bucket.

    The big side's salt is derived from its *other* columns, spreading a
    hot join key uniformly; the small side cross-joins a 0..n_salts-1
    array so every (key, salt) partition holds its copy. Result is
    row-identical to ``big.join(small, on, how)``.

    Only left-preserving join types are allowed: an unmatched *small*-side
    row exists once per salt replica, so right/full joins would emit it
    ``n_salts`` times.
    """
    if how not in ("inner", "left", "left_outer", "semi", "left_semi", "anti", "left_anti"):
        raise ValueError(f"salted join supports left-preserving types only, got {how!r}")
    other_cols = [c for c in big.columns if c != on]
    b = big.withColumn(SALT, _salt_col(other_cols or [on], n_salts))
    s = small.withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, [on, SALT], how)
    return out.drop(SALT)
