"""As-of join (nearest-earlier right row per left row and key).

Spark 3.x/4.x SQL has no native ASOF JOIN (SURVEY.md §2.2 R10). The
scalable rewrite used here is the *union + running last_value* trick:

    1. stack left and right rows into one frame tagged by side,
    2. single shuffle: window PARTITION BY key ORDER BY (ts, side-tag)
       carrying ``last(right_value, ignorenulls=True)`` forward,
    3. keep left rows; each one has the latest right row with
       right_ts <= left_ts attached.

Cost model at scale: ONE hash shuffle of |L|+|R| rows on the join key and
a per-partition sort — identical to a sort-merge join's shuffle, with no
range-explosion (a naive ``l.ts >= r.ts`` theta-join is |L|x|R| per key).
Skewed keys are handled by AQE skew-split since this is a plain window
over a shuffled sort.

Tie semantics: a right row at exactly left_ts IS visible (right sorts
before left on equal ts), matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
which the oracle uses to cross-check (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus the value columns of the
    nearest right row within the same ``on`` key (null when none exists).

    ``direction="backward"`` (default): latest right with
    ``right_ts <= left_ts`` — running ``last(ignorenulls)`` over an
    unbounded-preceding frame. ``direction="forward"``: earliest right
    with ``right_ts >= left_ts`` — ``first(ignorenulls)`` over an
    unbounded-following frame. Both cost the same single shuffle.
    Equal timestamps match in either direction (DuckDB ``>=``/``<=``
    ASOF semantics, cross-checked in tests).

    The right timestamp itself is exposed as ``{right_ts}{suffix}``.

    The nearest right ROW is selected atomically (all carried columns
    come from the same row, NULL fields included). Among multiple right
    rows sharing one (key, ts) the pick is arbitrary — same as DuckDB /
    pandas merge_asof; add a tiebreak column to ``right_ts`` upstream if
    the input can carry such duplicates and determinism matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    carried = list(value_cols)
    if right_ts not in carried:
        carried = [right_ts, *carried]

    left_cols = left.columns
    out_names = {right_ts: right_ts + suffix}
    for c in carried:
        if c != right_ts:
            out_names[c] = c + suffix if c in left_cols else c

    # The carried columns travel as ONE struct so the nearest right ROW
    # is picked atomically: per-column last(ignorenulls) passes would
    # each skip their own NULLs independently, stitching the output from
    # DIFFERENT right rows whenever a value column is NULL (e.g. right
    # rows (ts=1, v=5), (ts=2, v=NULL) joined from left ts=3 came back
    # as the chimera (ts_right=2, v=5); DuckDB ASOF returns (2, NULL)).
    # The struct built by F.struct is non-null for every right row even
    # when all its fields are NULL, so ignorenulls sees whole rows.
    r_struct_t = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in carried]
    )
    l_tag = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .select(
            *on,
            "__ts",
            "__side",
            *[F.col(c).alias(c) for c in left_cols if c not in on],
            F.lit(None).cast(r_struct_t).alias("__r"),
        )
    )
    r_tag = (
        right.withColumn("__ts", F.col(right_ts))
        .withColumn("__side", F.lit(0))
        .select(
            *on,
            "__ts",
            "__side",
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
            F.struct(*[F.col(c).alias(c) for c in carried]).alias("__r"),
        )
    )

    stacked = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right (__side=0) sorts before left on equal ts -> visible
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        stacked = stacked.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    else:
        # left (__side=1) sorts before right on equal ts -> the frame
        # [current, following] still sees an equal-ts right row
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        stacked = stacked.withColumn("__r", F.first("__r", ignorenulls=True).over(w))

    return stacked.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col("__r").getField(c).alias(out_names[c]) for c in carried],
    )
