"""Physical-plan inspection helpers.

Used by tests to assert the *plan we want at 100 TB*, not just a plan
that happens to pass locally: filters pushed into the parquet scan,
small dimensions broadcast, no gratuitous Exchange nodes, wide
WholeStageCodegen spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def simple_plan(df: DataFrame) -> str:
    """Simple-mode physical plan; WholeStageCodegen stages show as `*(n)`
    (formatted mode hides codegen markers under AQE)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def n_exchanges(df: DataFrame, include_single_partition: bool = True) -> int:
    """Count shuffle Exchange operators (not broadcast exchanges).

    Parses the SIMPLE-mode plan: formatted mode prints the node name and
    its `hashpartitioning(...)` arguments on separate lines, so matching
    "Exchange hashpartitioning" there silently counts zero.

    ``include_single_partition=False`` ignores ``Exchange SinglePartition``
    nodes — the inherent (and tiny: pre-aggregated partials only) exchange
    under a global aggregate — so tests can assert "the fact table never
    shuffles" without forbidding global aggregation itself.
    """
    plan = simple_plan(df)
    n = plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
    if include_single_partition:
        n += plan.count("Exchange SinglePartition")
    return n


def executed_plan(df: DataFrame) -> str:
    """Post-execution physical plan string. Under AQE this is the FINAL
    adaptive plan (isFinalPlan=true) — the only place runtime re-plans
    (skew-join splits ``skew=true``, SMJ->broadcast demotions, coalesced
    partitions) are visible; the pre-execution explain shows none of
    them. Call only after an action has run on ``df``."""
    return df._jdf.queryExecution().executedPlan().toString()


def execute_jvm(df: DataFrame) -> int:
    """Run ``df``'s OWN QueryExecution entirely JVM-side and return the
    row count. Unlike ``df.count()`` (wraps the plan in an aggregate —
    which suppresses AQE rewrites that would violate the agg's required
    distribution, e.g. skew-join splits) or ``df.write`` (a NEW
    QueryExecution, so ``executed_plan(df)`` stays unexecuted), this
    drains the exact plan ``executed_plan`` will report, with no rows
    crossing to Python."""
    return df._jdf.queryExecution().executedPlan().execute().count()


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters" in plan and fragment in plan


def has_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastExchange" in formatted_plan(df)


def explain_summary(df: DataFrame) -> dict:
    plan = formatted_plan(df)
    simple = simple_plan(df)
    return {
        "shuffle_exchanges": simple.count("Exchange hashpartitioning")
        + simple.count("Exchange rangepartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "codegen_spans": simple.count("*("),
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        # A (local)Checkpoint severs lineage: everything upstream of it —
        # range exchanges, windows, whole scans — is INVISIBLE to this
        # audit (the plan reads from `Scan ExistingRDD`). Flag it so a
        # 0-shuffle row over a checkpoint boundary can't masquerade as a
        # free plan (VERDICT r05 item 4).
        "truncated_lineage": "ExistingRDD" in simple,
    }
