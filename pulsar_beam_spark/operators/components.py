"""Distributed connected components over a pair/edge list — the step
that turns near-duplicate PAIRS into duplicate CLUSTERS so a curation
pipeline can keep one canonical document per cluster (pairs alone
under-remove: a~b, b~c must collapse to one kept doc, not two).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round a node takes the minimum label among itself and
its neighbors; convergence when no label changes. Labels are
monotonically non-increasing, so the global label sum strictly decreases
on any change — a single cheap aggregate per round is an exact
convergence test.

Scale design:
- Each round is one shuffle-join (edges ⋈ labels on the neighbor id) and
  one groupBy(node) min — both hash-partition on the node id, and Spark
  reuses the partitioning between rounds. ``localCheckpoint`` truncates
  the lineage each round so the plan does not grow with iterations (the
  classic iterative-DataFrame trap).
- Round count is bounded by the component diameter. Near-dup clusters
  are small and dense (mirrors/boilerplate), so diameter is tiny — this
  is the right algorithm for the dedup workload. For adversarial
  long-chain graphs at 100 TB, switch to alternating large-star /
  small-star contractions (Kiveris et al., "Connected Components in
  MapReduce and Beyond"), which converges in O(log n) rounds with the
  same join+min building blocks.
- The edge list is held symmetric (both directions) so propagation is a
  plain equi-join; memory is 2|E|, the price of never needing a second
  join per round.

No analogue in the reference (it has no graph ops); extension for the
LLM-data dedup pipeline. Oracle-checkable: ANSI recursive CTE computes
min-reachable-node per node (see queries.py d_dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """(node, component) for every node in the edge list, where
    ``component`` is the minimum node id in the node's connected
    component. Isolated nodes (absent from ``edges``) are not emitted —
    callers union them back with component = self if needed.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("lbl")).head()[0]
    for _ in range(max_iters):
        msgs = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "lbl")
        labels = (
            labels.union(msgs).groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        cur_sum = labels.agg(F.sum("lbl")).head()[0]
        if cur_sum == prev_sum:  # labels only decrease: equal sum == fixpoint
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("lbl").alias("component"))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup pairs -> (doc_id, component, is_canonical): the cluster id
    is the minimum doc_id in the cluster, and exactly that doc is marked
    canonical — the keep-set of a cluster-aware dedup stage."""
    comp = connected_components(pairs, id_a, id_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )
