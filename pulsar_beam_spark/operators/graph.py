"""Functional-graph reachability — linear root chase and the
pointer-doubling scale path.

A functional graph gives every node at most one parent (org charts, BOM
trees, reply chains, symlink forests). Root finding:

- ``root_chase`` (the form queries.q_reachability uses inline): follow
  one parent hop per round — O(depth) joins. Optimal for the shallow
  forests real hierarchies are, because each round shuffles only the
  (node, anc) relation on a narrow key.
- ``root_doubling`` (this module's addition): maintain each node's
  current ancestor pointer AND the distance to it, then compose the
  pointer relation with itself — after k rounds every pointer spans
  2^k hops, so an adversarially deep chain (depth n) resolves in
  O(log n) rounds at ~2x shuffle volume per round. The same
  linear-vs-logarithmic trade as propagation vs large-star/small-star
  in components.py; dispatch on expected depth.

Both return (node, root, depth) with identical results (property-tested
on deep path graphs and random forests, tests/test_graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def root_chase(nodes: DataFrame, edges: DataFrame, max_rounds: int = 1000) -> DataFrame:
    """O(depth) rounds. ``nodes``: (node); ``edges``: (e_child, e_parent).

    ``edges`` must be a forest (each child one parent, no cycles). A
    cycle keeps every member moving forever, so the loop RAISES after
    ``max_rounds`` instead of spinning (round-8 probe; same contract as
    components.py round 7: never return partial iterative state) —
    depth-``max_rounds`` forests are the declared domain; use
    ``root_doubling`` (O(log depth)) for deeper hierarchies."""
    cur = nodes.select("node", F.col("node").alias("anc"), F.lit(0).alias("depth"))
    for _ in range(max_rounds):
        stepped = (
            cur.join(edges, cur.anc == edges.e_child, "left")
            .select(
                "node",
                F.coalesce("e_parent", "anc").alias("anc"),
                (F.col("depth") + F.col("e_parent").isNotNull().cast("int")).alias("depth"),
                F.col("e_parent").isNotNull().alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        cur = stepped.drop("moved")
        if stepped.filter("moved").isEmpty():
            return cur.select(
                "node", F.col("anc").alias("root"),
                F.col("depth").cast("int").alias("depth"))
    raise RuntimeError(
        f"root_chase did not reach a fixpoint in {max_rounds} rounds: "
        "the edge set contains a cycle, or the hierarchy is deeper than "
        "max_rounds (use root_doubling for deep chains)"
    )


def root_doubling(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 64,
    return_rounds: bool = False,
):
    """O(log depth) rounds via pointer composition.

    State: (node, anc, dist) where ``anc`` is the node's current
    known ancestor ``dist`` hops up (a root iff anc has no parent).
    Round: compose the state with itself — node's new ancestor is its
    ancestor's ancestor, distances add. Nodes whose anc is already a
    root stop moving; fixpoint when nobody moves.
    """
    # seed: one hop (or self for roots)
    cur = (
        nodes.join(edges, nodes.node == edges.e_child, "left")
        .select(
            "node",
            F.coalesce("e_parent", "node").alias("anc"),
            F.col("e_parent").isNotNull().cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nxt = cur.alias("x")
        ptr = cur.select(
            F.col("node").alias("p_node"), F.col("anc").alias("p_anc"),
            F.col("dist").alias("p_dist"),
        )
        stepped = (
            nxt.join(ptr, F.col("x.anc") == F.col("p_node"), "left")
            .select(
                F.col("x.node").alias("node"),
                F.coalesce("p_anc", "x.anc").alias("anc"),
                (F.col("x.dist") + F.coalesce("p_dist", F.lit(0))).alias("dist"),
                (F.coalesce("p_dist", F.lit(0)) > 0).alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        cur = stepped.drop("moved")
        if stepped.filter("moved").isEmpty():
            out = cur.select(
                "node", F.col("anc").alias("root"),
                F.col("dist").cast("int").alias("depth"))
            return (out, rounds) if return_rounds else out
    # composition doubles reach each round, so max_rounds=64 covers any
    # acyclic depth representable in 64 bits — non-convergence proves a
    # cycle; returning the partially-composed state would silently hand
    # back garbage roots (round-8 probe; components.py round-7 contract)
    raise RuntimeError(
        f"root_doubling did not reach a fixpoint in {max_rounds} rounds: "
        "the edge set contains a cycle (pointer composition reaches any "
        f"acyclic root within {max_rounds} doublings)"
    )


def find_roots(
    nodes: DataFrame, edges: DataFrame, expected_depth: int | None = None
) -> DataFrame:
    """Dispatch: linear chase for shallow forests (the common case),
    doubling when the caller knows the graph is deep (>= 32 hops) —
    mirroring dedup_clusters' propagation/star dispatch."""
    if expected_depth is not None and expected_depth >= 32:
        return root_doubling(nodes, edges)
    return root_chase(nodes, edges)
