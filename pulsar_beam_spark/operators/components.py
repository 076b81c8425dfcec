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
  long-chain graphs at 100 TB, ``connected_components_star`` implements
  the alternating large-star / small-star contraction (Kiveris et al.,
  "Connected Components in MapReduce and Beyond"): each round shrinks
  every component toward a star rooted at its minimum id, converging in
  O(log n) rounds instead of O(diameter) — property-tested on a path
  graph (diameter = n) in tests/test_operators.py. ``algorithm="auto"``
  picks it above an edge-count threshold.
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

    Min-label propagation reaches the fixpoint in O(diameter) rounds; if
    ``max_iters`` rounds pass WITHOUT reaching it (a chain-shaped graph
    whose diameter exceeds the budget), the partial labels are NOT
    returned — truncated propagation is silently wrong (each node would
    carry the min of its max_iters-hop neighborhood, splitting long
    components and letting local minima masquerade as canonical docs).
    Instead the computation escalates to the O(log n) star contraction,
    which converges on any shape.
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
    converged = False
    for _ in range(max_iters):
        msgs = sym.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "lbl")
        labels = (
            labels.union(msgs).groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint()
        cur_sum = labels.agg(F.sum("lbl")).head()[0]
        if cur_sum == prev_sum:  # labels only decrease: equal sum == fixpoint
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # diameter > max_iters: hand the ORIGINAL edges to the star
        # contraction rather than returning truncated (wrong) labels
        return connected_components_star(edges, src, dst)
    return labels.select(F.col("node"), F.col("lbl").alias("component"))


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (lo, hi), no self-loops, distinct."""
    return (
        e.select(F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _large_star(c: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to the minimum of u's
    closed neighborhood. Emitted edges (m, v) always have m < v."""
    sym = c.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
        c.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m"))
    return _canon(
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v"))
    )


def _small_star(c: DataFrame) -> DataFrame:
    """For each node hi (viewing each edge oriented to its larger
    endpoint), connect all its smaller neighbors AND hi itself to the
    minimum smaller neighbor."""
    g = c.groupBy("hi").agg(F.min("lo").alias("m"))
    members = c.join(g, "hi").select(F.col("m").alias("u"), F.col("lo").alias("v"))
    roots = g.select(F.col("m").alias("u"), F.col("hi").alias("v"))
    return _canon(members.union(roots))


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 40,
    return_rounds: bool = False,
):
    """(node, component) via alternating large-star/small-star contraction
    (Kiveris et al.) — O(log n) rounds on ANY graph shape, vs the
    propagation loop's O(diameter). Same output contract as
    ``connected_components``: component = min node id, isolated nodes not
    emitted.

    Fixpoint: star graphs rooted at component minima are invariant under
    both operations, so convergence is detected exactly by edge-set
    equality (count match + empty subtract — both cheap: the candidate
    sets shrink geometrically).
    """
    cur = _canon(edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))).localCheckpoint()
    rounds = 0
    converged = False
    for _ in range(max_iters):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        rounds += 1
        if nxt.count() == cur.count() and nxt.subtract(cur).isEmpty():
            cur = nxt
            converged = True
            break
        cur = nxt
    if not converged:
        # O(log n) rounds means 40 covers any graph that fits on disk; a
        # non-fixpoint here is a logic/overflow bug, and truncated star
        # edges are wrong the same way truncated propagation is — fail
        # loudly instead of returning them.
        raise RuntimeError(
            f"connected_components_star did not reach a fixpoint in "
            f"{max_iters} rounds; raise max_iters"
        )
    # converged star edges are (root=lo, member=hi)
    members = cur.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    roots = cur.select(F.col("lo").alias("component")).distinct().select(
        F.col("component").alias("node"), "component"
    )
    labels = members.union(roots).groupBy("node").agg(F.min("component").alias("component"))
    if return_rounds:
        return labels, rounds
    return labels


# Above this many edges the O(diameter) propagation loop is no longer a
# safe default (an adversarial chain means unbounded rounds); hand off to
# the O(log n) star contraction.  Below it, auto mode solves the
# components on the DRIVER (union-find over a bounded collect) — see
# dedup_clusters.
STAR_EDGE_THRESHOLD = 100_000


def unionfind_components(edge_rows) -> dict:
    """Min-root union-find over an in-memory edge list: returns
    {node: component} where component is the minimum node id of the
    node's connected component — exactly ``connected_components``'s
    contract (isolated nodes absent, since they never appear in
    ``edge_rows``). Union-by-min keeps every root the component
    minimum; path compression keeps lookups near-linear."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in edge_rows:
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {n: find(n) for n in parent}


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                   algorithm: str = "auto") -> DataFrame:
    """Near-dup pairs -> (doc_id, component, is_canonical): the cluster id
    is the minimum doc_id in the cluster, and exactly that doc is marked
    canonical — the keep-set of a cluster-aware dedup stage.

    ``algorithm``: "propagation" (O(diameter) rounds — right for the
    small dense clusters near-dup graphs produce), "star" (O(log n)
    rounds — right for huge or adversarially-chained graphs), or "auto":
    below STAR_EDGE_THRESHOLD edges the component labels are computed by
    a driver-side union-find over ONE bounded collect (<= 100k edges =
    ~2 MB — the probe-cells bounded-collect pattern; labels are
    identical to the distributed loops, gated in tests/test_operators
    .py), above it the star contraction. Rationale (r14, guide §1.2):
    the propagation loop costs 2 driver-synchronized jobs per round —
    ~10 serial job launches for a graph that fits in L2 cache — and
    that fixed cost is dead time for the whole cluster at any scale;
    the threshold keeps the driver's state hard-bounded while graphs
    big enough to matter stay distributed."""
    if algorithm == "auto":
        # materialize once: the dispatch count() and whichever solver
        # runs both read the checkpoint instead of recomputing the
        # (near-dup) pair lineage
        pairs = pairs.localCheckpoint()
        if pairs.count() > STAR_EDGE_THRESHOLD:
            algorithm = "star"
        else:
            spark = pairs.sparkSession
            labels = unionfind_components(
                (r[0], r[1])
                for r in pairs.select(id_a, id_b).collect())
            return spark.createDataFrame(
                [(int(n), int(c)) for n, c in sorted(labels.items())],
                "doc_id long, component long",
            ).select(
                "doc_id", "component",
                (F.col("doc_id") == F.col("component")).cast("int")
                .alias("is_canonical"))
    cc = connected_components if algorithm == "propagation" else connected_components_star
    comp = cc(pairs, id_a, id_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("node") == F.col("component")).cast("int").alias("is_canonical"),
    )
