"""Functional-graph root finding (operators/graph.py): the pointer-
doubling path must equal the linear chase everywhere and resolve an
adversarially deep chain in O(log n) rounds (components.py's large-star
discipline, applied to reachability)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pulsar_beam_spark.operators.graph import find_roots, root_chase, root_doubling


def _df_nodes_edges(spark, parent_of: dict[int, int], all_nodes: list[int]):
    nodes = spark.createDataFrame([(n,) for n in all_nodes], "node long")
    edges = spark.createDataFrame(
        [(c, p) for c, p in parent_of.items()], "e_child long, e_parent long"
    )
    return nodes, edges


def _expected(parent_of, all_nodes):
    out = {}
    for n in all_nodes:
        d, a = 0, n
        while a in parent_of:
            a = parent_of[a]
            d += 1
        out[n] = (a, d)
    return out


def test_doubling_equals_chase_on_random_forest(spark):
    rng = random.Random(7)
    all_nodes = list(range(200))
    parent_of = {}
    for n in range(1, 200):
        if rng.random() < 0.8:
            parent_of[n] = rng.randrange(0, n)  # acyclic: parent < child
    nodes, edges = _df_nodes_edges(spark, parent_of, all_nodes)
    chase = {r["node"]: (r["root"], r["depth"]) for r in root_chase(nodes, edges).collect()}
    dbl = {r["node"]: (r["root"], r["depth"]) for r in root_doubling(nodes, edges).collect()}
    assert chase == dbl == _expected(parent_of, all_nodes)


def test_doubling_is_logarithmic_on_path_graph(spark):
    n = 256  # a single chain of depth 255 — adversarial for the chase
    parent_of = {i: i - 1 for i in range(1, n)}
    nodes, edges = _df_nodes_edges(spark, parent_of, list(range(n)))
    out, rounds = root_doubling(nodes, edges, return_rounds=True)
    got = {r["node"]: (r["root"], r["depth"]) for r in out.collect()}
    assert got == _expected(parent_of, list(range(n)))
    # pointer span doubles per round: ceil(log2(255)) + fixpoint check
    assert rounds <= math.ceil(math.log2(n)) + 1, rounds


def test_dispatch_switches_on_expected_depth(spark):
    parent_of = {1: 0, 2: 1}
    nodes, edges = _df_nodes_edges(spark, parent_of, [0, 1, 2])
    shallow = {r["node"]: r["root"] for r in find_roots(nodes, edges, 2).collect()}
    deep = {r["node"]: r["root"] for r in find_roots(nodes, edges, 1000).collect()}
    assert shallow == deep == {0: 0, 1: 0, 2: 0}


def test_cycle_raises_instead_of_partial_state(spark):
    """Round-8 probe: a parent cycle previously spun root_chase forever
    and made root_doubling RETURN partially-composed garbage after its
    round budget (the components.py round-7 bug class). Both must raise,
    never hand back wrong roots."""
    parent_of = {0: 1, 1: 2, 2: 0, 3: 0}  # 3-cycle plus a node hanging off it
    nodes, edges = _df_nodes_edges(spark, parent_of, [0, 1, 2, 3])
    with pytest.raises(RuntimeError, match="cycle"):
        root_chase(nodes, edges, max_rounds=20)
    with pytest.raises(RuntimeError, match="cycle"):
        root_doubling(nodes, edges, max_rounds=8)
