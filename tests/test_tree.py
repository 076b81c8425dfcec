"""Self-probe gates for the depth-2 CART trainer (operators/tree.py).

The oracle entries prove fixture parity; these tests attack the trainer
with the inputs the fixtures lack: exact impurity TIES across features
and thresholds (the (imp, feat, val) tie-break must be the one the
DuckDB oracle replays), nodes with no valid child split (the shallow-
leaf path), and tiny/degenerate corpora — via a pure-Python reference
implementation of the identical integer arithmetic, driven by
hypothesis over small value domains where ties are the common case,
not the corner case.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_beam_spark.operators.tree import (FEATURES, IMP_SCALE, Depth2Tree,
                                              Split, fit_depth2, leaf_label,
                                              predict_expr)

# -- pure-python reference (same integer arithmetic, same tie-break) ----


def _ref_best_split(rows):
    best = None
    for f in FEATURES:
        hist, pos = {}, {}
        for r in rows:
            hist[r[f]] = hist.get(r[f], 0) + 1
            pos[r[f]] = pos.get(r[f], 0) + r["y"]
        n, p = len(rows), sum(r["y"] for r in rows)
        nL = pL = 0
        for v in sorted(hist)[:-1]:
            nL += hist[v]
            pL += pos[v]
            nR, pR = n - nL, p - pL
            imp = (pL * (nL - pL) * IMP_SCALE) // nL \
                + (pR * (nR - pR) * IMP_SCALE) // nR
            key = (imp, f, v)
            if best is None or key < best:
                best = key
    if best is None:
        return None
    imp, f, v = best
    return Split(f, v, len(rows), sum(r["y"] for r in rows), imp)


def _ref_fit(rows):
    root = _ref_best_split(rows)
    if root is None:
        return None
    tl = [r for r in rows if r[root.feat] <= root.thr]
    tr = [r for r in rows if r[root.feat] > root.thr]
    left, right = _ref_best_split(tl), _ref_best_split(tr)
    leaves = {}
    if left is None:
        leaves[1] = (len(tl), sum(r["y"] for r in tl))
    else:
        for nid, part in ((3, [r for r in tl if r[left.feat] <= left.thr]),
                          (4, [r for r in tl if r[left.feat] > left.thr])):
            leaves[nid] = (len(part), sum(r["y"] for r in part))
    if right is None:
        leaves[2] = (len(tr), sum(r["y"] for r in tr))
    else:
        for nid, part in ((5, [r for r in tr if r[right.feat] <= right.thr]),
                          (6, [r for r in tr if r[right.feat] > right.thr])):
            leaves[nid] = (len(part), sum(r["y"] for r in part))
    return Depth2Tree(root, left, right, leaves)


def _ref_predict(tree, r):
    def side(child, shallow_id, deep):
        if child is None:
            return leaf_label(*tree.leaves[shallow_id])
        nid = deep[0] if r[child.feat] <= child.thr else deep[1]
        return leaf_label(*tree.leaves[nid])
    if r[tree.root.feat] <= tree.root.thr:
        return side(tree.left, 1, (3, 4))
    return side(tree.right, 2, (5, 6))


def _frame(spark, rows):
    schema = "doc_id long, alpha long, mlen long, ntok long, stop long, y long"
    data = [(i, r["alpha"], r["mlen"], r["ntok"], r["stop"], r["y"])
            for i, r in enumerate(rows)]
    return spark.createDataFrame(data, schema)


_row = st.fixed_dictionaries({
    # domain 0..2 per feature: exact impurity ties across features and
    # thresholds on nearly every draw
    "alpha": st.integers(0, 2), "mlen": st.integers(0, 2),
    "ntok": st.integers(0, 2), "stop": st.integers(0, 2),
    "y": st.integers(0, 1),
})


@given(st.lists(_row, min_size=0, max_size=14))
@settings(max_examples=12, deadline=None)
def test_fit_matches_reference(spark, rows):
    got = fit_depth2(_frame(spark, rows))
    want = _ref_fit(rows)
    assert got == want


def test_exact_tie_breaks_on_feature_then_value(spark):
    """Two features with IDENTICAL split impurity everywhere: alpha and
    stop carry the same perfectly-separating column, so every candidate
    (imp=0) ties and the winner must be ('alpha', 0) by name order —
    the ordering the DuckDB oracle's ORDER BY imp, feat, val replays."""
    rows = [{"alpha": v, "mlen": 1, "ntok": 1, "stop": v, "y": v}
            for v in (0, 0, 1, 1)]
    tree = fit_depth2(_frame(spark, rows))
    assert tree.root.feat == "alpha" and tree.root.thr == 0
    assert tree.root.imp == 0
    # both children are pure single-value nodes: no valid child split
    assert tree.left is None and tree.right is None
    assert tree.leaves == {1: (2, 0), 2: (2, 2)}


def test_predict_expr_matches_reference(spark):
    """The literal nested-CASE apply column agrees with the reference
    tree walk row-by-row, including on a shallow-leaf (no child split)
    side."""
    rows = [{"alpha": a, "mlen": m, "ntok": 1, "stop": 1,
             "y": 1 if a + m >= 2 else 0}
            for a in (0, 1, 2) for m in (0, 1, 2)]
    df = _frame(spark, rows)
    tree = fit_depth2(df)
    want = _ref_fit(rows)
    assert tree == want
    got = {r["doc_id"]: r["pred"]
           for r in df.withColumn("pred", predict_expr(tree))
           .select("doc_id", "pred").collect()}
    for i, r in enumerate(rows):
        assert got[i] == _ref_predict(tree, r), (i, r)
