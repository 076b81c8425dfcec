"""Distributed decision-tree training for corpus quality filtering.

The curation step big text pipelines run between heuristics and humans:
TRAIN a cheap classifier on a labeled slice, apply it corpus-wide (the
fastText-filter shape from the GPT-3/CCNet lineage — reference parity
note: pulsar-beam has no ML surface; this family belongs to the
training-data-pipeline mandate, not the reference inventory).

The learner is a depth-2 CART trained by exact integer histogram
split-finding — the same aggregation shape XGBoost/LightGBM use to
scale: one distributed pass per tree node builds (feature, value) count
histograms, a window cumsum turns them into every candidate split's
left/right class counts, and the driver collects exactly ONE best-split
row per node (the bounded-collect training discipline of
clustering.kmeans_fit / text.bpe_train_merges). Driver state is O(1)
per node; the histograms never leave the cluster.

Everything is integer arithmetic — features are fixed-point-scaled
BIGINTs, the split objective is a SCALE-multiplied Gini impurity under
floor division, ties break on (impurity, feature, value) — so a DuckDB
oracle replays training bit-exactly (no float sums, no nondeterministic
reduction order). Impurity bound: pos*(n-pos)*SCALE <= (n/2)^2 * 2^16
keeps BIGINT-safe beyond sf10 (n = 6e6 -> 5.9e17 < 2^63).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import STOPWORDS_EN
from ..functions.litarr import lit_arr
from ..functions.texthash import tokens

# fixed-point feature scale and the Gini impurity scale
FEAT_SCALE = 256
IMP_SCALE = 65536
# melt order == the deterministic tie-break order (ASCII)
FEATURES = ("alpha", "mlen", "ntok", "stop")


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Integer quality features + the rule label to distill.

    Mirrors text.quality_scores' measurements but keeps every feature a
    fixed-point BIGINT (ratio * 256 under floor division) so training
    is exactly replayable. The label y is quality_scores' composite
    keep rule re-stated in exact rational form (ratio >= p/q as
    cross-multiplication), i.e. the hand-written heuristic the learned
    tree distills into a scorer.
    """
    # NULL text folds to '' BEFORE feature extraction: a NULL feature
    # value would land in the split histogram, where Spark and DuckDB
    # disagree on NULL ordering (NULLS FIRST vs LAST) — the one place
    # this bit-exact trainer could silently diverge.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = tokens(txt)
    lex = lit_arr(list(STOPWORDS_EN), "string")
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(lex, F.lower(x))))
    base = docs.select(
        F.col(id_col),
        F.length(txt).cast("long").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace(txt, r"[^A-Za-z]", ""))
        .cast("long").alias("alpha_len"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    return base.select(
        id_col,
        F.expr(f"(alpha_len * {FEAT_SCALE}) div greatest(n_chars, 1)")
        .cast("long").alias("alpha"),
        F.expr("least(((n_chars - n_tokens + 1) * 64) div greatest(n_tokens, 1), 512)")
        .cast("long").alias("mlen"),
        F.least(F.col("n_tokens"), F.lit(512)).cast("long").alias("ntok"),
        F.expr(f"(stop_hits * {FEAT_SCALE}) div greatest(n_tokens, 1)")
        .cast("long").alias("stop"),
        F.when((F.col("n_tokens") >= 20)
               & (F.col("stop_hits") * 100 >= F.col("n_tokens"))
               & (F.col("alpha_len") * 2 >= F.col("n_chars")), F.lit(1))
        .otherwise(F.lit(0)).cast("long").alias("y"),
    )


@dataclass(frozen=True)
class Split:
    feat: str
    thr: int
    n: int
    pos: int
    imp: int


def _melt(node: DataFrame) -> DataFrame:
    pairs = ", ".join(f"'{f}', {f}" for f in FEATURES)
    return node.select(
        F.expr(f"stack({len(FEATURES)}, {pairs}) as (feat, val)"), "y")


def split_candidates(node: DataFrame) -> DataFrame:
    """Every candidate split of a node with its scaled-Gini impurity:
    groupBy (feat, val) builds the class histograms (map-side partial
    agg — ONE shuffle keyed on the tiny (feat, val) domain), the
    per-feat window cumsum yields every candidate's left counts in the
    same pass. No joins, nothing row-count-sized crosses the wire."""
    g = (_melt(node).groupBy("feat", "val")
         .agg(F.count("*").alias("n_v"), F.sum("y").alias("p_v")))
    wcum = (Window.partitionBy("feat").orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy("feat")
    s = g.select(
        "feat", "val",
        F.sum("n_v").over(wcum).alias("nL"), F.sum("p_v").over(wcum).alias("pL"),
        F.sum("n_v").over(wall).alias("n"), F.sum("p_v").over(wall).alias("p"))
    return s.filter(F.col("nL") < F.col("n")).select(
        "feat", F.col("val").alias("thr"), "n", "p",
        (F.expr(f"(pL * (nL - pL) * {IMP_SCALE}) div nL")
         + F.expr(f"((p - pL) * ((n - nL) - (p - pL)) * {IMP_SCALE})"
                  " div (n - nL)")).alias("imp"))


def best_split(node: DataFrame) -> Split | None:
    """One distributed histogram pass -> the node's arg-min split: the
    scaled-Gini arg-min with (imp, feat, val) tie-break is a 1-row
    TakeOrdered collect over split_candidates. Returns None when the
    node has no valid split (all rows identical on every feature, or
    < 2 rows)."""
    rows = split_candidates(node).orderBy("imp", "feat", "thr").limit(1).collect()
    if not rows:
        return None
    r = rows[0]
    return Split(r["feat"], int(r["thr"]), int(r["n"]), int(r["p"]),
                 int(r["imp"]))


@dataclass(frozen=True)
class Depth2Tree:
    """root + optional child splits + leaf (n, pos) stats keyed by
    node id: 1/2 = child leaves when that side has no valid split,
    3..6 = the four depth-2 leaves (00, 01, 10, 11)."""
    root: Split
    left: Split | None
    right: Split | None
    leaves: dict[int, tuple[int, int]]


def _leaf_stats(df: DataFrame, node_ids: tuple[int, int],
                cond: Column) -> dict[int, tuple[int, int]]:
    rows = (df.select(F.when(cond, F.lit(node_ids[0]))
                      .otherwise(F.lit(node_ids[1])).alias("node"), "y")
            .groupBy("node")
            .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
            .collect())
    return {int(r["node"]): (int(r["n"]), int(r["pos"])) for r in rows}


def fit_depth2(train: DataFrame) -> Depth2Tree | None:
    """Three histogram passes + one leaf-stat pass, each a distributed
    aggregation over (a partition of) the training slice; the collects
    are one row per node. None when the root has no valid split.

    The feature frame is localCheckpointed once (r14 optimization,
    guide §5: reused >= 5x and recomputing it repeats the tokenize/
    feature-extraction scan of the raw documents for every node pass;
    the materialized frame is 5 BIGINTs per training row). Results are
    unchanged — the same rows feed every pass."""
    train = train.localCheckpoint()
    root = best_split(train)
    if root is None:
        return None
    lcond = F.col(root.feat) <= F.lit(root.thr)
    tl, tr_ = train.filter(lcond), train.filter(~lcond)

    # The two child searches (and then the two leaf-stat passes) are
    # independent jobs over disjoint partitions of the checkpointed
    # slice — submit them concurrently so the second back-fills the
    # first's task tail instead of waiting for a full driver round-trip
    # (r14, guide §2.6). Results are unchanged: each job is the same
    # aggregation either way.
    from concurrent.futures import ThreadPoolExecutor

    def _side_leaves(side_df, child, shallow_id, deep_ids):
        if child is None:
            # no valid split => the whole side is one leaf
            rows = side_df.agg(F.count("*").alias("n"),
                               F.sum("y").alias("pos")).collect()
            return {shallow_id: (int(rows[0]["n"]), int(rows[0]["pos"] or 0))}
        return _leaf_stats(side_df, deep_ids,
                           F.col(child.feat) <= F.lit(child.thr))

    with ThreadPoolExecutor(max_workers=2) as ex:
        fl, fr = ex.submit(best_split, tl), ex.submit(best_split, tr_)
        left, right = fl.result(), fr.result()
        gl = ex.submit(_side_leaves, tl, left, 1, (3, 4))
        gr = ex.submit(_side_leaves, tr_, right, 2, (5, 6))
        leaves: dict[int, tuple[int, int]] = {}
        leaves.update(gl.result())
        leaves.update(gr.result())
    return Depth2Tree(root, left, right, leaves)


def leaf_label(n: int, pos: int) -> int:
    """Majority with the deterministic tie -> 1 (2*pos >= n)."""
    return 1 if 2 * pos >= n else 0


def predict_expr(tree: Depth2Tree) -> Column:
    """The fitted tree as a literal nested-CASE column — pure
    projection, no joins, whole-stage-codegen'd; the 100 TB apply path
    is a scan + this expression."""
    def side(child: Split | None, shallow_id: int,
             deep_ids: tuple[int, int]) -> Column:
        if child is None:
            n, p = tree.leaves[shallow_id]
            return F.lit(leaf_label(n, p))
        dl = leaf_label(*tree.leaves[deep_ids[0]])
        dr = leaf_label(*tree.leaves[deep_ids[1]])
        return (F.when(F.col(child.feat) <= F.lit(child.thr), F.lit(dl))
                .otherwise(F.lit(dr)))
    return (F.when(F.col(tree.root.feat) <= F.lit(tree.root.thr),
                   side(tree.left, 1, (3, 4)))
            .otherwise(side(tree.right, 2, (5, 6)))).cast("long")
