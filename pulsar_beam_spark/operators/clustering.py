"""Distributed Lloyd k-means over embedding columns, hash-exact against
an unrolled SQL oracle via FIXED-POINT integer arithmetic.

Float k-means is not oracle-checkable: the per-cluster means are float
sums whose value depends on partition/accumulation order. Quantizing
each component to a non-negative BIGINT — ``round((x + offset) * scale)``
— makes every quantity in the loop an integer:

- squared L2 distances are integer sums (integer addition is
  associative, so there is NO fold-order coupling at all — stronger
  than the sequential-fold contract the double-based vector family
  needs);
- argmin ties break on the first index in both engines
  (``array_position(ds, array_min(ds))`` / ``list_indexof(ds,
  list_aggregate(ds, 'min'))``);
- the centroid update is an integer division whose operands are
  non-negative by the offset, so Spark's ``div``, DuckDB's ``//`` and
  Python's ``//`` — which disagree on NEGATIVE operands (truncation vs
  floor) — all agree.

The offset cancels in every distance (only differences enter), so it
affects nothing but the non-negativity guarantee; ``scale`` bounds the
quantization error at ``0.5/scale`` per component.

Scale shape — the Spark MLlib KMeans loop re-expressed: the ASSIGNMENT
is a vectorized Arrow kernel against k literal centroid arrays (no
join, no shuffle); the UPDATE emits per-partition ``(cluster, d, s,
n)`` integer partials from the SAME Arrow pass (``lloyd_partials`` —
at most k*dim rows per task, exactly MLlib's treeAggregate shape) and
reduces them in one tiny shuffle to the ``k * dim`` rows of the only
driver collect, bounded by construction. The declarative
``posexplode`` + ``groupBy(cluster, dim)`` form — the oracle's shape —
is kept as ``lloyd_update_exploded``, the reference both paths are
gated equal against. At 100 TB each iteration costs one corpus scan
plus that k*dim-per-task shuffle; the iteration count is a small
constant fixed in the entry and in its oracle's unrolled CTEs.

The reference (kafkaesque-io/pulsar-beam) has no clustering operator;
this extends the LLM-pipeline family next to the trained quantizers in
operators/similarity.py (SURVEY §2 extension set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.litarr import lit_arr
from ..functions.vector import valid_vector

DEFAULT_SCALE = 100_000
DEFAULT_OFFSET = 1.0

# Largest allowed quantized component. Bounds every intermediate in the
# loop within int64: squared distances <= dim * (2 * MAX_QUANT)^2 and the
# vectorized kernel's v.v / 2 v.c / c.c terms <= dim * MAX_QUANT^2 + a
# factor 2 — all < 2^63 at dim=64. WITHOUT this bound a single huge
# component (x ~ 1e6 -> quantized 1e11 -> squared diff 1e22) would WRAP
# SILENTLY in the numpy int64 kernel (verified: 1e22 wraps to 1.86e18
# with no error) while Spark's ANSI long arithmetic throws and DuckDB's
# HUGEINT widens — three different behaviors, one of them quietly wrong.
# Out-of-domain components are EXCLUDED by the guard (both engines, same
# clause), never clamped. Residual documented bound: per-(cluster,dim)
# update sums are n * MAX_QUANT, so corpora beyond ~6e10 rows per
# cluster need a smaller scale (Spark's ANSI sum overflows loudly there;
# DuckDB widens — divergence is noisy, not silent).
MAX_QUANT = 150_000_000


def _check_quant_dim(dim: int) -> None:
    """ADVICE r11: the int64 no-overflow argument above was derived at
    dim=64 but every entry point accepts arbitrary ``dim`` — a caller
    passing dim ~ 200 re-opens the silent numpy wraparound the guard
    exists to exclude. Derive the bound from dim instead: the worst
    intermediate anywhere in the family is the shifted-residual ADC sum
    / the vectorized kernel's recombined distance, both bounded by
    ``dim * (2 * MAX_QUANT)^2`` (components <= 2*MAX_QUANT on the
    shifted domain, subspace terms of the residual kernels sum back to
    at most the full-dim total for m >= 2). Raise loudly at plan-build
    time — never at executor time, where numpy would wrap silently."""
    if dim * (2 * MAX_QUANT) ** 2 >= 2 ** 63:
        raise ValueError(
            f"fixed-point family: dim={dim} overflows the int64 domain "
            f"bound (dim * (2*MAX_QUANT)^2 < 2^63 requires dim <= "
            f"{(2 ** 63 - 1) // (2 * MAX_QUANT) ** 2}); lower MAX_QUANT/"
            "scale or reduce dim")


def quantize_vec(vec_col: Column | str, scale: int = DEFAULT_SCALE,
                 offset: float = DEFAULT_OFFSET) -> Column:
    """``array<long>`` fixed-point image of a float vector column.

    ``try_cast``, not ``cast``: rows that fail the ``quantizable`` guard
    never survive the filter, but Spark's InferFiltersFromGenerate can
    evaluate this expression BELOW the guard when the quantized column
    feeds a generator (the update step's posexplode) — an ANSI cast then
    aborts the whole query on one poisoned NaN vector (found by the
    poisoned-vector gate in tests/test_adversarial_corpus.py). try_cast
    yields NULL there instead; on the guarded domain the two casts are
    identical, so oracle parity is untouched."""
    v = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast("array<double>")
    return F.transform(
        v, lambda x: (F.round((x + F.lit(float(offset))) * F.lit(float(scale)), 0)
                      .try_cast("long")))


def quantizable(vec_col: str, dim: int, offset: float = DEFAULT_OFFSET,
                scale: int = DEFAULT_SCALE) -> Column:
    """Domain guard for the fixed-point loop: a valid vector (finite,
    non-NULL, non-zero — the uniform vector-family contract) of exactly
    ``dim`` components, all >= -offset so the quantized image is
    non-negative (integer division below is floor==truncation only for
    non-negative operands) AND with quantized magnitude <= MAX_QUANT so
    no int64 intermediate can overflow (see the MAX_QUANT note — the
    numpy kernel would WRAP silently). Mirrored clause-for-clause in
    the SQL oracle; out-of-domain components are excluded, not clamped
    (clamping would silently move them)."""
    _check_quant_dim(dim)
    v = F.col(vec_col).cast("array<double>")
    return (
        valid_vector(vec_col)
        & (F.size(v) == dim)
        & F.forall(v, lambda x: (x + F.lit(float(offset)) >= 0)
                   & ((x + F.lit(float(offset))) * F.lit(float(scale))
                      <= F.lit(float(MAX_QUANT))))
    )


def sq_dist_to_literal(qv_col: Column | str, centroid: list[int]) -> Column:
    """Exact integer squared-L2 distance to a literal quantized centroid."""
    qv = F.col(qv_col) if isinstance(qv_col, str) else qv_col
    return F.aggregate(
        F.zip_with(qv, lit_arr([int(c) for c in centroid], "long"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dists_expr(qv_col: str, centroids: list[list[int]]) -> Column:
    """Distances to every centroid as ONE nested-literal transform —
    ``transform(lit(array<array<long>>), c -> fold(qv, c))``, the exact
    shape of the oracle's ``list_transform((SELECT list(v ...)), ...)``.
    One literal expression instead of k*dim ``F.lit`` py4j round-trips:
    the per-call driver cost of building/analyzing the assignment plan
    drops ~10x (measured on the sf1 probe; the executed work is
    identical)."""
    cents = lit_arr([[int(x) for x in c] for c in centroids], "long")
    return F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col(qv_col), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def assign_exprs(qv_col: str, centroids: list[list[int]]) -> tuple[Column, Column]:
    """(cluster, sq_dist) argmin projections against literal centroids.
    First-index tie-break: ``array_position`` returns the FIRST match,
    as does the oracle's ``list_indexof``.

    This is the REFERENCE implementation — the expression-level mirror
    of the oracle's CTEs, kept for the cross-implementation equality
    gate in tests/test_clustering.py. The execution default is
    ``assign_struct`` below: Spark evaluates higher-order-function
    lambdas interpreted (never whole-stage-codegen), at ~7 us per
    element — k=8 x dim=64 folds over a 2000-row corpus cost ~7 s on
    one partition (measured), which is the slow path at any scale."""
    ds = _dists_expr(qv_col, centroids)
    cluster = (F.array_position(ds, F.array_min(ds)) - 1).cast("long")
    return cluster, F.array_min(ds)


def assign_struct(qv_col: str, centroids: list[list[int]]) -> Column:
    """``struct<cluster: long, sq_dist: long>`` argmin against the
    centroids, as an Arrow-batched vectorized kernel — the execution
    default.

    The FIXED-POINT domain is what makes this legal: the float vector
    family must keep sequential-fold expressions because float sums are
    order-dependent (numpy/BLAS accumulation breaks the bit-exact oracle
    contract — see similarity.pq_encode's rejected-alternatives note),
    but integer arithmetic is associative, ``||v-c||^2 = v.v - 2 v.c +
    c.c`` is exact in int64 (components <= ~2e5, 64 dims -> every term
    <= ~2.6e12), and ``np.argmin`` breaks ties on the first index
    exactly like ``array_position``/``list_indexof``. So the vectorized
    kernel is bit-identical to the interpreted reference (gated in
    tests/test_clustering.py) at ~1000x the per-element throughput."""
    if centroids:
        _check_quant_dim(len(centroids[0]))
    cents = np.asarray([[int(x) for x in c] for c in centroids], dtype=np.int64)
    cc = (cents * cents).sum(axis=1)

    @pandas_udf("cluster long, sq_dist long")
    def _assign(qv: pd.Series) -> pd.DataFrame:
        if len(qv) == 0:
            return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                                 "sq_dist": pd.Series([], dtype="int64")})
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qv])
        d = ((v * v).sum(axis=1)[:, None] - 2 * (v @ cents.T) + cc[None, :])
        cl = d.argmin(axis=1)
        return pd.DataFrame({
            "cluster": cl.astype("int64"),
            "sq_dist": d[np.arange(len(cl)), cl].astype("int64"),
        })

    return _assign(F.col(qv_col))


def py_update(cents: list[list[int]], rows) -> list[list[int]]:
    """Pure-integer centroid update from (cluster, d, s, n) partial rows:
    new component = s // n (floor == truncation, operands non-negative);
    clusters with no members CARRY OVER unchanged — exactly the oracle's
    ``LEFT JOIN ... coalesce`` step."""
    dim = len(cents[0]) if cents else 0
    upd: dict[int, list[int | None]] = {}
    for r in rows:
        upd.setdefault(int(r["cluster"]), [None] * dim)[int(r["d"])] = (
            int(r["s"]) // int(r["n"]))
    out = []
    for j, c in enumerate(cents):
        nc = upd.get(j)
        out.append([int(x) for x in nc] if nc is not None else list(c))
    return out


def lloyd_update_exploded(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """``(cluster, d, s, n)`` Lloyd-update sums via the declarative
    shape: assignment projection, ``posexplode`` to (dim, component),
    ``groupBy(cluster, d)`` partial-aggregated shuffle.

    This is the REFERENCE implementation — the operator-level mirror of
    the oracle's unrolled update CTEs, kept for the cross-implementation
    equality gate in tests/test_clustering.py. The execution default is
    ``lloyd_update`` below: the posexplode generates dim x rows through
    the JVM and ships the corpus through the assignment's Arrow boundary
    only to immediately re-aggregate to <= k*dim rows per partition —
    the fused kernel computes the same partial sums inside the SAME
    Arrow pass that does the assignment (r14; exact integer arithmetic,
    so the partials are bit-identical and their sum is order-free)."""
    return (
        q.select(assign_struct("qv", cents).getField("cluster").alias("cluster"),
                 F.posexplode("qv").alias("d", "x"))
        .groupBy("cluster", "d")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    )


def lloyd_partials(q: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Per-partition ``(cluster, d, s, n)`` Lloyd partial sums, fused
    with the assignment into ONE ``mapInArrow`` pass over ``(qv)``.

    Exactness: the distance/argmin kernel is byte-for-byte the
    ``assign_struct`` formula (exact int64, first-index ties); the
    per-partition component sums are exact int64 adds (``np.add.at`` is
    unbuffered) of the same quantized values the exploded path sums, and
    integer addition is associative, so ``sum(s)`` / ``sum(n)`` over the
    partials equals the exploded path's ``sum(x)`` / ``count(*)`` for
    every (cluster, d) — gated in tests/test_clustering.py. Clusters
    with no members in a partition are NOT emitted (matching groupBy,
    which only sees existing groups — the carry-over contract).

    Scale shape: each task emits at most ``k * dim`` rows, so the
    downstream shuffle is tasks x k x dim tiny rows instead of
    corpus x dim exploded rows (the explode's map-side partial agg
    already bounded the shuffle BYTES; this removes the dim x row
    generation and one corpus-sized Python boundary crossing).
    Overflow: a partition-local sum wraps only past ~2^63 / MAX_QUANT
    ~ 6e10 rows per task — orders of magnitude past any real partition;
    the corpus-level sum stays a Spark ANSI long sum (loud on
    overflow), exactly as before."""
    assert centroids, "lloyd_partials: empty centroid list"
    _check_quant_dim(len(centroids[0]))
    cents = np.asarray([[int(x) for x in c] for c in centroids], dtype=np.int64)
    k, dim = cents.shape
    cc = (cents * cents).sum(axis=1)

    def _partials(batches):
        import numpy as _np
        import pyarrow as _pa

        sums = _np.zeros((k, dim), dtype=_np.int64)
        counts = _np.zeros(k, dtype=_np.int64)
        for b in batches:
            if b.num_rows == 0:
                continue
            flat = b.column(0).flatten().to_numpy(zero_copy_only=False)
            v = _np.asarray(flat, dtype=_np.int64).reshape(b.num_rows, dim)
            d = (v * v).sum(axis=1)[:, None] - 2 * (v @ cents.T) + cc[None, :]
            cl = d.argmin(axis=1)
            _np.add.at(sums, cl, v)
            counts += _np.bincount(cl, minlength=k)
        nz = _np.flatnonzero(counts)
        if len(nz):
            yield _pa.RecordBatch.from_arrays(
                [
                    _pa.array(_np.repeat(nz, dim), type=_pa.int64()),
                    _pa.array(_np.tile(_np.arange(dim, dtype=_np.int64), len(nz)),
                              type=_pa.int64()),
                    _pa.array(sums[nz].reshape(-1), type=_pa.int64()),
                    _pa.array(_np.repeat(counts[nz], dim), type=_pa.int64()),
                ],
                names=["cluster", "d", "s", "n"],
            )

    return q.select("qv").mapInArrow(
        _partials, "cluster long, d long, s long, n long")


def lloyd_update(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """``(cluster, d, s, n)`` Lloyd-update sums — fused execution
    default: per-partition Arrow partials + one k*dim-row shuffle.
    Row-equal to ``lloyd_update_exploded`` (gated)."""
    return (
        lloyd_partials(q, cents)
        .groupBy("cluster", "d")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )


def quantized_frame(
    emb: DataFrame,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(_kid, qv array<long>)`` fixed-point image of the guarded corpus
    — the shared entry point of the k-means loop and the trained-PQ
    pipeline (mirrored by the oracle's quantize CTE)."""
    return (
        emb.filter(quantizable(vec_col, dim, offset, scale))
        .select(F.col(id_col).alias("_kid"),
                quantize_vec(vec_col, scale, offset).alias("qv"))
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    aux: dict | None = None,
) -> tuple[DataFrame, list[list[int]]]:
    """Run ``iters`` Lloyd iterations; returns (quantized corpus frame
    ``(id, qv)``, final centroids as Python ints).

    Init is the k smallest ids' vectors (deterministic under any
    partitioning, unlike a sample) — one bounded k-row collect; each
    iteration's update collects exactly k*dim partial-agg rows.

    ``aux``, when passed, receives ``train_ckpt``: the materialized
    quantized frame the training loop reads — callers that run MORE
    bounded passes over the same corpus image (residual-book sampling)
    reuse it instead of re-scanning the source (r14; same rows either
    way, so results are identical).
    """
    from ..sources.tables import spread_small_input

    q = quantized_frame(emb, dim, scale, offset, id_col, vec_col)
    # r14: the init collect and every Lloyd iteration used to re-scan
    # the parquet and re-quantize (scan+HOF transform) per job — 3+
    # redundant passes. Train against ONE materialized image of the
    # quantized corpus instead; the RETURNED frame keeps the original
    # lineage so downstream plans (pushed filters, pruned scans — the
    # shapes test_plans.py pins) are untouched, and results are
    # identical either way (same rows feed every pass). The image is
    # spread to full width first: the single-row-group local fixture
    # checkpoints into ONE partition, serializing every iteration's
    # assign+agg on one core (0.87 s/iteration measured at sf0.1 vs
    # the shuffle's 128k-row cost; a no-op at real split counts). All
    # consumers are partitioning-invariant: orderBy+limit init, keyed
    # integer aggregation, and the _kid-strided residual-book sample.
    qt = spread_small_input(q).localCheckpoint()
    if aux is not None:
        aux["train_ckpt"] = qt
    init = qt.orderBy("_kid").limit(k).select("qv").collect()
    cents = [[int(x) for x in r["qv"]] for r in init]
    if not cents:
        return q, cents
    for _ in range(iters):
        rows = lloyd_update(qt, cents).collect()
        cents = py_update(cents, rows)
    return q, cents


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, sq_dist) under the final centroids — the converged
    assignment scan. The output plan is scan + codegen projection; the
    training iterations above it are the bounded-collect loop."""
    q, cents = kmeans_fit(emb, k, iters, dim, scale, offset, id_col, vec_col)
    if not cents:
        return q.select(
            F.col("_kid").alias(id_col),
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("long").alias("sq_dist"),
        ).where(F.lit(False))
    return (
        q.select(F.col("_kid").alias(id_col),
                 assign_struct("qv", cents).alias("_a"))
        .select(id_col, F.col("_a.cluster").alias("cluster"),
                F.col("_a.sq_dist").alias("sq_dist"))
    )


def kmeans_cluster_means(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, d, m): per-dimension integer mean of the FINAL
    assignment, computed distributively (fused Arrow partials +
    ``groupBy`` + ``div`` — row-equal to the oracle's posexplode shape,
    see ``lloyd_update``) — i.e. the (iters+1)-th update step, emitted
    for non-empty clusters only. This is the entry that puts the update
    arithmetic itself in the hash-checked output."""
    q, cents = kmeans_fit(emb, k, iters, dim, scale, offset, id_col, vec_col)
    if not cents:
        return q.select(
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("long").alias("d"),
            F.lit(None).cast("long").alias("m"),
        ).where(F.lit(False))
    return (
        lloyd_update(q, cents)
        .select("cluster", F.col("d").cast("long").alias("d"),
                F.expr("s div n").alias("m"))
    )


def ivf_trained_topk(
    emb: DataFrame,
    query_vec: list[float] | None,
    query_qv: list[int] | None,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k with a TRAINED coarse quantizer, end-to-end
    oracle-verifiable: cells come from the fixed-point Lloyd loop over
    the corpus (kmeans_fit — the SQL-replayable trainer), the query
    probes its ``nprobe`` nearest cells by EXACT integer distance
    (ties by cell index), and the probed candidates rank by exact float
    cosine under the vector family's sequential-fold / rank-on-raw /
    round-in-projection contract. similarity.ivf_topk's entry holds
    FIXED literal centroids precisely because float training wasn't
    oracle-replayable; this is the real index shape — train, assign,
    probe — with the oracle replaying every step.

    ``query_qv`` is the query's fixed-point image, collected by the
    caller from the SAME Spark expression the corpus uses (a one-row
    ``quantized_frame`` lookup — recomputing it in Python could diverge
    on exact .5 products, banker's vs half-up). None (either arg) means
    no valid query: empty result, the family's contract.

    One scan, zero joins: cell assignment (vectorized int64 kernel) and
    the cosine fold are projections over the same guarded corpus;
    probing is an IN filter on the assigned cell; top-k is
    TakeOrderedAndProject. At 100 TB the cell column is what you
    persist at ingest (the PQ-codes story again); the probe filter then
    prunes to ~nprobe/n_cells of the corpus before any ranking work.
    """
    from ..functions.vector import cosine_sim

    q, cents = kmeans_fit(emb, n_cells, iters, dim, scale, offset,
                          id_col, vec_col)
    base = (
        emb.filter(quantizable(vec_col, dim, offset, scale))
        .select(F.col(id_col),
                quantize_vec(vec_col, scale, offset).alias("qv"),
                F.col(vec_col).cast("array<double>").alias("_v"))
    )
    empty = base.select(
        F.col(id_col), F.lit(None).cast("double").alias("cosine")
    ).where(F.lit(False))
    if not cents or query_vec is None or query_qv is None:
        return empty
    probe = ivf_probe_cells(query_qv, cents, nprobe)
    qlit = lit_arr([float(x) for x in query_vec])
    cell = assign_struct("qv", cents).getField("cluster")
    cos = cosine_sim(F.col("_v"), qlit)
    return (
        base.select(F.col(id_col), cell.alias("_cell"), cos.alias("_cos"))
        .filter(F.col("_cell").isin([int(j) for j in probe]))
        .orderBy(F.col("_cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round(F.col("_cos"), 6).alias("cosine"))
    )


def ivf_probe_cells(query_qv: list[int], cents: list[list[int]],
                    nprobe: int) -> list[int]:
    """The query's ``nprobe`` nearest cells by exact integer distance,
    ties broken by cell index — Python ints, so exactly the oracle's
    ``ORDER BY fold, cluster LIMIT nprobe``."""
    dists = []
    for j, c in enumerate(cents):
        d = 0
        for a, b in zip(query_qv, c):
            d += (int(a) - b) * (int(a) - b)
        dists.append((d, j))
    return [j for _, j in sorted(dists)[:nprobe]]


def ivf_assign_cells(
    emb: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]]]:
    """Ingest-side half of the IVF pipeline: train the coarse quantizer
    and return ((id, cell) assignment frame, centroids) — the artifact
    pair a 100 TB deployment persists once (the cell column next to the
    corpus, the tiny centroid table for query-time probing)."""
    q, cents = kmeans_fit(emb, n_cells, iters, dim, scale, offset,
                          id_col, vec_col)
    if not cents:
        return (q.select(F.col("_kid").alias(id_col),
                         F.lit(None).cast("long").alias("cell"))
                .where(F.lit(False)), cents)
    cell = assign_struct("qv", cents).getField("cluster")
    return (q.select(F.col("_kid").alias(id_col), cell.alias("cell")), cents)


def ivf_cells_scan_topk(
    cells: DataFrame,
    emb: DataFrame,
    query_vec: list[float],
    probe: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query-time half over a PERSISTED (id, cell) artifact: the probe
    IN-filter lands in the cells parquet scan's PushedFilters (a
    cell-partitioned layout prunes to ~nprobe/n_cells of the postings
    at 100 TB), candidates join back to the corpus by id for the exact
    float cosine ranking (rank on raw, round in projection — the same
    contract as the inline entry, so they share one oracle). No
    training job anywhere in this plan."""
    from ..functions.vector import cosine_sim, valid_vector

    qlit = lit_arr([float(x) for x in query_vec])
    cand = (cells.filter(F.col("cell").isin([int(j) for j in probe]))
            .select(id_col))
    base = (emb.filter(valid_vector(vec_col))
            .select(F.col(id_col),
                    cosine_sim(F.col(vec_col).cast("array<double>"),
                               qlit).alias("_cos")))
    return (
        base.join(cand, id_col)
        .orderBy(F.col("_cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round(F.col("_cos"), 6).alias("cosine"))
    )


def residual_struct(qv_col: str, centroids: list[list[int]],
                    shift: int) -> Column:
    """``struct<cell: long, rv: array<long>>``: argmin cell plus the
    SHIFTED residual ``v - centroid[cell] + shift`` — one vectorized
    pass. The shift re-enters the non-negative domain the fixed-point
    contract needs (raw residuals are signed, and Spark div / DuckDB //
    / Python // disagree on negatives); distances are shift-invariant,
    so the PQ geometry is exactly FAISS's IVFPQ residual encoding.
    With shift == MAX_QUANT, residual components stay in
    [0, 2*MAX_QUANT] and every downstream intermediate still fits
    int64."""
    if centroids:
        _check_quant_dim(len(centroids[0]))
    cents = np.asarray([[int(x) for x in c] for c in centroids], dtype=np.int64)
    cc = (cents * cents).sum(axis=1)
    s = int(shift)

    @pandas_udf("cell long, rv array<long>")
    def _res(qv: pd.Series) -> pd.DataFrame:
        if len(qv) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "rv": pd.Series([], dtype="object")})
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qv])
        d = ((v * v).sum(axis=1)[:, None] - 2 * (v @ cents.T) + cc[None, :])
        cl = d.argmin(axis=1)
        rv = v - cents[cl] + s
        return pd.DataFrame({"cell": cl.astype("int64"),
                             "rv": list(rv)})

    return _res(F.col(qv_col))


def ivfpq_residual_books(
    q: DataFrame,
    cents: list[list[int]],
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    sample_cap: int = 256,
    shift: int = MAX_QUANT,
) -> list[list[list[int]]]:
    """Train the per-subspace residual codebooks from a DETERMINISTIC
    id-strided sample of the quantized corpus ``q`` (the
    ``quantized_frame`` output): ``stride = ceil(n/cap)``, rows with
    ``_kid % stride == 0`` in id order, capped.

    The sample collect is a pure-codegen scan (filter + limit on the
    quantized frame — NO pandas pass over the corpus just to sample;
    ADVICE r11 flagged the old shape that evaluated the residual
    pipeline for the sample); cell assignment and the shifted residual
    for the <= ``sample_cap`` sampled rows are then computed
    DRIVER-SIDE in pure Python ints — bit-identical to the vectorized
    kernel (first-index argmin, exact integer arithmetic) and to the
    oracle's CTEs, gated in tests/test_clustering.py."""
    if sample_cap < 4 * ksub:
        # the coarse-quantizer discipline (operators/dedup.py trains on
        # max(256, 4*n_centroids)): fewer than ~4 points per codeword
        # under-determines the subspace codebooks — several codewords
        # collapse onto single sample points and the 'trained' books
        # are mostly init artifacts (r12 task 4 audit)
        raise ValueError(
            f"ivfpq_residual_books: sample_cap={sample_cap} < 4*ksub="
            f"{4 * ksub} under-determines the residual codebooks — "
            "raise sample_cap or lower ksub")
    n = q.count()
    stride = (n + sample_cap - 1) // sample_cap if n else 1
    rows = (q.filter((F.col("_kid") % stride) == 0)
            .orderBy("_kid").limit(sample_cap).select("qv").collect())
    if cents and len(cents[0]) % m:
        # round-12 self-probe: sub = dim // m silently DROPS the last
        # dim % m components from every codebook, code and LUT — both
        # engines agree (the oracle slices identically), so parity
        # can't catch it; distances are just quietly computed on a
        # truncated vector. Refuse at train time.
        raise ValueError(
            f"ivfpq_residual_books: dim={len(cents[0])} not divisible by "
            f"m={m} — the last {len(cents[0]) % m} components would be "
            "silently excluded from every subspace")
    pts = []
    for r in rows:
        v = [int(x) for x in r["qv"]]
        best, bd = 0, None
        for j, c in enumerate(cents):
            d = 0
            for a, b in zip(v, c):
                d += (a - b) * (a - b)
            if bd is None or d < bd:
                best, bd = j, d
        pts.append([a - b + shift for a, b in zip(v, cents[best])])
    if not pts:
        return []
    dim = len(cents[0])
    sub = dim // m
    return [fixedpoint_kmeans_py([p[mi * sub:(mi + 1) * sub] for p in pts],
                                 ksub, iters)
            for mi in range(m)]


def ivfpq_codes_struct(qv_col: str, cents: list[list[int]],
                       books: list[list[list[int]]],
                       shift: int = MAX_QUANT) -> Column:
    """``struct<cell long, codes array<long>>``: coarse-cell argmin,
    shifted residual and the M per-subspace PQ codes FUSED into one
    Arrow crossing (the separate ``residual_struct`` +
    ``pq_int_codes_vectorized`` chain costs two Python round-trips per
    row batch; the composite index encodes every row exactly once at
    ingest, so the fused kernel is the shape that matters). Same
    associative-integer legality argument as ``assign_struct``;
    bit-equality against the two-stage chain gated in
    tests/test_clustering.py."""
    if not books or not books[0] or not books[0][0]:
        raise ValueError(
            "ivfpq_codes_struct: empty codebooks — train via "
            "ivfpq_residual_books/pq_train_fixedpoint first")
    if cents and len(books) * len(books[0][0]) != len(cents[0]):
        raise ValueError(
            f"ivfpq_codes_struct: m*sub = {len(books)}*{len(books[0][0])} "
            f"!= dim {len(cents[0])} — the slicing below would silently "
            "drop tail components from every code; the trainers raise on "
            "dim % m != 0, so these books came from an unguarded path")
    if cents:
        _check_quant_dim(len(cents[0]))
    _check_quant_dim(2 * len(books[0][0]))
    cmat = np.asarray([[int(x) for x in c] for c in cents], dtype=np.int64)
    cc = (cmat * cmat).sum(axis=1)
    mats = [np.asarray([[int(x) for x in cw] for cw in book], dtype=np.int64)
            for book in books]
    sub = len(books[0][0])
    s = int(shift)

    @pandas_udf("cell long, codes array<long>")
    def _enc(qv: pd.Series) -> pd.DataFrame:
        if len(qv) == 0:
            return pd.DataFrame({"cell": pd.Series([], dtype="int64"),
                                 "codes": pd.Series([], dtype="object")})
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qv])
        d = ((v * v).sum(axis=1)[:, None] - 2 * (v @ cmat.T) + cc[None, :])
        cl = d.argmin(axis=1)
        rv = v - cmat[cl] + s
        out = np.empty((len(v), len(mats)), dtype=np.int64)
        for mi, bm in enumerate(mats):
            sl = rv[:, mi * sub:(mi + 1) * sub]
            ds = ((sl * sl).sum(axis=1)[:, None] - 2 * (sl @ bm.T)
                  + (bm * bm).sum(axis=1)[None, :])
            out[:, mi] = ds.argmin(axis=1)
        return pd.DataFrame({"cell": cl.astype("int64"), "codes": list(out)})

    return _enc(F.col(qv_col))


def ivfpq_encode(
    emb: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    shift: int = MAX_QUANT,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ingest-side half of the composite index: ``(id, cell,
    _code0.._code{M-1} tinyint)`` — the per-cell residual PQ codes a
    100 TB deployment persists ONCE next to the (cell, centroid) and
    codebook artifacts, exactly like ``similarity.pq_encode``'s flat
    codes. Run per corpus (or per micro-batch under FIXED trained
    artifacts — encoding is row-local; streaming/vector_index.py) and
    written to parquet; the query path (``ivfpq_adc_scan``) then reads
    M bytes + one cell long per vector and never touches the float
    array."""
    q = quantized_frame(emb, dim, scale, offset, id_col, vec_col)
    return _ivfpq_encode_q(q, cents, books, shift, id_col)


def _ivfpq_encode_q(q: DataFrame, cents: list[list[int]],
                    books: list[list[list[int]]], shift: int,
                    id_col: str) -> DataFrame:
    for book in books:
        if len(book) > 127:
            raise ValueError(
                "ivfpq_encode: ksub > 127 does not fit the tinyint code "
                "columns — widen the persisted type before raising ksub")
    m = len(books)
    enc = q.select("_kid", ivfpq_codes_struct("qv", cents, books, shift)
                   .alias("_e"))
    return enc.select(
        F.col("_kid").alias(id_col),
        F.col("_e.cell").alias("cell"),
        *[F.element_at("_e.codes", mi + 1).cast("tinyint").alias(f"_code{mi}")
          for mi in range(m)],
    )


def ivfpq_build_artifacts(
    emb: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    sample_cap: int = 256,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]], list[list[list[int]]]]:
    """One-shot ingest-side build of the full composite-index artifact
    set: (codes frame ``(id, cell, _code0.._code{M-1})``, coarse
    centroids, residual codebooks). The three outputs are what a
    deployment persists — codes as a parquet table next to the corpus,
    centroids (n_cells rows) and codebooks (M x ksub rows) as tiny
    tables the query path collects. Empty corpus -> (empty frame, [],
    [])."""
    aux: dict = {}
    q, cents = kmeans_fit(emb, n_cells, iters, dim, scale, offset,
                          id_col, vec_col, aux=aux)
    empty = q.select(
        F.col("_kid").alias(id_col),
        F.lit(None).cast("long").alias("cell"),
    ).where(F.lit(False))
    if not cents:
        return empty, [], []
    books = ivfpq_residual_books(q, cents, m, ksub, iters, sample_cap,
                                 MAX_QUANT)
    if not books:
        return empty, cents, []
    return _ivfpq_encode_q(q, cents, books, MAX_QUANT, id_col), cents, books


def ivfpq_query_luts(query_qv: list[int], cents: list[list[int]],
                     books: list[list[list[int]]], probe: list[int],
                     shift: int = MAX_QUANT) -> dict[int, list[list[int]]]:
    """Per-PROBED-CELL ADC lookup tables — the defining IVFPQ detail:
    the query's residual is taken against EACH probed cell's centroid,
    giving one M x ksub LUT set per cell. Pure Python ints, exactly the
    oracle's folds."""
    sub = len(books[0][0])
    luts: dict[int, list[list[int]]] = {}
    for c in probe:
        qr = [int(a) - b + shift for a, b in zip(query_qv, cents[c])]
        cell_luts = []
        for mi, book in enumerate(books):
            qs = qr[mi * sub:(mi + 1) * sub]
            cell_luts.append([
                sum((a - b) * (a - b) for a, b in zip(qs, cw)) for cw in book])
        luts[c] = cell_luts
    return luts


def ivfpq_adc_scan(
    codes: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    query_qv: list[int],
    nprobe: int = 4,
    k: int = 10,
    shift: int = MAX_QUANT,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query-time half over (possibly persisted) residual PQ codes: the
    ``nprobe`` nearest cells by exact integer distance prune via a
    ``cell IN (...)`` filter — on a parquet artifact it lands in
    PushedFilters, so a cell-partitioned layout reads ~nprobe/n_cells
    of the codes at 100 TB — then the per-cell ADC (a CASE over the
    probed cells, M LUT lookups each) ranks into
    TakeOrderedAndProject. Zero shuffles, no float vector IO, no
    training anywhere in the plan. (id, adc) ordered by (adc, id)."""
    m = len(books)
    probe = ivf_probe_cells(query_qv, cents, nprobe)
    luts = ivfpq_query_luts(query_qv, cents, books, probe, shift)

    def adc_for(c: int) -> Column:
        t = F.element_at(lit_arr([int(x) for x in luts[c][0]], "long"),
                         (F.col("_code0").cast("int") + 1))
        for mi in range(1, m):
            t = t + F.element_at(
                lit_arr([int(x) for x in luts[c][mi]], "long"),
                (F.col(f"_code{mi}").cast("int") + 1))
        return t

    adc = None
    for c in probe:
        adc = (F.when(F.col("cell") == int(c), adc_for(c)) if adc is None
               else adc.when(F.col("cell") == int(c), adc_for(c)))
    return (
        codes.filter(F.col("cell").isin([int(c) for c in probe]))
        .select(F.col(id_col), adc.alias("adc"))
        .orderBy("adc", id_col)
        .limit(k)
    )


def ivfpq_batch_lut_rows(
    queries: list[tuple[int, list[int]]],
    cents: list[list[int]],
    books: list[list[list[int]]],
    nprobe: int,
    shift: int,
) -> tuple[list[tuple], set[int]]:
    """Vectorized (numpy int64) builder of the batch-ADC LUT rows —
    bit-identical to the pure-Python ``ivf_probe_cells`` +
    ``ivfpq_query_luts`` loop it replaces (equality gated in
    tests/test_clustering.py), ~100x faster on the driver: at corpus-
    as-queries scale the Python loop was ~6000 int ops per query of
    SERIAL driver time (the r14 census put pipeline_semantic_dedup at
    9.9 s construct / 0.02 s execute), which is dead time for every
    executor at any cluster size (guide §5: the driver should do
    almost no data work).

    Exactness: every intermediate is bounded by the ``_check_quant_dim``
    int64 domain argument (squared distances <= dim * (2*MAX_QUANT)^2;
    shifted residuals in [0, 2*MAX_QUANT]), so int64 numpy equals
    arbitrary-precision Python ints; the probe order uses a STABLE
    argsort, matching ``sorted((dist, cell))``'s tie-break exactly.

    Returns (rows, probed_cell_union) with rows in the same
    (first-occurrence qid, probe-rank) order the scalar loop produced;
    duplicate qids keep the first occurrence (the batch(dups) ==
    batch(set) gate).
    """
    m = len(books)
    rows_np = _ivfpq_batch_lut_np(queries, cents, books, nprobe, shift)
    if rows_np is None:
        return [], set()
    qids, probe, luts = rows_np
    rows: list[tuple] = []
    all_cells: set[int] = set()
    for i, qid in enumerate(qids):
        for p in range(probe.shape[1]):
            c = int(probe[i, p])
            all_cells.add(c)
            rows.append(tuple([qid, c]
                              + [luts[mi][i, p].tolist() for mi in range(m)]))
    return rows, all_cells


def ivfpq_batch_lut_frame(
    spark,
    queries: list[tuple[int, list[int]]],
    cents: list[list[int]],
    books: list[list[list[int]]],
    nprobe: int,
    shift: int,
) -> tuple[DataFrame | None, set[int]]:
    """The batch-ADC LUT table as a DataFrame, shipped to the JVM as ONE
    Arrow batch instead of a verified row list: ``createDataFrame(rows,
    schema)`` walks every nested value through the Python type verifier
    (~1.1M ``verify()`` calls and >1 s of serial driver time for the
    corpus-as-queries table at sf0.1 — profiled in round 14), while a
    pyarrow Table built zero-copy from the kernel's own int64 arrays
    crosses in milliseconds (guide §6 "Arrow for driver transfers").

    Values and row order are IDENTICAL to ``ivfpq_batch_lut_rows``
    (same numpy kernel; ``np.repeat``/``ravel``/``reshape`` reproduce
    the (first-occurrence qid, probe-rank) nesting exactly) and the
    resulting schema matches the DDL the row path declared — both gated
    in tests/test_clustering.py. Returns (frame | None-when-empty,
    probed_cell_union)."""
    import pyarrow as pa

    rows_np = _ivfpq_batch_lut_np(queries, cents, books, nprobe, shift)
    if rows_np is None:
        return None, set()
    qids, probe, luts = rows_np
    m = len(books)
    ksub = len(books[0])
    nq, npr = probe.shape
    offsets = pa.array(np.arange(0, nq * npr * ksub + 1, ksub,
                                 dtype=np.int32))
    cols: dict[str, pa.Array] = {
        "qid": pa.array(np.repeat(np.asarray(qids, dtype=np.int64), npr)),
        "cell": pa.array(probe.reshape(-1).astype(np.int64)),
    }
    for mi in range(m):
        flat = np.ascontiguousarray(luts[mi].reshape(-1))
        cols[f"l{mi}"] = pa.ListArray.from_arrays(offsets, pa.array(flat))
    return (spark.createDataFrame(pa.table(cols)),
            {int(c) for c in np.unique(probe)})


def _ivfpq_batch_lut_np(
    queries: list[tuple[int, list[int]]],
    cents: list[list[int]],
    books: list[list[list[int]]],
    nprobe: int,
    shift: int,
):
    """Shared numpy core of the two LUT builders: (qids, probe q x nprobe,
    luts m x (q x nprobe x ksub)) or None for an empty query set. Exact
    int64 throughout (see ivfpq_batch_lut_rows' exactness note)."""
    m = len(books)
    sub = len(books[0][0])
    seen: set[int] = set()
    qids: list[int] = []
    qvecs: list[list[int]] = []
    for qid, qv in queries:
        if int(qid) in seen:
            continue
        seen.add(int(qid))
        qids.append(int(qid))
        qvecs.append(qv)
    if not qids:
        return None
    dim = len(qvecs[0])
    _check_quant_dim(dim)
    Q = np.asarray(qvecs, dtype=np.int64)
    C = np.asarray(cents, dtype=np.int64)
    d = ((Q * Q).sum(1)[:, None] - 2 * (Q @ C.T)
         + (C * C).sum(1)[None, :])
    probe = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
    R = Q[:, None, :] - C[probe] + int(shift)
    B = [np.asarray(book, dtype=np.int64) for book in books]
    luts = []
    for mi in range(m):
        s = R[:, :, mi * sub:(mi + 1) * sub]
        bm = B[mi]
        luts.append((s * s).sum(-1)[:, :, None]
                    - 2 * (s @ bm.T)
                    + (bm * bm).sum(-1)[None, None, :])
    return qids, probe, luts


def ivfpq_adc_batch_scan(
    codes: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    queries: list[tuple[int, list[int]]],
    nprobe: int = 4,
    k: int = 10,
    shift: int = MAX_QUANT,
    id_col: str = "vec_id",
) -> DataFrame:
    """BATCH multi-query ADC over (possibly persisted) residual codes —
    the retrieval-for-training read shape: every training example needs
    k neighbors, so queries arrive as a SET, and the brute batch join
    (e_grouped_topk: Q x N dots) is exactly what the index exists to
    avoid.

    Per query the probe + LUTs are computed driver-side (bounded:
    Q x nprobe x m x ksub ints — the probe-cells collect pattern); they
    ship as ONE broadcast (qid, cell, l0..l{M-1}) table joined to the
    codes ON CELL. The codes are scanned ONCE for all queries with the
    union of probed cells pushed as an IN filter (a cell-partitioned
    layout reads ~the probed fraction at 100 TB regardless of Q); each
    surviving (row, query-probing-its-cell) pair pays M element_at
    adds, and the per-query rank is a window over the already-pruned
    candidates (the one shuffle, proportional to candidates, never the
    corpus). (qid, id, adc, rn<=k), rank ties broken by id — exact
    integers end to end, so the multi-query oracle replays it.
    """
    from pyspark.sql import Window

    m = len(books)
    # qid is the query's IDENTITY: a duplicated qid would duplicate its
    # (qid, cell) LUT rows, double every candidate through the join and
    # corrupt the per-qid row_number ranks (each vec_id would appear at
    # two ranks). Keep the first occurrence — batch(dups) == batch(set),
    # pinned by the adversarial gate. The probe/LUT computation is the
    # vectorized int64 kernel (bit-equal to the scalar loop, gated in
    # tests/test_clustering.py) and ships as ONE Arrow batch — the row
    # path's per-value Python verifier was >1 s of serial driver time
    # at corpus-as-queries scale (gated row- and schema-equal).
    lutdf, all_cells = ivfpq_batch_lut_frame(
        codes.sparkSession, queries, cents, books, nprobe, shift)
    if lutdf is None:
        schema = ("qid long, cell long, "
                  + ", ".join(f"l{mi} array<long>" for mi in range(m)))
        lutdf = codes.sparkSession.createDataFrame([], schema)
    adc = F.element_at(F.col("l0"), F.col("_code0").cast("int") + 1)
    for mi in range(1, m):
        adc = adc + F.element_at(F.col(f"l{mi}"),
                                 F.col(f"_code{mi}").cast("int") + 1)
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(),
                                          F.col(id_col).asc())
    return (
        codes.filter(F.col("cell").isin(sorted(all_cells)))
        .join(F.broadcast(lutdf), "cell")
        .select("qid", id_col, adc.alias("adc"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "adc", F.col("rn").cast("int").alias("rn"))
    )


def ivfpq_corpus_candidates(
    qf: DataFrame,
    codes: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    *,
    chunk: int = 512,
    nprobe: int = 4,
    k: int = 16,
    shift: int = MAX_QUANT,
    id_col: str = "vec_id",
) -> DataFrame | None:
    """CORPUS-as-queries batch retrieval — the SemDeDup read shape:
    every document needs its approximate neighbors, so the whole
    quantized corpus ``qf`` (``(_kid, qv)``, the quantized_frame shape)
    flows through ``ivfpq_adc_batch_scan`` in id-range CHUNKS of at
    most ``chunk`` queries. Per chunk the driver state is the bounded
    probe+LUT collect (chunk x nprobe x m x ksub ints — never
    corpus-sized) and the codes artifact is scanned ONCE with that
    chunk's probed-cell union pushed as an IN filter; a cell-
    partitioned layout reads ~the probed fraction per chunk at 100 TB.
    Returns the lazy union of per-chunk (qid, id) candidate frames
    (one codes scan per chunk in the final plan — pinned in
    tests/test_plans.py), or None when the corpus/index is empty.
    Self-candidates (qid == id) are kept: they occupy an ADC slot on
    both engines identically; downstream pair building drops them."""
    # single-chunk probe BEFORE any materialization: a bare
    # limit(chunk+1).count() short-circuits after the first partitions
    # (CollectLimit grows its partition set incrementally), so it never
    # costs a full quantize pass. When the corpus fits one chunk — every
    # sub-2048-query caller, i.e. all benched SFs — the whole
    # checkpoint+count preamble (two extra driver-serialized jobs, one
    # of them a full eager pass) collapses into this probe + the one
    # collect below (r14: 3 jobs -> 2, the probe near-free).
    if not cents or not books:
        return None
    qprobe = qf.limit(chunk + 1).count()
    if qprobe == 0:
        return None
    if qprobe <= chunk:
        # single chunk: the collect below is the ONLY pass over qf, so
        # there is nothing for a checkpoint to de-duplicate; the
        # bounded row list is sorted driver-side instead of paying the
        # orderBy's range exchange + sort inside the collect job (the
        # LUT builder only needs a deterministic qid order)
        qrows = qf.select("_kid", "qv").collect()
        queries = sorted(
            ((int(r["_kid"]), [int(x) for x in r["qv"]]) for r in qrows),
            key=lambda t: t[0])
        return ivfpq_adc_batch_scan(
            codes, cents, books, queries, nprobe=nprobe, k=k, shift=shift,
            id_col=id_col).select("qid", id_col)
    # materialize the quantized corpus ONCE: the chunk loop collects
    # N/chunk times, and without this every collect re-scans and
    # re-quantizes the source parquet — at 100 TB that rescan, not the
    # pruned codes scans, would dominate. One pass, then each chunk's
    # range filter reads the in-memory checkpoint.
    qf = qf.localCheckpoint()
    n = qf.count()
    # chunk by RANK, not by id value: ids may be sparse or offset (the
    # sf1 weak-scaling fixture strides replicas by 1e9 — a value-strided
    # loop spins over millions of empty ranges; found when the r14
    # decade probe hung on exactly that). One approxQuantile pass
    # yields ~equal-population boundaries; the driver holds n/chunk + 1
    # doubles — proportional to the chunk count the loop already owns.
    # The quantile error only skews chunk POPULATIONS a few percent,
    # never results (chunking is invisible to them: each query's
    # candidates are independent).
    nchunks = -(-n // chunk)
    bs = sorted({int(b) for b in qf.stat.approxQuantile(
        "_kid", [i / nchunks for i in range(nchunks + 1)],
        1.0 / (4 * nchunks))})
    if len(bs) == 1:
        bs = bs + bs
    out: DataFrame | None = None
    for i in range(len(bs) - 1):
        last = i == len(bs) - 2
        upper = (F.col("_kid") <= bs[i + 1]) if last \
            else (F.col("_kid") < bs[i + 1])
        qrows = (qf.filter((F.col("_kid") >= bs[i]) & upper)
                 .select("_kid", "qv").collect())
        if not qrows:
            continue
        queries = sorted(
            ((int(r["_kid"]), [int(x) for x in r["qv"]]) for r in qrows),
            key=lambda t: t[0])
        part = ivfpq_adc_batch_scan(
            codes, cents, books, queries, nprobe=nprobe, k=k, shift=shift,
            id_col=id_col).select("qid", id_col)
        out = part if out is None else out.unionByName(part)
    return out


def ivfpq_topk(
    emb: DataFrame,
    query_qv: list[int] | None,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    sample_cap: int = 256,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FAISS-shape IVFPQ, end-to-end oracle-replayable: coarse cells
    from the fixed-point Lloyd loop, per-subspace PQ codebooks trained
    on a deterministic strided sample of SHIFTED residuals
    (``ivfpq_residual_books``), the corpus encoded by the fused
    ``ivfpq_codes_struct`` kernel, and query-time ADC where the query's
    residual is taken against EACH PROBED CELL's centroid (one LUT set
    per probed cell). Every quantity end to end is an exact integer:
    training, codes, LUTs and the ranked adc, so the DuckDB oracle
    replays the whole index and the top-k hashes exactly.

    This INLINE composition (train + encode + scan in one query) exists
    as the oracle-anchored contrast row; the production shape persists
    the artifacts once (``ivfpq_encode`` + the centroid/codebook
    tables) and runs only ``ivfpq_adc_scan`` per query — the
    e_ivfpq_codes_topk entry, sharing this function's oracle.

    Returns (id, adc) ordered by (adc, id). None query / empty corpus
    -> empty frame (the vector-family contract).
    """
    aux: dict = {}
    q, cents = kmeans_fit(emb, n_cells, iters, dim, scale, offset,
                          id_col, vec_col, aux=aux)
    empty = q.select(
        F.col("_kid").alias(id_col), F.lit(None).cast("long").alias("adc")
    ).where(F.lit(False))
    if not cents or query_qv is None:
        return empty
    shift = MAX_QUANT
    # sample from the training checkpoint: same rows, no parquet re-scan
    books = ivfpq_residual_books(aux.get("train_ckpt", q), cents, m, ksub,
                                 iters, sample_cap, shift)
    if not books:
        return empty
    codes = _ivfpq_encode_q(q, cents, books, shift, id_col)
    return ivfpq_adc_scan(codes, cents, books, query_qv, nprobe, k, shift,
                          id_col)


# == trained product quantization on the same fixed-point contract ========

def fixedpoint_kmeans_py(pts: list[list[int]], k: int, iters: int) -> list[list[int]]:
    """Pure-Python mirror of the unrolled SQL Lloyd chain over a BOUNDED
    in-memory sample: init = first k points, assign = first-occurrence
    argmin (strict ``<``, matching ``list_indexof``/``array_position``),
    update = per-dim ``sum // count`` with empty-cluster carryover.
    Python ints are arbitrary-precision and ``//`` floors — identical to
    the SQL BIGINT/HUGEINT path on the non-negative domain — so the
    codebooks this returns are bit-identical to what the oracle's CTEs
    derive."""
    cents = [list(p) for p in pts[:k]]
    if not cents:
        return cents
    dim = len(cents[0])
    for _ in range(iters):
        sums = [[0] * dim for _ in cents]
        cnt = [0] * len(cents)
        for p in pts:
            best, bd = 0, None
            for j, c in enumerate(cents):
                d = 0
                for a, b in zip(p, c):
                    d += (a - b) * (a - b)
                if bd is None or d < bd:
                    best, bd = j, d
            cnt[best] += 1
            s = sums[best]
            for di, a in enumerate(p):
                s[di] += a
        cents = [
            [sums[j][di] // cnt[j] for di in range(dim)] if cnt[j] else list(c)
            for j, c in enumerate(cents)
        ]
    return cents


def pq_train_fixedpoint(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    sample_cap: int = 256,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Train M per-subspace codebooks (K codewords each) with the
    fixed-point Lloyd loop over a DETERMINISTIC id-strided sample —
    the whole training, not just the result, is replayable in SQL, so
    an oracle can verify queries against TRAINED codebooks (the r10
    audit's untrained-random recall gap, closed with the oracle kept).

    Sample: ``stride = ceil(n_guarded / cap)`` (computed from the
    guarded-corpus count — the training is a once-at-ingest cost, like
    the FAISS-style samplers in similarity.py), rows with
    ``id % stride == 0`` in id order, capped. The collect is bounded at
    ``sample_cap`` rows by construction; everything after it is pure
    Python integer arithmetic mirrored by the oracle's unrolled CTEs.
    """
    if dim % m:
        # same silent-truncation hazard as ivfpq_residual_books — the
        # tail components would vanish from every subspace on BOTH
        # engines, invisible to parity
        raise ValueError(
            f"pq_train_fixedpoint: dim={dim} not divisible by m={m} — "
            f"the last {dim % m} components would be silently excluded")
    q = quantized_frame(emb, dim, scale, offset, id_col, vec_col)
    n = q.count()
    stride = (n + sample_cap - 1) // sample_cap if n else 1
    rows = (
        q.filter((F.col("_kid") % stride) == 0)
        .orderBy("_kid").limit(sample_cap).select("qv").collect()
    )
    pts = [[int(x) for x in r["qv"]] for r in rows]
    if not pts:
        # [] (falsy), never m empty books — a truthy list of empty
        # codebooks would send callers into len(books[0][0]) crashes
        return []
    sub = dim // m
    books = []
    for mi in range(m):
        slices = [p[mi * sub:(mi + 1) * sub] for p in pts]
        books.append(fixedpoint_kmeans_py(slices, ksub, iters))
    return books


def pq_int_code_exprs(qv_col: str, books: list[list[list[int]]]) -> list[Column]:
    """Per-subspace argmin code columns over the fixed-point vector —
    the integer twin of similarity.pq_encode (exact distances, so no
    fold-order caveats at all). REFERENCE implementation mirroring the
    oracle's CTEs; the execution default is the vectorized
    ``pq_int_codes_vectorized`` (same interpreted-HOF cost argument as
    ``assign_exprs`` vs ``assign_struct``; equality gated in tests)."""
    out = []
    sub = len(books[0][0])
    for mi, book in enumerate(books):
        sl = F.slice(F.col(qv_col), mi * sub + 1, sub)
        book_lit = lit_arr([[int(x) for x in cw] for cw in book], "long")
        # NOTE: a one-parameter lambda only — PySpark maps the lambda's
        # ARITY onto transform's (element[, index]) signature, so a
        # captured-default second parameter would silently bind the int
        # index instead of the closure value
        ds = F.transform(
            book_lit,
            lambda cw: F.aggregate(
                F.zip_with(sl, cw, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        out.append((F.array_position(ds, F.array_min(ds)) - 1)
                   .cast("long").alias(f"_code{mi}"))
    return out


def pq_int_codes_vectorized(qv_col: str, books: list[list[list[int]]]) -> Column:
    """``array<long>`` of the M per-subspace argmin codes, vectorized —
    the Arrow-batched twin of ``pq_int_code_exprs`` (same associative-
    integer argument as ``assign_struct``; equality gated in
    tests/test_clustering.py)."""
    # worst kernel term on the shifted-residual domain is 2*s.b <=
    # 2*sub*(2*MAX_QUANT)^2 — the 2x is folded in by checking 2*sub
    _check_quant_dim(2 * len(books[0][0]))
    mats = [np.asarray([[int(x) for x in cw] for cw in book], dtype=np.int64)
            for book in books]
    sub = len(books[0][0])

    @pandas_udf("array<long>")
    def _codes(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="object")
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qv])
        out = np.empty((len(v), len(mats)), dtype=np.int64)
        for mi, bm in enumerate(mats):
            s = v[:, mi * sub:(mi + 1) * sub]
            d = ((s * s).sum(axis=1)[:, None] - 2 * (s @ bm.T)
                 + (bm * bm).sum(axis=1)[None, :])
            out[:, mi] = d.argmin(axis=1)
        return pd.Series(list(out))

    return _codes(F.col(qv_col))


def pq_adc_int_topk(
    emb: DataFrame,
    query_qv: list[int],
    books: list[list[list[int]]],
    k: int = 10,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k under trained integer codebooks: encode (vectorized
    argmin per subspace), then sum M LUT lookups of EXACT integer
    query-to-codeword distances — ties impossible to misorder across
    engines since every adc value is integral. (id, adc) ordered by
    (adc, id)."""
    q = quantized_frame(emb, dim, scale, offset, id_col, vec_col)
    codes = (
        q.select("_kid", pq_int_codes_vectorized("qv", books).alias("_codes"))
        .select("_kid",
                *[F.element_at("_codes", mi + 1).alias(f"_code{mi}")
                  for mi in range(len(books))])
    )
    sub = len(books[0][0])
    luts = []
    for mi, book in enumerate(books):
        qs = query_qv[mi * sub:(mi + 1) * sub]
        luts.append([sum((a - b) * (a - b) for a, b in zip(qs, cw)) for cw in book])
    adc = F.element_at(lit_arr([int(x) for x in luts[0]], "long"),
                       (F.col("_code0") + 1).cast("int"))
    for mi in range(1, len(books)):
        adc = adc + F.element_at(
            lit_arr([int(x) for x in luts[mi]], "long"),
            (F.col(f"_code{mi}") + 1).cast("int"))
    return (
        codes.select(F.col("_kid").alias(id_col), adc.alias("adc"))
        .orderBy("adc", id_col)
        .limit(k)
    )
