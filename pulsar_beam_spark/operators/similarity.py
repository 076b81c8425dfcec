"""Approximate-nearest-neighbor similarity search over an embedding column.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline and
  the DuckDB-oracle-checkable form. Distributed: per-partition partial
  top-k via the sort/limit Catalyst already does (TakeOrderedAndProject),
  no driver-side loop.
- ``hyperplane_lsh_topk``: the scale path — random-hyperplane signatures
  bucket vectors; only the query's bucket neighborhood (exact bucket +
  optional multi-probe hamming<=1) is scanned. Buckets are a plain
  equi-join, so 100 TB of vectors shuffle once by bucket and the probe
  touches a ~2^-bits fraction of the corpus.

Hyperplanes are generated from a seeded NumPy RNG on the driver and
shipped as *literal* plan constants (they are tiny: bits x dim doubles) —
no broadcast variable or Python closure in the executors' hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.litarr import lit_arr
from ..functions.vector import cosine_sim, valid_vector


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    ORDER BY + LIMIT lowers to TakeOrderedAndProject: each partition keeps
    k rows, the driver merges partition winners — no global sort shuffle.

    Invalid corpus vectors (NULL / non-finite / zero-norm — see
    functions.vector.valid_vector) are dropped: a single zero-norm row
    would abort the whole scan with ANSI DIVIDE_BY_ZERO.

    Ranks on the UNROUNDED cosine (vec_id tiebreak), rounding only in
    the final projection — the same convention as mips_topk and the
    recall audit, and the one COSINE_TOPK_ORACLE uses. The round-11
    boundary probe showed the old rounded-rank form diverging from the
    oracle whenever two cosines within 1e-6 straddle the k-th slot:
    rounding manufactures a tie the raw order doesn't have, and the
    vec_id tiebreak then picks a different member than the oracle's raw
    ORDER BY (both engines compute bit-identical doubles via the
    sequential fold, so the raw order itself is parity-exact).
    """
    emb = emb.filter(valid_vector(vec_col))
    q = lit_arr([float(x) for x in query_vec]).cast("array<double>")
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            cosine_sim(F.col(vec_col), q).alias("_cos_raw"),
        )
        .orderBy(F.col("_cos_raw").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round(F.col("_cos_raw"), 6).alias("cosine"))
    )


def mips_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by INNER PRODUCT to a constant query vector — the
    retrieval metric for unnormalized embeddings (recommendation scores,
    learned rerankers) where cosine's normalization is wrong.

    Same execution shape as brute_force_topk: a codegen'd per-row fold,
    ORDER BY + LIMIT lowered to TakeOrderedAndProject (per-partition
    top-k, driver merge — no global sort shuffle, no join). For an
    index-accelerated variant at 100 TB, the standard norm-augmentation
    reduction applies: append sqrt(M^2 - ||v||^2) to each vector (M =
    max norm) and the query's MIPS order equals cosine order in the
    augmented space, so ivf_topk / hyperplane_lsh_topk serve MIPS with
    no new index machinery.

    Same invalid-vector drop as brute_force_topk (uniform family domain;
    a zero-norm vector is valid for a raw inner product but carries no
    signal, and one rule across the family keeps the contract simple).
    """
    emb = emb.filter(valid_vector(vec_col))
    q = lit_arr([float(x) for x in query_vec]).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), q, lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    # Order by the UNROUNDED dot (vec_id tiebreak) so a near-tie at the
    # k-th boundary can't flip membership vs the oracle's ORDER BY on the
    # raw inner product; round only in the final projection.
    return (
        emb.select(F.col(id_col).alias("vec_id"), dot.alias("_dot_raw"))
        .orderBy(F.col("_dot_raw").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round(F.col("_dot_raw"), 6).alias("dot"))
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def _signature_expr(vec_col: str, planes: np.ndarray):
    """Bit-pack sign(v . plane_i) into a long, all in JVM expressions."""
    bits_exprs = []
    for i, plane in enumerate(planes):
        const = lit_arr([float(x) for x in plane])
        d = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), const, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits_exprs.append(F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits_exprs[0]
    for e in bits_exprs[1:]:
        out = out + e
    return out


def _kmeans_centroids(
    emb: DataFrame, id_col: str, vec_col: str, n_centroids: int, seed: int,
    sample_cap: int = 256, iters: int = 8, n_hint: int | None = None,
) -> np.ndarray:
    """Train a coarse quantizer on a deterministic driver-side sample.

    At 100 TB you train the IVF coarse quantizer on a tiny sample anyway
    (FAISS-style); only the *assignment* has to be distributed. The sample
    here is id-strided (deterministic across partitionings, unlike
    ``df.sample``), capped at ``sample_cap`` vectors.

    ``n_hint`` lets callers that know the corpus size (parquet footer
    metadata via ``sources.tables.table_rowcount``) skip the count()
    job — the stride only needs the order of magnitude, and a full scan
    to learn it is the exact anti-pattern at 100 TB.
    """
    n = n_hint if n_hint is not None else emb.count()
    # CEILING division: a floored stride (e.g. 2000 // 1024 = 1) makes
    # the id-strided candidate set larger than sample_cap and the
    # .limit() below then truncates to the table's HEAD — the sample
    # silently covers only a prefix of the corpus and every cluster
    # living in the tail goes untrained (round-9 planted-cluster gate:
    # half the clusters uncovered, cell radii blown to inter-cluster
    # angles, cell-pair pruning dead at 86% survival). Ceil keeps the
    # stride spanning the whole id range.
    stride = max(1, -(-n // sample_cap))
    rows = (
        # invalid vectors carry no geometry: excluded from the training
        # sample (a NULL row crashed list(); a NaN component would poison
        # every centroid the numpy iterations touch)
        emb.filter(((F.col(id_col) % stride) == 0) & valid_vector(vec_col))
        .select(vec_col)
        .limit(sample_cap)
        .collect()
    )
    if not rows:
        return np.empty((0, 0))
    pts = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    pts = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(pts))
    # Farthest-point (maximin) seeding instead of a random draw: every
    # natural cluster in the sample gets a seed before any cluster gets
    # two, which is what the MAX-radius cell blocking in
    # dedup.embedding_near_dup_pairs needs — one uncovered cluster
    # assigns its vectors to a far cell, blows that cell's radius to
    # the inter-cluster angle, and that single wide cell pairs with
    # everything (round-9 planted-cluster gate: random init left 86% of
    # cell pairs alive where maximin prunes to a few percent).
    # `seed` picks the maximin START point (ADVICE r09: a dead rng made
    # every seed identical while the signature promised seed-controlled
    # variants) — maximin coverage holds from any start, so distinct
    # seeds give genuinely distinct (all deterministic) quantizers.
    start = int(np.random.default_rng(seed).integers(len(pts)))
    cent = np.empty((k, pts.shape[1]))
    cent[0] = pts[start]
    maxcos = pts @ cent[0]
    for j in range(1, k):
        cent[j] = pts[int(np.argmin(maxcos))]
        maxcos = np.maximum(maxcos, pts @ cent[j])
    for _ in range(iters):
        # cosine k-means on the unit sphere: assign by max dot, re-mean, renormalize
        assign = np.argmax(pts @ cent.T, axis=1)
        for j in range(len(cent)):
            members = pts[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _seq_dot(a, b) -> float:
    """Sequential left-fold dot product — bit-matches ``F.aggregate`` on
    the executors and ``list_reduce`` in the DuckDB oracle (a BLAS dot can
    round differently near a probe-ranking tie and flip the probe set)."""
    d = 0.0
    for x, y in zip(a, b):
        d += float(x) * float(y)
    return d


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_hint: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into ``n_centroids``
    inverted lists, scan only the ``nprobe`` lists nearest the query, then
    exact-cosine rank within them.

    The assignment (argmax dot over centroids) is pure JVM expressions —
    ``array_position(dots, array_max(dots))`` — so at scale the cell id can
    be precomputed once and used as a partition column; the probe is then
    partition pruning, not a scan.

    ``centroids`` overrides the trained coarse quantizer with caller-fixed
    literal centroids. That makes the whole approximation deterministic
    plan constants, so a DuckDB oracle can recompute assignment + probe +
    top-k exactly (the e_centroid_assign strategy; VERDICT r05 item 1c).
    """
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        cent = _kmeans_centroids(emb, id_col, vec_col, n_centroids, seed, n_hint=n_hint)
    # rank cells by dot(c_i, q) with a sequential fold (oracle-matchable);
    # q's norm is a shared positive factor, so no normalization needed
    probe_ids = sorted(
        range(len(cent)), key=lambda i: (-_seq_dot(cent[i], query_vec), i)
    )[:nprobe]

    v = F.col(vec_col).cast("array<double>")
    # argmax_c (v.c / ||v||) == argmax_c (v.c): the norm is a shared
    # positive factor, so skip it — one fewer fold per row in the
    # assignment expression (the per-row hot path).
    # transform over ONE nested literal instead of n_centroids unrolled
    # folds: same element values in the same order (array_position /
    # array_max see an identical array), but the tree is built in a
    # handful of py4j calls instead of n*dim (round-14, guide §7.3).
    dots = F.transform(
        lit_arr([[float(x) for x in c] for c in cent]),
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    cell = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    # invalid vectors (NULL/non-finite/zero-norm) never enter a cell:
    # their NaN dots make argmax engine-dependent and their cosine
    # aborts the ANSI rank stage
    probed = (
        emb.filter(valid_vector(vec_col))
        .withColumn("__cell", cell)
        .filter(F.col("__cell").isin(probe_ids))
    )
    q = lit_arr([float(x) for x in query_vec]).cast("array<double>")
    return (
        probed.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def hyperplane_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: scan only vectors whose LSH bucket is within
    ``multiprobe_hamming`` of the query's bucket, then exact-cosine rank.

    Recall is tested against ``brute_force_topk`` in tests (tolerance
    contract, SURVEY.md §5.2 — approx operators are recall-checked, not
    hash-matched).
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    # query signature via the SAME sequential IEEE fold the engine-side
    # signature uses (F.aggregate; DuckDB's list_reduce in the oracle) —
    # a BLAS dot can round differently near zero and flip a bucket bit
    qsig = 0
    for i, plane in enumerate(planes):
        d = 0.0
        for x, y in zip(query_vec, plane):
            d += float(x) * float(y)
        if d > 0:
            qsig |= 1 << i
    sig = _signature_expr(vec_col, planes)
    # same invalid-vector drop as the IVF path: a NaN dot's sign bit is
    # engine-dependent (Python says NaN > 0 is False; both SQL engines
    # say True), so invalid vectors never receive a signature
    bucketed = emb.filter(valid_vector(vec_col)).withColumn("__bucket", sig)
    probed = bucketed.filter(F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qsig))) <= multiprobe_hamming)
    q = lit_arr([float(x) for x in query_vec]).cast("array<double>")
    return (
        probed.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def pq_adc_topk(
    emb: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN top-k with asymmetric distance (ADC) —
    the memory-side scale technique the IVF/LSH entries don't cover:
    each vector is compressed to M subspace code bytes against fixed
    codebooks, and query time touches only an M x K lookup table of
    query-to-codeword distances (FAISS's IndexPQ search shape).

    ``codebooks`` is M lists of K codewords (each ``dim/M`` floats).
    Encoding is pure JVM expressions over literal codewords —
    ``array_position(dists, array_min(dists))`` per subspace, each
    distance a sequential left-fold of squared differences (bit-matching
    ``list_reduce`` in a SQL oracle) — so at scale the codes are
    computed once at ingest and persisted as M tinyint columns: the
    scan then reads M bytes per vector instead of the full float array
    (dim/M * 32 / 8 = 32x compression at dim=64, M=8), and the ADC scan
    is M array lookups + an M-term add chain per row, no float vector
    IO at all. The LUT is M*K doubles computed driver-side from the
    (already driver-held) query vector with the same left-fold, so
    Spark, Python and the oracle agree bit-for-bit.

    Approximation contract: like ivf_topk's fixed-centroid entry, the
    result is exactly determined by the literal codebooks — the oracle
    recomputes codes and ADC from the same literals; recall-vs-brute
    depends on codebook quality and is the caller's training concern.
    """
    return pq_adc_scan(
        pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col),
        query_vec, codebooks, k=k, id_col=id_col,
    )


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ingest-side half of the PQ pipeline: compress each vector to M
    subspace code bytes — ``(id, _code0.._code{M-1} tinyint)`` — against
    the literal codebooks. Run ONCE and persisted (parquet), this is the
    32x-compression scan artifact the docstring above promises: the
    query-time path (``pq_adc_scan``) then reads M bytes per vector and
    never touches the float array.

    Encoding is M x K sequential folds over the subspace slices. Two
    rejected alternatives, measured: expanding to element_at add-chains
    (~10k scalar expression nodes) falls out of whole-stage codegen and
    runs ~2x SLOWER interpreted; numpy GEMM encoding would be fastest
    but breaks the bit-exact SQL-oracle contract (BLAS sum order). The
    fold form is the fastest hash-checkable shape. Invalid vectors are
    dropped here (same valid_vector contract as every ANN operator), so
    a persisted codes table contains only scorable rows.
    """
    sub_dim = len(codebooks[0][0])

    # Round-14: one ``transform`` over a nested codeword literal per
    # subspace instead of K unrolled fold expressions. The distance
    # array has the same K elements in the same order (identical
    # sequential folds, identical argmin), so codes and oracle hashes
    # are untouched — but the tree is built in ~10 py4j calls per
    # subspace instead of ~K * sub_dim (measured 6.8 s -> <0.3 s of
    # driver time per query; guide §7.3 — large plans are driver-side
    # serial cost). Execution also sheds K-1 redundant slice() evals
    # per row: the old form recomputed the subspace slice inside every
    # codeword's fold.
    code_cols = []
    def _dists(book, sub):
        # NOTE: one-parameter lambda only — F.transform maps lambda
        # ARITY onto (element, index), so a captured-default second
        # parameter would silently bind the int index (see
        # clustering.pq_int_code_exprs). Closure via def instead.
        return F.transform(
            lit_arr([[float(x) for x in cw] for cw in book]),
            lambda cw: F.aggregate(
                F.zip_with(sub, cw,
                           lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )

    for mi, book in enumerate(codebooks):
        ds = _dists(book, F.slice(F.col(vec_col), mi * sub_dim + 1, sub_dim))
        code_cols.append(
            (F.array_position(ds, F.array_min(ds)) - 1)
            .cast("tinyint").alias(f"_code{mi}"))
    return emb.filter(valid_vector(vec_col)).select(F.col(id_col), *code_cols)


def pq_adc_scan(
    codes: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query-time half: asymmetric-distance top-k over (possibly
    persisted) PQ codes. The LUT is M*K doubles computed driver-side
    from the (already driver-held) query vector with the same
    sequential left-fold the SQL oracle uses (0.0 + d1 + d2 ... —
    bit-matching ``list_reduce``), so Spark, Python and the oracle
    agree bit-for-bit. The plan is M array lookups + an M-term add
    chain per row into TakeOrderedAndProject — zero shuffles, no float
    vector IO, and (unlike the inline-encode path) no M x K x sub_dim
    literal expression tree for Catalyst to analyze per query.
    """
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    lut = []
    for mi, book in enumerate(codebooks):
        qs = [float(x) for x in query_vec[mi * sub_dim:(mi + 1) * sub_dim]]
        row = []
        for cw in book:
            d = 0.0
            for a, bq in zip(qs, cw):
                d = d + (a - float(bq)) * (a - float(bq))
            row.append(d)
        lut.append(row)

    adc = F.element_at(lit_arr(lut[0]),
                       F.col("_code0").cast("int") + 1)
    for mi in range(1, m):
        adc = adc + F.element_at(
            lit_arr(lut[mi]),
            F.col(f"_code{mi}").cast("int") + 1)
    return (
        codes.select(F.col(id_col), F.round(adc, 6).alias("pq_dist"))
        .orderBy("pq_dist", id_col)
        .limit(k)
    )
