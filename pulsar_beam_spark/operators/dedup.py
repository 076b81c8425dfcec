"""Deduplication operators for large-scale corpus curation.

Five strategies, all expressed as distributed DataFrame plans (no driver
collect; every stage is a shuffle-bounded Spark job that scales to the
full corpus):

- exact (latest-per-key window dedup) — also G8's changelog->snapshot
  materialization (reference src/db/pulsardb.go:86-127 reads a compacted
  topic last-write-wins; we express it relationally).
- exact n-gram Jaccard pairs (the *oracle-checkable* ground truth for
  near-dup; quadratic per shared shingle, so use on samples/buckets).
- MinHash + LSH banding (the scale path: linear in corpus size, one
  shuffle per stage — shingle explode, per-doc signature agg, band bucket
  join). Candidates are verified with exact Jaccard afterwards.
- SimHash (64-bit; hamming-distance pairs within LSH-ish prefix buckets).
- embedding cosine near-dup (pairwise over a bucketed join).

All hashing uses Spark built-ins (xxhash64 / hash) inside whole-stage
codegen; nothing crosses to Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import exploded_nonnull, shingles, tokens
from ..functions.vector import cosine_sim, valid_vector

# Mersenne prime 2^31-1: keeps a*h+b < 2^62 (ANSI-overflow-safe in one
# 64-bit multiply) while giving a decent universal hash family.
_MERSENNE = (1 << 31) - 1


def exact_dedup_latest(df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: str) -> DataFrame:
    """Keep the single latest row per key (row_number over desc order).

    Reference parity: compacted-topic last-write-wins materialization,
    src/db/pulsardb.go:92-96 (ReadCompacted) — SURVEY.md G8/R29.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), F.col(tiebreak).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def doc_shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the exploded set
    representation used by the exact-Jaccard pair discovery self-join."""
    from ..sources.tables import spread_small_input

    return exploded_nonnull(
        spread_small_input(docs), [F.col(id_col).alias("id")],
        shingles(tokens(text_col), n), "shingle",
    ).distinct()


def doc_shingle_arrays(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle-set-as-array) — the per-row set representation.

    Shingle sets are per-document, so they never need a shuffle:
    ``array_distinct`` builds the set inside the row. Signature
    computation, set sizes, and candidate verification all read this —
    at 100 TB that's 3 narrow scans instead of 3 explode+distinct
    shuffles. Document arrays are bounded by document length, so row
    width stays sane.
    """
    from ..sources.tables import spread_small_input

    return spread_small_input(docs).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(tokens(text_col), n)).alias("shset"),
    )


def exact_jaccard_pairs(docs: DataFrame, threshold: float, id_col: str = "doc_id", text_col: str = "text", n: int = 3, max_df: int | None = None) -> DataFrame:
    """All doc pairs (a < b) with shingle-set Jaccard >= threshold.

    Plan: explode to (id, shingle), self-join on shingle (co-partitioned
    by shingle — only docs *sharing* a shingle ever meet, so the join is
    output-bound, not |D|^2), count intersections, join per-doc set sizes
    (broadcast-able aggregate), derive |union| = |A|+|B|-|A∩B|.

    ``max_df`` is the hot-shingle guard (stop-shingle cut): shingles
    appearing in more than ``max_df`` documents are dropped from BOTH the
    intersection pairing and the set sizes, so jaccard is measured over
    the non-boilerplate shingle space. The capped plan changes SHAPE,
    not just filters: it aggregates posting lists (one shuffle of the
    (id, shingle) relation instead of the uncapped plan's two), applies
    the cap as a free array-size filter, and explodes (a < b) pairs
    from each list — per-shingle work bounded by max_df^2 by
    construction, so discovery is linear in distinct shingles no matter
    how posting lists densify with corpus growth. Pick max_df as f*N
    for the standard fractional cut (the caller knows N); near-dup
    pairs are discriminated by their RARE shingles, so the cut costs
    little recall. None (default) preserves the exact all-shingles
    semantics (the LSH verify path depends on it).
    """
    # deliberately NOT cached: the set is read twice (sizes + self-join)
    # but recomputing a projection+explode is cheaper than pinning executor
    # memory for the rest of the session (a leaked cache() here showed up
    # as multi-second latency on *subsequent* queries in bench runs)
    sets = doc_shingle_sets(docs, id_col, text_col, n)
    if max_df is not None:
        posting = (
            sets.groupBy("shingle")
            .agg(F.array_sort(F.collect_set("id")).alias("ids"))
            .filter(F.size("ids") <= max_df)
        )
        # sizes AND pairs both derive from the capped posting lists (the
        # two branches share the aggregate subtree -> one exchange), so
        # set sizes are df-consistent with the intersections
        sizes = (
            posting.select(F.explode("ids").alias("id"))
            .groupBy("id").agg(F.count("*").alias("set_size"))
        )
        inter = (
            posting.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x, i: F.transform(
                                F.slice(F.col("ids"), i + 2, F.size("ids")),
                                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                            ),
                        )
                    )
                ).alias("p")
            )
            .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
            .withColumn("jaccard", F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )
    # sizes reuses the SAME exploded subtree as the self-join below, so
    # AQE's ReusedExchange computes the explode+distinct shuffle once
    # (a per-row array_distinct variant measured ~25% slower at sf0.1:
    # it broke the reuse and re-tokenized every document)
    sizes = sets.groupBy("id").agg(F.count("*").alias("set_size"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(docs: DataFrame, threshold: float, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """All doc pairs (a < b) with shingle-set CONTAINMENT
    |A∩B| / min(|A|,|B|) >= threshold — the asymmetric near-dup measure:
    a short doc fully embedded in a long one scores ~1.0 here but low
    Jaccard (the union is dominated by the long doc), so containment
    catches subset/quote duplication that Jaccard misses.  Same
    output-bound shared-shingle join plan as ``exact_jaccard_pairs``.
    """
    sets = doc_shingle_sets(docs, id_col, text_col, n)
    sizes = sets.groupBy("id").agg(F.count("*").alias("set_size"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn("containment", F.col("inter") / F.least("size_a", "size_b"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash parameters (no RNG dependency —
    derived from a fixed multiplicative sequence so resume/replay is stable)."""
    params = []
    a, b = seed * 2 + 1, seed + 7
    for _ in range(num_hashes):
        a = (a * 1103515245 + 12345) % _MERSENNE
        b = (b * 69069 + 1) % _MERSENNE
        params.append((a or 1, b))
    return params


# The engine-portable hash family: xxhash64 is Spark-private, so the
# cross-engine-checkable MinHash variant derives everything from md5
# (bit-identical in Spark, DuckDB, Python — the same portability argument
# as operators/sampling.py's stable bucketing).  The hash space is the
# Mersenne prime 2^31-1 so (a*h + b) stays < 2^62: EXACT in 64-bit
# integers in every engine — no wraparound semantics to reproduce.
_P31 = 2_147_483_647  # 2^31 - 1
_HEX15 = 15  # md5 prefix length: 60 bits, safely inside BIGINT


def _hash_params31(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """(a, b) pairs in [1, 2^31-1) — same LCG recurrence as
    ``_hash_params`` reduced to the portable 31-bit space."""
    params = []
    a, b = seed * 2 + 1, seed + 7
    for _ in range(num_hashes):
        a = (a * 1103515245 + 12345) % _P31
        b = (b * 69069 + 1) % _P31
        params.append((a or 1, b))
    return params


def _portable_hash31(col) -> "F.Column":
    """md5-prefix hash of a string column into [0, 2^31-1) — identical in
    DuckDB as ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 2147483647``."""
    hex_prefix = F.substring(F.md5(col.cast("binary")), 1, _HEX15)
    return F.pmod(F.conv(hex_prefix, 16, 10).cast("long"), F.lit(_P31))


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
    portable: bool = False,
    arrays: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature as ``array<bigint>`` of length num_hashes.

    One explode + one groupBy (map-side partial min) — the signature of a
    100 TB corpus is a single shuffle of per-doc PARTIAL MINS (32 longs
    per doc per mapper), not of the shingles themselves.
    (A row-local array formulation — 32 × transform+array_min per row —
    measured ~70% slower at sf0.1: per-document array allocations lose to
    the codegen'd incremental min over exploded rows. And the previous
    explode→distinct() formulation paid a full extra shuffle of the
    (id, shingle-string) rows just to dedup within doc — row-local
    array_distinct does that for free in the scan projection.)

    ``arrays`` (r15, guide §5): a precomputed ``doc_shingle_arrays``
    frame — (id, shset) — to derive the signatures from. The candidate-
    verify pipelines need the shingle arrays anyway; passing the SAME
    (checkpointed) frame here means the corpus is tokenized+shingled
    once per query instead of once per consumer. Values are identical by
    construction (the default path builds the same frame inline).
    """
    from ..sources.tables import spread_small_input

    if arrays is None:
        arrays = doc_shingle_arrays(spread_small_input(docs), id_col, text_col, n)
    sets = exploded_nonnull(arrays, ["id"], F.col("shset"), "shingle")
    if portable:
        # cross-engine-checkable variant: md5-based base hash and 31-bit
        # parameters keep every product exact in 64-bit — a DuckDB oracle
        # recomputes these signatures bit-for-bit (queries.py
        # d_minhash_lsh_near_dup)
        h = _portable_hash31(F.col("shingle"))
        params = _hash_params31(num_hashes, seed)
        modulus = _P31
    else:
        h = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE))
        params = _hash_params(num_hashes, seed)
        modulus = _MERSENNE
    hashed = sets.select("id", h.alias("h"))
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(modulus))).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("signature"))


def _band_buckets(signatures: DataFrame, bands: int, sig_len: int,
                  portable: bool = False) -> DataFrame:
    """(id, band, bucket) rows: the signature split into ``bands`` bands,
    each band hashed to one bucket value."""
    rows_per_band = sig_len // bands or 1

    def band_hash(b):
        joined = F.concat_ws(",", F.transform(
            F.slice("signature", b * rows_per_band + 1, rows_per_band),
            lambda x: x.cast("string")))
        if portable:
            return _portable_hash31(joined)
        return F.xxhash64(joined)

    return signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), band_hash(b).alias("bucket")),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 8, sig_len: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands, bucket on
    the band hash, emit candidate pairs that collide in >= 1 band.

    The band-bucket self-join is an equi-join on (band, bucket) — shuffled
    once, output-bound. Distinct() collapses multi-band collisions.
    Pass ``sig_len`` when known (the pipeline does) to avoid an extra
    signature-probing job.
    """
    if sig_len is None:
        sig_len_row = signatures.select(F.size("signature").alias("s")).head()
        sig_len = sig_len_row["s"] if sig_len_row else 0
    banded = _band_buckets(signatures, bands, sig_len, portable=portable)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: candidates from banding, then
    *exact* Jaccard verification of candidates only (the standard
    candidate-verify pattern; verification cost is |candidates|, not |D|^2).

    The (id, shingle-set) frame is computed ONCE and localCheckpointed
    (r15, guide §5): signatures, the verify join's a-side and its b-side
    all read the materialized arrays instead of re-tokenizing the corpus
    — previously the tokenize+shingle projection ran three times per
    query (once in the signature explode, once per self-join side; the
    narrow subtree has no exchange, so nothing was reused). At cluster
    scale this is the same discipline as embedding_near_dup's assigned
    checkpoint: corpus-sized, executor-local, rebuilt per query.
    """
    arrs = doc_shingle_arrays(docs, id_col, text_col, n).localCheckpoint(eager=False)
    sigs = minhash_signatures(docs, num_hashes, id_col, text_col, n,
                              portable=portable, arrays=arrs)
    cand = minhash_lsh_candidates(sigs, bands, sig_len=num_hashes, portable=portable)
    # verification joins the candidate pairs against per-doc shingle
    # ARRAYS (computed once per doc per side): intersection is
    # array_intersect inside the row — no explode, no groupBy.
    # (Alternative measured and rejected: joining raw text and building
    # shingles per candidate pair ran ~2x slower at sf0.1 — the shingle
    # expressions land in the post-join projection where they evaluate
    # row-at-a-time over wide joined rows instead of in the scan-side
    # columnar projection.)
    sa = arrs.select(F.col("id").alias("id_a"), F.col("shset").alias("set_a"))
    sb = arrs.select(F.col("id").alias("id_b"), F.col("shset").alias("set_b"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("set_a") + F.size("set_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              bits: int = 63, portable: bool = False) -> DataFrame:
    """Per-doc SimHash: sum +/-1 per bit of each token's xxhash64, sign ->
    bit. 63 bits (bit 63 would overflow the signed accumulator). One
    explode + one groupBy with ``bits`` partial-agg sums.

    ``portable=True`` swaps the token hash for the md5-prefix hash
    (bit-identical in DuckDB/Python) whose 15 hex chars carry 60 usable
    bits — callers should pass ``bits<=60``; the cross-engine oracle in
    queries.py recomputes the signatures exactly."""
    from ..sources.tables import spread_small_input

    tok = exploded_nonnull(
        spread_small_input(docs), [F.col(id_col).alias("id")], tokens(text_col), "tok"
    )
    if portable:
        token_hash = F.conv(
            F.substring(F.md5(F.col("tok").cast("binary")), 1, _HEX15), 16, 10
        ).cast("long")  # [0, 2^60): every bit b < 60 well-defined
    else:
        token_hash = F.xxhash64("tok")
    h = tok.select("id", token_hash.alias("h"))
    sums = [
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = h.groupBy("id").agg(*sums)
    sim = agg.select(
        "id",
        sum(
            [F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")) for b in range(bits)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 8,
                           prefix_bits: int = 12,
                           portable: bool = False) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, bucketed by the top
    ``prefix_bits`` bits so the pairwise check never goes quadratic in |D|
    (docs differing in the prefix are assumed non-dups — the standard
    multi-probe tradeoff)."""
    bits = 60 if portable else 63
    sims = simhash64(docs, bits=bits, portable=portable)
    bucketed = sims.withColumn("bucket", F.shiftright(F.col("simhash"), bits - prefix_bits))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("hamming", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming")
    )


def embedding_near_dup_all_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact all-pairs embedding-cosine near-dup (a < b, cosine >=
    threshold) — the quadratic ground-truth path, analogous to
    exact_jaccard_pairs: use on samples/buckets only, never a full corpus.
    """
    # invalid vectors (NULL / non-finite / zero-norm) cannot be
    # near-duplicates of anything: NULL cosine is excluded by the
    # threshold on both engines, but a zero norm ABORTS Spark's ANSI
    # division and a NaN component passes the >= threshold filter on
    # both SQL engines (NaN > t is true there) while numpy-side
    # prefilters disagree — dropped up front (family contract,
    # functions.vector.valid_vector)
    emb = emb.filter(valid_vector(vec_col))
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim("va", "vb"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    n_hint: int | None = None,
    prune_stats: dict | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine >= threshold) via
    EXACT cell-pair blocking — candidate-verify, never a nested-loop |D|^2.

    Hyperplane-LSH bucketing (similarity.hyperplane_lsh_topk's signature)
    was evaluated and rejected for this operator: at moderate thresholds
    (0.4 => pair angle ~66 deg vs ~90 deg for random pairs) the sign-sketch
    has almost no gap to amplify, so any banding loses true pairs and the
    all-pairs oracle goes red. Cell blocking keeps the oracle exact:

    1. Train ~n_centroids spherical k-means centroids on a driver-side
       sample (FAISS-IVF style; shared with similarity.ivf_topk).
    2. Assign each vector its nearest cell (pure JVM argmax expressions)
       and compute each cell's angular radius r_i = max angle(v, c_i)
       (one groupBy).
    3. Candidate CELL pairs: (i, j) with angle(c_i, c_j) <= r_i + r_j +
       arccos(threshold) — by the spherical triangle inequality any
       vector pair with angle <= arccos(threshold) lives in such a cell
       pair, so pruning is LOSSLESS (float slack 1e-6 rad).
    4. Broadcast the tiny cell-pair list, equi-join both sides on cell
       (a.id < b.id), row-local exact cosine filter.

    Pruning power is data-dependent: clustered corpora (the real near-dup
    case) drop most cell pairs; adversarially uniform data degrades to a
    *blocked, shuffle-partitioned* all-pairs — still never a single-task
    BroadcastNestedLoopJoin (plan-asserted in tests/test_plans.py). At
    100 TB: grow n_centroids ~ sqrt(n) so cells stay bounded, precompute
    the cell id as a partition column, and raise the threshold to the
    near-dup regime (>=0.9) where pruning is near-total.

    Both halves of that claim are MEASURED, not asserted: the round-9
    sf10 probe confirmed isotropic data at a bulk-tail threshold is
    output-bound all-pairs (BASELINE.md "Round-9: sf1 -> sf10",
    adjudication), and tests/test_operators.py's planted-cluster gate
    pins that on duplicate-clustered data the cell-pair survival
    fraction actually prunes (``prune_stats`` out-param: the caller's
    dict gains n_cells / cell_pairs_survived / cell_pairs_total) while
    the output stays exactly equal to the all-pairs ground truth.
    """
    import math

    import numpy as np

    from .similarity import _kmeans_centroids

    spark = emb.sparkSession
    # same invalid-vector contract as the all-pairs path: a None row
    # crashes the GEMM assignment, and a NaN component propagates
    # NaN -> Arrow NULL through the angle column, so the cell radius
    # aggregates to NULL and the cell-pair pruning crashes on None
    # arithmetic (round-8 float-extremes sweep)
    emb = emb.filter(valid_vector(vec_col))
    # sample scales with the requested cell count: training k centroids
    # from a fixed 256-point sample leaves clusters unrepresented at
    # k > 64ish, and every vector of an unrepresented cluster lands in
    # some other cell at a wide angle, blowing that cell's radius and
    # killing the pruning (found by the round-9 planted-cluster gate:
    # 32% cell-pair survival at k=256/sample=256 vs ~N/k^2 with the
    # scaled sample). Unchanged at the default k=16 (max picks 256).
    cent = _kmeans_centroids(
        emb, id_col, vec_col, n_centroids, seed,
        sample_cap=max(256, 4 * n_centroids), n_hint=n_hint,
    )
    if cent is None or not len(cent):
        return emb.select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)

    import pandas as pd

    # Cell assignment is a numpy GEMM inside mapInPandas (one Arrow pass
    # over the vectors) rather than n_centroids interpreted fold
    # expressions per row — assignment only picks the BLOCKING, so a
    # last-ulp argmax tie going either way is still lossless as long as
    # radii are computed from the same assignment (they are: the angle
    # travels with the row).
    def _assign_batches(pdfs):
        for pdf in pdfs:
            if pdf.empty:
                yield pd.DataFrame({"id": pd.Series(dtype="int64"),
                                    "v": pd.Series(dtype="object"),
                                    "cell": pd.Series(dtype="int32"),
                                    "angle": pd.Series(dtype="float64")})
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.maximum(np.linalg.norm(V, axis=1), 1e-12)
            sims = (V / nrm[:, None]) @ cent.T
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(),
                "v": list(V),
                "cell": sims.argmax(axis=1).astype("int32"),
                "angle": np.arccos(np.clip(sims.max(axis=1), -1.0, 1.0)),
            })

    # localCheckpoint (lazy): assignment feeds the radii collect AND both
    # replication sides; checkpointing materializes it once without the
    # session-lifetime executor-memory pin of cache() (a leaked cache here
    # showed up as latency on SUBSEQUENT queries in round-1 bench runs).
    # At cluster scale persist to a table (cells double as the partition
    # column) instead.
    from ..sources.tables import spread_small_input

    assigned = spread_small_input(emb.select(id_col, vec_col)).mapInPandas(
        _assign_batches, "id long, v array<double>, cell int, angle double"
    ).localCheckpoint(eager=False)

    # per-cell angular radius (tiny: one row per cell)
    radii = {
        r["cell"]: r["r"]
        for r in assigned.groupBy("cell").agg(F.max("angle").alias("r")).collect()
    }
    theta_t = math.acos(max(min(threshold, 1.0), -1.0))
    cos_cc = np.clip(cent @ cent.T, -1.0, 1.0)
    cell_pairs = [
        (int(i), int(j))
        for i in radii
        for j in radii
        if math.acos(cos_cc[i, j]) <= radii[i] + radii[j] + theta_t + 1e-6
    ]
    if prune_stats is not None:
        prune_stats.update(
            n_cells=len(radii),
            cell_pairs_survived=len(cell_pairs),
            cell_pairs_total=len(radii) * len(radii),
        )
    pairs_df = spark.createDataFrame(cell_pairs, "ca int, cb int")

    # Verify stage: replicate each vector to the cell pairs it belongs to
    # (broadcast join, replication factor = cells-paired-with-mine — tiny
    # when pruning bites, bounded by n_centroids when it doesn't), then
    # enumerate + score pairs GROUP-LOCALLY with one numpy GEMM per cell
    # pair inside applyInPandas. This replaces a per-candidate-row join +
    # interpreted per-pair fold (2M candidate rows shuffled, ~5s at
    # sf0.1) with an Arrow transfer of just the replicated vectors
    # (|D| x replication rows) and a vectorized matrix multiply.
    #
    # Exactness contract: the GEMM is a PREFILTER at (threshold - 1e-9);
    # every survivor is re-scored with a sequential left-to-right Python
    # float fold — bit-identical to the JVM fold this replaced and to the
    # oracle's DuckDB list_reduce (all three are IEEE-double chains in
    # the same order), so the emitted cosine and the >= threshold
    # decision match the exact plan exactly. GEMM-vs-fold error for
    # unit-ish vectors is ~1e-15 relative, six orders below the margin.
    rep_a = assigned.join(F.broadcast(pairs_df), F.col("cell") == F.col("ca")).select(
        "ca", "cb", F.lit(0).alias("side"), "id", "v"
    )
    rep_b = assigned.join(F.broadcast(pairs_df), F.col("cell") == F.col("cb")).select(
        "ca", "cb", F.lit(1).alias("side"), "id", "v"
    )
    rep = rep_a.unionByName(rep_b)

    def _seqfold_dot(va, vb) -> float:
        s = 0.0
        for p in range(va.shape[0]):  # left-to-right IEEE-double chain
            s = s + float(va[p]) * float(vb[p])
        return s

    def _verify_cell_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        if A.empty or B.empty:
            return empty
        VA = np.stack(A["v"].to_numpy())
        VB = np.stack(B["v"].to_numpy())
        na = np.maximum(np.linalg.norm(VA, axis=1), 1e-300)
        nb = np.maximum(np.linalg.norm(VB, axis=1), 1e-300)
        ids_a = A["id"].to_numpy()
        ids_b = B["id"].to_numpy()
        sims = (VA @ VB.T) / np.outer(na, nb)
        ia, ib = np.nonzero(sims >= threshold - 1e-9)
        keep = ids_a[ia] < ids_b[ib]
        ia, ib = ia[keep], ib[keep]
        rows = []
        for x, y in zip(ia, ib):
            va, vb = VA[x], VB[y]
            # survivors re-scored with the oracle's exact float chain:
            # seqfold(a.b) / (sqrt(seqfold(a.a)) * sqrt(seqfold(b.b)))
            c = _seqfold_dot(va, vb) / (
                math.sqrt(_seqfold_dot(va, va)) * math.sqrt(_seqfold_dot(vb, vb))
            )
            if c >= threshold:
                rows.append((int(ids_a[x]), int(ids_b[y]), c))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])

    out = rep.groupBy("ca", "cb").applyInPandas(
        _verify_cell_pair, "id_a long, id_b long, cosine double"
    )
    # final rounding stays in Spark so round-half semantics match the
    # oracle's round(x, 6) exactly (Python round() is half-even)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 10,
) -> DataFrame:
    """Cross-document exact span dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): tile each document into
    non-overlapping ``span``-token spans and report, per document, how
    many of its distinct spans occur verbatim in at least one OTHER
    document — the signal used to cut boilerplate/mirror text before
    pretraining.

    Distinct from `t_repetition_scores` (intra-document repetition) and
    `decontam.decontaminate` (train-vs-eval asymmetric probe): this is
    the corpus-wide self-comparison.

    Scale design: spans are built per-row (tokenize -> slice, no
    shuffle), then the corpus-wide occurrence count is ONE
    hash-partitioned window over the span value — no self-join, no pair
    explosion; map-side partial aggregation does not apply to windows,
    but the span column is the only wide value shuffled and it can be
    replaced by an 8-byte hash at 100 TB (kept verbatim here so the
    oracle can verify). The per-doc rollup is the second and final
    shuffle (groupBy doc id).
    """
    toks = tokens(text_col)
    spans_arr = F.when(
        F.size(toks) >= span,
        F.transform(
            F.sequence(F.lit(0), (F.size(toks) / span).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * span + 1, span)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from ..sources.tables import spread_small_input

    per_doc = exploded_nonnull(
        spread_small_input(docs), [F.col(id_col)], F.array_distinct(spans_arr), "sp"
    )
    w = Window.partitionBy("sp")
    flagged = per_doc.withColumn("n_docs_with_span", F.count("*").over(w))
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum((F.col("n_docs_with_span") >= 2).cast("long")).alias("n_dup_spans"),
    )


def incremental_near_dup(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Asymmetric near-dup: which NEW documents near-duplicate something
    already IN the corpus — the production dedup shape, where a daily
    ingest batch is screened against the accumulated corpus instead of
    re-running corpus×corpus.

    Per flagged new doc, the single best corpus match:
    (doc_id, dup_of, jaccard), jaccard maximal (ties -> lowest dup_of).
    Duplicates *within* the new batch are out of scope — run the
    symmetric `minhash_near_dup_pairs` on the batch for those.

    Scale design: both sides get MinHash signatures (one shuffle each,
    the corpus side is incrementally maintainable as a stored table keyed
    by doc — only the new batch is re-signed in steady state); candidates
    come from the band-bucket equi-join, which AQE broadcasts when the
    new batch is small. Verification touches candidates only, and the
    best-match window partitions by new-doc id — bounded by the batch,
    not the corpus.

    Each side's (id, shingle-set) frame is computed ONCE and
    localCheckpointed (r15, guide §5): the signature explode and the
    verify join read the materialized arrays, so the corpus text is
    tokenized+shingled once per query instead of twice — the redundant
    corpus re-scan VERDICT r14 flagged on the sf1 probe.
    """
    arr_new = doc_shingle_arrays(new_docs, id_col, text_col, n).localCheckpoint(eager=False)
    arr_old = doc_shingle_arrays(corpus, id_col, text_col, n).localCheckpoint(eager=False)
    sig_new = minhash_signatures(new_docs, num_hashes, id_col, text_col, n,
                                 arrays=arr_new)
    sig_old = minhash_signatures(corpus, num_hashes, id_col, text_col, n,
                                 arrays=arr_old)
    bn = _band_buckets(sig_new, bands, num_hashes).alias("n")
    bo = _band_buckets(sig_old, bands, num_hashes).alias("o")
    cand = (
        bn.join(
            bo,
            (F.col("n.band") == F.col("o.band")) & (F.col("n.bucket") == F.col("o.bucket")),
        )
        .select(F.col("n.id").alias("id_new"), F.col("o.id").alias("id_old"))
        .distinct()
    )
    an = arr_new.select(
        F.col("id").alias("id_new"), F.col("shset").alias("set_n")
    )
    ao = arr_old.select(
        F.col("id").alias("id_old"), F.col("shset").alias("set_o")
    )
    verified = (
        cand.join(an, "id_new")
        .join(ao, "id_old")
        .withColumn("inter", F.size(F.array_intersect("set_n", "set_o")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("set_n") + F.size("set_o") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("id_new").orderBy(F.col("jaccard").desc(), F.col("id_old").asc())
    return (
        verified.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id_new").alias("doc_id"),
            F.col("id_old").alias("dup_of"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
