"""Fixed-point Lloyd k-means + trained-PQ gates.

The oracle parity suite already hash-checks e_kmeans_lloyd /
e_kmeans_centroids / e_pq_trained_recall against the unrolled SQL
chains; this file pins the properties parity alone can't express:
the pure-Python sample trainer's semantics (first-min tie-break,
empty-cluster carryover, floor division), determinism across runs,
the plan shapes, the out-of-domain guard, and the reason the trained
entry exists at all — trained codebooks must not recall WORSE than
the untrained-random ones they replace.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pulsar_beam_spark.operators.clustering import (
    assign_exprs,
    assign_struct,
    fixedpoint_kmeans_py,
    kmeans_assign,
    kmeans_fit,
    pq_adc_int_topk,
    pq_int_code_exprs,
    pq_int_codes_vectorized,
    pq_train_fixedpoint,
    quantizable,
    quantized_frame,
)
from pulsar_beam_spark.queries import REGISTRY

from .conftest import SF_SMOKE


# == pure-Python trainer semantics ======================================

def test_py_kmeans_first_min_tie_break():
    # two identical centroids: every point is equidistant to both; the
    # FIRST index must win (list_indexof / array_position semantics),
    # so cluster 1 goes empty and carries over unchanged
    pts = [[0, 0], [0, 0], [10, 10], [10, 10]]
    cents = fixedpoint_kmeans_py(pts, k=2, iters=1)
    # init = first 2 points = both [0,0]; all 4 points tie -> cluster 0
    # gets everything (mean [5,5]), cluster 1 carries over [0,0]
    assert cents == [[5, 5], [0, 0]]


def test_py_kmeans_floor_division():
    # 3 members summing to 10 per dim: 10 // 3 == 3 (floor), never a
    # float round-trip
    pts = [[1], [4], [5]]
    cents = fixedpoint_kmeans_py(pts, k=1, iters=1)
    assert cents == [[3]]


def test_py_kmeans_empty_input():
    assert fixedpoint_kmeans_py([], k=4, iters=2) == []


def test_py_kmeans_k_larger_than_sample():
    cents = fixedpoint_kmeans_py([[2, 2]], k=8, iters=2)
    assert cents == [[2, 2]]


def test_py_kmeans_converges_on_separated_clusters():
    pts = [[0], [1], [2], [100], [101], [102]]
    cents = fixedpoint_kmeans_py(pts, k=2, iters=3)
    assert cents == [[1], [101]]


# == Spark-side loop ====================================================

def test_kmeans_fit_deterministic(spark):
    _, c1 = kmeans_fit(spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"))
    _, c2 = kmeans_fit(spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet"))
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == 64
    assert all(x >= 0 for c in c1 for x in c)  # the non-negative domain


def test_kmeans_assign_matches_driver_side_recompute(spark):
    """The distributed assignment must equal a driver-side argmin over
    the same integers — pins assign_exprs against an independent
    Python recompute (first-min ties included)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb)
    got = {r["vec_id"]: (r["cluster"], r["sq_dist"])
           for r in kmeans_assign(emb).collect()}
    for row in q.collect():
        p = [int(x) for x in row["qv"]]
        dists = [sum((a - b) * (a - b) for a, b in zip(p, c)) for c in cents]
        want = (dists.index(min(dists)), min(dists))
        assert got[row["_kid"]] == want


def test_quantizable_guard_excludes_out_of_domain(spark):
    """Components below -offset would break the non-negative fixed-point
    contract: such vectors are EXCLUDED (not clamped), same as the
    oracle's list_filter clause."""
    rows = [
        (1, [0.5] * 64),            # in-domain
        (2, [-2.0] + [0.5] * 63),   # below -offset -> out
        (3, [float("nan")] * 64),   # invalid -> out
        (4, [0.5] * 32),            # wrong dim -> out
        (5, None),                  # NULL -> out
        (6, [1.0e6] + [0.5] * 63),  # finite but quantized > MAX_QUANT ->
                                    # out (int64 overflow domain bound)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = [r["vec_id"] for r in
            df.filter(quantizable("embedding", 64)).select("vec_id").collect()]
    assert kept == [1]


def test_kmeans_lloyd_plan_is_shuffle_free_projection(spark):
    """The OUTPUT plan of the assignment entry is scan + codegen argmin
    projection: zero exchanges, no join of any kind (training cost sits
    in the bounded per-iteration collects, not the result plan)."""
    from pulsar_beam_spark.plans.explain import formatted_plan, n_exchanges

    df = REGISTRY["e_kmeans_lloyd"].spark(spark, SF_SMOKE)
    assert n_exchanges(df) == 0, formatted_plan(df)[:2000]
    plan = formatted_plan(df)
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_kmeans_centroids_single_exchange(spark):
    from pulsar_beam_spark.plans.explain import formatted_plan, n_exchanges

    df = REGISTRY["e_kmeans_centroids"].spark(spark, SF_SMOKE)
    assert n_exchanges(df) <= 1, formatted_plan(df)[:2000]


# == trained PQ =========================================================

def test_pq_training_deterministic(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    b1 = pq_train_fixedpoint(emb)
    b2 = pq_train_fixedpoint(emb)
    assert b1 == b2
    assert len(b1) == 8 and len(b1[0]) == 16 and len(b1[0][0]) == 8


def test_trained_codebooks_beat_random_recall(spark):
    """The point of e_pq_trained_recall: codebooks fit on the corpus
    must recall at least as well as the fixed random ones, strictly
    better on the smoke fixture (measured 3 vs 1; equality elsewhere is
    allowed — on isotropic fixtures PQ recall saturates low)."""
    row = REGISTRY["e_pq_trained_recall"].spark(spark, SF_SMOKE).head()
    assert row["hits_trained"] >= row["hits_random"]
    if row["hits_trained"] == row["hits_random"]:
        # ADVICE r11: >= is the CONTRACT; the strict improvement (3 vs 1
        # measured on this fixture) is an observation that any fixture
        # regeneration or codebook-neutral change could legitimately
        # flatten — surface it loudly, don't fail spuriously
        import warnings

        warnings.warn(
            "trained recall no longer strictly beats random on the smoke "
            "fixture (measured 3 vs 1 at pin time) — if the fixture "
            "changed, re-measure; the >= contract still holds",
            stacklevel=1)


def test_trained_adc_topk_is_integer_exact(spark):
    """Every adc distance is integral (exact longs end to end), and the
    ranking is reproducible run-to-run."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    books = pq_train_fixedpoint(emb)
    qv = [int(x) for x in
          quantized_frame(emb).filter(F.col("_kid") == 0).head()["qv"]]
    r1 = pq_adc_int_topk(emb, qv, books, k=10).collect()
    r2 = pq_adc_int_topk(emb, qv, books, k=10).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    assert all(isinstance(r["adc"], int) for r in r1)


def test_assign_exprs_first_min_tie_break_in_spark(spark):
    """Two identical literal centroids: Spark's array_position must pick
    index 0, mirroring list_indexof and the Python trainer."""
    df = spark.createDataFrame([(1, [5, 5])], "id long, qv array<long>")
    cluster, _ = assign_exprs("qv", [[0, 0], [0, 0]])
    assert df.select(cluster.alias("c")).head()["c"] == 0
    # and the vectorized default agrees (np.argmin is also first-min)
    a = df.select(assign_struct("qv", [[0, 0], [0, 0]]).alias("a")).head()["a"]
    assert a["cluster"] == 0 and a["sq_dist"] == 50


def test_ivf_cells_probe_filter_pushed_to_artifact_scan(spark):
    """The persisted-cells IVF query plan must push the probe's cell IN
    filter into the cells parquet scan (PushedFilters) and read only
    (vec_id, embedding) from the corpus — no training job, no quantize
    expression, anywhere in the query path."""
    from pulsar_beam_spark.plans.explain import formatted_plan

    df = REGISTRY["e_ivf_cells_topk"].spark(spark, SF_SMOKE)
    plan = formatted_plan(df)
    pushed = [seg.split("\n")[0] for seg in plan.split("PushedFilters:")[1:]]
    assert any("cell" in p and "In(" in p for p in pushed), (
        "probe cell IN filter must reach the cells parquet scan:\n"
        + "\n".join(pushed))
    assert "transform(" not in plan.lower().replace("list_transform", ""), \
        "no quantize/assign expression may appear in the query path"
    # result parity with the inline trained entry (same oracle)
    from pulsar_beam_spark.queries import REGISTRY as R
    inline = R["e_ivf_trained_topk"].spark(spark, SF_SMOKE).collect()
    cells = df.collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in cells]


# == cross-implementation equality: vectorized kernel vs the =============
# == oracle-mirroring HOF reference, whole fixture, bit-exact =============

def test_vectorized_assign_equals_reference_exprs(spark):
    """assign_struct (Arrow/numpy int64) and assign_exprs (interpreted
    sequential folds — the oracle's exact shape) must agree on every
    row of the fixture: the associativity argument, executed."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb)
    cl, sq = assign_exprs("qv", cents)
    ref = {r["_kid"]: (r["c"], r["s"]) for r in
           q.select("_kid", cl.alias("c"), sq.alias("s")).collect()}
    vec = {r["_kid"]: (r["a"]["cluster"], r["a"]["sq_dist"]) for r in
           q.select("_kid", assign_struct("qv", cents).alias("a")).collect()}
    assert ref == vec and len(ref) > 0


def test_fused_lloyd_update_equals_exploded_reference(spark):
    """lloyd_update (fused Arrow partials, r14) and lloyd_update_exploded
    (posexplode + groupBy — the oracle's exact shape) must produce the
    SAME (cluster, d, s, n) rows on the fixture, under (a) the real init
    centroids, (b) a centroid table with a DUPLICATED centroid (argmin
    ties -> the duplicate gets no members and must be ABSENT from both
    row sets, the carry-over contract) and (c) a far-away centroid
    (empty cluster, same absence contract)."""
    from pulsar_beam_spark.operators.clustering import (
        lloyd_update,
        lloyd_update_exploded,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb)
    far = [3 * 10 ** 8 // 2] * 64  # MAX_QUANT corner: in-domain, no member
    cases = {
        "init": cents,
        "dup": cents + [list(cents[0])],
        "empty": cents + [far],
    }
    for label, table in cases.items():
        ref = sorted(tuple(int(x) for x in r)
                     for r in lloyd_update_exploded(q, table).collect())
        fused = sorted(tuple(int(x) for x in r)
                       for r in lloyd_update(q, table).collect())
        assert fused == ref and len(ref) > 0, label
        if label != "init":
            emitted = {r[0] for r in fused}
            assert len(table) - 1 not in emitted, label  # dup/far never win
    # single-partition image (the checkpointed trainer path shape)
    one = q.coalesce(1)
    assert (sorted(tuple(int(x) for x in r)
                   for r in lloyd_update(one, cents).collect())
            == sorted(tuple(int(x) for x in r)
                      for r in lloyd_update_exploded(one, cents).collect()))


def test_ivf_trained_probed_candidates_rank_like_brute_force(spark):
    """Every hit the trained IVF returns must appear in the brute-force
    ranking with the SAME rounded cosine (the probe prunes, never
    rescores), and the result must be deterministic across runs."""
    from pulsar_beam_spark.operators.clustering import ivf_trained_topk
    from pulsar_beam_spark.operators.similarity import brute_force_topk
    from pulsar_beam_spark.queries import _query_vec

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qv = _query_vec(emb, 0)
    qrow = quantized_frame(emb).filter(F.col("_kid") == 0).head()
    got = ivf_trained_topk(emb, qv, [int(x) for x in qrow["qv"]]).collect()
    again = ivf_trained_topk(emb, qv, [int(x) for x in qrow["qv"]]).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    assert 0 < len(got) <= 10
    brute = {r["vec_id"]: r["cosine"]
             for r in brute_force_topk(emb, qv, k=emb.count()).collect()}
    for r in got:
        assert brute[r["vec_id"]] == r["cosine"]


def test_vectorized_pq_codes_equal_reference_exprs(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    books = pq_train_fixedpoint(emb)
    q = quantized_frame(emb)
    ref = {r["_kid"]: tuple(r[f"_code{m}"] for m in range(8)) for r in
           q.select("_kid", *pq_int_code_exprs("qv", books)).collect()}
    vec = {r["_kid"]: tuple(r["c"]) for r in
           q.select("_kid", pq_int_codes_vectorized("qv", books).alias("c")).collect()}
    assert ref == vec and len(ref) > 0


def test_ivfpq_candidates_only_from_probed_cells_and_deterministic(spark):
    """IVFPQ discipline: every returned id sits in one of the query's
    probed cells (the coarse prune is a filter, never a rescore), the
    adc values are exact ints, and the whole composite is reproducible."""
    from pulsar_beam_spark.operators.clustering import (
        ivf_probe_cells, ivfpq_topk, kmeans_fit)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb, k=16)
    qrow = quantized_frame(emb).filter(F.col("_kid") == 0).head()
    qv = [int(x) for x in qrow["qv"]]
    got = ivfpq_topk(emb, qv, k=10).collect()
    again = ivfpq_topk(emb, qv, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    assert 0 < len(got) <= 10
    assert all(isinstance(r["adc"], int) for r in got)
    probe = set(ivf_probe_cells(qv, cents, 4))
    cells = {r["_kid"]: r["a"]["cluster"] for r in q.select(
        "_kid", assign_struct("qv", cents).alias("a")).collect()}
    for r in got:
        assert cells[r["vec_id"]] in probe


# == round-12: persisted composite-index artifacts ======================

def test_quant_dim_guard_derived_from_dim():
    """ADVICE r11: the int64 no-overflow bound must follow dim, not
    assume dim=64 — dim ~ 200 would silently wrap the numpy kernel."""
    from pulsar_beam_spark.operators.clustering import (
        MAX_QUANT, _check_quant_dim)

    _check_quant_dim(64)
    _check_quant_dim((2 ** 63 - 1) // (2 * MAX_QUANT) ** 2)  # exact max
    with pytest.raises(ValueError, match="overflows the int64 domain"):
        _check_quant_dim(200)
    with pytest.raises(ValueError):
        quantizable("embedding", 200)


def test_fused_ivfpq_encode_matches_two_stage(spark):
    """ivfpq_codes_struct (one Arrow crossing) must be bit-identical to
    the residual_struct -> pq_int_codes_vectorized chain it fuses."""
    from pulsar_beam_spark.operators.clustering import (
        MAX_QUANT, _ivfpq_encode_q, ivfpq_residual_books, residual_struct)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb, k=16)
    books = ivfpq_residual_books(q, cents)
    fused = {
        r["vec_id"]: (r["cell"],) + tuple(
            int(r[f"_code{mi}"]) for mi in range(len(books)))
        for r in _ivfpq_encode_q(q, cents, books, MAX_QUANT, "vec_id").collect()
    }
    res = (q.select("_kid", residual_struct("qv", cents, MAX_QUANT).alias("_r"))
           .select("_kid", F.col("_r.cell").alias("cell"),
                   F.col("_r.rv").alias("rv")))
    staged = {
        r["_kid"]: (r["cell"],) + tuple(int(x) for x in r["_codes"])
        for r in res.select(
            "_kid", "cell",
            pq_int_codes_vectorized("rv", books).alias("_codes")).collect()
    }
    assert fused == staged and len(fused) > 0


def test_residual_books_match_pre_refactor_sample_semantics(spark):
    """The driver-side sample trainer (codegen sample collect + Python
    residuals) must reproduce what sampling the distributed residual
    frame produced: same strided ids, same residuals, same codebooks."""
    from pulsar_beam_spark.operators.clustering import (
        MAX_QUANT, ivfpq_residual_books, residual_struct)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb, k=16)
    books = ivfpq_residual_books(q, cents, sample_cap=256)
    n = q.count()
    stride = (n + 255) // 256 if n else 1
    res = (q.select("_kid", residual_struct("qv", cents, MAX_QUANT).alias("_r"))
           .filter((F.col("_kid") % stride) == 0)
           .orderBy("_kid").limit(256).select("_r.rv").collect())
    pts = [[int(x) for x in r["rv"]] for r in res]
    sub = len(pts[0]) // 8
    expect = [fixedpoint_kmeans_py([p[mi * sub:(mi + 1) * sub] for p in pts],
                                   16, 2) for mi in range(8)]
    assert books == expect


def test_ivfpq_codes_entry_matches_inline(spark):
    """Index-path parity at the result level (the oracle proves it by
    hash; this is the fast in-suite pin): the persisted-artifact entry
    and the inline train+encode+scan entry return identical rows."""
    a = [tuple(r) for r in REGISTRY["e_ivfpq_topk"].spark(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in REGISTRY["e_ivfpq_codes_topk"].spark(spark, SF_SMOKE).collect()]
    assert a == b and len(a) > 0


def test_pq_trainers_reject_indivisible_dim(spark):
    """Round-12 self-probe: sub = dim // m drops the last dim % m
    components from every subspace on BOTH engines — parity-invisible
    silent truncation. The trainers must refuse."""
    from pulsar_beam_spark.operators.clustering import ivfpq_residual_books

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible by m"):
        pq_train_fixedpoint(emb, m=7, dim=64)
    q, cents = kmeans_fit(emb, k=4)
    with pytest.raises(ValueError, match="not divisible by m"):
        ivfpq_residual_books(q, cents, m=7)


def test_ivfpq_batch_scan_equals_per_query_scans(spark):
    """r13 batch retrieval: the one-scan-for-Q-queries batch kernel
    must return, per query, exactly the rows the single-query ADC scan
    returns — same candidates, same integer distances, same
    (adc, vec_id) order."""
    from pulsar_beam_spark.operators.clustering import (
        ivfpq_adc_batch_scan,
        ivfpq_adc_scan,
        ivfpq_build_artifacts,
        quantized_frame,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    codes, cents, books = ivfpq_build_artifacts(emb, n_cells=8, m=4,
                                                ksub=8, sample_cap=64)
    qrows = (quantized_frame(emb, 64).filter(F.col("_kid") < 4)
             .orderBy("_kid").select("_kid", "qv").collect())
    queries = [(int(r["_kid"]), [int(x) for x in r["qv"]]) for r in qrows]
    assert len(queries) == 4
    batch = ivfpq_adc_batch_scan(codes, cents, books, queries,
                                 nprobe=3, k=7)
    got = {}
    for r in batch.collect():
        got.setdefault(int(r["qid"]), []).append(
            (int(r["rn"]), int(r["vec_id"]), int(r["adc"])))
    for qid, qv in queries:
        want = [(i + 1, int(r["vec_id"]), int(r["adc"]))
                for i, r in enumerate(
                    ivfpq_adc_scan(codes, cents, books, qv,
                                   nprobe=3, k=7).collect())]
        assert sorted(got[qid]) == want, f"qid {qid} diverged"


def test_batch_lut_rows_equal_scalar_loop():
    """r14 optimization: the vectorized int64 probe+LUT builder must be
    bit-identical to the pure-Python ivf_probe_cells/ivfpq_query_luts
    loop it replaced — rows (order included), probed-cell union,
    duplicate-qid drop, and the stable tie-break on equal probe
    distances (adversarial: duplicated centroids force ties)."""
    import random

    from pulsar_beam_spark.operators.clustering import (
        MAX_QUANT,
        ivf_probe_cells,
        ivfpq_batch_lut_rows,
        ivfpq_query_luts,
    )

    rng = random.Random(7)
    dim, m, ksub, ncell, nprobe, shift = 16, 4, 5, 6, 3, MAX_QUANT
    cents = [[rng.randrange(0, MAX_QUANT) for _ in range(dim)]
             for _ in range(ncell)]
    cents[3] = list(cents[1])  # duplicated centroid -> tied probe dists
    books = [[[rng.randrange(0, 2 * MAX_QUANT) for _ in range(dim // m)]
              for _ in range(ksub)] for _ in range(m)]
    queries = [(qid, [rng.randrange(0, MAX_QUANT) for _ in range(dim)])
               for qid in (5, 9, 5, 2)]  # duplicate qid 5

    want_rows: list[tuple] = []
    want_cells: set[int] = set()
    seen: set[int] = set()
    for qid, qv in queries:
        if qid in seen:
            continue
        seen.add(qid)
        probe = ivf_probe_cells(qv, cents, nprobe)
        luts = ivfpq_query_luts(qv, cents, books, probe, shift)
        for c in probe:
            want_cells.add(int(c))
            want_rows.append(tuple([qid, int(c)]
                                   + [[int(x) for x in luts[c][mi]]
                                      for mi in range(m)]))

    got_rows, got_cells = ivfpq_batch_lut_rows(queries, cents, books,
                                               nprobe, shift)
    assert got_cells == want_cells
    assert got_rows == want_rows

    # empty query set: both paths produce nothing
    assert ivfpq_batch_lut_rows([], cents, books, nprobe, shift) == ([], set())


def test_batch_lut_frame_equals_row_path(spark):
    """r14 optimization: the Arrow-shipped LUT frame must be row-equal
    (order included), schema-equal, and probed-cell-union-equal to the
    verified-row-list createDataFrame path it replaced — including the
    duplicate-qid drop and duplicated-centroid probe ties — and must
    return (None, empty) for an empty query set so the caller keeps the
    empty-DDL fallback."""
    import random

    from pulsar_beam_spark.operators.clustering import (
        MAX_QUANT,
        ivfpq_batch_lut_frame,
        ivfpq_batch_lut_rows,
    )

    rng = random.Random(11)
    dim, m, ksub, ncell, nprobe, shift = 16, 4, 5, 6, 3, MAX_QUANT
    cents = [[rng.randrange(0, MAX_QUANT) for _ in range(dim)]
             for _ in range(ncell)]
    cents[4] = list(cents[0])  # duplicated centroid -> tied probe dists
    books = [[[rng.randrange(0, 2 * MAX_QUANT) for _ in range(dim // m)]
              for _ in range(ksub)] for _ in range(m)]
    queries = [(qid, [rng.randrange(0, MAX_QUANT) for _ in range(dim)])
               for qid in (5, 9, 5, 2)]  # duplicate qid 5

    rows, cells = ivfpq_batch_lut_rows(queries, cents, books, nprobe, shift)
    ddl = ("qid long, cell long, "
           + ", ".join(f"l{mi} array<long>" for mi in range(m)))
    old = spark.createDataFrame(rows, ddl)
    new, cells2 = ivfpq_batch_lut_frame(spark, queries, cents, books,
                                        nprobe, shift)
    assert cells2 == cells
    assert new.schema == old.schema
    assert [tuple(r) for r in new.collect()] == [tuple(r) for r in old.collect()]

    empty, empty_cells = ivfpq_batch_lut_frame(spark, [], cents, books,
                                               nprobe, shift)
    assert empty is None and empty_cells == set()


def test_ivfpq_residual_books_rejects_underdetermined_sample(spark):
    """r12 task 4 audit: a residual training sample smaller than
    4*ksub leaves codewords collapsed onto single points — the books
    are init artifacts, not trained quantizers. Refuse at train time
    (the dedup.py coarse-quantizer discipline)."""
    from pulsar_beam_spark.operators.clustering import (
        ivfpq_residual_books, kmeans_fit)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q, cents = kmeans_fit(emb, k=4)
    with pytest.raises(ValueError, match="under-determines"):
        ivfpq_residual_books(q, cents, m=8, ksub=16, sample_cap=32)


def test_ivfpq_codes_struct_rejects_mismatched_books():
    """ADVICE r12: the encode kernel slices rv[:, mi*sub:(mi+1)*sub];
    books with m*sub != dim (possible only from an unguarded external
    path — the trainers raise) would silently drop tail components from
    every code. The kernel itself must refuse, and refuse loudly on
    empty books rather than IndexError."""
    from pulsar_beam_spark.operators.clustering import ivfpq_codes_struct

    cents = [[0] * 64, [1] * 64]
    with pytest.raises(ValueError, match="empty codebooks"):
        ivfpq_codes_struct("qv", cents, [])
    with pytest.raises(ValueError, match="empty codebooks"):
        ivfpq_codes_struct("qv", cents, [[]])
    # m=3, sub=20 -> 60 != 64
    bad = [[[0] * 20, [1] * 20] for _ in range(3)]
    with pytest.raises(ValueError, match=r"m\*sub"):
        ivfpq_codes_struct("qv", cents, bad)
