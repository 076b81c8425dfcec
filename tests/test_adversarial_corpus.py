"""Adversarial-corpus differential gate: every text/dedup/pipeline entry
runs Spark-vs-DuckDB on a documents table the fixtures DON'T have —
empty text, whitespace-only, NULL text, unicode (combining marks, CJK),
punctuation soup, a 2000-token repetition, single-token docs.

The fixture corpora are well-behaved, so an entry and its oracle can
agree there while diverging on degenerate inputs (found in round 7:
t_sentence_stats returned NULL n_words on NULL text where the oracle
coalesces to 0). This suite pins the edge behavior for the whole
text-analysis family, not just the entry that happened to diverge.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pulsar_beam_spark.queries import REGISTRY

from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_run

ADV_ROWS = [
    (0, "", "en", "s0", 0),
    (1, "   \t  \n ", "en", "s0", 8),
    (2, "one", "en", "s1", 3),
    (3, "héllo wörld ünïcode tęst ẞharp", "de", "s1", 30),
    (4, "a " * 2000, "en", "s2", 4000),
    (5, "!!! ??? ... ,,, ;;; :::", "en", "s2", 23),
    (6, None, "en", "s3", 0),
    (7, "the the the the the the", "en", "s3", 23),
    (8, "日本語 テキスト 処理 テスト", "ja", "s4", 14),
    (9, "word1 word2 word3 word1 word2 word1", "en", "s4", 35),
]

# the document-driven oracle entries: text analysis, dedup, doc pipelines
TARGETS = sorted(
    n
    for n, s in REGISTRY.items()
    if s.oracle is not None
    and (
        n.startswith("t_")
        or n.startswith("d_")
        or n.startswith("r3")
        or n in ("p_decontaminate", "p_span_dedup", "p_chunk_documents",
                 "r29_dedup_exact_latest")
    )
)


@pytest.fixture(scope="module")
def adv_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv-corpus"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ADV_ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ADV_ROWS], pa.string()),
            "lang": pa.array([r[2] for r in ADV_ROWS], pa.string()),
            "source": pa.array([r[3] for r in ADV_ROWS], pa.string()),
            "n_chars": pa.array([r[4] for r in ADV_ROWS], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    # non-document tables come from the smallest fixture so joins resolve
    for f in os.listdir(SF_SMOKE):
        if f != "documents.parquet" and f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", TARGETS)
def test_adversarial_corpus_parity(spark, adv_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, adv_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, adv_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on the adversarial corpus: " + "; ".join(errs)


# == empty-input differential gate ======================================
# Every table sliced to 0 rows. A round-7 sweep of all 238 oracle entries
# found 15 repo-side crashes (ranking kernels building an untyped
# create_map() from zero partitions; ANN entries subscripting a None
# query-vector row; pagerank and split-leakage dividing by a zero count)
# — all fixed; this pins the previously-crashing set. Known ENGINE
# divergence, asserted as such: Spark's rollup/cube on an empty relation
# emits NO grand-total row where DuckDB (per the SQL standard's empty
# grouping set) emits one.

EMPTY_REGRESSION = [
    "r31_cosine_topk", "s_ann_lsh_topk", "s_ann_ivf_topk",
    "s_ann_recall_audit", "e_range_search", "e_mips_topk", "e_pq_adc_topk",
    "e_pq_codes_topk", "e_pq_recall_audit", "t_bm25_search",
    "t_bm25_indexed", "t_bm25_index_merge", "t_hybrid_rrf",
    "e_kmeans_lloyd", "e_kmeans_centroids", "e_pq_trained_recall",
    "e_ivf_trained_topk", "e_ivf_cells_topk", "e_ivfpq_topk",
    "e_ivfpq_batch_topk", "e_ivfpq_batch_rerank_topk",
    "pipeline_semantic_dedup", "d_semantic_incremental_near_dup",
    "d_semantic_dedup_recall", "d_semantic_dedup_recall_sweep",
    "e_hard_negative_mining", "pipeline_contrastive_triplets",
    # round-14 tree trainer: empty corpus => no valid root split => all
    # three entries must return 0 rows on BOTH engines (fit_depth2 None
    # vs the b0 LIMIT 1 over an empty histogram)
    "t_quality_tree_train", "t_quality_tree_eval", "t_quality_tree_apply",
    "t_quality_tree_learned_apply",
    "r_pagerank_iter3", "p_split_leakage", "p_rank_calibrate",
    "r_pareto_cut", "r_rfm_segmentation", "r_quartile_bands",
    "r_keyset_pagination", "r_lorenz_deciles", "r_abc_xyz",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty-tables"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SF_SMOKE, f))
            pq.write_table(t.slice(0, 0), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", EMPTY_REGRESSION)
def test_empty_input_parity(spark, empty_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, empty_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, empty_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on empty input: " + "; ".join(errs)


def test_empty_input_rollup_known_engine_divergence(spark, empty_sf_dir):
    """Documented, NOT a repo bug: Spark rollup/cube over an empty
    relation yields 0 rows; DuckDB emits the standard's () grouping-set
    grand-total row. If a Spark upgrade aligns this, fold r14 into
    EMPTY_REGRESSION."""
    assert REGISTRY["r14_rollup"].spark(spark, empty_sf_dir).count() == 0
    assert len(duck_run(REGISTRY["r14_rollup"].oracle, empty_sf_dir)) == 1


# == single-row / tie-saturated gate ====================================
# Round-8 fuzz sweeps: every table sliced to ONE row (zero degrees of
# freedom — also reachable at scale from a filtered-to-one-group input),
# and value columns saturated with ties (zero variance, the worst case
# for rank/top-k tie-breaking). The full 238-entry sweeps found exactly
# two defects, both ANSI DIVIDE_BY_ZERO crashes where the oracle's
# DuckDB evaluates x/0 -> NULL: r11_stats_aggregates (n*(n-1) and
# sqrt(var) denominators) and r_anova_dow (k-1, nn-k, ms_within). Zero
# tie-break mismatches registry-wide. This pins the fixed pair plus a
# representative rank/top-k set on both fixtures.

DEGENERATE_REGRESSION = [
    "r11_stats_aggregates", "r_anova_dow",         # the round-8 fixes
    "r15_window_rank", "r19_topk", "r_topk_with_ties",
    "r_weighted_median", "r_quartile_bands", "r_gini_by_nation",
    # round-11 wave 2: the fixed-point clustering family at zero
    # degrees of freedom (k > n init, single-member clusters, the
    # trained-PQ sample collapsing to one point)
    "e_kmeans_lloyd", "e_kmeans_centroids", "e_pq_trained_recall",
    "e_ivf_cells_topk", "e_ivfpq_topk",
    # round-14: the batch kernels at zero degrees of freedom (one corpus
    # row means at most one query and one candidate per qid)
    "e_ivfpq_batch_topk", "e_ivfpq_batch_rerank_topk",
]


def _degenerate_dir(tmp_path_factory, mode):
    d = str(tmp_path_factory.mktemp(f"degen-{mode}"))
    reps_by_table = {
        "events": {"value": 1.0},
        "orders": {"o_totalprice": 1000.0},
        "lineitem": {"l_quantity": 10.0, "l_extendedprice": 500.0,
                     "l_discount": 0.05},
        "documents": {"text": "the same tie text appears in every document"},
        "customer": {"c_acctbal": 100.0},
    }
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SF_SMOKE, f))
        if mode == "onerow":
            t = t.slice(0, 1)
        else:
            reps = reps_by_table.get(f[:-8], {})
            cols = []
            for i, field in enumerate(t.schema):
                if field.name in reps:
                    cols.append(pa.array([reps[field.name]] * t.num_rows,
                                         type=field.type))
                else:
                    cols.append(t.column(i))
            t = pa.table(cols, schema=t.schema)
        pq.write_table(t, os.path.join(d, f))
    return d


@pytest.fixture(scope="module", params=["onerow", "ties"])
def degenerate_sf_dir(request, tmp_path_factory):
    return _degenerate_dir(tmp_path_factory, request.param)


@pytest.mark.parametrize("name", DEGENERATE_REGRESSION)
def test_degenerate_input_parity(spark, degenerate_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, degenerate_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, degenerate_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on degenerate input: " + "; ".join(errs)


# == missing / NULL query-vector gate ===================================
# The ANN entries anchor on the stored embedding of a fixed vec_id. On a
# corpus where that id is absent (or its embedding is NULL) the oracles'
# "WHERE vec_id = ..." CTE goes empty (round 8: NULL-guarded), while a
# dummy-vector Spark plan would still emit k rows of NULL cosine via
# LIMIT (ADVICE r07). Pins the contract: missing/NULL query -> empty
# result (the recall audit's FROM-less oracle -> one (k, 0, 0) row).

ANN_QUERY_ENTRIES = [
    "r31_cosine_topk", "s_ann_lsh_topk", "s_ann_ivf_topk",
    "s_ann_recall_audit", "e_range_search", "e_mips_topk", "e_pq_adc_topk",
    "e_pq_codes_topk", "e_pq_recall_audit", "t_hybrid_rrf",
    "e_pq_trained_recall", "e_ivf_trained_topk", "e_ivf_cells_topk",
    "e_ivfpq_topk",
    # round-12: the persisted composite, its recall audit, and the
    # artifact-native hybrid all anchor on the same query vector
    "e_ivfpq_codes_topk", "e_ivfpq_recall_audit", "t_hybrid_rrf_indexed",
    # round-14 (VERDICT r13 task 6): the batch entries anchor on
    # vec_id < Q, so removing/nulling vec_id 0 removes ONE of the Q
    # queries; parity must hold and the surviving queries must still
    # rank (asserted below — batch is the one family where a missing
    # query does NOT mean an empty result)
    "e_ivfpq_batch_topk", "e_ivfpq_batch_rerank_topk",
]


@pytest.fixture(scope="module", params=["missing", "null"])
def no_query_sf_dir(request, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"q-{request.param}"))
    t = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    ids = t.column("vec_id").to_pylist()
    if request.param == "missing":
        keep = pa.array([i not in (0, 7) for i in ids])
        t = t.filter(keep)
    else:
        cols = []
        for i, field in enumerate(t.schema):
            col = t.column(i)
            if field.name == "embedding":
                idx = pa.array(
                    [None if v in (0, 7) else j for j, v in enumerate(ids)],
                    pa.int64(),
                )
                col = col.combine_chunks().take(idx)
            cols.append(col)
        t = pa.table(cols, schema=t.schema)
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", ANN_QUERY_ENTRIES)
def test_no_query_vector_parity(spark, no_query_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, no_query_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, no_query_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on a missing/NULL query vector: " + "; ".join(errs)
    if name in ("t_hybrid_rrf", "t_hybrid_rrf_indexed"):
        # fusion contract (both variants): a missing dense query degrades
        # to the SPARSE ranking (both engines agree — parity asserted
        # above); emptiness would mean the sparse leg was wrongly coupled
        # to the dense guard
        assert len(sdf) == 10 and (sdf["dense_rank"] == 0).all()
    elif name in ("e_ivfpq_batch_topk", "e_ivfpq_batch_rerank_topk"):
        # batch contract: losing ONE of the Q queries drops only that
        # qid's rows; the surviving queries keep ranking (an empty
        # result here would mean the whole batch was wrongly coupled to
        # one query's guard)
        qids = set(sdf["qid"])
        assert 0 not in qids and len(qids) >= 3, sorted(qids)
    elif name not in ("s_ann_recall_audit", "e_pq_recall_audit",
                      "e_pq_trained_recall", "e_ivfpq_recall_audit"):
        assert len(sdf) == 0  # the contract, not just parity (the audits
        # emit their one (k, 0, ...) summary row instead)


# == NULL-bearing-column gate ===========================================
# 20% NULLs in events.value, embeddings.label and embeddings.embedding —
# plausible production data (missing measurements, unlabeled or failed
# embeddings) that the fixtures never carry. The round-7 sweep found four
# crash classes here, all fixed with contracts mirrored in the oracles:
# the centroid sampler and embedding near-dup iterated None vectors, a
# NULL label key crashed the driver-side sorted(), and the pandas-UDF
# kernels astype(int64)-crashed on NaN. (Fixture-wide nullification of
# ORDER-BY columns is deliberately NOT gated: those columns are NOT NULL
# in the modeled domain, and Spark/DuckDB default null ordering differs.)

NULL_REGRESSION = [
    "d_embedding_near_dup", "e_label_margin", "e_vector_quantize",
    "r34_pandas_grouped_agg", "r34_pandas_grouped_map", "s_ann_ivf_topk",
    "e_kmeans_lloyd", "e_pq_trained_recall",
]


@pytest.fixture(scope="module")
def nullish_sf_dir(tmp_path_factory):
    import numpy as np

    d = str(tmp_path_factory.mktemp("null-cols"))
    rng = np.random.default_rng(7)

    def nullify(table, cols):
        t = pq.read_table(os.path.join(SF_SMOKE, f"{table}.parquet"))
        out = []
        for i, field in enumerate(t.schema):
            col = t.column(i)
            if field.name in cols:
                mask = rng.random(t.num_rows) < 0.2
                idx = pa.array(
                    [None if m else j for j, m in enumerate(mask)], pa.int64()
                )
                col = col.combine_chunks().take(idx)
            out.append(col)
        pq.write_table(pa.table(out, schema=t.schema), os.path.join(d, f"{table}.parquet"))

    nullify("events", {"value"})
    nullify("embeddings", {"label", "embedding"})
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f not in ("events.parquet", "embeddings.parquet"):
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", NULL_REGRESSION)
def test_null_columns_parity(spark, nullish_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, nullish_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, nullish_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on NULL-bearing columns: " + "; ".join(errs)


# == poisoned-vector gate (ADVICE r08) ===================================
# NaN / +Inf / zero-norm / NULL-component vectors in the embeddings
# corpus, and the same poison applied to the anchored QUERY vectors. The
# Spark operators drop invalid vectors via functions.vector.valid_vector;
# until round 9 the oracles guarded only `embedding IS NOT NULL`, so on a
# corpus with one NaN vector DuckDB ranked its NaN cosine to the top of
# every ORDER BY DESC (NaN sorts greatest in both engines) and passed
# `cos >= threshold` while the implementation dropped the row — every
# vector entry's parity contract was fixture-dependent. Round 9 spliced
# queries._finite_vec_sql into every vector-family oracle's corpus and
# query CTEs; this gate pins that the two sides now agree on poison.

VEC_FAMILY = [
    "r31_cosine_topk", "s_ann_lsh_topk", "s_ann_ivf_topk",
    "s_ann_recall_audit", "e_range_search", "e_mips_topk",
    "e_vector_quantize", "e_grouped_topk", "d_embedding_near_dup",
    "e_pq_adc_topk", "e_pq_codes_topk", "e_pq_recall_audit", "t_hybrid_rrf",
    "e_kmeans_lloyd", "e_kmeans_centroids", "e_pq_trained_recall",
    "e_ivf_trained_topk", "e_ivf_cells_topk", "e_ivfpq_topk",
    "e_ivfpq_codes_topk", "e_ivfpq_recall_audit", "t_hybrid_rrf_indexed",
    # round-14 (VERDICT r13 task 6): the single-query gates' poisoned
    # vectors replayed through the BATCH path — query-mode poison hits
    # vec_ids 0 and 3, both inside the batch query set (vec_id < 5), so
    # the quantizable guard must drop them on BOTH engines while the
    # clean queries keep ranking
    "e_ivfpq_batch_topk", "e_ivfpq_batch_rerank_topk",
    # round-14: the corpus-as-queries pipeline — poisoned vectors drop
    # from BOTH the query set (quantizable) and the refine legs
    # (_finite_vec_sql / valid_vector) on both engines; same contract
    # for the batch-vs-corpus screen (poison on either side of the %5
    # split must drop symmetrically) and the recall audit (poison must
    # vanish from BOTH the exact reference and the index pair set, or
    # recall would be computed against a phantom denominator)
    "pipeline_semantic_dedup", "d_semantic_incremental_near_dup",
    "d_semantic_dedup_recall",
    # round-14: hard-negative mining — poison must vanish from the
    # anchor set (quantizable guard; anchor 0 is poisoned in query
    # mode) and from the refine legs on both engines; the composed
    # triplets pipeline inherits the same contract on both legs
    "e_hard_negative_mining", "pipeline_contrastive_triplets",
]

# vec_id -> poison kind; "corpus" mode hits non-query rows only, "query"
# mode hits the anchored query ids (0: brute/lsh/ivf/range, 7: mips,
# 3: one of e_grouped_topk's five queries)
# "huge": finite but beyond the fixed-point family's MAX_QUANT domain
# bound (round-11 self-probe: numpy int64 squared distances WRAP
# silently at ~1e22 — the clustering guard must exclude the row on both
# engines; the float family keeps it, it is a perfectly finite vector)
_POISON_CORPUS = {10: "nan", 11: "inf", 12: "zero", 13: "null_comp",
                  14: "huge"}
_POISON_QUERY = {0: "nan", 7: "zero", 3: "inf"}


def _poison_vec(vec, kind):
    vec = list(vec)
    if kind == "nan":
        vec[1] = float("nan")
    elif kind == "inf":
        vec[2] = float("inf")
    elif kind == "zero":
        vec = [0.0] * len(vec)
    elif kind == "null_comp":
        vec[0] = None
    elif kind == "huge":
        vec[3] = 1.0e6
    return vec


@pytest.fixture(scope="module", params=["corpus", "query"])
def poisoned_vec_sf_dir(request, tmp_path_factory):
    poison = _POISON_CORPUS if request.param == "corpus" else _POISON_QUERY
    d = str(tmp_path_factory.mktemp(f"poison-{request.param}"))
    t = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    out = [
        _poison_vec(e, poison[i]) if i in poison else e
        for i, e in zip(ids, embs)
    ]
    cols = {
        "vec_id": t.column("vec_id"),
        "embedding": pa.array(out, t.schema.field("embedding").type),
        "label": t.column("label"),
    }
    pq.write_table(pa.table(cols), os.path.join(d, "embeddings.parquet"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", VEC_FAMILY)
def test_poisoned_vector_parity(spark, poisoned_vec_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, poisoned_vec_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, poisoned_vec_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on poisoned vectors: " + "; ".join(errs)
    # the result must also be non-degenerate where a query vector survives:
    # corpus-mode poison drops 4 corpus rows but every anchored query is
    # intact, so the top-k entries still return k rows
    if "corpus" in poisoned_vec_sf_dir and name in (
        "r31_cosine_topk", "s_ann_lsh_topk", "s_ann_ivf_topk", "e_mips_topk"
    ):
        assert len(sdf) > 0
    if name in ("e_ivfpq_batch_topk", "e_ivfpq_batch_rerank_topk"):
        qids = set(sdf["qid"])
        if "query" in poisoned_vec_sf_dir:
            # poisoned queries 0 (nan) and 3 (inf) must be dropped by
            # the quantizable guard; the clean ones keep ranking
            assert 0 not in qids and 3 not in qids, sorted(qids)
            assert qids >= {1, 2, 4}, sorted(qids)
        else:
            # corpus-mode poison leaves every query intact
            assert qids >= {0, 1, 2, 3, 4}, sorted(qids)


# == timezone / DST gate (VERDICT r08 item 4) ============================
# The harness pins spark.sql.session.timeZone=UTC on both engines
# (SURVEY §5.2); nothing proved the date family survives (a) timestamps
# straddling DST transitions at all, or (b) a NON-UTC session timezone.
# This gate runs the events/orders date-family entries on a fixture
# whose timestamps straddle the America/New_York spring-forward
# (2024-03-10 07:00 UTC), fall-back (2024-11-03 06:00 UTC) and a
# local-midnight boundary (05:00 UTC), twice: under the declared UTC
# domain (must match the oracle exactly) and under
# session.timeZone=America/New_York, pinning per entry whether the
# result is timezone-independent (must STILL match the UTC oracle) or
# legitimately timezone-dependent (documented out-of-domain divergence
# that must KEEP diverging — a silent flip to "matches" would mean the
# entry stopped honoring the session timezone).

DST_FAMILY = [
    # events-based (ts)
    "s3_tumbling_window", "s4_sliding_window", "s5_session_window",
    "r_gap_fill_forward", "r_ewma_smoothing", "r_cohort_retention",
    "r_ohlc_bars", "r_gaps_islands", "r_running_distinct",
    "r_coverage_pct", "r_calendar_profile", "r_time_to_convert",
    "r_new_vs_returning", "r_rolling_active_users", "r_rolling_median",
    "r_autocorr_daily", "r_anova_dow", "r_sessionize_gap",
    # orders-based (o_orderdate / l_shipdate)
    "r23_date_fns", "r23_date_arith", "r_business_days",
]

# entries whose results legitimately change under a non-UTC session
# timezone, with the mechanism noted. The round-9 classification run
# found the date family almost entirely timezone-INDEPENDENT: the
# fixtures' parquet timestamps are written tz-naive
# (isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ, so
# year/month/to_date/date_trunc/weekday/hour are all wall-clock math
# with no session-tz conversion — matching DuckDB's naive TIMESTAMP
# semantics by construction. The exception:
# - r_ohlc_bars: its bar boundary round-trips through epoch seconds
#   (unix_timestamp -> floor to the 30-min grid -> back to a
#   timestamp); unix_timestamp on an NTZ value interprets the wall
#   clock IN THE SESSION TIMEZONE, so under America/New_York every bar
#   label shifts by the UTC offset and rows near a bar edge change
#   buckets. This is the documented out-of-domain divergence the UTC
#   pin exists for (SURVEY §5.2); the gate asserts it KEEPS diverging.
TZ_SENSITIVE: set[str] = {"r_ohlc_bars"}


@pytest.fixture(scope="module")
def dst_sf_dir(tmp_path_factory):
    from datetime import datetime, timedelta

    d = str(tmp_path_factory.mktemp("dst-corpus"))
    stamps = []
    # spring forward in America/New_York: 2024-03-10 02:00 EST -> 03:00
    # EDT, i.e. 07:00 UTC. Minute steps across the transition.
    base = datetime(2024, 3, 10, 6, 30)
    stamps += [base + timedelta(minutes=3 * i) for i in range(20)]
    # fall back: 2024-11-03 02:00 EDT -> 01:00 EST, i.e. 06:00 UTC; the
    # 01:00-02:00 local hour happens twice.
    base = datetime(2024, 11, 3, 5, 30)
    stamps += [base + timedelta(minutes=3 * i) for i in range(20)]
    # local-midnight boundary: 05:00 UTC == 00:00 EST on 2024-01-02 —
    # the UTC date and the NY date differ for 00:00-05:00 UTC rows.
    base = datetime(2024, 1, 2, 4, 30)
    stamps += [base + timedelta(minutes=3 * i) for i in range(20)]
    n = len(stamps)
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(stamps, pa.timestamp("us")),
        "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
        "event_type": pa.array(
            [("click", "view", "purchase")[i % 3] for i in range(n)]),
        "value": pa.array([round(10.0 + (i % 13) * 3.25, 2) for i in range(n)]),
        "props": pa.array([f'{{"k": {i % 5}, "tag": "t{i % 3}"}}' for i in range(n)]),
    })
    pq.write_table(t, os.path.join(d, "events.parquet"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "events.parquet":
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", DST_FAMILY)
def test_dst_straddling_parity_under_utc(spark, dst_sf_dir, name):
    """The declared UTC domain extended to DST-straddling timestamps:
    parity must hold exactly (both engines are tz-naive-UTC here, so a
    divergence means an engine-behavior asymmetry, not timezone math)."""
    spec = REGISTRY[name]
    sdf = spec.spark(spark, dst_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, dst_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges on DST-straddling timestamps under UTC: " + "; ".join(errs)


@pytest.mark.parametrize("name", DST_FAMILY)
def test_dst_family_under_new_york_session_tz(spark, dst_sf_dir, name):
    """Pin the session-timezone contract per entry: tz-independent
    entries must match the UTC oracle even under a New-York session;
    tz-sensitive entries must keep diverging on this DST fixture."""
    spec = REGISTRY[name]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sdf = spec.spark(spark, dst_sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    ddf = duck_run(spec.oracle, dst_sf_dir)
    errs = compare(sdf, ddf)
    if name in TZ_SENSITIVE:
        assert errs, (
            f"{name} is pinned tz-SENSITIVE but matched the UTC oracle "
            "under a New-York session — it stopped honoring the session "
            "timezone (or the fixture no longer exercises the boundary)"
        )
    else:
        assert not errs, (
            f"{name} is pinned tz-INDEPENDENT but diverged under a "
            "New-York session: " + "; ".join(errs)
        )


# == cosine k-th-slot rounding-boundary gate (round 11) =================
# Two corpus vectors whose RAW cosines differ but round to the same 6
# decimals, straddling the k-th slot. The old brute_force_topk ranked on
# the ROUNDED cosine: rounding manufactured a tie the raw order doesn't
# have, the vec_id tiebreak picked the other member than the oracle's
# raw ORDER BY, and r31's parity was one adversarial fixture away from
# red. Pins the family convention: SELECTION ranks on the raw double
# (bit-identical across engines via the sequential fold), rounding only
# in the projection.


@pytest.fixture(scope="module")
def boundary_sf_dir(tmp_path_factory):
    import numpy as np

    d = str(tmp_path_factory.mktemp("cos-boundary"))
    dim = 64
    rows = []

    def vec(c32, s32):
        v = np.zeros(dim, dtype=np.float32)
        v[0], v[1] = c32, s32
        return v

    # query: e1 (vec_id 0 anchors every ANN entry)
    rows.append((0, vec(np.float32(1.0), np.float32(0.0))))
    # 8 clear top ranks: cosines ~0.95 .. 0.88
    for i in range(1, 9):
        c = np.float32(0.95 - 0.01 * i)
        rows.append((i, vec(c, np.float32(np.sqrt(1 - float(c) ** 2)))))
    # the boundary pair fighting for slot 10 (query itself takes slot 1):
    # nudge c by float32 ULPs until two RAW cosines differ but round to
    # the same 6 decimals
    s = np.float32(0.69)

    def cos_of(c):
        cd, sd = float(c), float(s)
        return cd / np.sqrt(cd * cd + sd * sd)

    base = np.float32(0.7234567)
    cands = []
    c = base
    for _ in range(64):
        cands.append((c, cos_of(c)))
        c = np.nextafter(c, np.float32(1.0), dtype=np.float32)
    by_bucket: dict = {}
    pair = None
    for c, cc in cands:
        b = round(cc, 6)
        if b in by_bucket and by_bucket[b][1] != cc:
            pair = (by_bucket[b], (c, cc))
            break
        by_bucket.setdefault(b, (c, cc))
    assert pair, "could not construct a rounding-tied pair"
    (c_lo, cos_lo), (c_hi, cos_hi) = sorted(pair, key=lambda t: t[1])
    assert round(cos_lo, 6) == round(cos_hi, 6) and cos_lo != cos_hi
    # LOWER raw cosine gets the SMALLER vec_id: a rounded rank would
    # tie-break to it; the raw rank must pick the higher one
    rows.append((100, vec(c_lo, s)))
    rows.append((101, vec(c_hi, s)))
    # filler below the boundary
    for i in range(110, 116):
        c = np.float32(0.5 - 0.02 * (i - 110))
        rows.append((i, vec(c, np.float32(np.sqrt(1 - float(c) ** 2)))))

    t = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([[float(x) for x in r[1]] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    return d


@pytest.mark.parametrize("name", ["r31_cosine_topk", "t_hybrid_rrf"])
def test_cosine_rounding_boundary_parity(spark, boundary_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, boundary_sf_dir).toPandas()
    ddf = duck_run(spec.oracle, boundary_sf_dir)
    errs = compare(sdf, ddf)
    assert not errs, f"{name} diverges at the k-th-slot rounding boundary: " + "; ".join(errs)
    if name == "r31_cosine_topk":
        # non-vacuous: the higher-RAW member must take the k-th slot
        # (the old rounded rank tie-broke to vec_id 100 and failed
        # parity here); the hybrid's fused top-10 legitimately ranks by
        # rrf, so only its parity is asserted
        ids = set(sdf["vec_id"])
        assert 101 in ids and 100 not in ids, sorted(ids)


# == batch-retrieval poisoned QUERY-SET gate (VERDICT r13 task 6) ========
# The corpus gates above replay poisoned STORED vectors through the
# batch entries; this pins the kernel against a poisoned QUERY SET —
# the shapes a retrieval-for-training caller actually produces:
# duplicate qids (a training example sampled twice) and a query whose
# probed cells hold zero codes (a far-out-of-distribution example).
# Hand-built integer index so the expected candidates are exact.


@pytest.fixture(scope="module")
def tiny_batch_index(spark):
    # one PQ subspace (m=1, dim=2), two codewords; four coarse cells on
    # a line; codes ONLY in cells 0 and 1 — cells 2 and 3 are empty.
    books = [[[0, 0], [10, 10]]]
    cents = [[0, 0], [100, 100], [200, 200], [300, 300]]
    codes = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 1), (3, 1, 0), (4, 1, 1)],
        "vec_id long, cell long, _code0 int")
    return codes, cents, books


def test_batch_query_probing_only_empty_cells(spark, tiny_batch_index):
    """A query whose nprobe nearest cells contain no codes yields ZERO
    rows for that qid — and must not disturb the other queries' ranks
    (the join simply finds no candidates; nothing crashes, nothing
    backfills k rows of NULL)."""
    from pulsar_beam_spark.operators.clustering import ivfpq_adc_batch_scan

    codes, cents, books = tiny_batch_index
    out = ivfpq_adc_batch_scan(
        codes, cents, books,
        queries=[(0, [1, 1]), (9, [299, 299])], nprobe=2, k=10)
    rows = {(r["qid"], r["vec_id"], r["rn"]) for r in out.collect()}
    assert not {t for t in rows if t[0] == 9}, rows
    # qid 0 probes cells 0,1 and ranks all four codes. The exact order
    # follows the SHIFTED-residual ADC: with qv=[1,1], residual vs cell
    # c is (1 - cent_c + shift), so distances ascend as (shift-109)^2 <
    # (shift-99)^2 < (shift-9)^2 < (shift+1)^2 -> vec 4, 3, 2, 1.
    assert {t for t in rows if t[0] == 0} == {
        (0, 4, 1), (0, 3, 2), (0, 2, 3), (0, 1, 4)}, rows


def test_batch_duplicate_qids_collapse_to_first(spark, tiny_batch_index):
    """batch(queries with duplicated qids) == batch(first occurrences):
    qid is the query's identity; without the kernel's dedup the
    duplicated (qid, cell) LUT rows double every candidate through the
    join and corrupt the per-qid row_number ranks."""
    from pulsar_beam_spark.operators.clustering import ivfpq_adc_batch_scan

    codes, cents, books = tiny_batch_index
    dup = ivfpq_adc_batch_scan(
        codes, cents, books,
        queries=[(0, [1, 1]), (0, [1, 1]), (0, [95, 95]), (5, [101, 101])],
        nprobe=1, k=10)
    uniq = ivfpq_adc_batch_scan(
        codes, cents, books,
        queries=[(0, [1, 1]), (5, [101, 101])], nprobe=1, k=10)
    drows = sorted(tuple(r) for r in dup.collect())
    urows = sorted(tuple(r) for r in uniq.collect())
    assert drows == urows, (drows, urows)
    # non-vacuous: each qid ranks its own probed cell's codes exactly once
    per_qid = {}
    for q, v, _a, rn in drows:
        per_qid.setdefault(q, []).append((v, rn))
    assert sorted(per_qid) == [0, 5]
    for q, pairs in per_qid.items():
        assert len({v for v, _ in pairs}) == len(pairs), (q, pairs)
        assert sorted(rn for _, rn in pairs) == list(
            range(1, len(pairs) + 1)), (q, pairs)
