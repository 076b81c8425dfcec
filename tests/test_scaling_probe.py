"""Env-gated sf1 weak-scaling regression gate (VERDICT r06 item 6).

The sf1 probe (scripts/sf1_probe.py) was a one-shot round note; this
test pins its exponents so a plan regression to super-linear scaling
fails CI BY ENTRY NAME instead of going unnoticed until the next manual
probe. Gated behind PBS_SF1_PROBE=1 because it builds/reads the ~1.7 GB
weak-scaled fixture and times ~60 entries at two scales (minutes):

    PBS_SF1_PROBE=1 python -m pytest tests/test_scaling_probe.py -q

Ceilings are the BASELINE.md anchor exponents + 0.15 margin (the host
drift band: identical code measured up to +-0.15 across runs — see
BASELINE.md round-7 notes). A breach is re-measured twice more and the
MEDIAN is judged, so a single contended run cannot flap the gate.
"""

from __future__ import annotations

import os
import statistics

import pytest

# anchor exponents: BASELINE.md sf0.1 -> sf1 tables (round 5-7; later
# re-anchors win). r30/p_source_overlap re-anchored in round 7 after the
# hot-shingle cap + posting-list/hashed-key plan rework.
ANCHOR_EXPONENTS = {
    "d_embedding_near_dup": 0.28,
    "d_fuzzy_name_pairs": 0.18,
    "d_incremental_near_dup": 0.42,
    "d_minhash_lsh_near_dup": 0.44,
    "e_cluster_inertia": 0.01,
    "e_grouped_topk": 0.16,
    "e_mips_topk": 0.07,
    "e_silhouette_by_cell": 0.06,
    "e_vector_quantize": 0.09,
    "flagship_revenue_by_nation": 0.29,
    "l_zorder_layout": 0.02,
    "p_decontaminate": 0.41,
    "p_packing_efficiency": 0.14,
    "p_rank_calibrate": 0.08,
    "p_source_overlap_matrix": 0.50,
    "p_span_dedup": 0.28,
    "pipeline_corpus_curation": 0.42,
    "pipeline_curation_clustered": 0.73,
    # round-14: corpus-as-queries SemDeDup pipeline — inherently ~linear
    # per decade (every doc is a query: candidates, refine pairs and
    # components all scale with N; measured 0.86 sf0.1->sf1). At fixed
    # fixture hyperparameters the per-chunk probed fraction adds a mild
    # super-linear term; in production n_cells grows with the corpus so
    # probed rows per chunk stay bounded (see ivfpq_corpus_candidates).
    "pipeline_semantic_dedup": 1.00,
    # round-14 companions: the batch-vs-corpus semantic screen (weak
    # scaling grows BOTH the batch and the corpus 10x, so ~linear
    # candidate work is the honest expectation; measured 0.58) and the
    # recall audit (dominated by its exact cell-blocked all-pairs
    # reference leg, the d_embedding_near_dup kernel; measured 0.79 —
    # the audit is an offline tuning read, not a production path)
    "d_semantic_incremental_near_dup": 0.58,
    "d_semantic_dedup_recall": 0.79,
    # d_semantic_dedup_recall_sweep is deliberately NOT anchored: it is
    # 4 pair-frame legs + the recall audit's exact leg by construction
    # (measured 0.85, 221 s at sf1), and each leg is anchored above —
    # gating the composite would re-measure ~11 min of already-pinned
    # work on every breach.
    # round-14 tree trainer: histogram passes shuffle only the tiny
    # (feat, val) domain and the apply is a pure projection — both are
    # per-job-overhead-dominated at probe scale (decade-flat).
    "t_quality_tree_train": 0.07,
    "t_quality_tree_apply": 0.05,
    "t_quality_tree_learned_apply": 0.00,
    # anchors AND corpus both grow 10x under weak scaling, so ~linear
    # candidate+refine work bounds the honest expectation (the
    # d_semantic_incremental_near_dup argument); measured 0.46, and the
    # composed triplets read adds only the checkpointed double-rank
    "e_hard_negative_mining": 0.46,
    "pipeline_contrastive_triplets": 0.53,
    "r04_inner_join": 0.11,
    "r05_broadcast_join": 0.09,
    "r08_range_join": 0.19,
    "r10_asof_join": 0.12,
    "r11_tpch_q1_agg": 0.02,
    "r12_count_distinct": 0.25,
    "r13_hll_mergeable": 0.08,
    "r14_rollup": 0.06,
    "r15_window_rank": 0.27,
    "r17_window_frames": 0.07,
    "r19_topk": 0.03,
    "r29_dedup_exact_latest": 0.12,
    "r30_ngram_jaccard_pairs": 0.50,
    "r31_cosine_topk": 0.05,
    "r32_top_terms": 0.11,
    "r34_pandas_grouped_map": 0.30,
    "r_abc_xyz": 0.10,
    "r_correlated_subquery_q17": 0.26,
    "r_ewma_smoothing": 0.03,
    "r_funnel_sequence": 0.11,
    "r_lorenz_deciles": 0.25,
    "r_merge_upsert": 0.05,
    "r_ohlc_bars": 0.15,
    "r_pagerank_iter3": 0.58,
    "r_pareto_cut": 0.18,
    "r_partial_agg_merge": 0.03,
    "r_quartile_bands": 0.22,
    "r_reachability": 0.19,
    "r_rfm_segmentation": 0.19,
    "r_skew_salted_agg": 0.05,
    "r_skew_salted_join": 0.43,
    "s3_tumbling_window": 0.11,
    "s5_session_window": 0.19,
    "s_ann_ivf_topk": 0.20,
    # re-anchored 0.14 -> 0.15 in round 10: the r06 anchor sat exactly at
    # the entry's quiet-host median (5-run standalone re-measure:
    # 0.107/0.140/0.153/0.153/0.220, median 0.153), leaving zero noise
    # margin — an in-suite shared-session run confirmed a phantom 0.296.
    # Plan unchanged since anchoring (one window shuffle on key).
    "s_rate_limit_sliding": 0.15,
    "t_unigram_logprob": 0.59,
    # round-11 anchors (BASELINE.md "Round-11"): the ingest-persisted
    # query paths and BPE accounting. e_pq_codes_topk measured -0.11 /
    # -0.08 (sub-second scan, noise floor) — anchored at 0.05 so the
    # ceiling is still a real flat-scan pin; the two BPE rows are
    # per-row codegen scans (expected ~linear in bytes at fixed
    # parallelism headroom, measured 0.13-0.18 at these SFs).
    "e_pq_adc_topk": 0.07,
    "t_bm25_search": 0.06,
    "e_pq_codes_topk": 0.05,
    "t_bm25_indexed": 0.15,
    "t_bpe_token_count": 0.18,
    "p_sequence_packing_bpe": 0.18,
    # round-14: packing under the TRAINED persisted merge table — same
    # plan shape as the synthetic twin (encode scan + one shard-window
    # shuffle), trained artifact warm at query time (measured 0.13 vs
    # the twin's 0.20 in the same probe run)
    "p_packing_learned_bpe": 0.18,
    # flat by construction: both legs are top-20 TakeOrdered scans whose
    # wall-clock is the BM25 corpus stats pass (measured 1.00x at 10x)
    "t_hybrid_rrf": 0.05,
    "t_bm25_index_merge": 0.10,  # measured 0.02; tokenize is the term
    "e_pq_recall_audit": 0.08,   # measured 0.04; driver ADC analysis dominates
    # round-11 late anchors: the fixed-point clustering family. The
    # assignment/encode kernels are Arrow-vectorized int64 (the
    # associativity dividend — see operators/clustering.assign_struct),
    # so per-row cost is tiny and these exponents are dominated by the
    # per-iteration job overhead (measured 0.10 / 0.14 / 0.04).
    "e_kmeans_lloyd": 0.12,
    "e_kmeans_centroids": 0.16,
    "e_pq_trained_recall": 0.06,
    "e_ivf_trained_topk": 0.12,  # measured 0.10 (train + one probed scan)
    "e_ivf_cells_topk": 0.05,    # measured -0.08 (sub-second artifact scan,
                                 # noise floor — pinned like e_pq_codes_topk)
    "e_ivfpq_topk": 0.13,        # measured 0.11 (cells + residual-PQ train
                                 # + probed ADC scan)
    # round-12 anchors: persisted/artifact-native query paths, all flat
    # by construction (measured 0.01 / -0.01 / 0.01 / 0.08; the BPE
    # arrow kernel's distinct-word cache saturates with vocabulary)
    "e_ivfpq_codes_topk": 0.05,
    "t_hybrid_rrf_indexed": 0.05,
    "e_ivfpq_recall_audit": 0.06,
    "t_bpe_token_count_1k": 0.15,
    # re-anchored 0.35 -> 0.40 in round 13 (the s_rate_limit_sliding
    # precedent): a full-gate shared-session run confirmed a phantom
    # 0.503 median while a 5-run STANDALONE re-measure read
    # 0.194/0.221/0.269/0.272/0.297 (median 0.269 == the original
    # anchor-time measurement; plan unchanged — explode scan linear,
    # count shuffle vocab-bounded). The old ceiling (0.50) sat exactly
    # at the contended-host reading; 0.40 keeps a real linearity pin
    # (+0.13 over quiet median) with noise margin for in-suite runs.
    "t_bpe_top_subwords": 0.40,
    # round-13 anchors: BPE training + the recall sweep. Training is
    # vocab-rate after the one wordcount shuffle (measured -0.02 —
    # iteration job overhead dominates; pinned at the noise-floor 0.05
    # like the flat artifact scans); apply is the codegen encode scan
    # (measured 0.11); the sweep is 4 flat persisted ADC scans + one
    # brute exact leg (measured 0.00).
    "t_bpe_train_merges": 0.05,
    "t_bpe_train_apply": 0.13,
    "t_bpe_learned_apply": 0.13,  # measured 0.00 (warm-artifact encode
                                  # scan at the noise floor); pinned at
                                  # the inline apply's expected-linear
                                  # anchor so the ceiling is a real pin
    "e_ivfpq_recall_sweep": 0.05,
    # the refine stage: one flat persisted ADC scan + a 64-row pushed-IN
    # re-rank (measured -0.03 / 0.04 — both at the noise floor)
    "e_ivfpq_rerank_topk": 0.05,
    "e_ivfpq_rerank_recall": 0.08,
    "e_ivfpq_rerank_sweep": 0.08,  # measured -0.02 (four flat chains)
    "e_ivfpq_rerank_scaled_sweep": 0.08,  # measured -0.02
    "e_ivfpq_batch_topk": 0.08,  # measured -0.07 (one pruned codes scan
                                 # + candidate-proportional window)
    "e_ivfpq_batch_rerank_topk": 0.08,  # measured 0.03 (composed read:
                                        # both halves flat)

    "tpch_q10_returned_items": 0.04,
    "tpch_q11_important_stock": 0.10,
    "tpch_q18_large_orders": 0.21,
    "tpch_q20_promo_suppliers": 0.11,
    "tpch_q3_shipping_priority": 0.24,
    "tpch_q7_volume_shipping": 0.23,
}
MARGIN = 0.15

# sf1 -> sf10 decade anchors (round 9; BASELINE.md "Round-9: sf1 ->
# sf10"). d_embedding_near_dup is deliberately absent: its sf10 reading
# is output-bound (quadratic TRUE pair count at the entry threshold on
# isotropic embeddings) — adjudicated in BASELINE.md, not anchor-worthy.
SF10_ANCHOR_EXPONENTS = {
    # re-anchored 0.66 -> 0.87 in round 10: ABSOLUTE times improved at
    # BOTH scales vs the r9 recording (sf1 13.1 -> 6.3-6.8 s, sf10
    # 59.7 -> 47-50 s; 3-run quiet-host medians, best-of-2 probe) — the
    # exponent rose only because the sf1 denominator deflated, exposing
    # growth the old inflated denominator hid. A real plan regression
    # grows t10; this shrank it.
    "pipeline_curation_clustered": 0.87,
    "r_pagerank_iter3": 0.55,
    "d_minhash_lsh_near_dup": 0.92,
    "d_incremental_near_dup": 0.84,
}


def test_sf10_exponents_within_ceilings(spark):
    if os.environ.get("PBS_SF10_PROBE") != "1":
        pytest.skip("sf10 decade probe (builds ~1.2 GB fixture, ~15 min); "
                    "set PBS_SF10_PROBE=1 to run")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import sf1_probe

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        results = sf1_probe.probe_sf10(spark, list(SF10_ANCHOR_EXPONENTS))
        breaches = {
            n: r["exponent"] for n, r in results.items()
            if r["exponent"] > SF10_ANCHOR_EXPONENTS[n] + MARGIN
        }
        confirmed = {}
        for n, first in breaches.items():
            more = [sf1_probe.probe_sf10(spark, [n])[n]["exponent"] for _ in range(2)]
            med = statistics.median([first, *more])
            if med > SF10_ANCHOR_EXPONENTS[n] + MARGIN:
                confirmed[n] = round(med, 3)
        assert not confirmed, (
            "sf1->sf10 decade regression vs BASELINE.md anchor (+0.15 "
            f"margin): {confirmed}"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.skipif(
    os.environ.get("PBS_SF1_PROBE") != "1",
    reason="minutes-long sf1 weak-scaling probe; set PBS_SF1_PROBE=1 to run",
)
def test_sf1_exponents_within_ceilings(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import sf1_probe

    # anchors were measured at shuffle=32; the conftest session runs 8 —
    # runtime-settable, restored after (AQE coalesce dampens the rest)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        entries = list(ANCHOR_EXPONENTS)
        results = sf1_probe.probe(spark, entries)
        breaches = {
            n: r["exponent"] for n, r in results.items()
            if r["exponent"] > ANCHOR_EXPONENTS[n] + MARGIN
        }
        # re-measure breaches twice more; judge the median of 3 so one
        # contended run cannot flap the gate
        confirmed = {}
        for n, first in breaches.items():
            more = [sf1_probe.probe(spark, [n])[n]["exponent"] for _ in range(2)]
            med = statistics.median([first, *more])
            if med > ANCHOR_EXPONENTS[n] + MARGIN:
                confirmed[n] = round(med, 3)
        assert not confirmed, (
            "super-linear regression vs BASELINE.md anchor (+0.15 margin): "
            f"{confirmed} — re-run the probe, then either fix the plan or "
            "re-anchor in BASELINE.md with a justification"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
