#!/usr/bin/env python
"""sf1 scaling probe (VERDICT r05 item 7).

The sf0.1 determinism sweep proved CORRECTNESS holds at 10x the oracle
scale; this probes whether the TIME curves do.  It synthesizes an sf1
fixture (10x sf0.1) by deterministic weak-scaling replication, runs the
heaviest headline entries once at sf0.1 and once at sf1 in the same
session, and prints a markdown table of per-entry scaling ratios and
exponents (t ~ n^k -> k = log10(t_sf1/t_sf0.1) after subtracting
nothing — fixed per-job overhead makes the printed k a *ceiling* on the
asymptotic exponent for fast entries).

Replication design (weak scaling, not duplication):
- keyed tables get replica offsets of 1e9 * r on every key column, with
  the SAME offset applied to each foreign key, so intra-replica joins
  stay referentially intact and replicas are disjoint;
- nation/region stay fixed (geography does not scale in TPC-H either);
- document tokens are prefixed "r<r>" for replicas r>0, so shingle/
  minhash near-dup structure repeats per replica instead of creating
  cross-replica duplicate cliques (which would grow pair output ~45x
  and measure the fixture, not the operator);
- embeddings are rotated by r positions per replica — norm-preserving,
  deterministic, and far from the original in cosine, so ANN/near-dup
  candidate densities scale ~linearly.

Usage:
    python scripts/sf1_probe.py [--rebuild] [--out /tmp/pbs-sf1]
The generated fixture is cached in --out; ~1.7 GB.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 1_000_000_000

# heaviest BENCH_r05 entries (stream/skew stress excluded: their n is
# bench-controlled, not sf-controlled)
PROBE = [
    "pipeline_curation_clustered",
    "r_pagerank_iter3",
    "d_incremental_near_dup",
    "pipeline_corpus_curation",
    "d_embedding_near_dup",
    "d_minhash_lsh_near_dup",
    "r30_ngram_jaccard_pairs",
    "s_ann_ivf_topk",
    "flagship_revenue_by_nation",
    "tpch_q7_volume_shipping",
    # round-11 wave 2: the clustering family's per-round sf1 records
    # (bench sf1_total_s grows by their ~5 s from this round on —
    # per-query series stay comparable)
    "e_kmeans_lloyd",
    "e_ivf_cells_topk",
]

# key columns to offset per table (same offset per replica keeps FKs
# referentially intact within a replica)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark, out: str, replicas: int = REPLICAS,
          tables: list[str] | None = None) -> None:
    """Weak-scale sf0.1 by ``replicas``x into ``out``. ``tables`` limits
    the build (the sf10 decade only needs the probed entries' inputs —
    ~17 GB for all tables vs ~5 GB for three)."""
    from pulsar_beam_spark.sources.tables import TABLES, load_table

    os.makedirs(out, exist_ok=True)
    for name in (tables or TABLES):
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            continue
        df = load_table(spark, SRC, name)
        if name in ("region", "nation"):
            df.write.mode("overwrite").parquet(dst)
            continue
        reps = []
        dim = None
        if name == "embeddings":
            dim = len(df.select("embedding").head()["embedding"])
        for r in range(replicas):
            rep = df
            for k in KEYS[name]:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * OFF))
            if name == "part" and r > 0:
                # salt the entity-resolution block key (brand) and the
                # name: replicated parts are otherwise IDENTICAL entities,
                # so blocked fuzzy matching legitimately finds all
                # cross-replica pairs and in-block pair counts grow
                # quadratically — a fixture artifact, not operator scaling
                rep = rep.withColumn(
                    "p_brand", F.concat(F.lit(f"r{r}-"), F.col("p_brand"))
                ).withColumn("p_name", F.concat(F.lit(f"r{r} "), F.col("p_name")))
            if name == "documents" and r > 0:
                # disjoint token space per replica: prefix every token
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(F.lit(f"r{r}"), t),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if name == "embeddings" and r > 0:
                # rotate by r: norm-preserving deterministic perturbation.
                # Rotations alone only yield ``dim`` distinct replicas —
                # beyond that (the sf10 build), replicas r and r+dim
                # would be IDENTICAL vector sets and every cross pair a
                # cosine-1.0 near-dup (quadratic fixture artifact), so
                # replicas past the rotation period also negate (norm-
                # preserving; cos(v, -v) = -1, maximally far).
                rot = r % dim
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), rot + 1, dim - rot),
                        F.slice(F.col("embedding"), 1, rot),
                    ) if rot else F.col("embedding"),
                )
                if r >= dim:
                    rep = rep.withColumn(
                        "embedding", F.transform("embedding", lambda x: -x)
                    )
            reps.append(rep)
        full = reps[0]
        for rep in reps[1:]:
            full = full.unionByName(rep)
        full.write.mode("overwrite").parquet(dst)
        print(f"built {name}", file=sys.stderr)


def probe(spark, entries: list[str], out: str = "/tmp/pbs-sf1",
          samples: int = 2) -> dict[str, dict]:
    """Build (or reuse) the sf1 fixture and measure each entry at sf0.1
    and at sf1, taking the BEST of ``samples`` runs per scale (after one
    warm run). Returns {entry: {"t01": s, "t1": s, "ratio": r,
    "exponent": k}}.

    Best-of-N (round 10): single-shot ratios made the exponent gate
    flap — in a hot 50-entry session, one GC pause or a cold sf1 footer
    read on either side swings log10(t1/t01) by ±0.1-0.2, and three
    different entries "breached" on three consecutive runs while 5-run
    quiet-host medians sat comfortably under their ceilings. min() is
    the standard noise-robust timing estimator for "the plan's inherent
    cost"; it can only sit AT or BELOW the single-shot anchors recorded
    in BASELINE.md, so the ceilings stay valid and a real plan
    regression (slow on every run) still trips the gate."""
    import math

    from pulsar_beam_spark.queries import REGISTRY

    build(spark, out)

    # warm python worker pool (see bench.py)
    def _noop(it):
        import pandas as _pd  # noqa: F401
        yield from it

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_noop, "id long").write.format("noop").mode("overwrite").save()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    for name in entries:
        run(name, SRC)  # warm (footers, codegen)
        t01 = min(run(name, SRC) for _ in range(samples))
        t1 = min(run(name, out) for _ in range(samples))
        ratio = t1 / t01
        results[name] = {
            "t01": t01, "t1": t1, "ratio": ratio,
            "exponent": math.log10(max(ratio, 1e-9)),
        }
    return results


# the heaviest sf1 exponents (VERDICT r08 item 3), probed one decade
# further. d_embedding_near_dup was probed in round 9 and ADJUDICATED
# out of the anchor set: at its entry threshold (0.4) the base
# embeddings are isotropic (pairwise cos ~ N(0, 1/sqrt(64)), so 0.4 is
# a 3.2-sigma tail) and the TRUE pair count is ~5e-4 * n^2/2 (measured:
# 920 pairs at n=2k, 95,212 at n=20k) — the output itself is quadratic
# and the operator tracks it (exponent 2.18 = output-bound, optimal-ish,
# not a plan regression); at design thresholds (>=0.6, 18 pairs at
# n=20k) isotropic data defeats ANY cell/radius pruning (no 64-dim
# partition has cell radii below 90deg - theta/2), so exact dense
# near-dup without duplicate-cluster structure is inherently
# all-pairs — the documented answer at scale is the MinHash/LSH family
# or ANN top-k, which is what gets anchored here instead.
SF10_PROBE = [
    "pipeline_curation_clustered",   # documents
    "r_pagerank_iter3",              # lineitem
    "d_minhash_lsh_near_dup",        # documents (the 100 TB near-dup path)
    "d_incremental_near_dup",        # documents (production steady state)
]
SF10_TABLES = ["documents", "embeddings", "lineitem", "region", "nation"]


def probe_sf10(spark, entries: list[str] | None = None,
               sf1_dir: str = "/tmp/pbs-sf1",
               sf10_dir: str = "/tmp/pbs-sf10") -> dict[str, dict]:
    """Second weak-scaling decade: sf1 -> sf10 (100 replicas of sf0.1,
    needed tables only, ~5 GB cached). Returns
    {entry: {"t1": s, "t10": s, "ratio": r, "exponent": k}} where the
    exponent is log10(t_sf10/t_sf1) — directly comparable to the sf0.1->
    sf1 anchors in BASELINE.md / tests/test_scaling_probe.py."""
    import math

    from pulsar_beam_spark.queries import REGISTRY

    entries = entries or SF10_PROBE
    build(spark, sf1_dir)
    build(spark, sf10_dir, replicas=100, tables=SF10_TABLES)

    def _noop(it):
        import pandas as _pd  # noqa: F401
        yield from it

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_noop, "id long").write.format("noop").mode("overwrite").save()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, dict] = {}
    for name in entries:
        run(name, sf1_dir)  # warm (footers, codegen)
        # best-of-2 per scale, same rationale as probe()
        t1 = min(run(name, sf1_dir) for _ in range(2))
        t10 = min(run(name, sf10_dir) for _ in range(2))
        ratio = t10 / t1
        results[name] = {
            "t1": t1, "t10": t10, "ratio": ratio,
            "exponent": math.log10(max(ratio, 1e-9)),
        }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/pbs-sf1")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--entries", default=None,
                    help="comma-separated registry entry names (default: PROBE list)")
    ap.add_argument("--json", action="store_true",
                    help="print one JSON object instead of the markdown table")
    ap.add_argument("--sf10", action="store_true",
                    help="probe the sf1->sf10 decade (SF10_PROBE entries)")
    args = ap.parse_args()

    from pulsar_beam_spark.session import get_spark

    spark = get_spark("sf1-probe")
    if args.rebuild:
        import shutil

        shutil.rmtree(args.out, ignore_errors=True)
    if args.sf10:
        entries = args.entries.split(",") if args.entries else SF10_PROBE
        results = probe_sf10(spark, entries)
        if args.json:
            import json

            print(json.dumps({n: round(r["exponent"], 3) for n, r in results.items()}))
        else:
            print("| entry | sf1 s | sf10 s | ratio | exponent |")
            print("|---|---|---|---|---|")
            for name, r in results.items():
                print(f"| {name} | {r['t1']:.2f} | {r['t10']:.2f} | {r['ratio']:.2f}x | {r['exponent']:.2f} |")
        spark.stop()
        return
    entries = args.entries.split(",") if args.entries else PROBE
    results = probe(spark, entries, args.out)
    if args.json:
        import json

        print(json.dumps({n: round(r["exponent"], 3) for n, r in results.items()}))
    else:
        print("| entry | sf0.1 s | sf1 s | ratio | exponent |")
        print("|---|---|---|---|---|")
        for name, r in results.items():
            print(f"| {name} | {r['t01']:.2f} | {r['t1']:.2f} | {r['ratio']:.2f}x | {r['exponent']:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
