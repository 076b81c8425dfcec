#!/usr/bin/env python
"""Round-14 optimization tooling: per-entry measurement + plan capture.

For each requested bench-headline entry, measures the driver-side
DataFrame CONSTRUCTION time (Python expression building + any bounded
collects the entry performs while composing its plan), the
analysis+physical-planning time, and the noop-sink execution time —
the split that tells an optimizer whether an entry is py4j-bound,
Catalyst-bound or execution-bound (guide §1).  Optionally writes
``plans/r14/<name>_{before,after}.txt`` with ``explain("formatted")``.

Usage:
  python scripts/r14_capture.py --names a,b,c --tag before [--sf DIR] [--no-plan]
  python scripts/r14_capture.py --all --tag before --no-plan   # census, no files
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import bench
    from pulsar_beam_spark.queries import REGISTRY
    from pulsar_beam_spark.session import get_spark

    names = bench.HEADLINE if args.all else [
        n for n in args.names.split(",") if n]
    spark = get_spark("r14-capture")
    plan_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, dict[str, float]] = {}
    for name in names:
        rows = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, args.sf)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2))
        # warm numbers (last rep): rep0 carries one-off JVM/codegen warmup
        c, a, e = rows[-1]
        results[name] = {
            "construct_s": round(c, 3),
            "plan_s": round(a, 3),
            "exec_s": round(e, 3),
            "total_s": round(c + a + e, 3),
        }
        print(f"{name}: construct={c:.2f} plan={a:.2f} exec={e:.2f}", flush=True)
        if not args.no_plan:
            df = REGISTRY[name].spark(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)
    out_path = args.out or f"/tmp/r14_census_{args.tag}.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
