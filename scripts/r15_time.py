#!/usr/bin/env python
"""Round-15 optimization tooling: time named registry entries at an
arbitrary SF dir with N reps into the noop sink (median + all samples),
honoring $SPARK_GRAFT_CPUS — the quick A/B harness for this round's
changes (bench.py stays the authoritative record).

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/r15_time.py --names a,b --sf /tmp/pbs-sf1 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    from pulsar_beam_spark.queries import REGISTRY
    from pulsar_beam_spark.session import get_spark

    spark = get_spark("r15-time")

    # warm python worker pool (see bench.py)
    def _noop(it):
        import pandas as _pd  # noqa: F401
        yield from it

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(_noop, "id long").write.format("noop").mode("overwrite").save()

    out = {}
    for name in [n for n in args.names.split(",") if n]:
        spark.sparkContext.setJobDescription(f"r15-time:{name}")
        samples = []
        for rep in range(args.warm + args.reps):
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, args.sf).write.format(
                "noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rep >= args.warm:
                samples.append(dt)
        out[name] = {"median": round(statistics.median(samples), 3),
                     "samples": [round(s, 3) for s in samples]}
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
