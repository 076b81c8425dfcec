#!/usr/bin/env python
"""Pre-flight the driver's CORRECTNESS window: run the first N entries
of queries.py's _driver_order() Spark-vs-DuckDB at sf0.01 exactly the
way the driver does (rows + schema + values via tests.oracle_harness),
so a red row is found in-session instead of in CORRECTNESS_r{N}.json.

Usage: python scripts/preflight_window.py [--n 50] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO,):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pulsar_beam_spark.queries import REGISTRY, _driver_order
    from pulsar_beam_spark.session import get_spark
    from tests.oracle_harness import compare, duck_run

    spark = get_spark("preflight-window")
    window = [n for n in _driver_order() if REGISTRY[n].oracle is not None][: args.n]
    bad = []
    t0 = time.time()
    for i, name in enumerate(window, 1):
        spec = REGISTRY[name]
        try:
            errs = compare(
                spec.spark(spark, args.sf).toPandas(),
                duck_run(spec.oracle, args.sf),
            )
        except Exception as e:  # a crash is a red row too
            errs = [f"exception: {e}"]
        status = "ok" if not errs else "RED"
        print(f"[{i:2d}/{len(window)}] {name}: {status}", flush=True)
        if errs:
            bad.append((name, errs))
    print(f"\n{len(window) - len(bad)}/{len(window)} green in {time.time()-t0:.0f}s")
    for name, errs in bad:
        print(f"RED {name}: " + "; ".join(errs))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
