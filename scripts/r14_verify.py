#!/usr/bin/env python
"""Round-14: targeted Spark-vs-DuckDB oracle verification for a named
subset of registry entries (the preflight_window harness pointed at an
explicit list instead of the driver window)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pulsar_beam_spark.queries import REGISTRY
    from pulsar_beam_spark.session import get_spark
    from tests.oracle_harness import compare, duck_run

    spark = get_spark("r14-verify")
    bad = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"[{i}/{len(names)}] {name}: no-oracle (skip)", flush=True)
            continue
        try:
            errs = compare(
                spec.spark(spark, sf).toPandas(),
                duck_run(spec.oracle, sf),
            )
        except Exception as e:
            errs = [f"exception: {type(e).__name__}: {e}"]
        print(f"[{i}/{len(names)}] {name}: {'ok' if not errs else 'RED'}", flush=True)
        if errs:
            bad.append((name, errs))
    print(f"\n{len(names) - len(bad)}/{len(names)} green in {time.time()-t0:.0f}s")
    for name, errs in bad:
        print(f"RED {name}: " + "; ".join(str(e)[:300] for e in errs))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
