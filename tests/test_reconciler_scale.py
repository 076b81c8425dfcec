"""Reconciler control-plane scale (VERDICT r08 item 7): tick latency at
10k webhook configs.

`Reconciler.reconcile` collects the desired set per tick
(reconciler.py) — fine at the hundreds the gateway goldens cover, but
unmeasured at fleet scale until now. This pins: (a) every per-tick
structure is linear (one collect + set diffs — no pairwise scan), (b) a
steady-state tick at 10k configs completes inside a generous wall bound
on this host, and (c) coverage deltas at that scale are reported
exactly (add/remove 10 configs out of 10k).

The bound is deliberately loose (tens of seconds for a driver-side
collect of 10k exploded rows vs the reference's PbDbInterval of 180 s,
webhook.go:247) — it exists to catch an accidental quadratic tick, not
to benchmark the host.
"""

from __future__ import annotations

import time
from datetime import datetime

from pulsar_beam_spark.model.message import TOPIC_CONFIG_SCHEMA
from pulsar_beam_spark.streaming.reconciler import Reconciler

N_CONFIGS = 10_000
TICK_BOUND_S = 30.0
T0 = datetime(2024, 1, 1)


def _snapshot(spark, n, drop_prefix: int = 0):
    rows = [
        (
            f"key-{i:05d}", f"persistent://t{i % 7}/ns/topic{i}",
            "pulsar://c:6650", "", "", None, 1,
            [(f"http://ep{i}.example.com/cb", [], f"sub-{i}", "exclusive",
              "latest", 1, T0, T0, None)],
            T0, T0, i,
        )
        for i in range(drop_prefix, n)
    ]
    return spark.createDataFrame(rows, TOPIC_CONFIG_SCHEMA)


class _FakeQuery:
    def stop(self):
        pass


def test_reconciler_tick_latency_at_10k_configs(spark):
    started_mux = []

    def start_fn(row, ckpt):
        return _FakeQuery()

    def start_mux_fn(rows, ckpt):
        started_mux.append(len(rows))
        return _FakeQuery()

    rec = Reconciler(
        spark, "/tmp/pbs-reconciler-scale-ckpts", start_fn,
        start_mux_fn=start_mux_fn, multiplex_threshold=32,
    )

    snap = _snapshot(spark, N_CONFIGS).localCheckpoint()

    t0 = time.perf_counter()
    s1, t1 = rec.reconcile(snap)
    flip_tick = time.perf_counter() - t0
    assert len(s1) == N_CONFIGS and not t1
    assert started_mux == [N_CONFIGS], "one mux query serves the fleet"

    # steady state: the tick is a collect + set compare, no restarts
    t0 = time.perf_counter()
    s2, t2 = rec.reconcile(snap)
    steady_tick = time.perf_counter() - t0
    assert not s2 and not t2
    assert started_mux == [N_CONFIGS], "steady tick must not restart the mux query"
    assert steady_tick < TICK_BOUND_S, (
        f"steady-state tick took {steady_tick:.1f}s at {N_CONFIGS} configs "
        "— a linear tick on this host is seconds; investigate for a "
        "quadratic structure in reconcile()"
    )

    # coverage delta at scale: drop the first 10 configs
    snap2 = _snapshot(spark, N_CONFIGS, drop_prefix=10).localCheckpoint()
    t0 = time.perf_counter()
    s3, t3 = rec.reconcile(snap2)
    delta_tick = time.perf_counter() - t0
    assert not s3 and len(t3) == 10
    assert started_mux == [N_CONFIGS, N_CONFIGS - 10], "set change restarts mux once"
    assert delta_tick < TICK_BOUND_S

    print(
        f"\nreconciler@{N_CONFIGS}: flip={flip_tick:.2f}s "
        f"steady={steady_tick:.2f}s delta={delta_tick:.2f}s"
    )
