"""Pin the bench.py recording contract (VERDICT r10 item 1).

BENCH_r10.json came back ``parsed: null`` because bench.py's single JSON
line outgrew the driver's fixed-size TAIL capture (last ~2000 chars of
stdout): the captured fragment began mid-line, so no line in it parsed.
The contract now is layered — full line first, a compact scalars-only
line LAST, full dict mirrored to bench_last_full.json — so that a
tail-of-stdout capture of ANY size >= the compact line always contains
a parseable JSON line carrying the headline calibration fields.
"""

from __future__ import annotations

import io
import json
import sys

sys.path.insert(0, "/root/repo")

from bench import emit_results  # noqa: E402

TAIL_CHARS = 2000  # the observed driver capture size in BENCH_r10.json

SCALARS = {
    "metric": "headline_query_wall_clock",
    "value": 57.3,
    "unit": "sec",
    "value_calibrated": 54.9,
    "calib_s": 0.795,
    "calib_ref_s": 0.80,
    "fanout_msgs_per_s": 27173.9,
    "gateway_ingest_s": 11.1,
    "ingest_reqs_per_s": 897.1,
    "ingest_inproc_reqs_per_s": 38314.2,
    "skew_speedup_aqe": 1.5,
    "skew_speedup_salted": 1.42,
    "sf": 0.1,
    "sf1_total_s": 63.2,
}


def _emit(tmp_path, n_queries: int) -> str:
    out = dict(SCALARS)
    # a registry far past today's 60 headline entries: the full line must
    # be allowed to outgrow ANY fixed capture without breaking parsing
    out["queries"] = {f"q_entry_{i:04d}": round(0.1 + i / 997, 3)
                      for i in range(n_queries)}
    out["sf1_queries"] = {f"q_entry_{i:04d}": 1.5 for i in range(10)}
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        emit_results(out, SCALARS, repo=str(tmp_path))
    finally:
        sys.stdout = old
    return buf.getvalue()


def _parse_tail(stdout: str, tail_chars: int) -> dict | None:
    """What a tail-capturing driver can recover: the last parseable JSON
    line inside the final ``tail_chars`` characters of stdout."""
    tail = stdout[-tail_chars:]
    for line in reversed(tail.splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def test_tail_capture_always_parses(tmp_path):
    for n in (60, 200, 1000):  # today's size and far beyond
        parsed = _parse_tail(_emit(tmp_path, n), TAIL_CHARS)
        assert parsed is not None, f"no parseable line in tail at n={n}"
        for k in ("metric", "value", "value_calibrated", "calib_s",
                  "skew_speedup_aqe", "sf", "sf1_total_s"):
            assert k in parsed, f"{k} missing from tail-recovered record"


def test_full_record_survives_on_disk(tmp_path):
    stdout = _emit(tmp_path, 500)
    # first line is the complete record when the capture is unbounded
    first = json.loads(stdout.splitlines()[0])
    assert len(first["queries"]) == 500
    # and the on-disk mirror carries the per-query timings regardless of
    # what the stdout capture kept
    disk = json.loads((tmp_path / "bench_last_full.json").read_text())
    assert disk == first


def test_compact_line_stays_inside_any_sane_tail(tmp_path):
    last = _emit(tmp_path, 1000).splitlines()[-1]
    assert len(last) < 600, "compact scalars line must stay small"
    json.loads(last)
