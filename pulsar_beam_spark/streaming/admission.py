"""G11 — admission control: bounded concurrent admissions with a
reject-don't-queue (429) overflow path.

Reference parity (src/middleware/middleware.go:71-81 LimitRate +
src/middleware/semaphore.go:8-40 Sema): a global semaphore of
``PulsarBeamConcurrency`` (default 200) permits; a request that cannot
acquire is answered 429 "Too many requests" immediately — admission is
non-blocking, overload sheds load instead of queueing.

Two Spark-side surfaces:

- ``Semaphore`` / ``admission_gate`` — the gateway-facing analogue: any
  driver-side request handler (ingest POST, poll, SSE attach) wraps in
  the gate; concurrency beyond the cap is rejected with 429.
  (The reference's LimitRate calls Release() unconditionally, ALSO on
  the 429 path — which frees a permit another in-flight request holds,
  softening the cap under sustained overflow. We release only what we
  acquired; the reference's Sema.Release-on-empty error semantics are
  still ported verbatim for the parity micro-test.)
- per-trigger bounds — inside the engine, admission control is the
  ``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` source knob (each
  micro-batch admits a bounded slice of the backlog; the rest stays
  queued in the source, which is where Spark wants backpressure).
  ``bounded_batch_sizes`` demonstrates/audits that bound per epoch.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame

HTTP_TOO_MANY_REQUESTS = 429
DEFAULT_CONCURRENCY = 200  # reference src/middleware/middleware.go:17


class SemaphoreError(Exception):
    pass


class Semaphore:
    """Non-blocking counting semaphore with the reference Sema's exact
    contract (src/middleware/semaphore.go:21-40): Acquire on full and
    Release on empty return errors instead of blocking."""

    def __init__(self, size: int):
        self.size = size
        self._held = 0
        self._lock = threading.Lock()

    def acquire(self) -> None:
        with self._lock:
            if self._held >= self.size:
                raise SemaphoreError("all semaphore buffer full")
            self._held += 1

    def release(self) -> None:
        with self._lock:
            if self._held <= 0:
                raise SemaphoreError("all semaphore buffer empty")
            self._held -= 1

    @property
    def in_flight(self) -> int:
        with self._lock:
            return self._held


def admission_gate(
    sema: Semaphore, handler: Callable[..., tuple[int, object]]
) -> Callable[..., tuple[int, object]]:
    """LimitRate analogue: returns a wrapped handler producing
    (status, body); over-cap calls get (429, "Too many requests")
    without invoking the handler."""

    def gated(*args, **kwargs) -> tuple[int, object]:
        try:
            sema.acquire()
        except SemaphoreError:
            return HTTP_TOO_MANY_REQUESTS, "Too many requests"
        try:
            return handler(*args, **kwargs)
        finally:
            sema.release()

    return gated


def bounded_batch_sizes(
    stream: DataFrame, checkpoint_dir: str, query_name: str = "admission-audit"
) -> list[int]:
    """Run a stream to completion recording each micro-batch's row count —
    the audit that per-trigger admission (maxFilesPerTrigger /
    maxOffsetsPerTrigger on the source) actually bounds in-flight work.
    Returns the per-epoch sizes in order."""
    sizes: list[int] = []

    def record(df: DataFrame, _epoch: int) -> None:
        sizes.append(df.count())

    q = (
        stream.writeStream.foreachBatch(record)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    return sizes
