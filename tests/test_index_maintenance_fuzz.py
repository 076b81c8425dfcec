"""VERDICT r11 item 6 — fuzz the artifact/maintenance layer.

Two rule-based machines modeled on the compaction/delivery machines:

- **EpochIndexMachine** drives the REAL streaming write path
  (streaming/vector_index.ivfpq_write_epoch — the exact function the
  foreachBatch sink runs) with interleaved appends and epoch REPLAYS
  (a committed epoch re-delivered after a crash, the standing
  foreachBatch discipline). Invariant at every step: the artifact's
  row multiset == a one-shot batch encode of everything appended —
  replay must never duplicate, reorder batches must never lose.

- **LifecycleMachine** drives the task-5 contract against the REAL
  TopicDirStore: interleaved produce / compact / ensure_artifact.
  Invariant at every step: whenever the staleness verdict is NOT
  'stale', the artifact content equals a fresh re-encode of the topic
  — i.e. 'fresh' and 'compacted' verdicts are never wrong about
  content (a wrong 'compacted' is the silent-divergence bug the
  contract exists to exclude; 'stale' is allowed to diverge, that is
  its meaning, and ensure() must restore equality).

Both machines are soaked at 10 examples by default
(PBS_FUZZ_EXAMPLES overrides; the r11 delivery machine's 1000-example
soak found a real conflation bug — these share its shape).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    rule,
    run_state_machine_as_test,
)
from pyspark.sql import functions as F

from pulsar_beam_spark.model.artifacts import artifact_staleness, ensure_artifact
from pulsar_beam_spark.server.store import TopicDirStore

_EX = int(os.environ.get("PBS_FUZZ_EXAMPLES", "10"))
TOPIC = "persistent://t/ns/idx-fuzz"


# == machine 1: epoch appends + replays on the real write path ==========

class EpochIndexMachine(RuleBasedStateMachine):
    spark = None          # injected by the test
    cents = None
    books = None
    pool = None           # list[(vec_id, [float]*64)]

    def __init__(self):
        super().__init__()
        self.tmp = tempfile.mkdtemp(prefix="pbs-idxfuzz-")
        self.art = os.path.join(self.tmp, "art")
        self.bm_art = os.path.join(self.tmp, "bm25")
        self.cursor = 0
        self.epochs: list[tuple[int, int]] = []  # epoch -> pool slice

    def _frame(self, lo: int, hi: int):
        return self.spark.createDataFrame(
            self.pool[lo:hi], "vec_id long, embedding array<double>")

    @staticmethod
    def _text(i: int):
        # deterministic, overlap-heavy vocabulary so dfreq actually
        # couples across epochs (the globally-coupled partials are what
        # the bm25 rules exist to fuzz); every 7th doc has NULL text
        # (the adversarial-corpus class: partial stats must sum cleanly
        # over null-token rows)
        if i % 7 == 0:
            return None
        return (f"data scan a{i % 3} b{i % 5} "
                + ("repeat " * (i % 4)))

    def _docs_frame(self, lo: int, hi: int):
        return self.spark.createDataFrame(
            [(int(v[0]), self._text(int(v[0]))) for v in self.pool[lo:hi]],
            "doc_id long, text string")

    @rule(n=st.integers(1, 8))
    def append_batch(self, n):
        from pulsar_beam_spark.streaming.text_index import bm25_write_epoch
        from pulsar_beam_spark.streaming.vector_index import ivfpq_write_epoch

        lo, hi = self.cursor, min(self.cursor + n, len(self.pool))
        if lo == hi:
            return
        self.cursor = hi
        epoch = len(self.epochs)
        self.epochs.append((lo, hi))
        ivfpq_write_epoch(self._frame(lo, hi), self.cents, self.books,
                          self.art, epoch)
        bm25_write_epoch(self._docs_frame(lo, hi), self.bm_art, epoch)

    @rule(pick=st.integers(0, 10_000))
    def replay_epoch(self, pick):
        from pulsar_beam_spark.streaming.text_index import bm25_write_epoch
        from pulsar_beam_spark.streaming.vector_index import (
            ivfpq_write_epoch, live_artifact_dirs)

        if not self.epochs:
            return
        # the checkpoint protocol can only re-deliver epochs whose
        # partition is still live (compact_artifact's keep_latest
        # protects the replayable window; folded epochs have retained
        # commit markers) — model exactly what the layout supports
        live = set(live_artifact_dirs(self.art, "ivfpq_codes"))
        candidates = [e for e in range(len(self.epochs))
                      if f"epoch={e}" in live]
        if candidates:
            epoch = candidates[pick % len(candidates)]
            lo, hi = self.epochs[epoch]
            ivfpq_write_epoch(self._frame(lo, hi), self.cents, self.books,
                              self.art, epoch)
        # r12 task 5: the bm25 partials replay under the SAME protocol;
        # replaying a live epoch must rewrite identical partial dfreq/
        # stats rows, never double-count them
        bm_live = set(live_artifact_dirs(self.bm_art, "postings"))
        bm_candidates = [e for e in range(len(self.epochs))
                         if f"epoch={e}" in bm_live]
        if bm_candidates:
            epoch = bm_candidates[pick % len(bm_candidates)]
            lo, hi = self.epochs[epoch]
            bm25_write_epoch(self._docs_frame(lo, hi), self.bm_art, epoch)

    @rule(fail=st.sampled_from([None, None, "after_manifest",
                                "after_rename", "mid_delete"]),
          which=st.sampled_from(["ivfpq_codes", "postings", "dictionary",
                                 "stats"]))
    def compact(self, fail, which):
        from pulsar_beam_spark.streaming.vector_index import compact_artifact

        if not self.epochs:
            return
        art = self.art if which == "ivfpq_codes" else self.bm_art
        compact_artifact(self.spark, art, which, _fail_point=fail)

    @rule()
    def fused_rrf_read_matches_one_shot(self):
        # VERDICT r13 task 6/4 — the TWO-INDEX case: the RRF fusion of
        # a sparse leg served from the live bm25 partials and a dense
        # leg served from the live ivfpq codes must equal the fusion
        # over one-shot rebuilds of BOTH indexes, at any interleaving
        # of appends/replays/compactions (each single-index invariant
        # alone does not pin the composed read). A rule, not an
        # invariant: the fused query is the expensive path and firing
        # it on every step would dominate the machine's budget.
        from pulsar_beam_spark.operators.clustering import (
            ivfpq_adc_scan, ivfpq_encode, quantized_frame)
        from pulsar_beam_spark.operators.text import (
            bm25_build_index, bm25_topk_indexed)
        from pulsar_beam_spark.queries import _rrf_fuse
        from pulsar_beam_spark.streaming.text_index import bm25_read_index
        from pulsar_beam_spark.streaming.vector_index import read_artifact

        if not self.epochs:
            return
        qrow = (quantized_frame(self._frame(0, 1))
                .select("qv").head())
        if qrow is None:
            return
        qv = [int(x) for x in qrow["qv"]]

        def fused(parts, codes):
            p, d, s = parts
            sparse = bm25_topk_indexed(p, d, s, ["data", "scan"], k=20)
            dense = (ivfpq_adc_scan(codes, self.cents, self.books, qv,
                                    nprobe=4, k=20)
                     .select("vec_id", (-F.col("adc")).cast("double")
                             .alias("cosine")))
            return [tuple(r) for r in
                    _rrf_fuse(sparse, dense, k=10, c=60).collect()]

        got = fused(bm25_read_index(self.spark, self.bm_art),
                    read_artifact(self.spark, self.art, "ivfpq_codes"))
        want = fused(bm25_build_index(self._docs_frame(0, self.cursor)),
                     ivfpq_encode(self._frame(0, self.cursor),
                                  self.cents, self.books))
        assert got == want, (
            f"fused two-index read diverged after epochs {self.epochs}")

    @invariant()
    def artifact_equals_one_shot_encode(self):
        from pulsar_beam_spark.operators.clustering import ivfpq_encode
        from pulsar_beam_spark.streaming.vector_index import read_artifact

        if not self.epochs:
            return
        m = len(self.books)
        cols = ["vec_id", "cell"] + [f"_code{i}" for i in range(m)]
        got = sorted(tuple(r) for r in read_artifact(
            self.spark, self.art, "ivfpq_codes").select(*cols).collect())
        want = sorted(tuple(r) for r in ivfpq_encode(
            self._frame(0, self.cursor), self.cents, self.books)
            .select(*cols).collect())
        assert got == want, (
            f"streamed artifact diverged from one-shot encode after "
            f"epochs {self.epochs}")

    @invariant()
    def bm25_partials_equal_one_shot_rebuild(self):
        from pulsar_beam_spark.operators.text import bm25_build_index
        from pulsar_beam_spark.streaming.text_index import bm25_read_index

        if not self.epochs:
            return
        p, d, s = bm25_read_index(self.spark, self.bm_art)
        wp, wd, ws = bm25_build_index(self._docs_frame(0, self.cursor))
        assert (sorted(tuple(r) for r in p.collect())
                == sorted(tuple(r) for r in wp.collect()))
        assert (sorted(tuple(r) for r in d.collect())
                == sorted(tuple(r) for r in wd.collect())), (
            f"partial-dfreq view diverged after epochs {self.epochs}")
        assert ([tuple(r) for r in s.collect()]
                == [tuple(r) for r in ws.collect()]), (
            f"partial-stats view diverged after epochs {self.epochs}")

    def teardown(self):
        shutil.rmtree(self.tmp, ignore_errors=True)
        super().teardown()


def test_epoch_index_interleavings(spark):
    from pulsar_beam_spark.operators.clustering import (
        ivfpq_residual_books, kmeans_fit)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q, cents = kmeans_fit(emb, k=16)
    books = ivfpq_residual_books(q, cents)
    rows = (emb.filter(F.col("embedding").isNotNull())
            .orderBy("vec_id").limit(48)
            .select("vec_id", F.col("embedding").cast("array<double>"))
            .collect())
    EpochIndexMachine.spark = spark
    EpochIndexMachine.cents = cents
    EpochIndexMachine.books = books
    EpochIndexMachine.pool = [(int(r[0]), [float(x) for x in r[1]])
                              for r in rows]
    run_state_machine_as_test(
        EpochIndexMachine,
        settings=settings(max_examples=_EX, stateful_step_count=8,
                          deadline=None),
    )


# == machine 2: the staleness contract against the real store ===========

class LifecycleMachine(RuleBasedStateMachine):
    spark = None  # injected

    def __init__(self):
        super().__init__()
        self.tmp = tempfile.mkdtemp(prefix="pbs-lcfuzz-")
        self.store = TopicDirStore(os.path.join(self.tmp, "store"),
                                   flush_interval_s=None)
        self.art = os.path.join(self.tmp, "art")
        self.n = 0
        # seed one message + build so the artifact dir always exists
        self.store.append(TOPIC, b"seed")
        self.d = self.store.topic_dir(TOPIC)
        self._rebuild(self.art)
        from pulsar_beam_spark.model.artifacts import record_provenance

        record_provenance(self.art, self.d)

    def _encode(self):
        return (self.spark.read.parquet(os.path.join(self.d, "*.parquet"))
                .select("message_id",
                        F.length("payload").cast("long").alias("n_bytes")))

    def _rebuild(self, art: str) -> None:
        self._encode().write.mode("overwrite").parquet(
            os.path.join(art, "rows"))

    @rule(n=st.integers(1, 3))
    def produce(self, n):
        for _ in range(n):
            self.store.append(TOPIC, b"m" * (self.n % 7 + 1))
            self.n += 1

    @rule()
    def compact(self):
        self.store.compact(TOPIC, watermark_us=2 ** 62, min_files=2)

    @rule()
    def ensure(self):
        ensure_artifact(self.d, self.art, self._rebuild)

    @invariant()
    def non_stale_verdicts_are_content_true(self):
        verdict = artifact_staleness(self.d, self.art)
        if verdict == "stale":
            return  # divergence allowed — that IS the verdict's meaning
        got = sorted(tuple(r) for r in self.spark.read.parquet(
            os.path.join(self.art, "rows")).collect())
        want = sorted(tuple(r) for r in self._encode().collect())
        assert got == want, (
            f"verdict {verdict!r} but artifact content diverged")

    def teardown(self):
        # ensure() must always restore equality at the end of the walk;
        # the post-verdict is fresh OR compacted (ensure deliberately
        # does NOT rebuild on compacted — content already equal, which
        # the assertion below re-proves)
        ensure_artifact(self.d, self.art, self._rebuild)
        assert artifact_staleness(self.d, self.art) in ("fresh", "compacted")
        got = sorted(tuple(r) for r in self.spark.read.parquet(
            os.path.join(self.art, "rows")).collect())
        want = sorted(tuple(r) for r in self._encode().collect())
        assert got == want
        shutil.rmtree(self.tmp, ignore_errors=True)
        super().teardown()


def test_lifecycle_interleavings(spark):
    LifecycleMachine.spark = spark
    run_state_machine_as_test(
        LifecycleMachine,
        settings=settings(max_examples=_EX, stateful_step_count=8,
                          deadline=None),
    )
