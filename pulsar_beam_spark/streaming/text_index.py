"""Streaming maintenance of the BM25 ingest artifacts (VERDICT r12
task 5 — the text counterpart of streaming/vector_index.py).

The vector sinks are simple because encoding is row-local; BM25's
dictionary (per-term document frequency) and corpus stats (doc count,
total tokens) couple GLOBALLY — a naive per-epoch overwrite of either
would make the artifact depend on which epochs ran, and a replayed
epoch could not rewrite "its" contribution without re-aggregating the
world. The merge operator (operators/text.bm25_merge_index) already
solved the math: dfreq, n and tot are all INTEGER SUMS of per-batch
partials over disjoint doc sets. So the streaming layout stores exactly
those partials, per epoch:

- ``postings/epoch=N``   — the batch's (term, doc_id, tf, dl) rows
  (row-local, pure append, the same shape the batch index persists);
- ``dictionary/epoch=N`` — the batch's PARTIAL (term, dfreq);
- ``stats/epoch=N``      — the batch's one-row partial (n, tot).

Every epoch writes ONLY functions of its own batch into its OWN
partition with overwrite — so a replayed committed epoch (the standing
foreachBatch crash discipline) rewrites identical bytes, never double
counts, exactly like the vector sinks. The global coupling moves to
the READ side (``bm25_read_index``): dictionary = sum of partials per
term, stats = sum of partial rows — integer sums, associative in any
grouping, so the served index is BIT-IDENTICAL to a one-shot
``bm25_build_index`` over the union corpus (golden-gated in
tests/test_streaming.py, fuzz-gated in the EpochIndexMachine).

Associativity also makes ``compact_artifact`` correct UNCHANGED on all
three artifacts: folding epoch partitions unions partial ROWS, and the
read-side aggregation is indifferent to how partials are partitioned.
Same crash-safety and replay-window (keep_latest) rules as the vector
artifacts.

The reference (kafkaesque-io/pulsar-beam) has no index artifacts; this
is the ingest-side maintenance the repo's t_bm25_indexed /
t_bm25_index_merge query paths assume exists at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .vector_index import compact_artifact, read_artifact


def bm25_write_epoch(
    batch_df: DataFrame,
    artifact_dir: str,
    epoch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One epoch's partial-index append — the exact function the
    foreachBatch sink runs, exported so the maintenance fuzz machine
    drives the REAL write path. mode=overwrite into the epoch's own
    partition IS the replay idempotency: every written row is a
    function of the batch alone."""
    from ..operators.text import bm25_build_index

    postings, dictionary, stats = bm25_build_index(
        batch_df, id_col=id_col, text_col=text_col)
    e = f"epoch={int(epoch_id)}"
    postings.write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "postings", e))
    dictionary.write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "dictionary", e))
    stats.write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "stats", e))


def bm25_index_sink(
    stream_df: DataFrame,
    artifact_dir: str,
    checkpoint: str,
    query_name: str = "bm25-index-maintenance",
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
):
    """availableNow foreachBatch sink appending per-epoch BM25 partials
    under ``artifact_dir`` (postings/, dictionary/, stats/ — each
    epoch-partitioned). ``compact_every=N`` folds settled epochs of all
    three artifacts after every Nth epoch (partial rows union losslessly
    — see module docstring), bounding directory counts for long-lived
    streams."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        bm25_write_epoch(batch_df, artifact_dir, epoch_id,
                         id_col=id_col, text_col=text_col)
        if compact_every and (int(epoch_id) + 1) % compact_every == 0:
            for which in ("postings", "dictionary", "stats"):
                compact_artifact(batch_df.sparkSession, artifact_dir, which)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def bm25_read_index(spark, artifact_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The query-time (postings, dictionary, stats) view over the
    streamed partials — drop-in for ``bm25_topk_indexed``'s inputs.
    Postings are the plain union (row-local rows); dictionary and stats
    re-aggregate the integer partials, which is exact in any grouping,
    so the view equals a one-shot rebuild bit-for-bit. Compaction-aware
    via vector_index.read_artifact (present outputs supersede lingering
    sources)."""
    postings = read_artifact(spark, artifact_dir, "postings")
    dictionary = (read_artifact(spark, artifact_dir, "dictionary")
                  .groupBy("term").agg(F.sum("dfreq").alias("dfreq")))
    stats = read_artifact(spark, artifact_dir, "stats").agg(
        F.sum("n").alias("n"), F.sum("tot").alias("tot"))
    return postings, dictionary, stats
