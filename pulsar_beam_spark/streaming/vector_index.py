"""Streaming maintenance of the vector-index ingest artifacts.

The batch entries prove the pay-once-at-ingest query shapes: PQ codes
(queries.pq_codes_dir -> e_pq_codes_topk) and IVF cells
(queries.ivf_cells_dir -> e_ivf_cells_topk) are parquet artifacts the
query path scans instead of the float corpus. This module is the
ingest-side half a production deployment actually runs: vectors arrive
as a STREAM and the artifacts are appended per micro-batch.

Why this is simple where BM25 was not: PQ encoding and cell assignment
are ROW-LOCAL under fixed codebooks/centroids — a new vector's codes
depend on nothing but that vector — so per-batch append IS the
incremental maintenance (BM25's document frequencies and corpus stats
couple globally, hence operators/text.bm25_merge_index). The contracts
worth pinning are therefore:

1. stream == batch bit-equality: the union of all micro-batch appends
   must equal a one-shot batch encode of the same corpus (the golden in
   tests/test_streaming.py compares exact row sets);
2. exactly-once under epoch REPLAY: foreachBatch may re-deliver a
   committed epoch after a crash (the repo's standing replay
   discipline), so each epoch writes to its OWN partition directory
   with overwrite — a replayed epoch rewrites identical bytes instead
   of appending duplicates. Readers scan the artifact root; the epoch
   directory layer is just the idempotency key.

Trained artifacts (codebooks, centroids) are inputs here, produced once
by operators/clustering.pq_train_fixedpoint / kmeans_fit — retraining
is a batch event that versions the artifact dir (queries.ivf_cells_dir
encodes the recipe in its cache tag), never a streaming side effect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.clustering import (
    DEFAULT_OFFSET,
    DEFAULT_SCALE,
    assign_struct,
    pq_int_codes_vectorized,
    quantizable,
    quantize_vec,
)


def encode_batch(
    batch_df: DataFrame,
    books: list[list[list[int]]],
    cents: list[list[int]],
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _code0.._code{M-1}, cell) for one batch of vectors — the
    row-local encode both artifact families share, one guarded scan."""
    q = (
        batch_df.filter(quantizable(vec_col, dim, offset, scale))
        .select(F.col(id_col),
                quantize_vec(vec_col, scale, offset).alias("qv"))
    )
    m = len(books)
    return (
        q.select(id_col,
                 pq_int_codes_vectorized("qv", books).alias("_codes"),
                 assign_struct("qv", cents).getField("cluster").alias("cell"))
        .select(id_col,
                *[F.element_at("_codes", mi + 1).alias(f"_code{mi}")
                  for mi in range(m)],
                "cell")
    )


def vector_index_sink(
    stream_df: DataFrame,
    books: list[list[list[int]]],
    cents: list[list[int]],
    artifact_dir: str,
    checkpoint: str,
    query_name: str = "vector-index-maintenance",
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """availableNow foreachBatch sink appending per-epoch artifact
    partitions under ``artifact_dir`` (codes/epoch=N, cells/epoch=N).
    Epoch replay overwrites its own partition — idempotent by layout,
    the same discipline as the merge sink's versioned dirs."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        enc = encode_batch(batch_df, books, cents, dim, scale, offset,
                           id_col, vec_col)
        m = len(books)
        code_cols = [id_col] + [f"_code{mi}" for mi in range(m)]
        enc.select(*code_cols).write.mode("overwrite").parquet(
            os.path.join(artifact_dir, "codes", f"epoch={int(epoch_id)}"))
        enc.select(id_col, "cell").write.mode("overwrite").parquet(
            os.path.join(artifact_dir, "cells", f"epoch={int(epoch_id)}"))

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def ivfpq_index_sink(
    stream_df: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    artifact_dir: str,
    checkpoint: str,
    query_name: str = "ivfpq-index-maintenance",
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """VERDICT r11 item 2 — streaming maintenance of the COMPOSITE
    index's per-cell residual PQ codes (the artifact
    queries.ivfpq_artifacts_dir persists batch-side and
    e_ivfpq_codes_topk queries). Under FIXED trained artifacts the
    residual encode is row-local exactly like the flat families — a
    vector's cell, residual and codes depend on nothing but that
    vector — so the same per-epoch-partition overwrite discipline
    gives replay idempotency: ``ivfpq_codes/epoch=N`` rewritten
    bit-identically on a re-delivered committed epoch. Retraining
    (new cents/books) is a batch event that versions the artifact dir,
    never a streaming side effect."""
    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        ivfpq_write_epoch(batch_df, cents, books, artifact_dir, epoch_id,
                          dim=dim, scale=scale, offset=offset,
                          id_col=id_col, vec_col=vec_col)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def ivfpq_write_epoch(
    batch_df: DataFrame,
    cents: list[list[int]],
    books: list[list[list[int]]],
    artifact_dir: str,
    epoch_id: int,
    dim: int = 64,
    scale: int = DEFAULT_SCALE,
    offset: float = DEFAULT_OFFSET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One epoch's append — the exact function the foreachBatch sink
    runs, exported so the maintenance fuzz machine drives the REAL
    write path (tests/test_index_maintenance_fuzz.py), not a copy.
    mode=overwrite into the epoch's own partition directory IS the
    replay idempotency."""
    from ..operators.clustering import ivfpq_encode

    enc = ivfpq_encode(batch_df, cents, books, dim=dim, scale=scale,
                       offset=offset, id_col=id_col, vec_col=vec_col)
    enc.write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "ivfpq_codes", f"epoch={int(epoch_id)}"))


def read_artifact(spark, artifact_dir: str, which: str) -> DataFrame:
    """Scan the streamed artifact root (epoch layer is layout only)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(artifact_dir, which))
