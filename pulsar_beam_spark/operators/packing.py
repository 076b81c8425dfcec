"""Sequence packing: assign documents to fixed-size context windows.

Pretraining pipelines assemble training sequences by concatenating
documents in a deterministic order and chunking the concatenation into
context-length windows ("concat-and-chunk"). The operator here computes,
per document, which pack (chunk) its first token lands in — the
assignment downstream writers need to emit packed sequences.

Scale design: a single global concatenation order would force the
running-token-total window onto one partition. Instead documents are
sharded by a stable hash (see ``operators/sampling.stable_bucket``) and
packed *within* shards — the universal practice at corpus scale, since
shards are the unit of data loading anyway. The cumulative sum is then
an ordinary partitioned window: one shuffle on the shard key, parallel
across shards, and rerun-stable because both the shard and the in-shard
order derive from md5 of the document key (portable to the SQL oracle,
so the packing itself is verifiable cross-engine).

Token counts are the caller's column (any estimator or real tokenizer
output); tests use a chars/4 heuristic.

No analogue in the reference (payloads are opaque bytes,
src/model/message.go:12); extension for LLM-data work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import stable_bucket


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 80,
    stride: int = 64,
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap
    (``stride`` < ``chunk_size`` -> ``chunk_size - stride`` chars of
    overlap) — the RAG/embedding-prep sibling of sequence packing.

    Pure per-row generate-and-explode: ``sequence`` builds the 1-based
    start offsets, ``explode`` emits one row per chunk, ``substr`` clips
    the final short chunk. No shuffle at any corpus size — chunking is
    embarrassingly parallel and stays inside whole-stage codegen.

    Returns (id_col, chunk_idx INT, chunk_start INT, chunk STRING,
    chunk_len INT).
    """
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride)
    )
    return (
        df.select(F.col(id_col), F.col(text_col), F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            F.floor((F.col("chunk_start") - 1) / stride).cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.col(text_col)
            .substr(F.col("chunk_start"), F.lit(chunk_size))
            .alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )


def sequence_pack(
    df: DataFrame,
    key: str,
    tokens_col: str,
    context_len: int,
    n_shards: int = 64,
) -> DataFrame:
    """Add ``shard``, ``start_offset`` and ``pack_id`` columns.

    ``pack_id`` is the context window containing the document's first
    token under in-shard concatenation; long documents straddle into
    following windows, exactly as concat-and-chunk training does.
    """
    shard = stable_bucket(F.col(key), n_shards)
    order = stable_bucket(F.col(key), 1 << 60)
    w = (
        Window.partitionBy("shard")
        .orderBy(order, F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn(
            "start_offset", F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
        )
        .withColumn("pack_id", F.floor(F.col("start_offset") / context_len))
    )
