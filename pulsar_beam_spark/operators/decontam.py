"""Eval-set decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard pretraining hygiene step (e.g. GPT-3 appendix C, The Pile,
FineWeb all describe variants): any training document containing an
n-gram that also appears in an evaluation benchmark is marked
contaminated so it can be dropped or audited before training.

Scale design (the asymmetry is the whole point):
- The EVAL side is tiny — benchmarks are thousands of documents, so the
  distinct eval n-gram set is a few MB and is **broadcast**; the 100 TB
  training corpus is never shuffled for the membership probe.
- The TRAIN side is one narrow projection (id, n-gram) exploded from a
  per-row ``array_distinct`` — never materialized, feeds straight into
  the broadcast hash join.
- The only shuffle is the per-doc overlap count (groupBy doc_id), and
  map-side partial aggregation collapses it to ~one row per contaminated
  doc before the exchange.
- The final left join back to the corpus re-attaches zero counts; its
  right side (hit counts) is bounded by the number of contaminated docs,
  so AQE turns it into a broadcast join in practice.

No analogue in the reference (payloads are opaque bytes,
src/model/message.go:12); extension for LLM-data work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import exploded_nonnull, shingles, tokens
from ..sources.tables import spread_small_input


def eval_ngram_set(eval_docs: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Distinct word n-grams of the evaluation set — the broadcast probe
    side. One column ``g``."""
    return exploded_nonnull(
        eval_docs, [], F.array_distinct(shingles(tokens(text_col), n)), "g"
    ).distinct()


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_hits: int = 1,
) -> DataFrame:
    """Per training document: how many of its distinct n-grams occur in
    the eval set, plus a ``contaminated`` flag (>= ``min_hits``).

    Returns (id_col, n_contaminated_ngrams BIGINT, contaminated INT).
    """
    grams = eval_ngram_set(eval_docs, text_col, n)
    train_grams = exploded_nonnull(
        spread_small_input(train_docs), [F.col(id_col)],
        F.array_distinct(shingles(tokens(text_col), n)), "g",
    )
    hits = (
        train_grams.join(F.broadcast(grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return train_docs.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("long").alias(
            "n_contaminated_ngrams"
        ),
        (F.coalesce("n_contaminated_ngrams", F.lit(0)) >= min_hits)
        .cast("int")
        .alias("contaminated"),
    )
