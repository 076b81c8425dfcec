"""Embedding-column preprocessing: L2 normalization, symmetric int8
quantization, and cosine radius (range) search.

The vector-store prep steps that sit in front of any ANN index build
(normalize -> quantize -> index): all pure JVM higher-order expressions
(`F.transform` / `F.aggregate` sequential folds), so whole-stage codegen
keeps the per-component loops on the JVM and the plan is a single
narrow projection — zero shuffles at any corpus size, embarrassingly
parallel across 100 TB of vectors.

Determinism / oracle parity:
- All folds are sequential left folds over the double-cast vector, so
  Spark's ``F.aggregate`` and DuckDB's ``list_reduce`` produce
  bit-identical doubles (see functions/vector.py).
- Quantization rounds with ``floor(x + 0.5)`` instead of each engine's
  ``round`` so both engines evaluate the exact same IEEE expression —
  no half-even vs half-up boundary drift.

No analogue in the reference (payloads are opaque bytes,
src/model/message.go:12); extension for LLM-data / vector-store work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.litarr import lit_arr
from ..functions.vector import cosine_sim, l2_norm, valid_vector


def _vd(vec_col: Column | str) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return c.cast("array<double>")


def max_abs(vec_col: Column | str) -> Column:
    """Largest absolute component (exact in fp — max has no rounding)."""
    return F.aggregate(_vd(vec_col), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))


def l2_normalize(vec_col: Column | str) -> Column:
    """Unit-length copy of the vector (array<double>)."""
    v = _vd(vec_col)
    n = l2_norm(v)
    return F.transform(v, lambda x: x / n)


def quantize_int8(vec_col: Column | str) -> Column:
    """Symmetric int8 codes: round(x * 127 / max_abs) per component.

    ``floor(x + 0.5)`` keeps the rounding engine-portable; codes are in
    [-127, 127] by construction (|x| <= max_abs). Reconstruction is
    ``code * scale`` with ``scale = max_abs / 127``.
    """
    v = _vd(vec_col)
    m = max_abs(v)
    return F.transform(v, lambda x: F.floor(x * 127.0 / m + 0.5).cast("int"))


def quantize_vectors(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per vector: dimensionality, L2 norm, quantization scale, and the
    int8 code array — everything an index build or a storage layer needs.

    One narrow projection; the plan has no exchange of any kind.

    Invalid vectors (NULL / non-finite components / zero norm — the
    uniform family contract, functions.vector.valid_vector) are dropped:
    a zero-norm vector makes ``x * 127 / max_abs`` an ANSI
    DIVIDE_BY_ZERO abort on Spark while DuckDB would yield NULL codes,
    and non-finite codes are unrepresentable in int8 anyway.
    """
    emb = emb.filter(valid_vector(vec_col))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.size(_vd(vec_col)).cast("int").alias("n_dims"),
        l2_norm(_vd(vec_col)).alias("norm"),
        (max_abs(vec_col) / 127.0).alias("scale"),
        quantize_int8(vec_col).alias("codes"),
    )


def range_search(
    emb: DataFrame,
    query_vec: list[float],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vectors with cosine(vec, query) >= threshold — radius search,
    the other half of the vector-store API next to top-k.

    A pure scan + filter: the cosine is a codegen'd fold against a
    literal query vector and the predicate prunes rows in place, so the
    plan is shuffle-free and streams at full scan throughput. (An IVF /
    LSH pre-filter composes in front exactly as in similarity.py when
    the selectivity is known to be tiny.)
    """
    q = lit_arr([float(x) for x in query_vec]).cast("array<double>")
    cos = cosine_sim(_vd(vec_col), q)
    # invalid-vector drop (family contract): one zero-norm row would
    # abort the whole 100 TB scan with ANSI DIVIDE_BY_ZERO
    emb = emb.filter(valid_vector(vec_col))
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
