r"""Text tokenization / shingling / deterministic hashing as pure Spark
column expressions (JVM-side, codegen-friendly; no Python UDFs).

Determinism notes for oracle parity:
- ``tokens`` splits on runs of whitespace (``\s+``) and drops empties,
  matching duckdb ``list_filter(regexp_split_to_array(text, '\s+'),
  x -> x != '')`` exactly — including tabs/newlines and empty text.
- ``poly_fingerprint`` is a polynomial rolling hash mod 1e9+7 evaluated as
  a sequential fold, so Spark and DuckDB (``list_reduce``) agree exactly;
  every intermediate stays < 2^63 (ANSI-safe, no overflow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
MULT = 131


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def shingles(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles: ['a','b','c','d'] with n=3 ->
    ['a b c', 'b c d']. Empty when the document has < n tokens."""
    c = F.col(toks) if isinstance(toks, str) else toks
    return F.when(
        F.size(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(c) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(c, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_codes(s: Column | str) -> Column:
    """Array of UTF-8 code points of a string (via split to chars + ascii)."""
    c = F.col(s) if isinstance(s, str) else s
    return F.transform(F.filter(F.split(c, ""), lambda ch: ch != ""), F.ascii)


def poly_fingerprint(s: Column | str) -> Column:
    """Rolling polynomial hash of a string: fold h = (h*131 + code) % 1e9+7.

    Used for document fingerprinting; exact-SQL-expressible so the DuckDB
    oracle can verify it (list_reduce with the same fold).
    """
    return F.aggregate(
        char_codes(s),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * MULT + x.cast("long")) % MOD,
    )


def exploded_nonnull(df, cols, arr, alias):
    """``df.select(*cols, explode(arr).alias(alias))`` without the hidden
    2x generator re-evaluation.

    Catalyst's InferFiltersFromGenerate rewrites ``explode(expr)`` into a
    pushed-down ``size(expr) > 0 AND isnotnull(expr)`` filter BELOW any
    exchange — for expensive generators (shingling, tokenization) that
    evaluates the whole expression two extra times per input row, and in
    the pre-shuffle stage whose parallelism is the file-split count.
    ``explode_outer`` is exempt from the rule; a post-explode null filter
    on the (already computed) scalar restores inner-explode semantics
    exactly, because our token/shingle arrays never contain null
    elements.
    """
    from pyspark.sql import functions as _F

    out = df.select(*cols, _F.explode_outer(arr).alias(alias))
    return out.filter(_F.col(alias).isNotNull())
