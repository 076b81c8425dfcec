"""Mimic of the driver's DuckDB-oracle comparison: run the Spark query and
the oracle SQL on the same parquet tables, canonicalize (sort columns by
name, sort rows), and compare row-count + dtypes + exact values.

Used by tests/test_oracle_parity.py over every registry entry.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pulsar_beam_spark.sources.tables import TABLES


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    if len(sql) >= 5000:
        # DuckDB's filter_pushdown optimizer goes super-linear on the
        # giant unrolled-training CTE oracles (e_pq_trained_recall:
        # 63 s -> 4.6 s on an EMPTY corpus with it disabled; results
        # verified identical — optimizers are semantics-preserving, and
        # compare() still gates every value). The 5000-char gate cleanly
        # separates the 21 pathological oracles (>= 5748 chars, all
        # improve) from the small ones (<= 4321 chars, where pushdown
        # helps a little). Test-harness-only: the driver's own DuckDB
        # runner is untouched.
        con.execute("SET disabled_optimizers='filter_pushdown'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"]
    # The driver's value-hash is representation-sensitive: an int64 Spark
    # column vs a float64 DuckDB column (e.g. an uncast HUGEINT count_if/sum)
    # hashes differently even when 61 == 61.0.  Catch that locally.
    for c in spark_df.columns:
        sk = spark_df[c].dtype.kind
        dk = duck_df[c].dtype.kind
        if {sk, dk} <= {"i", "u"} or sk == dk:
            continue
        if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
            errs.append(f"col {c}: dtype family differs: spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
    if len(spark_df) != len(duck_df):
        errs.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return errs
    s = canonicalize(spark_df)
    d = canonicalize(duck_df)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            errs.append(f"col {c}: {len(bad)}/{len(sv)} values differ; first at row {i}: spark={x!r} duck={y!r}")
    return errs
