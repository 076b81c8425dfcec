"""SQL-string entry point.

The engine's primary surface is the DataFrame registry (queries.py), but
users migrating from SQL-speaking systems get the same tables as plain
ANSI SQL: ``register_tables`` exposes the testdata tables as temp views
(the same names the DuckDB oracle uses), ``run_sql`` executes a query
string through Catalyst. Nothing custom sits between the string and
Spark's parser — no bespoke dialect to maintain; every optimization in
SCALE.md applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Expose every testdata table as a temp view named exactly like the
    oracle's (region/nation/.../documents/embeddings). Returns the names."""
    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)
        names.append(prefix + t)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(query)
