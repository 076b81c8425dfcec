"""Batch table registry over the driver-generated parquet testdata.

Reads go through ``spark.read.parquet`` so Catalyst keeps predicate
pushdown, column pruning and partition pruning (verify with
``plans.explain_summary``). At 100 TB the same call reads a partitioned
table layout (``.../events/date=.../tenant=...``) — nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins at any scale
# factor (region/nation are bounded by geography; the others are bounded
# relative to the fact tables but not absolutely — broadcast them only via
# explicit hints where the query knows the cardinality).
ALWAYS_BROADCAST = ("region", "nation")


def table_rowcount(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — a driver-side
    metadata read (milliseconds), not a Spark scan job. Used to size
    driver-side samples (e.g. the IVF coarse-quantizer stride) without
    paying a full count() pass over the table: at 100 TB a count() is a
    real job; the footers already know the answer."""
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        # Spark-written table directory (e.g. the sf1 probe fixture, or
        # any real partitioned layout): sum the part-file footers —
        # still metadata-only, no data pages read.
        import pyarrow.dataset as ds

        return ds.dataset(path, format="parquet").count_rows()
    return pq.ParquetFile(path).metadata.num_rows


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's
        # reader rejects; read nanos as long and truncate to microseconds
        # with integer division (duckdb truncates ns->us identically, so
        # oracle comparisons agree). `div` keeps 64-bit precision — a
        # double division would lose sub-ms precision at 2024 epochs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # cast to NTZ so the nanos fallback carries the SAME type the
            # direct micros read infers (tz-naive parquet -> TIMESTAMP_NTZ):
            # timestamp_micros() alone yields the LTZ type, which would
            # silently flip the whole date family from wall-clock math to
            # session-tz math on nanos-written fixtures (round-9 DST gate;
            # the cast is wall-clock-identical under the UTC session the
            # harness pins)
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)


def spread_small_input(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition a DataFrame to core count IF its input
    parallelism is below ``min_fraction`` of the cluster's slots.

    Why: CPU-heavy per-row projections (shingle hashing, tokenization,
    per-row GEMM batches) that sit BEFORE the first shuffle inherit the
    file-split parallelism of the scan. At 100 TB splits outnumber cores
    by orders of magnitude and this is a no-op (the partition check costs
    a plan analysis, no job). On a small local fixture a table is often
    ONE split, serializing the expensive map stage on a single core —
    the repartition costs a shuffle of the (small) input and buys back
    full-width execution. Deterministic for our uses: downstream
    operators aggregate/join by key, so partition placement never
    changes results.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts >= max(2, int(target * min_fraction)):
        return df
    return df.repartition(target)
