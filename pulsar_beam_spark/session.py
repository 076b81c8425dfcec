"""SparkSession factory.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config here is chosen to survive a 1000-executor cluster reading ~100 TB:

- AQE on (runtime re-plan: shuffle coalescing, skew-join splitting,
  broadcast demotion/promotion).
- shuffle partitions sized to cores locally; at cluster scale AQE's
  ``advisoryPartitionSizeInBytes`` governs the real fan-out, so we leave
  the initial number modest and let coalescing fix small stages.
- Arrow enabled for every Python<->JVM exchange (pandas UDFs, toPandas).
- session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(app_name: str = "pulsar-beam-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cores = default_parallelism()
    shuffle = shuffle_partitions if shuffle_partitions is not None else cores
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # INT64 micros instead of Spark's legacy INT96 timestamps: INT96
        # carries NO parquet min/max statistics, which silently disables
        # (a) row-group pruning for every pushed timestamp predicate —
        # including the poll cursor's (event_time, message_id) scan
        # filter over Spark-written topic files — and (b) the footer-min
        # regression detection and compaction watermarks in
        # streaming/poll.py, which then fall back to their conservative
        # stats-less paths (found by the round-9 compaction self-probe:
        # poll_low_water_mark returned the hold-everything 0 for any
        # Spark-written backfill file). Micros also round-trip DuckDB
        # and pyarrow exactly.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Pin the configs the DuckDB-oracle comparison depends on, for sessions
    we did not create (the driver passes its own SparkSession to entry())."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
