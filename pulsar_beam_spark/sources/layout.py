"""Physical table layout for 100 TB scale (SCALE.md "Storage layout").

Two mechanisms, both demonstrated end-to-end in tests/test_layout.py:

- ``write_partitioned`` / partition pruning: facts partitioned by
  (tenant, date) so G10 tenant isolation and time-range filters prune
  directories instead of scanning rows. The reference's
  ``persistent://tenant/ns/topic`` naming maps tenant straight to a
  partition column (src/util/util.go:78-86 builds it, handlers.go:375-421
  enforces isolation).
- ``write_bucketed`` / shuffle-free joins: the recurring fact⋈fact join
  key (e.g. orderkey) bucketed identically on both sides at write time
  removes the per-query shuffle — the join reads co-located buckets.
  Bucketing goes through the session catalog (saveAsTable), which is how
  Spark persists bucket metadata.
"""

from __future__ import annotations

import glob
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    tenant_col: str = "tenant",
    ts_col: str = "ts",
) -> None:
    """Materialize a fact table partitioned by (tenant, event date).

    Directory layout: ``path/tenant=X/event_date=YYYY-MM-DD/*.parquet``.
    A query filtering on tenant or date range lists only the matching
    directories — scan cost scales with the slice, not the table.
    """
    (
        df.withColumn("event_date", F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy(tenant_col, "event_date")
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> dict:
    """Rewrite a directory of many small parquet files into size-targeted
    files — the small-files remediation every long-running micro-batch
    sink needs (streaming epochs accrete KB-scale files until footer
    reads and task-launch overhead dominate scans; the reference's
    webhook sink has the same accretion problem on its receiving side).

    Output file count = ceil(input_bytes / target_file_bytes). With
    ``sort_col`` the rewrite uses ``repartitionByRange`` so per-file
    min/max ranges stay narrow and data-skipping survives compaction;
    without it a plain round-robin repartition balances bytes. At
    cluster scale run this per partition directory (tenant/date), not
    over the whole table, so compaction parallelizes and commits
    per-partition atomically.

    Returns {"files_in", "files_out", "bytes_in", "target_files"}.
    """
    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        # mode('overwrite') deletes dst before the lazy read scans it —
        # a same-path call would destroy the source data.
        raise ValueError("compact_small_files: dst_path must differ from src_path")
    files_in = glob.glob(os.path.join(src_path, "**", "*.parquet"), recursive=True)
    bytes_in = sum(os.path.getsize(p) for p in files_in)
    n = max(1, math.ceil(bytes_in / target_file_bytes))
    df = spark.read.parquet(src_path)
    out = df.repartitionByRange(n, sort_col) if sort_col else df.repartition(n)
    out.write.mode("overwrite").parquet(dst_path)
    files_out = glob.glob(os.path.join(dst_path, "**", "*.parquet"), recursive=True)
    return {
        "files_in": len(files_in),
        "files_out": len(files_out),
        "bytes_in": bytes_in,
        "target_files": n,
    }


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by the join key.

    Two tables bucketed identically on their join key sort-merge-join
    WITHOUT a shuffle on either side (asserted in tests): at 100 TB this
    converts the recurring lineitem⋈orders shuffle into a co-located
    bucket read.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a previously-failed run can leave the managed location behind after
    # the catalog entry is gone; saveAsTable refuses to reuse it
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse:
        leftover = os.path.join(warehouse, table_name.split(".")[-1])
        if os.path.isdir(leftover):
            shutil.rmtree(leftover, ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
