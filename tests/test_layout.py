"""Physical-layout tests: partition pruning and bucketed shuffle-free
joins — the two storage mechanisms SCALE.md leans on at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_beam_spark.plans.explain import formatted_plan
from pulsar_beam_spark.sources.layout import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)
from pulsar_beam_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _events_with_tenant(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    return ev.withColumn("tenant", F.concat(F.lit("tenant"), (F.col("user_id") % 3).cast("string")))


def test_partition_pruning_on_tenant_and_date(spark, tmp_path):
    path = str(tmp_path / "events_part")
    write_partitioned(_events_with_tenant(spark), path, tenant_col="tenant", ts_col="ts")

    df = read_partitioned(spark, path).filter(
        (F.col("tenant") == "tenant1") & (F.col("event_date") >= "2024-01-02")
    )
    plan = formatted_plan(df)
    # the tenant/date predicates must appear as PartitionFilters on the
    # scan (directory pruning), NOT as data filters after a full read
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "tenant" in pf and "event_date" in pf, pf

    # row-level result matches the unpartitioned filter
    ev = _events_with_tenant(spark).withColumn("event_date", F.to_date("ts"))
    expected = ev.filter(
        (F.col("tenant") == "tenant1") & (F.col("event_date") >= "2024-01-02")
    ).count()
    assert df.count() == expected


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=4, sort_col="l_orderkey")
    write_bucketed(o, "ord_b", "o_orderkey", n_buckets=4, sort_col="o_orderkey")

    lib, ob = spark.table("li_b"), spark.table("ord_b")
    # at sf0.001 the planner would broadcast these tiny tables; disable it
    # to model the 100 TB fact⋈fact case bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lib.join(ob, lib.l_orderkey == ob.o_orderkey)
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, (
            "bucketed co-located join must not shuffle:\n" + plan[:2000]
        )
        # same row count as the plain join
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_small_files(spark, tmp_path):
    """64 tiny files -> size-targeted rewrite: row-identical content,
    file count collapses to the computed target, and range-sorting by
    the key keeps per-file key ranges disjoint (data-skipping survives)."""
    from pulsar_beam_spark.sources.layout import compact_small_files
    from pulsar_beam_spark.sources.tables import load_table

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")
    ev.repartition(64).write.parquet(src)

    import glob as _g
    import os as _os

    bytes_in = sum(
        _os.path.getsize(p)
        for p in _g.glob(_os.path.join(src, "**", "*.parquet"), recursive=True)
    )
    stats = compact_small_files(
        spark, src, dst, target_file_bytes=max(1, bytes_in // 4), sort_col="event_id"
    )
    assert stats["files_in"] == 64
    assert stats["files_out"] <= 6, stats  # ~4 target + range-split slop
    a = spark.read.parquet(dst)
    assert a.count() == ev.count()
    # per-file event_id ranges must not overlap after the range rewrite
    import pyspark.sql.functions as F

    ranges = (
        a.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"], (prev, cur)
