"""Salted skew-mitigation helpers must be row-identical to their
unsalted equivalents (pure plan rewrites, no semantic drift)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_beam_spark.operators.skew import salted_agg, salted_broadcast_fallback_join
from pulsar_beam_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_salted_agg_matches_plain_agg(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], r["sq"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sq"),
            F.max("l_orderkey").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["sq"], r["mx"])
        for r in salted_agg(
            li.withColumn("qc", F.round(F.col("l_quantity") * 100).cast("long")),
            keys=["l_returnflag"],
            salt_source_cols=["l_orderkey", "l_linenumber"],
            aggs={
                "n": ("count", "qc"),
                "sq": ("sum", "qc"),
                "mx": ("max", "l_orderkey"),
            },
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in o.join(c, "o_custkey").select("o_orderkey", "c_name").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salted_broadcast_fallback_join(o, c, on="o_custkey", n_salts=8)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert salted == plain


def test_salted_left_join_preserves_unmatched(spark):
    c = load_table(spark, SF_SMOKE, "customer").withColumnRenamed("c_custkey", "o_custkey")
    o = load_table(spark, SF_SMOKE, "orders")
    plain = c.join(o, "o_custkey", "left").filter(F.col("o_orderkey").isNull()).count()
    salted = (
        salted_broadcast_fallback_join(c, o, on="o_custkey", n_salts=4, how="left")
        .filter(F.col("o_orderkey").isNull())
        .count()
    )
    assert plain == salted
