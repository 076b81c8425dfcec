"""Declared query registry — the contract consumed by __spark_entry__.py.

Every entry pairs a Spark DataFrame builder with (when SQL-expressible)
an equivalent DuckDB oracle SQL string. Design rules for hash-stable
oracle parity (SURVEY.md §5.2):

- Money/decimal aggregates are INTEGERIZED: per-row ``round(x*100)`` to
  BIGINT cents, integer sums (order-independent, exact), divide once at
  the end — Spark's parallel sum and DuckDB's sequential sum then emit
  bit-identical doubles. No float-accumulation nondeterminism.
- Per-row float expressions are rounded to 6 decimals on both sides.
- Integer sums in DuckDB are CAST(... AS BIGINT) (duckdb widens to
  HUGEINT, Spark stays LongType).
- Epoch seconds use floor() semantics on both sides.
- Every computed column is aliased identically in both dialects.
- LIMIT/top-k queries carry a unique-key tie-break so the result set is
  deterministic.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.asof import asof_join
from .operators.components import dedup_clusters
from .operators.decontam import decontaminate
from .operators.dedup import (
    duplicate_span_stats,
    incremental_near_dup,
    embedding_near_dup_pairs,
    exact_dedup_latest,
    exact_jaccard_pairs,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from .operators.merge import merge_upsert
from .operators.multimodal import extract_features, media_from_documents
from .operators.vectors import quantize_vectors, range_search
from .operators.packing import chunk_documents, sequence_pack
from .operators.sampling import (
    deterministic_split,
    rank_calibrate,
    shard_shuffle,
    stable_bucket_sql,
    stratified_sample,
    weighted_mix,
    weighted_mix_sql,
)
from .operators.similarity import brute_force_topk, hyperplane_lsh_topk, ivf_topk, mips_topk
from .operators.text import language_id, quality_scores, token_stats, top_terms
from .operators.text import doc_fingerprints, pii_scrub, repetition_scores, tf_idf
from .operators.text import unigram_logprob
from .operators.text import (
    BPE_MERGES,
    bpe_token_count,
    bpe_token_stats,
    gen_bpe_merges,
)
from .functions.litarr import lit_arr
from .functions.texthash import poly_fingerprint
from .model.topic import gen_key_from_names, tenant_from_topic_col, topic_key_col
from .sources.tables import load_table
from .sql import run_sql


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# -- integerized money helpers (see module docstring) ---------------------
def cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


def money_sum(col: str, alias: str) -> F.Column:
    return (F.sum(cents(col)).cast("double") / 100).alias(alias)


# == flagship =============================================================

FLAGSHIP_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


@register("flagship_revenue_by_nation", FLAGSHIP_ORACLE,
          doc="R1-R5+R11: 4-way join, broadcast dims, integerized revenue agg")
def q_flagship(spark: SparkSession, sf: str) -> DataFrame:
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    c, n, r = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "region")
    revenue = (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 10000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter((F.col("r_name") == "ASIA") & (F.col("o_orderdate") >= "1996-01-01"))
        .groupBy("n_name")
        .agg(revenue.alias("revenue"), F.count("*").alias("n_items"))
    )


# == R1-R3: scan / projection / filter ===================================

@register(
    "r01_scan_project",
    "SELECT p_partkey, p_name, round(p_retailprice * 0.9, 6) AS discounted FROM part",
    doc="R1+R2: parquet scan with column pruning + computed projection",
)
def q_r01(spark, sf):
    return T(spark, sf, "part").select(
        "p_partkey", "p_name", F.round(F.col("p_retailprice") * 0.9, 6).alias("discounted")
    )


@register(
    "r03_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND l_returnflag IN ('A','N') AND l_quantity BETWEEN 5 AND 30
    """,
    doc="R3: BETWEEN + IN filters, pushed to the parquet scan",
)
def q_r03(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
        & F.col("l_returnflag").isin("A", "N")
        & F.col("l_quantity").between(5, 30)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# == R4-R9: joins ========================================================

@register(
    "r04_inner_join",
    """
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment
    """,
    doc="R4+R11: shuffle hash/sort-merge equi-join + hash aggregate",
)
def q_r04(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), money_sum("o_totalprice", "total_price"))
    )


@register(
    "r05_broadcast_join",
    """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
    """,
    doc="R5: explicit broadcast of the small dims — no shuffle of the fact side",
)
def q_r05(spark, sf):
    li, s, n = T(spark, sf, "lineitem"), T(spark, sf, "supplier"), T(spark, sf, "nation")
    rev = (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 10000)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
    )


@register(
    "r06_left_join",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(round(o.o_totalprice*100,0) AS BIGINT)), 0) AS DOUBLE)/100 AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY c.c_custkey
    """,
    doc="R6: left outer join preserving customers with zero orders",
)
def q_r06(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(
            F.count(o.o_orderkey).alias("n_orders"),
            (F.coalesce(F.sum(cents("o_totalprice")), F.lit(0).cast("long")).cast("double") / 100).alias(
                "total_spent"
            ),
        )
    )


@register(
    "r06_full_outer_join",
    """
    WITH s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1),
         c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1)
    SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
           coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
    FROM s FULL JOIN c ON s.nationkey = c.nationkey
    """,
    doc="R6: full outer join of two aggregates",
)
def q_r06f(spark, sf):
    s = T(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("n_supp"))
    c = T(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("n_cust"))
    zero = F.lit(0).cast("long")
    return (
        s.join(c, "nationkey", "full")
        .select(
            F.col("nationkey"),
            F.coalesce("n_supp", zero).alias("n_supp"),
            F.coalesce("n_cust", zero).alias("n_cust"),
        )
    )


@register(
    "r07_semi_join",
    """
    SELECT c_mktsegment, count(*) AS n_customers FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY c_mktsegment
    """,
    doc="R7: left semi join (EXISTS)",
)
def q_r07s(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "r07_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="R7: left anti join (NOT EXISTS)",
)
def q_r07a(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "anti").select("c_custkey", "c_name")


@register(
    "r08_range_join",
    """
    SELECT n_name, count(*) AS n_pairs
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n_name
    """,
    doc="R8: equi+range theta join (equi key carries the shuffle; range is a post-filter)",
)
def q_r08(spark, sf):
    s, c, n = T(spark, sf, "supplier"), T(spark, sf, "customer"), T(spark, sf, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "r09_cross_join",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
    doc="R9: cross join of two bounded dims",
)
def q_r09(spark, sf):
    return T(spark, sf, "region").crossJoin(T(spark, sf, "nation")).select("r_name", "n_name")


@register(
    "r10_asof_join",
    """
    WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, c.ts AS click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="R10: as-of join via union+window rewrite, cross-checked vs duckdb native ASOF",
)
def q_r10(spark, sf):
    ev = T(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    joined = asof_join(p, c, ["user_id"], "ts", "ts", ["event_id"])
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("event_id_right").alias("click_id"),
        F.col("ts_right").alias("click_ts"),
    )


# == R11-R14: aggregates =================================================

@register(
    "r11_tpch_q1_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS sum_disc_price,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))
                    * (100 + CAST(round(l_tax*100,0) AS BIGINT))) AS DOUBLE)/1000000 AS sum_charge,
           CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100/count(*) AS avg_qty,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100/count(*) AS avg_price,
           CAST(sum(CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/100/count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="R11: TPC-H Q1-shaped 8-agg hash aggregate, integerized money math",
)
def q_r11(spark, sf):
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2000-12-01")
    qty, price, disc, tax = cents("l_quantity"), cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    n = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty).cast("double") / 100).alias("sum_qty"),
        (F.sum(price).cast("double") / 100).alias("sum_base_price"),
        (F.sum(price * (100 - disc)).cast("double") / 10000).alias("sum_disc_price"),
        (F.sum(price * (100 - disc) * (100 + tax)).cast("double") / 1000000).alias("sum_charge"),
        (F.sum(qty).cast("double") / 100 / n).alias("avg_qty"),
        (F.sum(price).cast("double") / 100 / n).alias("avg_price"),
        (F.sum(disc).cast("double") / 100 / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "r11_stats_aggregates",
    """
    WITH s AS (SELECT l_returnflag,
                      count(*) AS n,
                      CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sq,
                      CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)
                               * CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sqq,
                      CAST(sum(CAST(round(l_discount*100,0) AS BIGINT)) AS BIGINT) AS sd,
                      CAST(sum(CAST(round(l_discount*100,0) AS BIGINT)
                               * CAST(round(l_discount*100,0) AS BIGINT)) AS BIGINT) AS sdd,
                      CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)
                               * CAST(round(l_discount*100,0) AS BIGINT)) AS BIGINT) AS sqd
               FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round(sqrt((n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq) / (n * (n - 1.0))) / 100, 6) AS stddev_qty,
           round((n * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * sd)
                 / sqrt(n * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq)
                 / sqrt(n * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd), 6) AS corr_qty_disc
    FROM s
    """,
    doc="R11 depth: sample stddev + Pearson correlation derived from INTEGER moment "
        "sums (n, Σx, Σx², Σxy exact in BIGINT; the float formula is scalar, so "
        "parallel vs sequential accumulation cannot diverge)",
)
def q_stats(spark, sf):
    li = T(spark, sf, "lineitem")
    q, d = cents("l_quantity"), cents("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("sq"),
        F.sum(q * q).alias("sqq"),
        F.sum(d).alias("sd"),
        F.sum(d * d).alias("sdd"),
        F.sum(q * d).alias("sqd"),
    )
    n = F.col("n")
    var_q = n * F.col("sqq").cast("double") - F.col("sq").cast("double") * F.col("sq")
    var_d = n * F.col("sdd").cast("double") - F.col("sd").cast("double") * F.col("sd")
    cov = n * F.col("sqd").cast("double") - F.col("sq").cast("double") * F.col("sd")
    # denominators mirror DuckDB's x/0 -> NULL (ANSI Spark raises
    # DIVIDE_BY_ZERO instead): a single-row group has zero degrees of
    # freedom, a constant column has zero variance — both yield NULL
    # statistics on both engines (single-row/ties fuzz sweep, round 8)
    return s.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt(var_q / F.nullif(n * (n - F.lit(1.0)), F.lit(0.0))) / 100, 6).alias("stddev_qty"),
        F.round(cov / F.nullif(F.sqrt(var_q), F.lit(0.0)) / F.nullif(F.sqrt(var_d), F.lit(0.0)), 6).alias("corr_qty_disc"),
    )


@register(
    "r12_distinct",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="R12: distinct projection",
)
def q_r12(spark, sf):
    return T(spark, sf, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "r12_count_distinct",
    """
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="R12: exact count-distinct (expand+two-phase agg in Spark)",
)
def q_r12cd(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "r13_approx_count_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS INTEGER) AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="R13: HLL++ approx count-distinct as a HASH-checkable verdict entry "
        "(VERDICT r05 item 1a — the sketch estimate is engine-specific, so "
        "no value hash can compare it directly). The row carries (a) the "
        "exact distinct count, cross-checked value-for-value against "
        "DuckDB, and (b) the Spark-computed tolerance verdict "
        "|approx - exact| <= 3*rsd*exact; the oracle asserts the verdict "
        "is TRUE for every group, so a sketch drifting outside its "
        "advertised 3-sigma rsd turns the driver row red.",
)
def q_r13(spark, sf):
    agg = (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.05).alias("_approx"),
        )
    )
    within = (
        F.abs(F.col("_approx") - F.col("exact_parts")) <= 3 * 0.05 * F.col("exact_parts")
    ).cast("int")
    return agg.select("l_returnflag", "exact_parts", within.alias("within_tol"))


@register(
    "r14_rollup",
    """
    SELECT r_name, n_name,
           CAST(grouping(r_name) AS INTEGER) AS grp_r, CAST(grouping(n_name) AS INTEGER) AS grp_n,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="R14: rollup with grouping() flags",
)
def q_r14(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    n, r = T(spark, sf, "nation"), T(spark, sf, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("grp_r"),
            F.grouping("n_name").cast("int").alias("grp_n"),
            F.count("*").alias("n_orders"),
            money_sum("o_totalprice", "total_price"),
        )
        .select("r_name", "n_name", "grp_r", "grp_n", "n_orders", "total_price")
    )


@register(
    "r14_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS grp_f, CAST(grouping(l_linestatus) AS INTEGER) AS grp_s,
           count(*) AS n_items
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="R14: cube",
)
def q_r14c(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("grp_f"),
            F.grouping("l_linestatus").cast("int").alias("grp_s"),
            F.count("*").alias("n_items"),
        )
        .select("l_returnflag", "l_linestatus", "grp_f", "grp_s", "n_items")
    )


# == R15-R19: windows / sort / top-k =====================================

@register(
    "r15_window_rank",
    """
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER w AS rn, rank() OVER w AS rk,
             dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile
      FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rn <= 3
    """,
    doc="R15: ranking window functions, top-3 per nation",
)
def q_r15(spark, sf):
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        T(spark, sf, "customer")
        .select(
            "c_nationkey", "c_custkey", "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "r16_lag_lead",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           CAST(floor(epoch(o_orderdate)) - floor(epoch(lag(o_orderdate) OVER w)) AS BIGINT) AS gap_s
    FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="R16: lag/lead analytic windows",
)
def q_r16(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        (F.unix_timestamp("o_orderdate") - F.unix_timestamp(F.lag("o_orderdate").over(w))).alias("gap_s"),
    )


@register(
    "r17_window_frames",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100 AS running_spend,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)/100 AS last3_spend
    FROM orders
    """,
    doc="R17: rows-frame running + bounded windows, integerized",
)
def q_r17(spark, sf):
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = base.rowsBetween(-2, Window.currentRow)
    c = cents("o_totalprice")
    return T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey",
        (F.sum(c).over(run).cast("double") / 100).alias("running_spend"),
        (F.sum(c).over(last3).cast("double") / 100).alias("last3_spend"),
    )


@register(
    "r18_sort_with_position",
    """
    WITH top AS (SELECT o_orderkey, o_totalprice FROM orders
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 500)
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
    FROM top
    """,
    doc="R18: global sort verified by embedded position (TakeOrdered, no full-sort shuffle)",
)
def q_r18(spark, sf):
    top = (
        T(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(500)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return top.withColumn("pos", F.row_number().over(w))


@register(
    "r19_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    doc="R19: top-k with unique tie-break (TakeOrderedAndProject)",
)
def q_r19(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# == R20-R21: set operations =============================================

@register(
    "r20_union_all",
    """
    SELECT src, count(*) AS n FROM (
      SELECT 'high' AS src, o_orderkey FROM orders WHERE o_totalprice > 150000
      UNION ALL
      SELECT 'urgent' AS src, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) GROUP BY src
    """,
    doc="R20: union all of two branches",
)
def q_r20(spark, sf):
    o = T(spark, sf, "orders")
    hi = o.filter(F.col("o_totalprice") > 150000).select(F.lit("high").alias("src"), "o_orderkey")
    ur = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.lit("urgent").alias("src"), "o_orderkey")
    return hi.unionByName(ur).groupBy("src").agg(F.count("*").alias("n"))


@register(
    "r21_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="R21: intersect",
)
def q_r21i(spark, sf):
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@register(
    "r21_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT SELECT o_custkey AS c_custkey FROM orders
    """,
    doc="R21: except",
)
def q_r21e(spark, sf):
    c = T(spark, sf, "customer").select("c_custkey")
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


# == R22-R28: scalar function surface ====================================

@register(
    "r22_string_fns",
    """
    SELECT p_partkey,
           upper(p_name) AS name_u,
           lower(p_brand) AS brand_l,
           substr(p_name, 1, 5) AS name5,
           p_brand || '/' || p_type AS brand_type,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           trim(' ' || p_name || ' ') AS name_trim,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
           string_split(p_name, ' ')[1] AS name_first
    FROM part
    """,
    doc="R22: string scalar functions, duckdb-parity semantics",
)
def q_r22(spark, sf):
    p = T(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.lower("p_brand").alias("brand_l"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.split("p_name", " ").getItem(0).alias("name_first"),
    )


@register(
    "r23_date_fns",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           CAST(day(o_orderdate) AS INTEGER) AS o_day,
           date_trunc('month', o_orderdate) AS o_month_start,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_epoch,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INTEGER) AS ship_delay_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    doc="R23: date/time functions (UTC both sides; floor-epoch convention)",
)
def q_r23(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("o_month_start"),
        F.unix_timestamp("o_orderdate").alias("o_epoch"),
        F.datediff("l_shipdate", "o_orderdate").alias("ship_delay_days"),
    )


@register(
    "r24_math_fns",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * l_discount, 6) AS disc_amt,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_quantity - 25.0) AS qty_dev,
           round(pow(l_discount + 1.0, 2), 6) AS disc_pow,
           round(ln(l_extendedprice + 1.0), 6) AS log_price,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           ((l_orderkey % 7) + 7) % 7 AS key_mod
    FROM lineitem WHERE l_linenumber = 1
    """,
    doc="R24: math scalar functions (pmod spelled out for duckdb)",
)
def q_r24(spark, sf):
    li = T(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("disc_amt"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.round(F.pow(F.col("l_discount") + 1.0, 2), 6).alias("disc_pow"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
    )


@register(
    "r25_array_fns",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           list_contains(toks, 'spark') AS has_spark,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq,
           list_sort(toks)[1] AS first_sorted,
           array_to_string(toks[1:3], ' ') AS first3
    FROM t
    """,
    doc="R25: array higher-order functions over tokenized text",
)
def q_r25(spark, sf):
    d = T(spark, sf, "documents")
    toks = F.split("text", r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.sort_array(toks).getItem(0).alias("first_sorted"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("first3"),
    )


@register(
    "r25_higher_order_fns",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           round(list_reduce(list_transform(v, x -> x * x), (a, x) -> a + x), 6) AS sum_sq,
           CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
           len(list_filter(v, x -> x > 0.9)) > 0 AS any_big,
           round(list_reduce(list_transform(list_zip(v, v), p -> p[1] * p[2]), (a, x) -> a + x), 6) AS self_dot
    FROM e
    """,
    doc="R25 depth: higher-order functions (transform/filter/exists/aggregate/zip_with) "
        "as a user-facing surface — sequential folds match duckdb list_reduce exactly",
)
def q_r25h(spark, sf):
    v = F.col("embedding").cast("array<double>")
    return T(spark, sf, "embeddings").select(
        "vec_id",
        F.round(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("sum_sq"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: x > 0.9).alias("any_big"),
        F.round(
            F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("self_dot"),
    )


@register(
    "r25_nested_array_fns",
    """
    WITH t AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks,
                      CASE WHEN doc_id % 7 = 0 THEN NULL
                           ELSE list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') END AS maybe_toks
               FROM documents WHERE doc_id < 40)
    SELECT doc_id,
           CAST(len(flatten([toks[1:2], toks[3:4]])) AS INTEGER) AS n_flat,
           tok
    FROM (SELECT doc_id, toks,
                 unnest(CASE WHEN maybe_toks IS NULL THEN [NULL] ELSE maybe_toks END) AS tok
          FROM t)
    """,
    doc="R25 depth: flatten + explode_outer (null array keeps the row with a null element)",
)
def q_r25n(spark, sf):
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 40)
    toks = F.split("text", r"\s+")
    maybe = F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(toks)
    return (
        d.select(
            "doc_id",
            F.size(F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2)))).alias("n_flat"),
            F.explode_outer(maybe).alias("tok"),
        )
        .select("doc_id", "n_flat", "tok")
    )


@register(
    "r26_map_fns",
    """
    SELECT event_id,
           map_extract(m, 'type')[1] AS mtype,
           map_extract(m, 'uid')[1] AS muid,
           array_to_string(map_keys(m), ',') AS keys_str,
           CAST(cardinality(m) AS INTEGER) AS n_keys
    FROM (SELECT event_id,
                 map(['type','uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
          FROM events)
    """,
    doc="R26: map construction + element access (duckdb map_extract returns a list)",
)
def q_r26(spark, sf):
    ev = T(spark, sf, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("mtype"),
        F.element_at(m, "uid").alias("muid"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_str"),
        F.size(m).alias("n_keys"),
    )


@register(
    "r27_json_fns",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="R27: JSON path extraction over the props payload column",
)
def q_r27(spark, sf):
    ev = T(spark, sf, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@register(
    "r28_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x,
           least(o_totalprice, 150000.0) AS capped,
           greatest(o_totalprice, 50000.0) AS floored
    FROM orders
    """,
    doc="R28: CASE WHEN / coalesce / nullif / least / greatest",
)
def q_r28(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_x"),
        F.least("o_totalprice", F.lit(150000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(50000.0)).alias("floored"),
    )


# == R29-R31 + extensions: dedup / similarity ============================

@register(
    "r29_dedup_exact_latest",
    """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="R29/G8: exact dedup — latest row per key (compacted-topic materialization)",
)
def q_r29(spark, sf):
    ev = T(spark, sf, "events")
    return exact_dedup_latest(ev, ["user_id"], "ts", "event_id").select(
        "user_id", "event_id", "event_type", "value"
    )


JACCARD_ORACLE = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
    FROM toks)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b, round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
"""


# Hot-shingle-capped variant (VERDICT r06 item 5): shingles in more than
# MAX_DF docs are dropped from intersections AND set sizes before pairing,
# bounding per-shingle join fan-out at MAX_DF^2 — the stop-shingle cut
# that keeps exact pair discovery linear in distinct shingles as posting
# lists densify with corpus growth. The UNCAPPED JACCARD_ORACLE above
# stays the composition piece for the curation pipelines (their Spark
# side is the uncapped LSH verify, which must keep matching it).
_R30_MAX_DF = 5
JACCARD_ORACLE_CAPPED = f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
sh0 AS (SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
    FROM toks)),
dfc AS (SELECT s, count(*) AS df FROM sh0 GROUP BY 1),
sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN dfc USING (s) WHERE dfc.df <= {_R30_MAX_DF}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b, round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
"""


@register(
    "r30_ngram_jaccard_pairs",
    JACCARD_ORACLE_CAPPED,
    doc="R30 ground truth: exact 3-gram shingle Jaccard pairs >= 0.5 over the "
        f"non-hot shingle space (df <= {_R30_MAX_DF} stop-shingle cut; "
        "output-bound shingle self-join with bounded per-shingle fan-out)",
)
def q_r30(spark, sf):
    return exact_jaccard_pairs(T(spark, sf, "documents"), threshold=0.5,
                               max_df=_R30_MAX_DF)


def _minhash_lsh_oracle(threshold: float = 0.5, num_hashes: int = 32,
                        bands: int = 16, seed: int = 42) -> str:
    """DuckDB recomputes the ENTIRE MinHash+LSH pipeline — signatures,
    banding, candidate join, exact-Jaccard verify — from the same (a, b)
    literals (VERDICT r04 item 7, the s_ann_recall_audit strategy).  The
    portable md5/31-bit hash family (operators/dedup.py:_portable_hash31)
    keeps every product exact in 64-bit integers, so both engines derive
    identical signatures and identical candidate sets, making the
    approximation itself hash-checkable."""
    from .operators.dedup import _P31, _hash_params31

    params = _hash_params31(num_hashes, seed)
    rpb = num_hashes // bands
    mins = ",\n       ".join(
        f"min(({a}*h+{b})%{_P31}) AS h{i}" for i, (a, b) in enumerate(params))
    band_branches = "\n    UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, concat_ws(',', "
        + ", ".join(f"h{j * rpb + r}" for r in range(rpb))
        + ") AS vals FROM sig" for j in range(bands))
    return f"""
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
    FROM toks)),
hh AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_P31} AS h FROM sh),
sig AS (SELECT doc_id,
       {mins}
  FROM hh GROUP BY doc_id),
bb AS (SELECT doc_id, band,
              CAST('0x' || substr(md5(vals), 1, 15) AS BIGINT) % {_P31} AS bucket
       FROM ({band_branches})),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                            AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT c.id_a, c.id_b, count(*) AS c
          FROM cand c JOIN sh a ON a.doc_id = c.id_a
                      JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
          GROUP BY 1, 2)
SELECT id_a, id_b, round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= {threshold}
"""


@register(
    "d_minhash_lsh_near_dup",
    _minhash_lsh_oracle(),
    doc="R30 scale path: MinHash(32)+LSH(16 bands) candidates, exact-Jaccard "
        "verified — portable md5/31-bit hash family makes the full pipeline "
        "hash-checkable against a DuckDB recomputation",
)
def q_minhash(spark, sf):
    return minhash_near_dup_pairs(
        T(spark, sf, "documents"), threshold=0.5, num_hashes=32, bands=16,
        portable=True,
    )


def _simhash_oracle(bits: int = 60, max_hamming: int = 8,
                    prefix_bits: int = 12) -> str:
    """DuckDB recomputes the full SimHash pipeline from the portable
    md5-prefix token hash: 60 per-bit +/-1 sums -> sign bits -> prefix
    bucket -> hamming join.  Same strategy as _minhash_lsh_oracle."""
    sums = ",\n       ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits))
    sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits))
    return f"""
WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS tok FROM documents),
hh AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
sums AS (SELECT doc_id,
       {sums}
  FROM hh GROUP BY doc_id),
sig AS (SELECT doc_id, {sig} AS simhash FROM sums),
bk AS (SELECT doc_id, simhash, simhash >> {bits - prefix_bits} AS bucket FROM sig)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


@register(
    "d_simhash_near_dup",
    _simhash_oracle(),
    doc="SimHash near-dup pairs within hamming<=8, prefix-bucketed — portable "
        "md5 token hash makes the signatures hash-checkable vs a DuckDB recomputation",
)
def q_simhash(spark, sf):
    return simhash_near_dup_pairs(T(spark, sf, "documents"), max_hamming=8,
                                  prefix_bits=12, portable=True)


def _finite_vec_sql(v: str) -> str:
    """DuckDB mirror of functions.vector.valid_vector for expression
    ``v`` (a DOUBLE[]): non-NULL, all components non-NULL and finite,
    squared norm > 0. ``x*x > 0`` over non-negative terms is
    order-independent, so no fold-order coupling with Spark. Spliced
    into the corpus/query CTE of EVERY vector-family oracle (ADVICE r08:
    the guard existed but was not wired in, so a NaN corpus vector made
    DuckDB rank NaN cosines to the top while the implementation dropped
    the row — the parity contract held only on clean fixtures)."""
    return (
        f"({v} IS NOT NULL"
        f" AND len(list_filter({v}, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0"
        f" AND len(list_filter({v}, x -> x * x > 0)) > 0)"
    )


EMBED_NEARDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y))) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(cos, 6) AS cosine FROM p WHERE cos >= 0.4
"""


@register(
    "d_embedding_near_dup",
    EMBED_NEARDUP_ORACLE,
    doc="Embedding-cosine near-dup pairs (exact; sequential-fold dot product both sides)",
)
def q_embed_dup(spark, sf):
    from .sources.tables import table_rowcount

    return embedding_near_dup_pairs(
        T(spark, sf, "embeddings"), threshold=0.4,
        # parquet-footer rowcount: sizes the quantizer sample stride
        # without a count() scan job (results identical — same n)
        n_hint=table_rowcount(sf, "embeddings"),
    )


COSINE_TOPK_ORACLE = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
s AS (SELECT c.vec_id,
             list_reduce(list_transform(list_zip(c.v, q.qv), x -> x[1] * x[2]), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y))
                * sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y))) AS cos
      FROM c, q)
SELECT vec_id, round(cos, 6) AS cosine FROM s ORDER BY cos DESC, vec_id LIMIT 10
"""



def _query_vec(emb, vec_id: int) -> list | None:
    """Literal query vector for the ANN entries: the stored embedding of
    ``vec_id``, or None when the id is missing or its embedding is
    INVALID — NULL (ADVICE r07), any component NULL/non-finite, or zero
    squared norm (round-8 float-extremes sweep: a NaN query's hyperplane
    sign bits are computed here in PYTHON, where NaN > 0 is False, while
    both Spark SQL and DuckDB say True — the LSH probe set silently
    diverged; a zero norm aborts Spark's ANSI cosine). A None query must
    NOT be papered over with a dummy vector on a non-empty corpus: the
    consumers would rank NULL cosines and still emit k rows via LIMIT
    while the oracles' guarded query CTE goes empty — callers collapse
    to an empty, correctly-typed frame instead (``_ann_entry``). The
    oracle mirror is ``_finite_vec_sql`` on the q CTE."""
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").head()
    if row is None or row["embedding"] is None:
        return None
    vals = []
    for x in row["embedding"]:
        if x is None or not math.isfinite(x):
            return None
        vals.append(float(x))
    if not any(v * v > 0 for v in vals):
        return None
    return vals


def _ann_entry(emb, vec_id: int, build):
    """Run ``build(query_vec)`` against the stored embedding of
    ``vec_id``; when that query vector is missing or NULL, keep the
    consumer's exact plan schema but collapse it to an empty frame
    (PruneFilters folds the lit(False) into an empty LocalRelation) —
    mirroring the oracles' empty query CTE cross-join. The [0.0] dummy
    only shapes the pruned plan's schema; no row ever flows through it."""
    qv = _query_vec(emb, vec_id)
    out = build(qv if qv is not None else [0.0])
    return out if qv is not None else out.where(F.lit(False))


@register(
    "r31_cosine_topk",
    COSINE_TOPK_ORACLE,
    doc="R31: brute-force cosine top-k to a constant query vector (TakeOrdered)",
)
def q_r31(spark, sf):
    emb = T(spark, sf, "embeddings")
    return _ann_entry(emb, 0, lambda qv: brute_force_topk(emb, qv, k=10))


def _ann_audit_dot_sql(vexpr: str, consts) -> str:
    lits = ",".join(repr(float(c)) for c in consts)
    return (f"list_reduce(list_transform(list_zip({vexpr}, [{lits}]::DOUBLE[]), "
            "x -> x[1]*x[2]), (x, y) -> x + y)")


def _ann_lsh_topk_oracle(bits: int = 8, seed: int = 42, dim: int = 64,
                         hamming: int = 2, k: int = 10) -> str:
    """DuckDB recomputes the SAME approximation (VERDICT r04 item 7: the
    s_ann_recall_audit strategy applied to the top-k entry itself): the
    seeded hyperplane constants are inlined as literals in both plans,
    dot products are sequential IEEE folds in both engines, so the probe
    set and the rounded cosine ranking match bit-for-bit."""
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    sig_terms = " + ".join(
        f"(CASE WHEN {_ann_audit_dot_sql('v', p)} > 0 THEN CAST({1 << i} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    )
    cos = ("list_reduce(list_transform(list_zip(s.v, q.qv), x -> x[1]*x[2]), (x, y) -> x + y)"
           " / (sqrt(list_reduce(list_transform(s.v, x -> x * x), (x, y) -> x + y))"
           " * sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {sig_terms} AS sig
  FROM embeddings
  WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
q AS (SELECT v AS qv, sig AS qsig FROM sigs
      WHERE vec_id = 0)
SELECT s.vec_id, round({cos}, 6) AS cosine
FROM sigs s, q
WHERE bit_count(xor(s.sig, q.qsig)) <= {hamming}
ORDER BY round({cos}, 6) DESC, s.vec_id LIMIT {k}
"""


@register(
    "s_ann_lsh_topk",
    _ann_lsh_topk_oracle(),
    doc="R31 scale path: random-hyperplane LSH bucketed ANN top-k (multiprobe "
        "hamming<=2) — hash-checkable via inlined seeded plane literals in both engines",
)
def q_ann(spark, sf):
    emb = T(spark, sf, "embeddings")
    return _ann_entry(emb, 0, lambda qv: hyperplane_lsh_topk(
        emb, qv, k=10, bits=8, multiprobe_hamming=2))


# == R32 + text analysis =================================================

@register(
    "r32_top_terms",
    """
    SELECT term, freq FROM (
      SELECT term, count(*) AS freq FROM (
        SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term FROM documents)
      WHERE NOT list_contains(['the','a','of','and','to','in','is','on','for','with'], lower(term))
      GROUP BY term)
    ORDER BY freq DESC, term LIMIT 20
    """,
    doc="R32: global term frequency top-20, stopword-filtered",
)
def q_r32(spark, sf):
    return top_terms(T(spark, sf, "documents"), k=20)


@register(
    "t_language_id",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks FROM documents),
    h AS (SELECT doc_id,
          CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], lower(x)))) AS INTEGER) AS hits_en,
          CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','mit','auf','für','von'], lower(x)))) AS INTEGER) AS hits_de,
          CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','dans','pour','sur'], lower(x)))) AS INTEGER) AS hits_fr
          FROM t)
    SELECT doc_id, hits_en, hits_de, hits_fr,
           CASE WHEN greatest(hits_en, hits_de, hits_fr) = 0 THEN 'und'
                WHEN hits_en = greatest(hits_en, hits_de, hits_fr) THEN 'en'
                WHEN hits_de = greatest(hits_en, hits_de, hits_fr) THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM h
    """,
    doc="Text: n-gram/stopword-lexicon language ID heuristic",
)
def q_langid(spark, sf):
    return language_id(T(spark, sf, "documents"))


@register(
    "t_quality_scores",
    """
    WITH t AS (SELECT doc_id, text, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks FROM documents),
    x AS (SELECT doc_id, length(text) AS n_chars, CAST(len(toks) AS INTEGER) AS n_tokens,
                 length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_len,
                 CAST(len(list_filter(toks, t2 -> list_contains(['the','a','of','and','to','in','is','on','for','with'], lower(t2)))) AS INTEGER) AS stop_hits
          FROM t)
    SELECT doc_id, CAST(n_chars AS INTEGER) AS n_chars, n_tokens,
           round(alpha_len * 1.0 / greatest(n_chars, 1), 6) AS alpha_ratio,
           round(stop_hits * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
           round((n_chars - n_tokens + 1) * 1.0 / greatest(n_tokens, 1), 6) AS mean_token_len,
           (n_tokens >= 20 AND stop_hits * 1.0 / greatest(n_tokens, 1) >= 0.01
            AND alpha_len * 1.0 / greatest(n_chars, 1) >= 0.5) AS keep
    FROM x
    """,
    doc="Text: quality scoring (length/alpha/stopword ratios + keep flag)",
)
def q_quality(spark, sf):
    return quality_scores(T(spark, sf, "documents"))


@register(
    "t_token_stats",
    """
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS INTEGER) AS n_unique_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}')) AS INTEGER) AS n_subwords
    FROM documents
    """,
    doc="Text: whitespace + BPE-ish regex token counting",
)
def q_tokstats(spark, sf):
    return token_stats(T(spark, sf, "documents"))


@register(
    "t_tfidf",
    """
    WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
           round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE tf.doc_id < 25
    """,
    doc="Text: per-(doc, term) TF-IDF — tf shuffle by (doc,term), df by term, "
        "N broadcast; idf over the full corpus, output bounded for the gate",
)
def q_tfidf(spark, sf):
    return tf_idf(T(spark, sf, "documents"), max_doc_id=25)


@register(
    "t_fingerprint",
    """
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(list_transform(generate_series(1, length(text)), i -> CAST(ascii(text[i]) AS BIGINT)),
                                 (acc, x) -> (acc * 131 + x) % 1000000007)
           END AS fingerprint
    FROM documents
    """,
    doc="Text: rolling polynomial hash fingerprint (identical fold both engines)",
)
def q_fingerprint(spark, sf):
    return doc_fingerprints(T(spark, sf, "documents"))


# == R33-R35: UDF surface ================================================

@register(
    "r33_python_udf",
    "SELECT doc_id, reverse(substr(text, 1, 20)) AS rev20 FROM documents",
    doc="R33: scalar Python UDF (oracle = same fn in SQL); demo only — built-ins preferred",
)
def q_r33(spark, sf):
    rev = F.udf(lambda s: s[::-1] if s is not None else None, "string")
    return T(spark, sf, "documents").select(
        "doc_id", rev(F.substring("text", 1, 20)).alias("rev20")
    )


@register(
    "r34_pandas_scalar_udf",
    "SELECT event_id, value * 2.0 + 1.0 AS scaled FROM events",
    doc="R34: vectorized (Arrow) scalar pandas UDF — exact float arithmetic both sides",
)
def q_r34s(spark, sf):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def scale(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    return T(spark, sf, "events").select("event_id", scale("value").alias("scaled"))


@register(
    "r34_pandas_grouped_map",
    """
    SELECT event_id, event_type,
           CAST(count(*) OVER w AS BIGINT) * cents - CAST(sum(cents) OVER w AS BIGINT) AS demeaned_scaled
    FROM (SELECT event_id, event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events)
    WINDOW w AS (PARTITION BY event_type)
    """,
    doc="R34: applyInPandas grouped-map — integerized demean (n*x - sum), exact both sides",
)
def q_r34g(spark, sf):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        # float kernel, nullable-int out: matches the oracle window form
        # count(*)*cents - sum(cents), where a NULL value stays NULL,
        # count(*) includes it and sum skips it. Exact: cents and their
        # group sums sit far inside float64's 2^53 integer range.
        c = (pdf["value"] * 100).round()
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "demeaned_scaled": (len(c) * c - c.sum()).astype("Int64"),
            }
        )

    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .applyInPandas(demean, "event_id bigint, event_type string, demeaned_scaled bigint")
    )


@register(
    "r35_udtf_posexplode",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks FROM documents WHERE doc_id < 10)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
    FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)
    """,
    doc="R35: table-generating expansion (posexplode lateral view)",
)
def q_r35(spark, sf):
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 10)
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    return d.select("doc_id", F.posexplode(toks).alias("pos", "token"))


# == gateway parity (G-rows, SURVEY §2.1) ================================

# Synthesized fully-qualified topic per event (the events fixture has no
# topic column; this mirrors BuildTopicFn, reference src/util/util.go:78-86).
TOPIC_EXPR_SQL = (
    "'persistent://tenant' || CAST(user_id % 5 AS VARCHAR) || '/ns' || "
    "CAST(user_id % 3 AS VARCHAR) || '/' || event_type"
)


def topic_expr() -> F.Column:
    return F.concat(
        F.lit("persistent://tenant"), (F.col("user_id") % 5).cast("string"),
        F.lit("/ns"), (F.col("user_id") % 3).cast("string"),
        F.lit("/"), F.col("event_type"),
    )


@register(
    "g06_topic_tokenize",
    f"""
    SELECT event_id, topic,
           string_split(topic, '/')[3] AS tenant,
           string_split(topic, '/')[4] AS namespace,
           string_split(topic, '/')[5] AS short_topic
    FROM (SELECT event_id, {TOPIC_EXPR_SQL} AS topic FROM events)
    """,
    doc="G6 parity: build + tokenize persistent://tenant/ns/topic (util.go:78-86,156-176)",
)
def q_g06(spark, sf):
    ev = T(spark, sf, "events").withColumn("topic", topic_expr())
    parts = F.split("topic", "/")
    return ev.select(
        "event_id", "topic",
        parts.getItem(2).alias("tenant"),
        parts.getItem(3).alias("namespace"),
        parts.getItem(4).alias("short_topic"),
    )


# DuckDB lacks sha1(), so the oracle can't recompute keys from data.
# Instead the query runs Spark's codegen'd F.sha1 over a FIXED vector set
# (the reference's published golden vector from handlers_test.go:68-77
# plus the synthetic tenant/ns/topic grid) and the oracle embeds the
# expected digests as literals derived from gen_key_from_names (hashlib —
# an independent SHA-1 implementation). Green = Spark's sha1+concat
# byte-matches the reference semantics on every vector.
_G07_VECTORS = [
    (
        "persistent://picasso/local-useast1-gcp/yet-another-test-topic",
        "pulsar+ssl://useast1.gcp.kafkaesque.io:6651",
    ),
] + [
    (f"persistent://tenant{t}/ns{n}/{et}", "pulsar://cluster.local:6650")
    for t in range(5)
    for n in range(3)
    for et in ("click", "view", "purchase")
]

_G07_ORACLE = "SELECT * FROM (VALUES " + ", ".join(
    "('{0}', '{1}', '{2}')".format(t, u, gen_key_from_names(t, u))
    for t, u in _G07_VECTORS
) + ') AS t(topic_full_name, pulsar_url, "key")'


@register(
    "g07_sha1_key",
    _G07_ORACLE,
    doc="G7 parity: SHA-1 identity key sha1(topic_fn || pulsar_url) "
        "(topic.go:119-123) — golden-vector oracle incl. the reference's "
        "published digest 075fcf08... (handlers_test.go:68-77)",
)
def q_g07(spark, sf):
    df = spark.createDataFrame(_G07_VECTORS, "topic_full_name string, pulsar_url string")
    return df.select(
        "topic_full_name",
        "pulsar_url",
        topic_key_col("topic_full_name", "pulsar_url").alias("key"),
    )


@register(
    "g08_changelog_snapshot",
    """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    doc="G8 parity: changelog->snapshot, tombstone ('error') drops the key (pulsardb.go:86-127)",
)
def q_g08(spark, sf):
    ev = T(spark, sf, "events")
    return (
        exact_dedup_latest(ev, ["user_id"], "ts", "event_id")
        .filter(F.col("event_type") != "error")
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "g10_tenant_isolation",
    f"""
    SELECT event_id, tenant FROM (
      SELECT event_id, string_split({TOPIC_EXPR_SQL}, '/')[3] AS tenant FROM events)
    WHERE tenant = 'tenant3'
    """,
    doc="G10 parity: row-level tenant-isolation predicate (handlers.go:375-421)",
)
def q_g10(spark, sf):
    ev = T(spark, sf, "events").withColumn("topic", topic_expr())
    return ev.select("event_id", tenant_from_topic_col("topic").alias("tenant")).filter(
        F.col("tenant") == "tenant3"
    )


# == S-rows in batch-checkable form (streaming semantics live in
#    pulsar_beam_spark.streaming; these verify the window algebra) ========

@register(
    "s3_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)/100 AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="S3: tumbling 1h window agg (batch algebra of groupBy(window(ts,'1 hour')))",
)
def q_s3(spark, sf):
    ev = T(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "s4_sliding_window",
    """
    SELECT ws AS window_start, event_type, count(*) AS n
    FROM (SELECT e.*, date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS ws
          FROM events e, range(0, 2) r(k))
    GROUP BY 1, 2
    """,
    doc="S4: sliding 2h/1h window agg (each event lands in 2 windows)",
)
def q_s4(spark, sf):
    ev = T(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@register(
    "s5_session_window",
    """
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    y AS (SELECT user_id, ts,
                 CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM x)
    SELECT user_id, session_id, min(ts) AS session_start, count(*) AS n_events
    FROM y GROUP BY 1, 2
    """,
    doc="S5: sessionization, 30-min gap (batch algebra of session_window)",
)
def q_s5(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(lag_ts)) > 1800), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_s", new_s)
        .withColumn("session_id", F.sum("new_s").over(run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )


@register(
    "s6_stateful_dedup",
    """
    SELECT event_type, count(*) AS n FROM (
      SELECT DISTINCT * FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
    GROUP BY event_type
    """,
    doc="S6: dedup on message id — duplicated input collapses back to one row per event",
)
def q_s6(spark, sf):
    ev = T(spark, sf, "events")
    return (
        ev.unionByName(ev)
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "s7_bounded_poll",
    """
    SELECT event_type, event_id, ts, rn FROM (
      SELECT event_type, event_id, ts,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 10
    """,
    doc="S7/G5 parity: bounded take-N-earliest per topic (poll batchSize=10, sse-broker.go:34-61)",
)
def q_s7(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        ev.select("event_type", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
    )


# == multimodal plumbing =================================================

@register(
    "m_binary_columns",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(octet_length(encode(text)) * 8 AS INTEGER) AS n_bits,
           base64(encode(substr(text, 1, 12))) AS head_b64
    FROM documents
    """,
    doc="Multimodal: opaque binary payload columns + byte-level metadata",
)
def q_mbin(spark, sf):
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.bit_length("text").alias("n_bits"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("head_b64"),
    )


# The fake feature vector is f_i = int(sha256(content)[4i:4i+4]) / 2^32 —
# the full 32-byte digest, so hash-matching all 8 components verifies the
# mapInPandas kernel's output (and the binary payload that reached it)
# bit-for-bit.  DuckDB recomputes from sha256(text): the payload is
# encode(text,'UTF-8') and the fixture is pure ASCII (asserted per-sf in
# tests/test_formats.py), so the hex-substring cast reproduces each
# big-endian 4-byte word exactly; /2^32 is a power-of-two division, exact
# in IEEE doubles on both engines.  (VERDICT r05 item 1b.)
_MFEAT_F_SQL = ",\n           ".join(
    f"CAST(concat('0x', substr(sha256(text), {8 * i + 1}, 8)) AS BIGINT)"
    f" / 4294967296.0 AS f{i}"
    for i in range(8)
)


@register(
    "m_media_features",
    f"""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           {_MFEAT_F_SQL}
    FROM documents
    """,
    doc="Multimodal: Arrow-batched mapInPandas feature extraction over "
        "binary payloads (stub decode) — HASH-checkable: the deterministic "
        "fake features are sha256-derived doubles the oracle recomputes "
        "independently, so the Python kernel's Arrow round-trip is "
        "verified bit-for-bit",
)
def q_mfeat(spark, sf):
    media = media_from_documents(T(spark, sf, "documents"))
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id", "modality", "n_bytes",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(8)],
    )


# == additional window / pivot coverage ==================================

@register(
    "r15_percent_rank",
    """
    SELECT c_nationkey, c_custkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY CAST(round(c_acctbal*100,0) AS BIGINT), c_custkey)
    """,
    doc="R15: percent_rank/cume_dist (exact rational doubles both sides)",
)
def q_r15p(spark, sf):
    w = Window.partitionBy("c_nationkey").orderBy(cents("c_acctbal"), F.col("c_custkey"))
    return T(spark, sf, "customer").select(
        "c_nationkey", "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "r16_first_last_value",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    """,
    doc="R16: first_value/last_value with explicit full frame",
)
def q_r16fl(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


@register(
    "r16_nth_value",
    """
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_order
    FROM orders
    """,
    doc="R16 depth: nth_value with an explicit running frame (null until the 2nd row arrives)",
)
def q_r16n(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "r17_range_frame",
    """
    SELECT o_orderkey,
           CAST(count(*) OVER (PARTITION BY o_custkey
                               ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT)
                               RANGE BETWEEN 10000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_100k
    FROM orders
    """,
    doc="R17: RANGE frame over integerized price (peers included identically)",
)
def q_r17r(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(cents("o_totalprice"))
        .rangeBetween(-10_000_000, Window.currentRow)
    )
    return T(spark, sf, "orders").select(
        "o_orderkey", F.count("*").over(w).alias("n_within_100k")
    )


@register(
    "r_pivot_conditional",
    """
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS other
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Pivot via conditional aggregation (the alias-stable pivot form)",
)
def q_pivot(spark, sf):
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent"),
            F.count(F.when(F.col("o_orderpriority") == "2-HIGH", 1)).alias("high"),
            F.count(F.when(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).alias("other"),
        )
    )


@register(
    "r13_percentile_exact",
    """
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.5) / 100 AS median_price,
           quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.9) / 100 AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="R13 companion: exact interpolated percentile over integer cents",
)
def q_r13p(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents("l_extendedprice"), F.lit(0.5)) / 100).alias("median_price"),
        (F.percentile(cents("l_extendedprice"), F.lit(0.9)) / 100).alias("p90_price"),
    )


# == subqueries / HAVING / grouping sets (Catalyst decorrelation) ========

@register(
    "r_scalar_subquery",
    """
    WITH g AS (SELECT CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS s,
                      count(*) AS n FROM orders)
    SELECT o_orderkey, o_totalprice FROM orders, g
    WHERE CAST(round(o_totalprice*100,0) AS BIGINT) * n > s
    """,
    doc="Scalar subquery (orders above global mean price) — integer cross-multiply, no float avg",
)
def q_scalar_sub(spark, sf):
    o = T(spark, sf, "orders")
    g = o.agg(F.sum(cents("o_totalprice")).alias("s"), F.count("*").alias("n"))
    return (
        o.crossJoin(F.broadcast(g))
        .filter(cents("o_totalprice") * F.col("n") > F.col("s"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "r_correlated_subquery_q17",
    """
    WITH a AS (SELECT l_partkey AS pk,
                      CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sq,
                      count(*) AS n
               FROM lineitem GROUP BY 1)
    SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100/7 AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey JOIN a ON pk = l_partkey
    WHERE p_brand = 'Brand#11'
      AND CAST(round(l_quantity*100,0) AS BIGINT) * n * 5 < sq
    """,
    doc="TPC-H Q17 shape: correlated avg-per-part subquery decorrelated to a grouped self-join",
)
def q_q17(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(cents("l_quantity")).alias("sq"), F.count("*").alias("n")
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#11")), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == avg_q.pk)
        .filter(cents("l_quantity") * F.col("n") * 5 < F.col("sq"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100 / 7).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "r_having",
    """
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS total_spent
    FROM orders GROUP BY o_custkey HAVING count(*) >= 10
    """,
    doc="HAVING: post-aggregate predicate (filter above the hash aggregate)",
)
def q_having(spark, sf):
    return (
        T(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), money_sum("o_totalprice", "total_spent"))
        .filter(F.col("n_orders") >= 10)
    )


@register(
    "r14_grouping_sets",
    """
    SELECT r_name, c_mktsegment,
           CAST(grouping(r_name) AS INTEGER) AS grp_r, CAST(grouping(c_mktsegment) AS INTEGER) AS grp_m,
           count(*) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
    """,
    doc="R14: explicit GROUPING SETS (not derivable from rollup/cube)",
)
def q_grouping_sets(spark, sf):
    c, n, r = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.groupingSets(
            [["r_name"], ["c_mktsegment"], ["r_name", "c_mktsegment"]], "r_name", "c_mktsegment"
        )
        .agg(
            F.grouping("r_name").cast("int").alias("grp_r"),
            F.grouping("c_mktsegment").cast("int").alias("grp_m"),
            F.count("*").alias("n"),
        )
        .select("r_name", "c_mktsegment", "grp_r", "grp_m", "n")
    )


# == TPC-H-shaped composites (multi-join + agg + top-k + having) =========

@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape: unshipped-order revenue, join->agg->topk, broadcast-filtered customer",
)
def q_q3(spark, sf):
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-06-01")
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-06-01")
    rev = (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 10000)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(vol) AS DOUBLE)/10000 AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INTEGER) AS l_year,
                 CAST(round(l_extendedprice*100,0) AS BIGINT)
                 * (100 - CAST(round(l_discount*100,0) AS BIGINT)) AS vol
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: two-nation trade volume by year (self-joined dim, disjunctive filter)",
)
def q_q7(spark, sf):
    li, s, o, c = (T(spark, sf, t) for t in ("lineitem", "supplier", "orders", "customer"))
    n1 = T(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    vol = cents("l_extendedprice") * (100 - cents("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum(vol).cast("double") / 10000).alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20",
)
def q_q10(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    li, n = T(spark, sf, "lineitem"), T(spark, sf, "nation")
    rev = (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 10000)
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q18_large_orders",
    """
    WITH big AS (SELECT l_orderkey AS bk FROM lineitem GROUP BY 1
                 HAVING CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) > 20000)
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)/100 AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT bk FROM big)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: large-volume orders via HAVING + IN-subquery (semi join on agg)",
)
def q_q18(spark, sf):
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(cents("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 20000)
        .select("bk")
    )
    return (
        li.join(big, li.l_orderkey == big.bk, "semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg((F.sum(cents("l_quantity")).cast("double") / 100).alias("sum_qty"))
    )


@register(
    "tpch_q4_exists_late_ship",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a non-equi predicate -> semi join "
        "(equi key carries the shuffle, date comparison rides along)",
)
def q_q4(spark, sf):
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = T(spark, sf, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q2_correlated_min",
    """
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal = (SELECT min(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="TPC-H Q2 shape: correlated scalar-min subquery decorrelated to a "
        "grouped min + equi-join (double equality is exact: same stored values)",
)
def q_q2(spark, sf):
    c = T(spark, sf, "customer")
    mins = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.min("c_acctbal").alias("min_bal")
    )
    return (
        c.join(
            F.broadcast(mins),
            (c.c_nationkey == mins.nk) & (c.c_acctbal == mins.min_bal),
        )
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: local-supplier volume — the c_nationkey = s_nationkey "
        "equality makes the customer->supplier path a co-location constraint, "
        "not just a lookup; dims broadcast, facts shuffle on orderkey only",
)
def q_q5(spark, sf):
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    s, n, r = T(spark, sf, "supplier"), T(spark, sf, "nation"), T(spark, sf, "region")
    rev = (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 10000)
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * CAST(round(l_discount*100,0) AS BIGINT)) AS DOUBLE)/10000 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND CAST(round(l_discount*100,0) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: scan-only predicate aggregate — all three filters push "
        "into the parquet scan; discount compared on the integer cents grid so "
        "double-storage noise can't flip the BETWEEN on either engine",
)
def q_q6(spark, sf):
    li = T(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & cents("l_discount").between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double") / 10000)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "tpch_q12_priority_by_year",
    """
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H Q12 shape (adapted: schema has no l_shipmode, year(l_shipdate) "
        "stands in): conditional CASE counts split one pass over the join",
)
def q_q12(spark, sf):
    o, li = T(spark, sf, "orders"), T(spark, sf, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@register(
    "tpch_q14_promo_effect",
    """
    SELECT CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(round(l_extendedprice*100,0) AS BIGINT)
                       * (100 - CAST(round(l_discount*100,0) AS BIGINT)) ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                      * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14 shape: promo revenue share — both ratio terms are exact BIGINT "
        "sums, so the single final division is bit-stable across engines",
)
def q_q14(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    vol = cents("l_extendedprice") * (100 - cents("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    return (
        li.filter((F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double"))
            .alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16_supplier_part_count",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
      AND p_size IN (1, 8, 15, 22, 29, 36, 43, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
    doc="TPC-H Q16 shape (adapted: negative-acctbal suppliers stand in for the "
        "complaints exclusion): distinct-count agg over anti-joined fact",
)
def q_q16(spark, sf):
    li, p, s = T(spark, sf, "lineitem"), T(spark, sf, "part"), T(spark, sf, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 8, 15, 22, 29, 36, 43, 50)
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "anti")
        .join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@register(
    "tpch_q19_disjunctive_filter",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: three disjunct brand/size/quantity branches — the "
        "common join key is extracted so the OR rides the join instead of "
        "forcing a cross product",
)
def q_q19(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double") / 10000)
    return joined.filter(branch).agg(rev.alias("revenue"), F.count("*").alias("n_items"))


@register(
    "tpch_q22_dormant_customers",
    """
    WITH avg_bal AS (SELECT CAST(avg(CAST(round(c_acctbal*100,0) AS BIGINT)) AS DOUBLE)/100 AS ab
                     FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(sum(CAST(round(c_acctbal*100,0) AS BIGINT)) AS DOUBLE)/100 AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape (adapted: c_mktsegment stands in for the phone country "
        "code, dormant = no order since 1999): scalar-avg subquery + NOT EXISTS "
        "anti join; avg over integer cents keeps the threshold bit-identical",
)
def q_q22(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    recent = o.filter(F.col("o_orderdate") >= "1999-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.avg(cents("c_acctbal")).cast("double") / 100).alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), money_sum("c_acctbal", "totacctbal"))
        .orderBy("c_mktsegment")
    )


# == TPC-H q11/q20 over a DERIVED partsupp ===============================
#
# The fixture set has no partsupp table (SURVEY §9 declared q11/q20
# unportable; VERDICT r05 item 5 closes the gap): partsupp is derived
# DETERMINISTICALLY IN-QUERY from part x supplier with the TPC-H
# suppkey-spreading formula, on BOTH engines — 4 suppliers per part,
# availqty/cost as integer functions of (partkey, suppkey) so every
# value is portable arithmetic, no fixture file needed.  The stride
# can alias suppliers for some partkey ranges (e.g. stride ≡ 0 mod
# ns/gcd), so the pair set is DISTINCTed; attributes depend only on the
# pair, making duplicate rows identical and the DISTINCT clean.

_PARTSUPP_SQL = """
WITH ns AS (SELECT count(*) AS n FROM supplier),
ps0 AS (
  SELECT DISTINCT p_partkey AS ps_partkey,
         (p_partkey + i * ((n // 4) + (p_partkey // n))) % n AS ps_suppkey
  FROM part, ns, (VALUES (0),(1),(2),(3)) AS gen(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS BIGINT) AS ps_availqty,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100 AS BIGINT) AS ps_cost_cents
  FROM ps0
)
"""


def derived_partsupp(spark, sf: str) -> DataFrame:
    """Spark half of _PARTSUPP_SQL.  Scale shape: the supplier count and
    the 4-row generator are broadcast scalars, so the derivation is a
    map-only projection over part (codegen'd) plus one small DISTINCT
    shuffle of 4x|part| narrow rows — partsupp never materializes wide."""
    part = T(spark, sf, "part").select("p_partkey")
    ns = T(spark, sf, "supplier").agg(F.count("*").alias("n"))
    gen = spark.range(4).select(F.col("id").alias("i"))
    stride = F.floor(F.col("n") / 4).cast("long") + F.floor(
        F.col("p_partkey") / F.col("n")
    ).cast("long")
    ps0 = (
        part.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(gen))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.pmod(F.col("p_partkey") + F.col("i") * stride, F.col("n"))
            .cast("long").alias("ps_suppkey"),
        )
        .distinct()
    )
    return ps0.select(
        "ps_partkey", "ps_suppkey",
        (F.pmod(F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13, F.lit(9999)) + 1)
        .cast("long").alias("ps_availqty"),
        (F.pmod(F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17, F.lit(100000)) + 100)
        .cast("long").alias("ps_cost_cents"),
    )


@register(
    "tpch_q11_important_stock",
    _PARTSUPP_SQL + """
, nat AS (
  SELECT ps_partkey, CAST(sum(ps_cost_cents * ps_availqty) AS BIGINT) AS v_cents
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_15' GROUP BY ps_partkey),
tot AS (SELECT CAST(sum(v_cents) AS BIGINT) AS t, count(*) AS c FROM nat)
SELECT ps_partkey, CAST(v_cents AS DOUBLE) / 100 AS value
FROM nat, tot WHERE v_cents * c > t * 2
ORDER BY value DESC, ps_partkey
""",
    doc="TPC-H Q11 shape (important stock): per-part stock value for one "
        "nation's suppliers vs a scalar total — the HAVING-vs-global-"
        "aggregate pattern.  Adapted scale-free: TPC-H's 0.0001/SF "
        "fraction becomes 'value > 2x the mean' (v*count > total*2, "
        "integer cross-multiply, no float threshold).  All money math in "
        "integer cents; the nation dim broadcasts; the total is a 1-row "
        "broadcast scalar join, so the partsupp side shuffles once.",
)
def q_q11(spark, sf):
    ps = derived_partsupp(spark, sf)
    s, n = T(spark, sf, "supplier"), T(spark, sf, "nation")
    nat = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == "NATION_15")
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v_cents"))
    )
    tot = nat.agg(F.sum("v_cents").alias("t"), F.count("*").alias("c"))
    return (
        nat.join(F.broadcast(tot))
        .filter(F.col("v_cents") * F.col("c") > F.col("t") * 2)
        .select("ps_partkey", (F.col("v_cents").cast("double") / 100).alias("value"))
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@register(
    "tpch_q20_promo_suppliers",
    _PARTSUPP_SQL + """
, qty AS (
  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2001-01-01'
  GROUP BY 1, 2)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
FROM partsupp ps
JOIN qty ON ps.ps_partkey = qty.l_partkey AND ps.ps_suppkey = qty.l_suppkey
JOIN part p ON ps.ps_partkey = p.p_partkey
JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE 'red%' AND 2 * ps.ps_availqty > qty.q
ORDER BY s.s_name
""",
    doc="TPC-H Q20 shape (promo suppliers): suppliers whose stock of "
        "'red%' parts exceeds half the quantity they shipped in 2000 — "
        "the correlated-IN chain (part filter -> partsupp -> per-pair "
        "lineitem sum) decorrelated to joins.  Adapted: the final result "
        "keeps each supplier's nation instead of filtering to one nation "
        "(the sf0.001 fixture has ~1 supplier per nation, which would "
        "leave an empty, assertion-free result).  Quantities compare as "
        "integers (2*availqty > sum(qty)); lineitem aggregates before "
        "joining, so the one big shuffle is the qty groupBy.",
)
def q_q20(spark, sf):
    ps = derived_partsupp(spark, sf)
    li = T(spark, sf, "lineitem")
    p, s, n = T(spark, sf, "part"), T(spark, sf, "supplier"), T(spark, sf, "nation")
    qty = (
        li.filter((F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2001-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    red = p.filter(F.col("p_name").like("red%")).select("p_partkey")
    return (
        ps.join(qty, (ps.ps_partkey == qty.l_partkey) & (ps.ps_suppkey == qty.l_suppkey))
        .join(red, ps.ps_partkey == red.p_partkey)
        .filter(2 * F.col("ps_availqty") > F.col("q"))
        .select("ps_suppkey").distinct()
        .join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )


# == deterministic sampling / dataset splits =============================

_SPLIT_BUCKET = stable_bucket_sql("doc_id", 100)

@register(
    "p_deterministic_split",
    f"""
    SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars,
                 CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
                      WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents)
    GROUP BY split ORDER BY split
    """,
    doc="Pipeline: stable train/val/test split — md5-bucket of doc_id is a pure "
        "per-row projection (no shuffle, engine-portable, rerun-stable); the "
        "80/10/10 assignment survives reruns and cluster resizes",
)
def q_split(spark, sf):
    d = deterministic_split(T(spark, sf, "documents"), "doc_id")
    # no orderBy: a global sort adds a range exchange for display order the
    # driver's order-insensitive compare never needs
    return d.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "p_stratified_sample",
    f"""
    SELECT doc_id, lang, sample_rank FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {stable_bucket_sql("doc_id", 1 << 60)}, doc_id)
               AS sample_rank
      FROM documents)
    WHERE sample_rank <= 3 ORDER BY lang, sample_rank
    """,
    doc="Pipeline: deterministic stratified sample — top-3 docs per language by "
        "stable-hash order (reproducible unlike ORDER BY rand(); one shuffle on "
        "the strata key, the unavoidable minimum)",
)
def q_stratified(spark, sf):
    d = stratified_sample(T(spark, sf, "documents"), ["lang"], "doc_id", 3)
    return d.select("doc_id", "lang", "sample_rank").orderBy("lang", "sample_rank")


@register(
    "p_sequence_packing",
    f"""
    WITH t AS (
      SELECT doc_id,
             greatest(1, CAST(floor(n_chars/4) AS BIGINT)) AS toks,
             {stable_bucket_sql("doc_id", 8)} AS shard,
             {stable_bucket_sql("doc_id", 1 << 60)} AS ord
      FROM documents),
    p AS (
      SELECT shard, toks,
             sum(toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                             ROWS UNBOUNDED PRECEDING) - toks AS start_offset
      FROM t)
    SELECT shard, CAST(floor(start_offset/2048.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS pack_tokens
    FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id
    """,
    doc="Pipeline: concat-and-chunk sequence packing — docs shard by stable "
        "hash, a partitioned cumulative-sum window assigns each doc's context "
        "window; one shuffle on the shard key, parallel across shards "
        "(a global order would serialize the window onto one partition)",
)
def q_packing(spark, sf):
    d = T(spark, sf, "documents").withColumn(
        "toks", F.greatest(F.lit(1), F.floor(F.col("n_chars") / 4).cast("long"))
    )
    packed = sequence_pack(d, "doc_id", "toks", context_len=2048, n_shards=8)
    return (
        packed.groupBy("shard", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("pack_tokens"))
        .orderBy("shard", "pack_id")
    )


@register(
    "p_packing_efficiency",
    f"""
    WITH t AS (
      SELECT doc_id,
             greatest(1, CAST(floor(n_chars/4) AS BIGINT)) AS toks,
             {stable_bucket_sql("doc_id", 8)} AS shard,
             {stable_bucket_sql("doc_id", 1 << 60)} AS ord
      FROM documents),
    p AS (
      SELECT shard, doc_id, toks,
             sum(toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                             ROWS UNBOUNDED PRECEDING) - toks AS start_offset
      FROM t)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(ceil(CAST(sum(toks) AS DOUBLE) / 2048) AS BIGINT) AS n_packs,
           CAST(ceil(CAST(sum(toks) AS DOUBLE) / 2048) * 2048 - sum(toks) AS BIGINT)
             AS tail_waste_tokens,
           CAST(sum(CASE WHEN floor(start_offset/2048.0)
                          <> floor((start_offset + toks - 1)/2048.0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
           round(sum(CASE WHEN floor(start_offset/2048.0)
                           <> floor((start_offset + toks - 1)/2048.0)
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS split_pct
    FROM p GROUP BY shard ORDER BY shard
    """,
    doc="Pipeline audit over p_sequence_packing's layout: per shard, the "
        "numbers a training run actually budgets — pack count, tail padding "
        "waste (concat-and-chunk wastes ONLY the final partial window per "
        "shard), and how many documents straddle a context boundary "
        "(attention fragmentation / truncation exposure). Same single "
        "shard-partitioned window as the packing itself + one aggregate; "
        "all-integer metrics so the audit is hash-exact.",
)
def q_packing_efficiency(spark, sf):
    ctx = 2048
    d = T(spark, sf, "documents").withColumn(
        "toks", F.greatest(F.lit(1), F.floor(F.col("n_chars") / 4).cast("long"))
    )
    packed = sequence_pack(d, "doc_id", "toks", context_len=ctx, n_shards=8)
    end_pack = F.floor((F.col("start_offset") + F.col("toks") - 1) / ctx)
    split = F.when(F.col("pack_id") != end_pack, 1).otherwise(0)
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.ceil(F.sum("toks").cast("double") / ctx).alias("n_packs"),
            (F.ceil(F.sum("toks").cast("double") / ctx) * ctx - F.sum("toks"))
            .cast("long").alias("tail_waste_tokens"),
            F.sum(split).alias("n_split_docs"),
            F.round(F.sum(split) / F.count("*"), 6).alias("split_pct"),
        )
        .orderBy("shard")
    )


@register(
    "p_rank_calibrate",
    """
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id), 6) AS group_pctl,
           round(percent_rank() OVER (ORDER BY n_chars, doc_id), 6) AS global_pctl
    FROM documents
    """,
    doc="Pipeline: cross-source score calibration (operators/sampling."
        "rank_calibrate) — within-source AND global percent_rank of the "
        "quality proxy, so a curation threshold can prune every source at "
        "the same rate instead of letting one source's score distribution "
        "dominate a global cut. Exact rational ranks, hash-reproducible; "
        "the score column is a seam (any quality metric plugs in).",
)
def q_rank_calibrate(spark, sf):
    d = T(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return rank_calibrate(d, "n_chars", "source", "doc_id")


# == null-ordering semantics =============================================

@register(
    "r18_nulls_ordering",
    """
    SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_n
    FROM orders ORDER BY status_n NULLS FIRST, o_orderkey LIMIT 100
    """,
    doc="R18: explicit NULLS FIRST ordering pinned identically on both engines",
)
def q_nulls(spark, sf):
    o = T(spark, sf, "orders")
    return (
        o.select("o_orderkey", F.nullif("o_orderstatus", F.lit("O")).alias("status_n"))
        .orderBy(F.col("status_n").asc_nulls_first(), F.col("o_orderkey"))
        .limit(100)
    )


# == R34 grouped-agg pandas UDF / R35 real Python UDTF ===================

@register(
    "r34_pandas_grouped_agg",
    """
    SELECT event_type,
           CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS cents_sum,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="R34: grouped-agg pandas UDF (Arrow series -> scalar), integerized sum",
)
def q_r34a(spark, sf):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        # SQL sum semantics: NULLs skipped, all-NULL group -> NULL
        # (astype(int64) raised on a NaN-bearing series)
        c = (v * 100).round().dropna()
        return int(c.sum()) if len(c) else None

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(cents_sum("value").alias("cents_sum"), n_rows("value").alias("n"))
    )


@register(
    "r35_python_udtf",
    """
    WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks FROM documents WHERE doc_id < 5)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token,
           CAST(length(toks[i]) AS INTEGER) AS token_len
    FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)
    """,
    doc="R35: real PySpark UDTF class (eval/yield) applied via SQL LATERAL join",
)
def q_r35u(spark, sf):
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(t for t in _re.split(r"\s+", text) if t):
                yield i, tok, len(tok)

    spark.udtf.register("pbs_split_words", SplitWords)
    T(spark, sf, "documents").filter(F.col("doc_id") < 5).createOrReplaceTempView(
        "pbs_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, f.pos, f.token, f.token_len
        FROM pbs_udtf_docs d, LATERAL pbs_split_words(d.text) f
        """
    )


# == R23/R27 depth: date arithmetic + structured JSON parsing ============

@register(
    "r23_date_arith",
    """
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 36 HOUR AS TIMESTAMP) AS sla_ts
    FROM orders
    """,
    doc="R23 depth: date_add/quarter/dayofweek/last_day/interval arithmetic "
        "(dow pinned to Spark's 1=Sunday convention)",
)
def q_r23a(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 36 HOURS")).alias("sla_ts"),
    )


@register(
    "r27_from_json_struct",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           json_extract_string(props, '$.tag') AS tag,
           json_extract_string(props, '$.missing') AS missing_f
    FROM events
    """,
    doc="R27 depth: from_json into a typed struct (schema-on-read over the payload), "
        "null-safe on absent fields",
)
def q_r27s(spark, sf):
    ev = T(spark, sf, "events")
    parsed = F.from_json(
        "props", "struct<k:int, tag:string, missing:string>"
    ).alias("j")
    return ev.select("event_id", parsed).select(
        "event_id",
        F.col("j.k").alias("k"),
        F.col("j.tag").alias("tag"),
        F.col("j.missing").alias("missing_f"),
    )


@register(
    "r27_to_json_roundtrip",
    """
    SELECT event_id,
           '{"id":' || CAST(event_id AS VARCHAR) || ',"type":"' || event_type || '"}' AS envelope
    FROM events
    """,
    doc="R27 depth: to_json(struct(...)) envelope construction (G1 includeHeaders shape)",
)
def q_r27t(spark, sf):
    ev = T(spark, sf, "events")
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type"))
        ).alias("envelope"),
    )


# == IVF ANN (second scale path beside LSH) ==============================
#
# The driver entry runs ivf_topk with FIXED literal centroids (seeded
# unit-normalized Gaussians) instead of the trained coarse quantizer, so
# the whole approximation — assignment argmax, nprobe probe-set ranking,
# exact-cosine top-k within the probed cells — is deterministic plan
# constants a DuckDB oracle recomputes bit-for-bit (VERDICT r05 item 1c;
# the e_centroid_assign literal-centroid strategy).  The TRAINED-quantizer
# path keeps its recall-vs-brute-force contract in tests/test_operators.py.


def _ivf_fixed_centroids(n: int = 16, dim: int = 64, seed: int = 7) -> list[list[float]]:
    import numpy as np

    c = np.random.default_rng(seed).standard_normal((n, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in c]


_IVF_CENTROIDS = _ivf_fixed_centroids()


def _ann_ivf_topk_oracle(nprobe: int = 4, k: int = 10) -> str:
    cent_rows = ",\n    ".join(
        f"({i}, [{','.join(repr(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(_IVF_CENTROIDS)
    )
    dots = ",\n            ".join(
        _ann_audit_dot_sql("v", c) for c in _IVF_CENTROIDS
    )
    cos = ("list_reduce(list_transform(list_zip(a.v, q.qv), x -> x[1]*x[2]), (x, y) -> x + y)"
           " / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))"
           " * sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH cents AS (SELECT * FROM (VALUES
    {cent_rows}) AS t(cell, cv)),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
probe AS (
  SELECT cell FROM cents, q
  ORDER BY list_reduce(list_transform(list_zip(cv, qv), x -> x[1]*x[2]), (x, y) -> x + y) DESC, cell
  LIMIT {nprobe}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
d AS (SELECT vec_id, v, [{dots}] AS ds FROM raw),
assigned AS (SELECT vec_id, v,
                    list_indexof(ds, list_aggregate(ds, 'max')) - 1 AS cell
             FROM d)
SELECT a.vec_id, round({cos}, 6) AS cosine
FROM assigned a JOIN probe USING (cell), q
ORDER BY round({cos}, 6) DESC, a.vec_id LIMIT {k}
"""


@register(
    "s_ann_ivf_topk",
    _ann_ivf_topk_oracle(),
    doc="R31 scale path 2: IVF coarse-quantizer ANN top-k (nprobe inverted "
        "lists) — hash-checkable via fixed literal centroids in both "
        "engines; sequential-fold dots make assignment, probe ranking and "
        "cosine order bit-identical",
)
def q_ann_ivf(spark, sf):
    emb = T(spark, sf, "embeddings")
    return _ann_entry(emb, 0, lambda qv: ivf_topk(
        emb, qv, k=10, nprobe=4, centroids=_IVF_CENTROIDS))


@register(
    "r13_approx_percentile",
    """
    SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.5) / 100 AS median_price,
           quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.9) / 100 AS p90_price,
           CAST(1 AS INTEGER) AS median_ok,
           CAST(1 AS INTEGER) AS p90_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="R13 companion: approx_percentile sketch (the 100 TB path; exact "
        "percentile buffers each group's values, the GK-style sketch merges "
        "in fixed space) as a HASH-checkable verdict entry (VERDICT r05 "
        "item 1a): the exact interpolated percentiles cross-check against "
        "quantile_cont value-for-value, and the Spark-computed verdict "
        "pins the sketch inside the exact [p-0.005, p+0.005] quantile "
        "band — far looser than the sketch's n/accuracy rank-error "
        "guarantee (accuracy=10000), so a red row means a broken sketch, "
        "not noise.",
)
def q_r13ap(spark, sf):
    c = cents("l_extendedprice")
    agg = T(spark, sf, "lineitem").groupBy("l_returnflag").agg(
        (F.percentile(c, F.lit(0.5)) / 100).alias("median_price"),
        (F.percentile(c, F.lit(0.9)) / 100).alias("p90_price"),
        (F.percentile(c, F.lit(0.495)) / 100).alias("_m_lo"),
        (F.percentile(c, F.lit(0.505)) / 100).alias("_m_hi"),
        (F.percentile(c, F.lit(0.895)) / 100).alias("_p_lo"),
        (F.percentile(c, F.lit(0.905)) / 100).alias("_p_hi"),
        (F.percentile_approx(c, 0.5, 10000) / 100).alias("_am"),
        (F.percentile_approx(c, 0.9, 10000) / 100).alias("_ap"),
    )
    m_ok = (F.col("_am").between(F.col("_m_lo"), F.col("_m_hi"))).cast("int")
    p_ok = (F.col("_ap").between(F.col("_p_lo"), F.col("_p_hi"))).cast("int")
    return agg.select(
        "l_returnflag", "median_price", "p90_price",
        m_ok.alias("median_ok"), p_ok.alias("p90_ok"),
    )


# == ANN recall audit: the approx path gets a HASH-matchable contract ====
#
# s_ann_lsh_topk / s_ann_ivf_topk are inherently rows-only at the driver (a
# value-hash on an approximate result is meaningless).  This entry instead
# makes the approximation itself the checked artifact: both engines
# independently compute (a) the LSH probe set — hyperplane signatures from
# the SAME seeded plane constants, inlined as plan literals in Spark and as
# DOUBLE[] literals in the oracle SQL — (b) the exact cosine top-k, and
# (c) recall@k as an INTEGER hit count.  Dot products are sequential IEEE
# double folds in both engines (F.aggregate vs list_reduce), so bucket
# signatures and rank orders match bit-for-bit and the integers hash-match.

def _ann_recall_audit_oracle(bits: int = 8, seed: int = 42, dim: int = 64,
                             hamming: int = 2, k: int = 10) -> str:
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    sig_terms = " + ".join(
        f"(CASE WHEN {_ann_audit_dot_sql('v', p)} > 0 THEN CAST({1 << i} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for i, p in enumerate(planes)
    )
    cos = ("list_reduce(list_transform(list_zip({v}, qv), x -> x[1]*x[2]), (x, y) -> x + y)"
           " / (sqrt(list_reduce(list_transform({v}, x -> x * x), (x, y) -> x + y))"
           " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {sig_terms} AS sig
  FROM embeddings
  WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
q AS (SELECT v AS qv, sig AS qsig FROM sigs
      WHERE vec_id = 0),
probed AS (
  SELECT s.vec_id, s.v FROM sigs s, q
  WHERE bit_count(xor(s.sig, q.qsig)) <= {hamming}),
ann AS (
  SELECT p.vec_id FROM probed p, q
  ORDER BY {cos.format(v='p.v')} DESC, p.vec_id LIMIT {k}),
exact AS (
  SELECT s.vec_id FROM sigs s, q
  ORDER BY {cos.format(v='s.v')} DESC, s.vec_id LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM probed) AS n_probed,
       (SELECT CAST(count(*) AS BIGINT) FROM ann JOIN exact USING (vec_id)) AS hits
"""


@register(
    "s_ann_recall_audit",
    _ann_recall_audit_oracle(),
    doc="R31 audit: LSH-probe recall@10 vs exact top-k as integer counts — the "
        "tolerance contract for the ANN scale path, made hash-checkable "
        "(VERDICT r03 item 2; same golden-constant strategy as g07_sha1_key)",
)
def q_ann_recall_audit(spark, sf):
    from .functions.vector import cosine_sim, valid_vector
    from .operators.similarity import _hyperplanes, _signature_expr

    bits, seed, hamming, k = 8, 42, 2, 10
    # same corpus contract as the operators the audit grades: invalid
    # vectors never receive a signature (a zero-norm row would abort the
    # exact-cosine rank with ANSI DIVIDE_BY_ZERO, and a NaN dot's sign
    # bit is engine-dependent); mirrored by _finite_vec_sql in the
    # oracle's sigs CTE
    emb = T(spark, sf, "embeddings").filter(valid_vector("embedding"))
    qvec = _query_vec(emb, 0)
    if qvec is None:
        # missing/NULL query vector: the oracle's FROM-less final SELECT
        # still yields ONE row — its probed/ann CTEs are empty (empty q
        # CTE, or NULL qsig filtering every row), so both counts are 0
        return spark.range(1).select(
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("n_probed"),
            F.lit(0).cast("long").alias("hits"),
        )
    planes = _hyperplanes(len(qvec), bits, seed)
    # Driver-side query signature via the SAME sequential IEEE fold the
    # engines use (plain Python loop, not numpy BLAS — summation order is
    # part of the contract).
    qsig = 0
    for i, plane in enumerate(planes):
        d = 0.0
        for x, y in zip(qvec, plane):
            d += x * float(y)
        if d > 0:
            qsig |= 1 << i
    q = lit_arr([float(x) for x in qvec]).cast("array<double>")
    cos = cosine_sim(F.col("embedding"), q)
    sigs = emb.withColumn("__sig", _signature_expr("embedding", planes))
    probed = sigs.filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig).cast("long"))) <= hamming)
    ann = (probed.select("vec_id", cos.alias("__cos"))
           .orderBy(F.col("__cos").desc(), F.col("vec_id")).limit(k).select("vec_id"))
    exact = (emb.select("vec_id", cos.alias("__cos"))
             .orderBy(F.col("__cos").desc(), F.col("vec_id")).limit(k).select("vec_id"))
    return (
        ann.join(exact, "vec_id").agg(F.count("*").alias("hits"))
        .crossJoin(probed.agg(F.count("*").alias("n_probed")))
        .select(F.lit(k).cast("long").alias("k"), "n_probed", "hits")
    )


# == SQL-string surface: the SAME query text runs on both engines ========

SHARED_SQL_AGG = """
SELECT c_mktsegment,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       count(*) AS n_orders,
       CAST(CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, year(o_orderdate)
"""

SHARED_SQL_WINDOW = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 2
"""


@register(
    "sql_shared_dialect_agg",
    SHARED_SQL_AGG,
    doc="SQL entry point: the LITERAL SAME string runs through Catalyst and DuckDB "
        "(register_tables exposes oracle-named views; no bespoke dialect)",
)
def q_sql_agg(spark, sf):
    return run_sql(spark, sf, SHARED_SQL_AGG)


@register(
    "sql_shared_dialect_window",
    SHARED_SQL_WINDOW,
    doc="SQL entry point: identical window-function SQL on both engines",
)
def q_sql_win(spark, sf):
    return run_sql(spark, sf, SHARED_SQL_WINDOW)


@register(
    "r11_misc_aggregates",
    """
    SELECT c_nationkey,
           CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           bool_or(c_acctbal > 9000) AS any_rich,
           arg_max(c_custkey, CAST(round(c_acctbal*100,0) AS BIGINT) * 1000000 + c_custkey) AS richest_cust,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) FILTER (WHERE c_custkey % 500 = 0) AS sample_keys
    FROM customer GROUP BY c_nationkey
    """,
    doc="R11 depth: count_if / bool_and / bool_or / max_by (composite tie-break) / "
        "ordered string_agg — deterministic forms of the convenience aggregates",
)
def q_misc_agg(spark, sf):
    c = T(spark, sf, "customer")
    tiebreak = cents("c_acctbal") * 1000000 + F.col("c_custkey")
    sampled = F.when(F.col("c_custkey") % 500 == 0, F.col("c_custkey"))
    # sort numerically BEFORE stringifying (lexicographic '1000'<'500'
    # would diverge from duckdb's ORDER BY c_custkey); empty group -> NULL
    # to match string_agg-over-no-rows
    keys_str = F.nullif(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(sampled)), lambda x: x.cast("string")),
            ",",
        ),
        F.lit(""),
    )
    return c.groupBy("c_nationkey").agg(
        F.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.max_by("c_custkey", tiebreak).alias("richest_cust"),
        keys_str.alias("sample_keys"),
    )


@register(
    "r_unpivot",
    """
    SELECT c_custkey, metric, round(value, 6) AS value FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
    ) t
    """,
    doc="Unpivot/melt: wide columns to (key, metric, value) rows "
        "(Spark DataFrame.unpivot == the UNION ALL relational algebra)",
)
def q_unpivot(spark, sf):
    c = T(spark, sf, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="v",
    ).select("c_custkey", "metric", F.round("v", 6).alias("value"))


@register(
    "r_gap_fill_forward",
    """
    WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type,
                          count(*) AS n,
                          CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS cents
                   FROM events GROUP BY 1, 2),
    b AS (SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events),
    spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS d FROM b),
    grid AS (SELECT d, event_type FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM events)),
    j AS (SELECT g.d, g.event_type, coalesce(daily.n, 0) AS n, daily.cents
          FROM grid g LEFT JOIN daily ON daily.d = g.d AND daily.event_type = g.event_type)
    SELECT CAST(d AS TIMESTAMP) AS day, event_type, n,
           last_value(cents IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ffill
    FROM j
    """,
    doc="Time-series gap filling: date spine (sequence+explode) x entity grid, "
        "left join daily aggregates, zero-fill counts, forward-fill sums "
        "(last ignorenulls over an unbounded-preceding frame)",
)
def q_gap_fill(spark, sf):
    ev = T(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum(cents("value")).alias("cents"))
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    grid = spine.crossJoin(ev.select("event_type").distinct())
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["d", "event_type"], "left")
        .select(
            F.col("d").cast("timestamp").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.last("cents", ignorenulls=True).over(w).alias("cents_ffill"),
        )
    )


# == flagship curation pipeline: the LLM-data story end to end ===========
# (defined last so it can reuse the registered oracle texts verbatim —
# the oracle is literally the composition of the piece oracles)

def _curation_oracle() -> str:
    quality = REGISTRY["t_quality_scores"].oracle
    jaccard = JACCARD_ORACLE  # the UNCAPPED exact pairs: the pipeline's
    # LSH verify stage reproduces the all-shingles pair set, not the
    # r30 entry's hot-shingle-capped variant
    return f"""
    WITH q AS ({quality}),
         d AS ({jaccard}),
         keep AS (SELECT q.doc_id, q.n_tokens FROM q
                  WHERE q.keep AND q.doc_id NOT IN (SELECT id_b FROM d))
    SELECT doc.lang, count(*) AS n_docs,
           CAST(sum(keep.n_tokens) AS BIGINT) AS total_tokens
    FROM keep JOIN documents doc ON doc.doc_id = keep.doc_id
    GROUP BY doc.lang
    """


@register(
    "pipeline_corpus_curation",
    None,  # oracle attached right below (needs the registered piece oracles)
    doc="Flagship LLM-pipeline composition: quality filter -> near-dup removal "
        "(keep the lower doc_id of each pair) -> per-language doc/token accounting. "
        "The dedup stage is the SCALE path: MinHash+LSH candidates verified with "
        "exact Jaccard (dedup.minhash_near_dup_pairs) — linear in corpus size, "
        "never the quadratic exact-pairs discovery. The oracle composes the "
        "exact-Jaccard piece oracle: candidate-verify returns exactly the "
        "threshold-qualified pairs (recall asserted in tests/test_operators.py), "
        "so the composition still hash-matches.",
)
def q_curation(spark, sf):
    docs = T(spark, sf, "documents")
    q = quality_scores(docs).select("doc_id", "n_tokens", "keep")
    dup_bs = minhash_near_dup_pairs(docs, threshold=0.5).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    keep = q.filter(F.col("keep")).join(dup_bs, "doc_id", "anti")
    return (
        keep.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


REGISTRY["pipeline_corpus_curation"].oracle = _curation_oracle()


# == round-2 additions (registered AFTER the curation pipeline so the
#    driver's 50-entry front window stays exactly the round-1-unverified
#    set; these land at positions 51+ and get verified in a later round) =

REPETITION_ORACLE = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
g AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(t)-1, 0)),
                                   i -> array_to_string(t[i:i+1], ' '))) AS g
      FROM toks),
f AS (SELECT doc_id, g, count(*) AS f FROM g GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nd, CAST(max(f) AS BIGINT) AS top
      FROM f GROUP BY 1)
SELECT d.doc_id,
       coalesce(total, 0) AS n_ngrams,
       coalesce(nd, 0) AS n_distinct_ngrams,
       round(CASE WHEN total > 0 THEN 1.0 - nd*1.0/total ELSE 0.0 END, 6) AS dup_ngram_frac,
       round(CASE WHEN total > 0 THEN top*1.0/total ELSE 0.0 END, 6) AS top_ngram_frac
FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
"""


@register(
    "t_repetition_scores",
    REPETITION_ORACLE,
    doc="Gopher-style intra-doc repetition: duplicate/top 2-gram fractions "
        "(cross-doc dedup can't see these; boilerplate filter)",
)
def q_repetition(spark, sf):
    return repetition_scores(T(spark, sf, "documents"), n=2)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{4}\b"

PII_ORACLE = f"""
WITH p AS (SELECT doc_id,
  'contact user' || CAST(doc_id AS VARCHAR) || '@example.com call 555-'
    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 ' || text AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS INT) AS n_ips,
  CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INT) AS n_phones,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{_PII_EMAIL}', '<EMAIL>', 'g'),
    '{_PII_IP}', '<IP>', 'g'),
    '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
FROM p
"""


@register(
    "t_pii_scrub",
    PII_ORACLE,
    doc="PII redaction with per-category counts over a deterministic "
        "planted-PII column (emails/IPv4/phone fragments); zero-shuffle "
        "regexp built-ins",
)
def q_pii(spark, sf):
    docs = T(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 "), F.col("text"),
        ).alias("text"),
    )
    return pii_scrub(planted)


_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}

MIX_ORACLE = f"""
SELECT doc_id, source FROM documents
WHERE {weighted_mix_sql("source", "doc_id", _MIX_WEIGHTS)}
"""


@register(
    "p_weighted_mix",
    MIX_ORACLE,
    doc="Deterministic pretraining-mixture sampling: per-source keep "
        "fractions via the portable md5 bucket (zero shuffles; stable "
        "across engines/reruns — df.sample() can't provide that)",
)
def q_weighted_mix(spark, sf):
    docs = T(spark, sf, "documents")
    return weighted_mix(docs, "source", "doc_id", _MIX_WEIGHTS).select("doc_id", "source")


# -- round-2 TPC-H completions (q8/q9/q13/q15/q21 shapes; q11/q20 are the
#    only ones not portable to this fixture set — both are pure partsupp
#    queries and TESTDATA.md ships no partsupp table) --------------------

Q8_ORACLE = """
WITH v AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice*100,0) AS BIGINT)
           * (100 - CAST(round(l_discount*100,0) AS BIGINT)) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
SELECT o_year,
       round(CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(vol) AS BIGINT) AS DOUBLE), 6) AS mkt_share
FROM v GROUP BY o_year
"""


@register(
    "tpch_q8_market_share",
    Q8_ORACLE,
    doc="TPC-H Q8 shape: national market share — 8-way join, conditional "
        "integer sums, single final ratio division (bit-stable)",
)
def q_q8(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    c, s, p = T(spark, sf, "customer"), T(spark, sf, "supplier"), T(spark, sf, "part")
    n1 = T(spark, sf, "nation").alias("n1")
    n2 = T(spark, sf, "nation").alias("n2")
    r = T(spark, sf, "region")
    vol = cents("l_extendedprice") * (100 - cents("l_discount"))
    v = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .join(p, li.l_partkey == p.p_partkey)
        .filter(
            (F.col("r_name") == "AMERICA") & (F.col("p_type") == "ECONOMY")
            & (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(0)).cast("long")
    den = F.sum("vol").cast("long")
    return v.groupBy("o_year").agg(
        F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share")
    )


Q9_ORACLE = """
WITH a AS (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(round(l_extendedprice*100,0) AS BIGINT)
           * (100 - CAST(round(l_discount*100,0) AS BIGINT))
         - CAST(round(p_retailprice*100,0) AS BIGINT) * 10
           * CAST(round(l_quantity,0) AS BIGINT) AS amount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%')
SELECT nation, o_year,
       CAST(CAST(sum(amount) AS BIGINT) AS DOUBLE)/10000 AS sum_profit
FROM a GROUP BY nation, o_year
"""


@register(
    "tpch_q9_product_profit",
    Q9_ORACLE,
    doc="TPC-H Q9 shape (adapted: no partsupp table in the fixtures, so "
        "supply cost is proxied as 10% of p_retailprice): per-nation "
        "per-year profit, integerized to 1e-4 dollar units",
)
def q_q9(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    s, p, n = T(spark, sf, "supplier"), T(spark, sf, "part"), T(spark, sf, "nation")
    amount = (
        cents("l_extendedprice") * (100 - cents("l_discount"))
        - cents("p_retailprice") * 10 * F.round(F.col("l_quantity"), 0).cast("long")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .filter(F.col("p_name").like("%widget%"))
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg((F.sum("amount").cast("long").cast("double") / 10000).alias("sum_profit"))
    )


Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count
"""


@register(
    "tpch_q13_order_distribution",
    Q13_ORACLE,
    doc="TPC-H Q13 shape: outer join with a join-side filter, then a "
        "distribution-of-counts double aggregation (adapted: the "
        "original's o_comment NOT LIKE filter becomes an order-priority "
        "filter — the fixture has no comment column)",
)
def q_q13(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    filtered = o.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(filtered, c.c_custkey == filtered.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
                  * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS rev_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(rev_units AS DOUBLE)/10000 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE rev_units = (SELECT max(rev_units) FROM revenue)
"""


@register(
    "tpch_q15_top_supplier",
    Q15_ORACLE,
    doc="TPC-H Q15 shape: derived revenue view + scalar-subquery max over "
        "the same view (exact integer revenue units, so the max "
        "comparison is tie-safe)",
)
def q_q15(spark, sf):
    li, s = T(spark, sf, "lineitem"), T(spark, sf, "supplier")
    rev = (
        li.filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("long").alias("rev_units"))
    )
    mx = rev.agg(F.max("rev_units").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("rev_units") == F.col("mx"))
        .select("s_suppkey", "s_name", (F.col("rev_units").cast("double") / 10000).alias("total_revenue"))
    )


Q21_ORACLE = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, count(*) AS numwait
FROM lo l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE l1.late = 1 AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
GROUP BY s_name
"""


@register(
    "tpch_q21_waiting_suppliers",
    Q21_ORACLE,
    doc="TPC-H Q21 shape (adapted: late = shipped >30 days after order "
        "date, as in q4 — the fixture has no commit/receipt dates): the "
        "sole-late-supplier-on-a-multi-supplier-order pattern. The oracle "
        "keeps the EXISTS/NOT-EXISTS formulation; the Spark plan uses the "
        "equivalent per-order distinct-supplier aggregate rewrite — two "
        "independent formulations hash-matching is a stronger check than "
        "mirroring one",
)
def q_q21(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    s, n = T(spark, sf, "supplier"), T(spark, sf, "nation")
    lo = (
        li.join(o.filter(F.col("o_orderstatus") == "F"), li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .cast("int").alias("late"),
        )
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        lo.filter(F.col("late") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


SESSIONIZE_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM e)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


@register(
    "r_sessionize_gap",
    SESSIONIZE_ORACLE,
    doc="Batch sessionization (gap 30min): lag -> session-boundary flag -> "
        "running-sum session id -> per-session agg. The batch algebra "
        "behind S5's session_window; one window shuffle on user_id, reused "
        "by all three passes",
)
def q_sessionize(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "event_id", "ts", is_new.alias("is_new"))
        .withColumn("session_id", F.sum("is_new").over(cum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


SCD2_ORACLE = """
SELECT user_id, event_id, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM events
WHERE event_type <> 'error'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "r_scd2_intervals",
    SCD2_ORACLE,
    doc="SCD2 interval build over the changelog (G8's other half): each "
        "non-tombstone version gets [valid_from, valid_to) via lead(), "
        "open-ended current row flagged — one window shuffle",
)
def q_scd2(spark, sf):
    ev = T(spark, sf, "events").filter(F.col("event_type") != "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


DECONTAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(generate_series(1, greatest(len(t)-3, 0)),
                               i -> array_to_string(t[i:i+3], ' '))) AS g
  FROM toks),
ev AS (SELECT DISTINCT g FROM grams WHERE source = 'src19'),
hits AS (
  SELECT tg.doc_id, count(*) AS n
  FROM grams tg JOIN ev USING (g) WHERE tg.source <> 'src19' GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(n, 0) AS BIGINT) AS n_contaminated_ngrams,
       CAST(CASE WHEN coalesce(n, 0) >= 1 THEN 1 ELSE 0 END AS INT) AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
WHERE d.source <> 'src19'
"""


@register(
    "p_decontaminate",
    DECONTAM_ORACLE,
    doc="Eval-set decontamination: word-4-gram overlap of the training "
        "corpus (source<>src19) against a held-out benchmark (src19). "
        "Tiny eval n-gram set broadcast — the corpus is never shuffled "
        "for the probe; one groupBy(doc_id) for the count",
)
def q_decontaminate(spark, sf):
    docs = T(spark, sf, "documents")
    return decontaminate(
        docs.filter(F.col("source") != "src19"),
        docs.filter(F.col("source") == "src19"),
        n=4,
    )


CHUNK_ORACLE = """
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), 64)) AS cs
  FROM documents)
SELECT doc_id,
       CAST((cs - 1) // 64 AS INT) AS chunk_idx,
       CAST(cs AS INT) AS chunk_start,
       substr(text, CAST(cs AS INT), 80) AS chunk,
       CAST(length(substr(text, CAST(cs AS INT), 80)) AS INT) AS chunk_len
FROM s
"""


@register(
    "p_chunk_documents",
    CHUNK_ORACLE,
    doc="RAG/embedding-prep chunking: 80-char windows, stride 64 (16 "
        "overlap), generate-and-explode per row — zero shuffles at any "
        "corpus size",
)
def q_chunk_documents(spark, sf):
    return chunk_documents(
        T(spark, sf, "documents"), chunk_size=80, stride=64
    )


SHARD_SHUFFLE_ORACLE = f"""
WITH k AS (
  SELECT doc_id,
         ({stable_bucket_sql('doc_id', 64)}) AS shard,
         ({stable_bucket_sql("'ord:' || CAST(doc_id AS VARCHAR)", 1 << 60)}) AS shuffle_key
  FROM documents)
SELECT doc_id, shard, shuffle_key,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id)
            AS BIGINT) AS pos_in_shard
FROM k
"""


@register(
    "p_shard_shuffle",
    SHARD_SHUFFLE_ORACLE,
    doc="Deterministic global training-order shuffle: stable md5 shard + "
        "independent salted order hash + per-shard position. One window "
        "shuffle, parallel across shards; any engine reproduces the "
        "epoch order bit-for-bit",
)
def q_shard_shuffle(spark, sf):
    docs = T(spark, sf, "documents")
    return shard_shuffle(docs, "doc_id", n_shards=64).select(
        "doc_id", "shard", "shuffle_key", "pos_in_shard"
    )


MERGE_UPSERT_ORACLE = """
WITH r AS (
  SELECT user_id, value, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, value, ts AS updated_at
FROM r WHERE rn = 1 AND event_type <> 'error'
"""


@register(
    "r_merge_upsert",
    MERGE_UPSERT_ORACLE,
    doc="Incremental MERGE INTO: base snapshot (events < 2024-01-20) "
        "full-outer-joined with the latest-per-key delta slice "
        "(tombstone=error deletes). Oracle is the one-shot snapshot of "
        "the WHOLE log — the merge must reproduce it exactly. Delta "
        "pre-shrunk to one row per touched key before the join; AQE "
        "broadcasts the small delta so the base is not shuffled",
)
def q_merge_upsert(spark, sf):
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ev = T(spark, sf, "events").select(
        "user_id", "event_id", "ts", "value", "event_type",
        F.col("ts").alias("updated_at"),
    )
    base = (
        exact_dedup_latest(ev.filter(F.col("ts") < cutoff), ["user_id"], "ts", "event_id")
        .filter(F.col("event_type") != "error")
        .select("user_id", "value", "updated_at")
    )
    delta = ev.filter(F.col("ts") >= cutoff)
    return merge_upsert(
        base, delta,
        keys=["user_id"], order_col="ts", tiebreak="event_id",
        tombstone=F.col("event_type") == "error",
        payload_cols=["value", "updated_at"],
    )


SPAN_DEDUP_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
spans AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) // 10),
                               i -> array_to_string(t[(i-1)*10+1 : i*10], ' '))) AS sp
  FROM toks WHERE len(t) >= 10),
flagged AS (
  SELECT doc_id, count(*) OVER (PARTITION BY sp) AS n_docs_with_span FROM spans)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN n_docs_with_span >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans
FROM flagged GROUP BY doc_id
"""


@register(
    "p_span_dedup",
    SPAN_DEDUP_ORACLE,
    doc="Cross-document exact span dedup (Lee et al. 2022 signal): tile "
        "docs into non-overlapping 10-token spans, count per doc how many "
        "spans appear verbatim in other docs. No self-join — one window "
        "over the span value + the per-doc rollup (2 shuffles total)",
)
def q_span_dedup(spark, sf):
    return duplicate_span_stats(T(spark, sf, "documents"), span=10)


QUANTIZE_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           WHERE {_finite_vec_sql('embedding::DOUBLE[]')})
SELECT vec_id,
       CAST(len(e) AS INT) AS n_dims,
       sqrt(list_reduce(list_transform(e, x -> x * x), (x, y) -> x + y)) AS norm,
       list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale,
       array_to_string(
         list_transform(e, x -> CAST(CAST(floor(
           x * 127.0 / list_max(list_transform(e, y -> abs(y))) + 0.5)
           AS INT) AS VARCHAR)), ',') AS codes
FROM v
"""


@register(
    "e_vector_quantize",
    QUANTIZE_ORACLE,
    doc="Vector-store prep: L2 norm + symmetric int8 quantization "
        "(scale=max_abs/127, floor(x+0.5) rounding — engine-portable). "
        "Pure per-row folds, zero exchanges; codes CSV-stringified so the "
        "oracle pins every component",
)
def q_vector_quantize(spark, sf):
    # invalid vectors (NULL / non-finite / zero-norm) cannot be quantized
    # (codes/norm/scale undefined): quantize_vectors drops them via
    # valid_vector; the oracle mirrors with _finite_vec_sql
    return quantize_vectors(T(spark, sf, "embeddings")).select(
        "vec_id", "n_dims", "norm", "scale",
        F.concat_ws(",", F.transform("codes", lambda x: x.cast("string"))).alias("codes"),
    )


RANGE_SEARCH_ORACLE = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
s AS (SELECT c.vec_id,
             round(
               list_reduce(list_transform(list_zip(c.v, q.qv), x -> x[1] * x[2]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(c.v, x -> x * x), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y))), 6) AS cosine
      FROM c, q)
SELECT vec_id, cosine FROM s WHERE cosine >= 0.3
"""


@register(
    "e_range_search",
    RANGE_SEARCH_ORACLE,
    doc="Cosine radius search (the other vector-store read API next to "
        "top-k): all vectors within a similarity threshold of the query. "
        "Codegen'd fold against a literal query vector + in-place filter — "
        "shuffle-free scan at any corpus size",
)
def q_range_search(spark, sf):
    emb = T(spark, sf, "embeddings")
    return _ann_entry(emb, 0, lambda qv: range_search(emb, qv, threshold=0.3))


FRAME_SAMPLE_ORACLE = """
SELECT doc_id AS media_id,
       CAST(unnest(generate_series(0, CAST(strlen(text) AS BIGINT), 100))
            AS BIGINT) AS frame_ts_ms
FROM documents WHERE doc_id % 3 = 2
"""


@register(
    "m_frame_sample",
    FRAME_SAMPLE_ORACLE,
    doc="Multimodal: video frame-sampling plan — per-clip decode "
        "timestamps every 100 ms via sequence+explode (duration falls "
        "back to payload byte length on the synthetic fixture). Pure "
        "per-row expansion, zero exchanges; the decode of each listed "
        "frame is the mapInPandas kernel",
)
def q_frame_sample(spark, sf):
    from .operators.multimodal import frame_sample_plan

    return frame_sample_plan(media_from_documents(T(spark, sf, "documents")), every_ms=100)


@register(
    "m_resize_media",
    r"""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
           CAST(16 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
           CAST(64 AS INTEGER) AS n_bytes,
           base64(encode(substr(text, 1, 64)) ||
                  repeat('\x00'::BLOB, greatest(64 - length(text), 0))) AS content_b64
    FROM documents
    """,
    doc="Multimodal: Arrow-batched nearest-neighbor resize plumbing over "
        "binary payloads (fake-mode deterministic byte shaping; real "
        "PPM/BMP decode path exercised in tests) — HASH-checkable: the "
        "resized payload is base64'd and the oracle reconstructs the "
        "truncate-to-64/NUL-pad bytes from the source text (pure-ASCII "
        "fixture, so char-substr == byte-substr; asserted per-sf in "
        "tests/test_formats.py). Verifies the binary OUTPUT of the "
        "mapInPandas kernel, not just its row count. (VERDICT r05 item 1b.)",
)
def q_resize_media(spark, sf):
    from .operators.multimodal import resize_media

    return resize_media(
        media_from_documents(T(spark, sf, "documents")), width=16, height=4, fake=True
    ).select(
        "media_id", "modality", "width", "height",
        F.octet_length("content").alias("n_bytes"),
        # Spark's base64 MIME-chunks with \r\n every 76 chars; strip to
        # the unchunked RFC 4648 form DuckDB emits
        F.translate(F.base64("content"), "\r\n", "").alias("content_b64"),
    )


DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({{JACCARD}}),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)
SELECT u AS doc_id,
       CAST(min(r) AS BIGINT) AS component,
       CAST(CASE WHEN u = min(r) THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM reach GROUP BY u
""".replace("{JACCARD}", JACCARD_ORACLE)


@register(
    "d_dedup_clusters",
    DEDUP_CLUSTERS_ORACLE,
    doc="Pairs -> clusters: distributed connected components (iterative "
        "min-label propagation, localCheckpoint per round) over the exact "
        "Jaccard>=0.5 pair graph; cluster id = min doc_id, which is the "
        "canonical keep-doc. Oracle = ANSI recursive CTE transitive "
        "closure. The iterative-algorithm operator class: transitive "
        "grouping SQL window/join algebra cannot express in one pass",
)
def q_dedup_clusters(spark, sf):
    pairs = exact_jaccard_pairs(T(spark, sf, "documents"), threshold=0.5)
    return dedup_clusters(pairs)


INCREMENTAL_DEDUP_ORACLE = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
    FROM toks)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_new, b.doc_id AS id_old, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s
          WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2),
j AS (SELECT id_new, id_old, c * 1.0 / (sa.sz + sb.sz - c) AS j
      FROM inter JOIN sizes sa ON sa.doc_id = id_new
                 JOIN sizes sb ON sb.doc_id = id_old
      WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5),
r AS (SELECT id_new, id_old, j,
             row_number() OVER (PARTITION BY id_new ORDER BY j DESC, id_old) AS rn
      FROM j)
SELECT id_new AS doc_id, id_old AS dup_of, round(j, 6) AS jaccard
FROM r WHERE rn = 1
"""


@register(
    "d_incremental_near_dup",
    INCREMENTAL_DEDUP_ORACLE,
    doc="Production dedup shape: screen a NEW ingest batch (doc_id%5=0) "
        "against the EXISTING corpus (rest) — MinHash signatures both "
        "sides, asymmetric band-bucket join for candidates, exact-Jaccard "
        "verify, best corpus match per flagged new doc. Corpus signatures "
        "are incrementally maintainable as a stored table; only the batch "
        "is re-signed in steady state. Oracle = exact cross-Jaccard",
)
def q_incremental_near_dup(spark, sf):
    docs = T(spark, sf, "documents")
    return incremental_near_dup(
        docs.filter(F.col("doc_id") % 5 == 0),
        docs.filter(F.col("doc_id") % 5 != 0),
        threshold=0.5,
    )


def _curation_clustered_oracle() -> str:
    quality = REGISTRY["t_quality_scores"].oracle
    jaccard = JACCARD_ORACLE  # uncapped, see _curation_oracle
    return f"""
    WITH RECURSIVE q AS ({quality}),
    p AS ({jaccard}),
    edges AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
    noncanon AS (SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(r)),
    keep AS (SELECT q.doc_id, q.n_tokens FROM q
             WHERE q.keep AND q.doc_id NOT IN (SELECT doc_id FROM noncanon))
    SELECT doc.lang, count(*) AS n_docs,
           CAST(sum(keep.n_tokens) AS BIGINT) AS total_tokens
    FROM keep JOIN documents doc ON doc.doc_id = keep.doc_id
    GROUP BY doc.lang
    """


@register(
    "pipeline_curation_clustered",
    None,  # oracle attached right below (composes registered piece oracles)
    doc="Cluster-aware curation: quality filter -> MinHash+LSH pair "
        "discovery -> connected components -> keep ONE canonical doc per "
        "duplicate cluster (pairwise id_b-removal under/over-removes on "
        "transitive duplicates) -> per-language doc/token accounting. "
        "Oracle composes the quality + exact-Jaccard piece oracles with "
        "the recursive-CTE closure",
)
def q_curation_clustered(spark, sf):
    docs = T(spark, sf, "documents")
    q = quality_scores(docs).select("doc_id", "n_tokens", "keep")
    pairs = minhash_near_dup_pairs(docs, threshold=0.5)
    noncanon = dedup_clusters(pairs).filter(F.col("is_canonical") == 0).select("doc_id")
    keep = q.filter(F.col("keep")).join(noncanon, "doc_id", "anti")
    return (
        keep.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


REGISTRY["pipeline_curation_clustered"].oracle = _curation_clustered_oracle()


@register(
    "r_skew_salted_agg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
           count(*) AS n_items,
           CAST(max(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS max_qty_cents
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Skew: two-phase salted aggregation (operators/skew.salted_agg) — "
        "3 dominant group keys fan out over 16 salted reducers, a tiny "
        "second agg merges partials; result provably identical to the "
        "plain GROUP BY (that IS the oracle). The shape AQE cannot fix: "
        "map-side combine still leaves one reducer per hot key",
)
def q_skew_agg(spark, sf):
    from .operators.skew import salted_agg

    li = T(spark, sf, "lineitem").withColumn("qty_cents", cents("l_quantity"))
    return salted_agg(
        li,
        keys=["l_returnflag"],
        salt_source_cols=["l_orderkey", "l_linenumber"],
        aggs={
            "sum_qty_cents": ("sum", "qty_cents"),
            "n_items": ("count", "l_orderkey"),
            "max_qty_cents": ("max", "qty_cents"),
        },
        n_salts=16,
    )


@register(
    "r_skew_salted_join",
    """
    SELECT p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)/100 AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Skew: salted replicated join (operators/skew."
        "salted_broadcast_fallback_join) — big side salted by non-key "
        "columns, small side exploded n_salts x so every (key, salt) "
        "partition holds its copy; row-identical to the plain equi-join "
        "(that IS the oracle). The fallback for a hot join key when the "
        "small side exceeds the broadcast threshold",
)
def q_skew_join(spark, sf):
    from .operators.skew import salted_broadcast_fallback_join

    li = T(spark, sf, "lineitem").select("l_partkey", "l_extendedprice")
    p = T(spark, sf, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    joined = salted_broadcast_fallback_join(li, p, on="l_partkey", n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"), money_sum("l_extendedprice", "revenue")
    )


@register(
    "r_funnel_sequence",
    """
    SELECT user_id,
           CASE WHEN v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL
                     AND v < c AND c < p THEN 3
                WHEN v IS NOT NULL AND c IS NOT NULL AND v < c THEN 2
                WHEN v IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage,
           v AS first_view, c AS first_click, p AS first_purchase
    FROM (SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS v,
                 min(CASE WHEN event_type = 'click' THEN ts END) AS c,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
          FROM events GROUP BY user_id)
    """,
    doc="Analytics: first-touch funnel (view -> click -> purchase by first "
        "occurrence) — conditional min aggregation, ONE shuffle on user_id "
        "with map-side partials; no self-join, no per-user event collection "
        "(the naive sequence-match shape shuffles the raw event log per "
        "step). Stage = deepest prefix reached in order",
)
def q_funnel(spark, sf):
    ev = T(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    stage = (
        F.when(
            F.col("v").isNotNull() & F.col("c").isNotNull() & F.col("p").isNotNull()
            & (F.col("v") < F.col("c")) & (F.col("c") < F.col("p")),
            3,
        )
        .when(F.col("v").isNotNull() & F.col("c").isNotNull() & (F.col("v") < F.col("c")), 2)
        .when(F.col("v").isNotNull(), 1)
        .otherwise(0)
    )
    return firsts.select(
        "user_id",
        stage.alias("funnel_stage"),
        F.col("v").alias("first_view"),
        F.col("c").alias("first_click"),
        F.col("p").alias("first_purchase"),
    )


@register(
    "d_fuzzy_name_pairs",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    """,
    doc="Dedup: blocked fuzzy-match pair join — entity-resolution shape: "
        "block on an exact composite key (brand, size), pairwise edit "
        "distance only within blocks, JVM built-in levenshtein. The "
        "record-linkage complement to the token-set (Jaccard) and vector "
        "(cosine) near-dup families. Live demo of SCALE.md's hot-block "
        "rule: brand alone leaves ~800-row blocks at sf0.1 (8.0M "
        "levenshtein pairs, 17.6 s); widening the key to (brand, size) "
        "bounds blocks at ~16 rows (160k pairs, sub-second) with the "
        "same blocked-ER semantics",
)
def q_fuzzy(spark, sf):
    p = T(spark, sf, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .withColumn("edit_dist", dist.cast("int"))
        .filter(F.col("edit_dist") <= 8)
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            "edit_dist",
        )
    )


# Z-order (Morton) interleave of two bucketized keys: `bits` bits each
# (default 8 -> 16-bit z-value). Bit-level expressions only — identical arithmetic on
# both engines, so the oracle can mirror it term by term.
def _zorder_sql(xcol: str, ycol: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _zorder_col(x: F.Column, y: F.Column, bits: int = 8) -> F.Column:
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


@register(
    "l_zorder_layout",
    f"""
    WITH k AS (SELECT l_orderkey, l_partkey, l_suppkey,
                      CAST(l_partkey % 256 AS BIGINT) AS xb,
                      CAST(l_suppkey % 256 AS BIGINT) AS yb
               FROM lineitem),
    z AS (SELECT l_orderkey, l_partkey, l_suppkey,
                 {_zorder_sql('xb', 'yb')} AS zval FROM k)
    SELECT CAST(floor(zval / 1024) AS BIGINT) AS zfile,
           count(*) AS n_rows,
           CAST(min(l_partkey) AS BIGINT) AS part_min, CAST(max(l_partkey) AS BIGINT) AS part_max,
           CAST(min(l_suppkey) AS BIGINT) AS supp_min, CAST(max(l_suppkey) AS BIGINT) AS supp_max
    FROM z GROUP BY zfile
    """,
    doc="Layout: z-order (Morton) clustering key over (part, supp) with "
        "per-file min/max ranges — the multi-column data-skipping story: "
        "sorting files by the interleaved key keeps BOTH columns' per-file "
        "ranges narrow, so a predicate on either prunes files (a single-"
        "column sort gives narrow ranges on one column only). Pure bit "
        "expressions in codegen; the grouping simulates 1024-row files "
        "and emits exactly the min/max stats a parquet footer would carry",
)
def q_zorder(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    xb = (F.col("l_partkey") % 256).cast("long")
    yb = (F.col("l_suppkey") % 256).cast("long")
    z = _zorder_col(xb, yb)
    return (
        li.withColumn("zval", z)
        .groupBy(F.floor(F.col("zval") / 1024).cast("long").alias("zfile"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").cast("long").alias("part_min"),
            F.max("l_partkey").cast("long").alias("part_max"),
            F.min("l_suppkey").cast("long").alias("supp_min"),
            F.max("l_suppkey").cast("long").alias("supp_max"),
        )
    )


@register(
    "t_unigram_logprob",
    """
    WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term FROM documents),
    vocab AS (SELECT term, count(*) AS freq FROM toks GROUP BY 1),
    tot AS (SELECT count(*) AS total FROM toks),
    lp AS (SELECT term, CAST(round(ln(freq * 1.0 / total) * 1e6, 0) AS BIGINT) AS lp_micro
           FROM vocab CROSS JOIN tot),
    per_doc AS (SELECT doc_id, count(*) AS n_lm_tokens,
                       CAST(sum(lp_micro) AS BIGINT) AS s
                FROM toks JOIN lp USING (term) GROUP BY 1)
    SELECT d.doc_id,
           coalesce(per_doc.n_lm_tokens, 0) AS n_lm_tokens,
           round(per_doc.s * 1.0 / per_doc.n_lm_tokens / 1e6, 6) AS avg_logprob
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
    doc="Text: per-doc average unigram log-probability under the corpus's own "
        "unigram LM (cheap perplexity-ish quality rank) — micro-nat integer "
        "sums for order-independent exactness; vocab joined back broadcast-"
        "small, two shuffles total",
)
def q_unigram_lp(spark, sf):
    return unigram_logprob(T(spark, sf, "documents"))


@register(
    "e_mips_topk",
    f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id = 7 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
    s AS (SELECT c.vec_id,
                 list_reduce(list_transform(list_zip(c.v, q.qv), x -> x[1] * x[2]),
                             (x, y) -> x + y) AS d
          FROM c, q)
    SELECT vec_id, round(d, 6) AS dot FROM s ORDER BY d DESC, vec_id LIMIT 10
    """,
    doc="Similarity: exact max-inner-product top-k (unnormalized retrieval "
        "scores) — TakeOrderedAndProject, join-free; norm-augmentation "
        "reduction documented for index-served MIPS at scale. The corpus "
        "CTE mirrors mips_topk's uniform invalid-vector drop (incl. "
        "zero-norm, which is MIPS-definable but excluded by the family "
        "contract — ADVICE r08 medium: the exclusion must live on BOTH "
        "sides or a zero vector can enter the oracle's top-k only)",
)
def q_mips(spark, sf):
    emb = T(spark, sf, "embeddings")
    return _ann_entry(emb, 7, lambda qv: mips_topk(emb, qv, k=10))


# == fifth wave: temporal/statistical/retrieval composites ===============

@register(
    "r10_asof_forward",
    """
    WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id, nc.event_id AS next_click_id, nc.ts AS next_click_ts
    FROM p LEFT JOIN LATERAL (
      SELECT event_id, ts FROM c
      WHERE c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.ts ASC LIMIT 1
    ) nc ON true
    """,
    doc="R10 companion: FORWARD as-of join (earliest right event at or "
        "after each left event — the 'next action' lookup). Same "
        "union+window rewrite as backward, first_value over an "
        "unbounded-following frame; one shuffle. Oracle is a LATERAL "
        "top-1 probe, the semantic spec of forward-asof.",
)
def q_r10_forward(spark, sf):
    ev = T(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    joined = asof_join(p, c, ["user_id"], "ts", "ts", ["event_id"], direction="forward")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        F.col("event_id_right").alias("next_click_id"),
        F.col("ts_right").alias("next_click_ts"),
    )


@register(
    "r_ewma_smoothing",
    """
    WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type,
                          CAST(CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS DOUBLE) AS DOUBLE) AS cents
                   FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, list(cents ORDER BY d) AS vs FROM daily GROUP BY 1)
    SELECT event_type,
           CAST(len(vs) AS BIGINT) AS n_days,
           round(list_reduce(vs, (acc, x) -> x * 0.3 + acc * 0.7), 6) AS ewma_cents
    FROM s
    """,
    doc="Time-series smoothing: per-key EWMA (alpha=0.3) over the daily "
        "sum series — an ORDER-DEPENDENT left fold, the class of "
        "computation naive parallel aggregation gets wrong. Spark packs "
        "each key's (bounded: days-per-key) series into a sorted array "
        "and folds with F.aggregate seeded from element 1 — the exact "
        "IEEE chain DuckDB's list_reduce evaluates, so parity is "
        "bit-stable. One shuffle (daily agg) + one (series pack).",
)
def q_ewma(spark, sf):
    ev = T(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.sum(cents("value")).cast("double").alias("cents"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "cents"))).alias("s")
    )
    vals = F.transform("s", lambda x: x["cents"])
    tail = F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(tail, F.element_at(vals, 1), lambda acc, x: x * 0.3 + acc * 0.7)
    return series.select(
        "event_type",
        F.size(vals).cast("long").alias("n_days"),
        F.round(ewma, 6).alias("ewma_cents"),
    )


@register(
    "r_histogram_bins",
    """
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(value), 6) AS bin_min,
           round(max(value), 6) AS bin_max
    FROM events GROUP BY 1
    """,
    doc="Fixed-width histogram: floor-bucketized value -> per-bin count "
        "and actual extrema. One map-side-combined shuffle; the "
        "equi-width complement to the quantile (equi-depth) ops.",
)
def q_histogram(spark, sf):
    ev = T(spark, sf, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50).cast("long").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("bin_min"),
        F.round(F.max("value"), 6).alias("bin_max"),
    )


@register(
    "e_grouped_topk",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id < 5 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
    s AS (SELECT q.qid, e.vec_id,
                 list_reduce(list_transform(list_zip(e.v, q.qv), x -> x[1] * x[2]),
                             (x, y) -> x + y) AS d
          FROM e, q WHERE e.vec_id != q.qid),
    r AS (SELECT qid, vec_id, d,
                 row_number() OVER (PARTITION BY qid ORDER BY d DESC, vec_id) AS rn
          FROM s)
    SELECT qid, vec_id, round(d, 6) AS dot, CAST(rn AS INTEGER) AS rn
    FROM r WHERE rn <= 5
    """,
    doc="Similarity: BATCH multi-query top-k (the retrieval API shape: a "
        "query SET joined against the corpus, rank per query) — "
        "broadcast the query side, one codegen'd dot per (query, "
        "candidate), rank window partitioned by query. At 100 TB the "
        "corpus never shuffles: queries broadcast, per-query rank is a "
        "partial TakeOrdered under the window. Self-matches excluded. "
        "Both the query set and the corpus apply the family-wide "
        "invalid-vector drop (valid_vector / _finite_vec_sql): a NaN dot "
        "ranks engine-dependently and would poison the per-query window.",
)
def q_grouped_topk(spark, sf):
    from .functions.vector import valid_vector

    emb = T(spark, sf, "embeddings").filter(valid_vector("embedding"))
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").cast("array<double>").alias("qv")
    )
    cand = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("vec_id").asc())
    return (
        cand.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn("d", dot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", F.round("d", 6).alias("dot"), F.col("rn").cast("int").alias("rn"))
    )


@register(
    "r_partial_agg_merge",
    """
    WITH sharded AS (
      SELECT l_orderkey % 8 AS shard, l_returnflag AS k,
             count(*) AS c,
             sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS s,
             min(l_quantity) AS mn, max(l_quantity) AS mx
      FROM lineitem GROUP BY 1, 2)
    SELECT k,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(CAST(sum(s) AS BIGINT) AS DOUBLE) / 100 AS total_price,
           round(CAST(CAST(sum(s) AS BIGINT) AS DOUBLE) / 100 / sum(c), 6) AS avg_price,
           min(mn) AS min_qty, max(mx) AS max_qty
    FROM sharded GROUP BY k
    """,
    doc="Mergeable partial aggregates: shard-level (count,sum,min,max) "
        "partials re-aggregated to exact per-key finals — the algebraic "
        "re-aggregation contract behind incremental rollup tables and "
        "two-level aggregation at 100 TB (partials maintained per "
        "shard/epoch, merge is tiny). avg derived from merged sum/count, "
        "never averaged-of-averages.",
)
def q_partial_merge(spark, sf):
    li = T(spark, sf, "lineitem")
    sharded = li.groupBy(
        (F.col("l_orderkey") % 8).alias("shard"), F.col("l_returnflag").alias("k")
    ).agg(
        F.count("*").alias("c"),
        F.sum(cents("l_extendedprice")).alias("s"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    )
    return sharded.groupBy("k").agg(
        F.sum("c").alias("n_rows"),
        (F.sum("s").cast("double") / 100).alias("total_price"),
        F.round(F.sum("s").cast("double") / 100 / F.sum("c"), 6).alias("avg_price"),
        F.min("mn").alias("min_qty"),
        F.max("mx").alias("max_qty"),
    )


@register(
    "r_robust_stats",
    """
    WITH m AS (SELECT l_returnflag,
                      quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.5) / 100 AS med
               FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag,
           round(min(m.med), 6) AS median_price,
           round(quantile_cont(abs(CAST(round(l.l_extendedprice*100,0) AS BIGINT) / 100.0 - m.med), 0.5), 6) AS mad
    FROM lineitem l JOIN m USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    doc="Robust statistics: per-group median + median-absolute-deviation "
        "— two-pass (medians join back broadcast, deviations re-ranked). "
        "The outlier-resistant spread metric quality filters use where "
        "stddev is poisoned by the tail it is supposed to find.",
)
def q_robust(spark, sf):
    li = T(spark, sf, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        (F.percentile(cents("l_extendedprice"), F.lit(0.5)) / 100).alias("med")
    )
    j = li.join(F.broadcast(med), "l_returnflag")
    dev = F.abs(cents("l_extendedprice") / 100.0 - F.col("med"))
    return j.groupBy("l_returnflag").agg(
        F.round(F.min("med"), 6).alias("median_price"),
        F.round(F.percentile(dev, F.lit(0.5)), 6).alias("mad"),
    )


@register(
    "r_union_by_name",
    """
    SELECT count(*) AS n,
           CAST(count(o_totalprice) AS BIGINT) AS n_price,
           CAST(count(o_orderdate) AS BIGINT) AS n_date
    FROM (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS DATE) AS o_orderdate FROM orders
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderdate FROM orders
    ) t
    """,
    doc="Schema-evolution union: two generations of a table (columns "
        "added/dropped) merged with unionByName(allowMissingColumns) — "
        "absent columns null-filled by NAME, not position. The batch "
        "analogue of a schema-evolving ingest log.",
)
def q_union_by_name(spark, sf):
    o = T(spark, sf, "orders")
    v1 = o.select("o_orderkey", "o_totalprice")
    v2 = o.select("o_orderkey", "o_orderdate")
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.agg(
        F.count("*").alias("n"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderdate").alias("n_date"),
    )


@register(
    "r13_hll_mergeable",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INTEGER) AS within_tol
    FROM events GROUP BY event_type
    """,
    doc="R13 scale path: MERGEABLE HLL sketches — per-shard hll_sketch_agg "
        "partials, hll_union_agg merge, estimate at the end. The "
        "re-aggregatable sketch contract (same shape as "
        "r_partial_agg_merge but sublinear state): shard/epoch partials "
        "are maintained incrementally and the merge is tiny — THE "
        "count-distinct pattern at 100 TB, where exact per-key distinct "
        "state is unbounded. Datasketches HLL, lgConfigK=12 (~1.6% rse). "
        "HASH-checkable verdict entry (VERDICT r05 item 1a): exact "
        "distinct counts cross-check against DuckDB, and the Spark-side "
        "verdict pins |merged-estimate - exact| <= 3*rse*exact + 1.",
)
def q_hll_mergeable(spark, sf):
    ev = T(spark, sf, "events")
    shard = ev.groupBy(
        (F.col("event_id") % 16).alias("shard"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    est = shard.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    # lgConfigK=12 -> rse = 1.04/sqrt(2^12) ~ 1.6%; +1 absorbs integer
    # rounding on tiny groups.  Both sides of the join are post-aggregate
    # (|event_type| rows) so Spark broadcasts it.
    within = (
        F.abs(F.col("_approx") - F.col("exact_users"))
        <= 3 * 0.01625 * F.col("exact_users") + 1
    ).cast("int")
    return (
        exact.join(est, "event_type")
        .select("event_type", "exact_users", within.alias("within_tol"))
    )


SHARED_SQL_NOT_IN = """
SELECT
  (SELECT count(*) FROM orders
   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)) AS n_excl_nonnull,
  (SELECT count(*) FROM orders
   WHERE nullif(o_custkey, 1) NOT IN (SELECT nullif(c_custkey, c_custkey) FROM customer WHERE c_custkey = 1)) AS n_with_null_probe
"""


@register(
    "sql_shared_dialect_not_in",
    SHARED_SQL_NOT_IN,
    doc="SQL entry point: NULL-AWARE NOT IN — the classic three-valued-"
        "logic trap. The literal same string runs on both engines: the "
        "first count is a plain anti-join; the second probes against a "
        "subquery containing NULL, so NOT IN is UNKNOWN for every row "
        "and the count is 0 (Spark lowers this to NullAwareAntiJoin). "
        "An engine that rewrites NOT IN to NOT EXISTS naively gets the "
        "second count wrong.",
)
def q_sql_not_in(spark, sf):
    return run_sql(spark, sf, SHARED_SQL_NOT_IN)


@register(
    "r_cohort_retention",
    """
    WITH firsts AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_d FROM events GROUP BY 1),
    act AS (SELECT DISTINCT e.user_id, f.first_d,
                   CAST(floor(date_diff('day', f.first_d, CAST(e.ts AS DATE)) / 7.0) AS INTEGER) AS week_off
            FROM events e JOIN firsts f USING (user_id))
    SELECT date_trunc('week', first_d) AS cohort_week, week_off,
           count(*) AS n_users
    FROM act GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: each user anchored to their first-seen "
        "date, activity bucketed into week offsets, users counted once "
        "per (cohort-week, offset) cell — the product-analytics "
        "composite (two aggregations + a self-referential join). The "
        "firsts side is per-user (orders of magnitude smaller than the "
        "event log) and joins back broadcast at any realistic scale.",
)
def q_cohort(spark, sf):
    ev = T(spark, sf, "events")
    d = F.to_date("ts")
    firsts = ev.groupBy("user_id").agg(F.min(d).alias("first_d"))
    act = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "first_d",
            F.floor(F.datediff(d, F.col("first_d")) / 7.0).cast("int").alias("week_off"),
        )
        .distinct()
    )
    return act.groupBy(
        F.date_trunc("week", "first_d").alias("cohort_week"), "week_off"
    ).agg(F.count("*").alias("n_users"))


@register(
    "r_market_basket",
    """
    WITH items AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
                   FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT a.b AS brand_a, b.b AS brand_b, count(*) AS n_orders
    FROM items a JOIN items b ON a.ok = b.ok AND a.b < b.b
    GROUP BY 1, 2
    """,
    doc="Market-basket co-occurrence: distinct (order, brand) pairs "
        "self-joined WITHIN the order key (co-partitioned equi-join — "
        "pair explosion bounded by per-basket size, never |orders|^2), "
        "counted per brand pair. The association-mining shape (frequent "
        "itemset support counting) on the TPC-H schema.",
)
def q_basket(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    pt = T(spark, sf, "part").select("p_partkey", "p_brand")
    items = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.b") < F.col("b.b")))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("b.b").alias("brand_b"))
        .agg(F.count("*").alias("n_orders"))
    )


# == RAG index pipeline: chunk -> hash-embed -> retrieve =================

# Deterministic (a, b) projection constants for the portable hash
# embedding; every product stays < 2^63 (fp < 1e9+7, a < 2^20).
_RAG_PROJ = [(10007, 3), (100003, 17), (1000003, 29), (131071, 101), (524287, 211), (8191, 401), (127, 1009), (31, 2003)]

RAG_INDEX_ORACLE = """
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), 64)) AS cs
  FROM documents),
chunks AS (
  SELECT doc_id, CAST((cs - 1) // 64 AS INT) AS chunk_idx,
         substr(text, CAST(cs AS INT), 80) AS chunk
  FROM s),
fp AS (
  SELECT doc_id, chunk_idx,
         CASE WHEN length(chunk) = 0 THEN 0
              ELSE list_reduce(list_transform(generate_series(1, length(chunk)),
                                              i -> CAST(ascii(chunk[i]) AS BIGINT)),
                               (acc, x) -> (acc * 131 + x) % 1000000007)
         END AS f
  FROM chunks),
emb AS (
  SELECT doc_id, chunk_idx,
         list_transform([[10007, 3], [100003, 17], [1000003, 29], [131071, 101], [524287, 211], [8191, 401], [127, 1009], [31, 2003]],
                        p -> CAST((f * p[1] + p[2]) % 1000000007 AS DOUBLE) / 1000000007) AS e
  FROM fp),
q AS (SELECT doc_id AS qid, e AS qe FROM emb WHERE doc_id < 3 AND chunk_idx = 0),
scored AS (
  SELECT q.qid, c.doc_id AS cand_doc, c.chunk_idx AS cand_chunk,
         list_reduce(list_transform(list_zip(c.e, q.qe), x -> x[1] * x[2]),
                     (x, y) -> x + y) AS d
  FROM emb c, q WHERE c.doc_id >= 3),
r AS (SELECT qid, cand_doc, cand_chunk, d,
             row_number() OVER (PARTITION BY qid ORDER BY d DESC, cand_doc, cand_chunk) AS rn
      FROM scored)
SELECT qid, cand_doc, cand_chunk, round(d, 6) AS score, CAST(rn AS INTEGER) AS rn
FROM r WHERE rn <= 3
"""


@register(
    "pipeline_rag_index",
    RAG_INDEX_ORACLE,
    doc="End-to-end RAG indexing pipeline, fully oracle-checked: chunk "
        "(80-char windows, stride 64, zero-shuffle explode) -> "
        "deterministic hash embedding (polynomial fingerprint projected "
        "through 8 integer-affine maps -- a stand-in with the exact "
        "dataflow of a model encoder, portable to SQL) -> top-3 "
        "retrieval per query chunk (broadcast query set, per-query rank "
        "window). The corpus side never shuffles until the final "
        "per-query rank of scored candidates.",
)
def q_rag_index(spark, sf):
    chunks = chunk_documents(T(spark, sf, "documents"), chunk_size=80, stride=64)
    fp = poly_fingerprint("chunk")
    emb_arr = F.array(*[
        ((fp * F.lit(a) + F.lit(b)) % F.lit(1_000_000_007)).cast("double") / 1_000_000_007
        for a, b in _RAG_PROJ
    ])
    emb = chunks.select("doc_id", "chunk_idx", emb_arr.alias("e"))
    q = emb.filter((F.col("doc_id") < 3) & (F.col("chunk_idx") == 0)).select(
        F.col("doc_id").alias("qid"), F.col("e").alias("qe")
    )
    dot = F.aggregate(
        F.zip_with("e", "qe", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("d").desc(), F.col("cand_doc").asc(), F.col("cand_chunk").asc()
    )
    return (
        emb.filter(F.col("doc_id") >= 3)
        .select(F.col("doc_id").alias("cand_doc"), F.col("chunk_idx").alias("cand_chunk"), "e")
        .join(F.broadcast(q))
        .withColumn("d", dot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "cand_doc", "cand_chunk",
                F.round("d", 6).alias("score"), F.col("rn").cast("int").alias("rn"))
    )


@register(
    "r_data_quality_audit",
    """
    SELECT
      (SELECT count(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderkey IS NULL) AS n_orphan_lineitems,
      (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS n_nonpositive_price,
      (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS n_dup_orderkeys,
      (SELECT count(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate < o.o_orderdate) AS n_time_travel,
      (SELECT count(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS n_bad_nation_fk
    """,
    doc="Data-quality audit: referential orphans (anti-join), constraint "
        "violations (range / temporal-order), key uniqueness, FK domain "
        "membership -- the dbt-test / expectation-suite shape as ONE "
        "pass of broadcast-able probes. Each check is independently "
        "distributable; the final row is a crossJoin of five "
        "pre-aggregated singletons.",
)
def q_dq_audit(spark, sf):
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_orphan_lineitems"))
    )
    nonpos = o.filter(F.col("o_totalprice") <= 0).agg(
        F.count("*").alias("n_nonpositive_price")
    )
    dups = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n_dup_orderkeys")
    )
    ttravel = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count("*").alias("n_time_travel"))
    )
    badfk = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left_anti")
        .agg(F.count("*").alias("n_bad_nation_fk"))
    )
    out = orphans
    for sub in (nonpos, dups, ttravel, badfk):
        out = out.crossJoin(F.broadcast(sub))
    return out


@register(
    "t_keyword_extraction",
    """
    WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (SELECT tf.doc_id, tf.term,
                      CAST(round(tf.tf * ln(n.n_docs * 1.0 / df.df) * 1e6, 0) AS BIGINT) AS w_micro
               FROM tf JOIN df USING (term) CROSS JOIN n),
    r AS (SELECT doc_id, term, w_micro,
                 row_number() OVER (PARTITION BY doc_id ORDER BY w_micro DESC, term) AS rn
          FROM scored)
    SELECT doc_id, term, w_micro, CAST(rn AS INTEGER) AS rn FROM r WHERE rn <= 3
    """,
    doc="Text: per-document keyword extraction — top-3 terms by TF-IDF "
        "(micro-integerized weight for engine-exact parity, term "
        "tiebreak) via a rank window over the tf_idf composite. The "
        "keyword/tag generation stage of a curation pipeline.",
)
def q_keywords(spark, sf):
    docs = T(spark, sf, "documents")
    # integerized micro-nat weight (the 6dp-double tf_idf operator would
    # rank identically but hash differently at ties)
    from .functions.texthash import exploded_nonnull, tokens
    from .sources.tables import spread_small_input

    toks = exploded_nonnull(
        spread_small_input(docs), [F.col("doc_id").alias("id")], tokens("text"), "term"
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("id").alias("doc_id"), "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")) * 1e6, 0)
            .cast("long").alias("w_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("w_micro").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "w_micro", F.col("rn").cast("int").alias("rn"))
    )


@register(
    "r_interval_union_days",
    """
    WITH iv AS (SELECT o.o_custkey AS k, o.o_orderdate AS s, l.l_shipdate AS e
                FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                WHERE l.l_shipdate >= o.o_orderdate),
    m AS (SELECT k, s, e,
                 max(e) OVER (PARTITION BY k ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM iv)
    SELECT k AS o_custkey,
           CAST(sum(date_diff('day',
                    CASE WHEN prev_max IS NULL OR prev_max < s THEN s
                         ELSE prev_max END,
                    CASE WHEN e > (CASE WHEN prev_max IS NULL OR prev_max < s THEN s ELSE prev_max END)
                         THEN e
                         ELSE (CASE WHEN prev_max IS NULL OR prev_max < s THEN s ELSE prev_max END) END))
                AS BIGINT) AS covered_days,
           count(*) AS n_intervals
    FROM m GROUP BY k
    """,
    doc="Interval-union aggregation: per customer, total days covered by "
        "the UNION of [order date, ship date] intervals — overlaps "
        "counted once. The classic sweep: sort by start, running max of "
        "prior ends (one window), clamp each interval's uncovered "
        "contribution. One shuffle; no self-join, no explosion to "
        "per-day rows (the naive date-explode is |days| x |intervals|).",
)
def q_interval_union(spark, sf):
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("s"),
                F.col("l_shipdate").alias("e"))
    )
    w = (
        Window.partitionBy("k").orderBy(F.col("s").asc(), F.col("e").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.withColumn("prev_max", F.max("e").over(w))
    start = F.when(F.col("prev_max").isNull() | (F.col("prev_max") < F.col("s")), F.col("s")).otherwise(F.col("prev_max"))
    end = F.when(F.col("e") > start, F.col("e")).otherwise(start)
    return m.groupBy(F.col("k").alias("o_custkey")).agg(
        F.sum(F.datediff(end, start)).cast("long").alias("covered_days"),
        F.count("*").alias("n_intervals"),
    )


@register(
    "r_percent_of_total",
    """
    WITH a AS (SELECT c_mktsegment,
                      sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS cents
               FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
    SELECT c_mktsegment,
           CAST(CAST(cents AS DOUBLE)/100 AS DOUBLE) AS segment_total,
           round(cents * 1.0 / sum(cents) OVER (), 6) AS pct_of_total
    FROM a
    """,
    doc="Ratio-to-report: per-segment totals with share of grand total "
        "via an empty-frame window over the (tiny) aggregate — the "
        "grand total never forces a second scan of the fact table.",
)
def q_pct_total(spark, sf):
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    a = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(cents("o_totalprice")).alias("cents"))
    )
    w = Window.partitionBy()
    return a.select(
        "c_mktsegment",
        (F.col("cents").cast("double") / 100).alias("segment_total"),
        F.round(F.col("cents") * 1.0 / F.sum("cents").over(w), 6).alias("pct_of_total"),
    )


@register(
    "r_ohlc_bars",
    """
    WITH e AS (SELECT event_type,
                      CAST(to_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900) AS TIMESTAMP) AS bar,
                      CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS ord,
                      value
               FROM events)
    SELECT event_type, bar,
           round(arg_min(value, ord), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, ord), 6) AS close,
           count(*) AS n_events
    FROM e GROUP BY 1, 2
    """,
    doc="Time-series resample: 15-minute OHLC bars per key — open/close "
        "via min_by/max_by on a composite (epoch-micros + event_id) "
        "ordering key so equal-timestamp ties break deterministically on "
        "both engines; high/low/count are plain aggregates. One "
        "map-side-combined shuffle; the downsampling shape every "
        "metrics/telemetry pipeline needs.",
)
def q_ohlc(spark, sf):
    ev = T(spark, sf, "events")
    bar = F.to_timestamp(
        (F.floor(F.unix_timestamp("ts") / 900) * 900).cast("long")
    )
    ord_key = F.floor(F.unix_timestamp("ts")).cast("long") * 1000000 + F.col("event_id")
    e = ev.select("event_type", bar.alias("bar"), ord_key.alias("ord"), "value")
    return e.groupBy("event_type", "bar").agg(
        F.round(F.min_by("value", "ord"), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", "ord"), 6).alias("close"),
        F.count("*").alias("n_events"),
    )


# == round-4 wave 1: warehouse / time-series / graph depth ===============

@register(
    "r_gaps_islands",
    """
WITH d AS (SELECT DISTINCT user_id,
                  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events),
g AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d)
SELECT user_id, min(day) AS start_day, max(day) AS end_day,
       CAST(count(*) AS BIGINT) AS n_days
FROM g GROUP BY user_id, grp
""",
    doc="Gaps-and-islands: consecutive-active-day runs per user via the "
        "day - row_number() constant-group trick (one shuffle, no self-join)",
)
def q_gaps_islands(spark, sf):
    ev = T(spark, sf, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        d.withColumn("grp", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.min("day").alias("start_day"), F.max("day").alias("end_day"),
             F.count("*").alias("n_days"))
        .drop("grp")
    )


@register(
    "r_mode_per_group",
    """
WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM orders GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY n DESC, o_orderpriority) AS rn
      FROM c)
SELECT o_orderstatus, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1
""",
    doc="Statistical mode per group with deterministic lexical tie-break "
        "(count-then-rank; no collect/driver loop)",
)
def q_mode_per_group(spark, sf):
    o = T(spark, sf, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("n").desc(), "o_orderpriority")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


@register(
    "r_weighted_median",
    """
WITH w AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice*100,0) AS BIGINT) AS pc,
                  CAST(l_quantity AS BIGINT) AS q
           FROM lineitem),
c AS (SELECT l_returnflag, pc, q,
             CAST(sum(q) OVER (PARTITION BY l_returnflag ORDER BY pc
                               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
             CAST(sum(q) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      FROM w)
SELECT l_returnflag, CAST(min(pc) AS DOUBLE)/100 AS weighted_median
FROM c WHERE cw*2 >= tw GROUP BY l_returnflag
""",
    doc="Weighted median (quantity-weighted price): RANGE-frame cumulative "
        "weight — peers collapse, so the cut point is deterministic without "
        "a row-level tiebreak; integer weights, exact both engines",
)
def q_weighted_median(spark, sf):
    li = T(spark, sf, "lineitem")
    w = li.select(
        "l_returnflag", cents("l_extendedprice").alias("pc"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    cum = Window.partitionBy("l_returnflag").orderBy("pc").rangeBetween(
        Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy("l_returnflag")
    return (
        w.withColumn("cw", F.sum("q").over(cum))
        .withColumn("tw", F.sum("q").over(tot))
        .filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg((F.min("pc").cast("double") / 100).alias("weighted_median"))
    )


@register(
    "r_string_agg",
    """
SELECT p_brand,
       array_to_string(list_sort(array_agg(DISTINCT p_type)), ',') AS types_csv,
       CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
FROM part GROUP BY p_brand
""",
    doc="Ordered string aggregation (LISTAGG shape): set-collect + sort + "
        "join — deterministic regardless of row arrival order",
)
def q_string_agg(spark, sf):
    p = T(spark, sf, "part")
    return p.groupBy("p_brand").agg(
        F.array_join(F.array_sort(F.collect_set("p_type")), ",").alias("types_csv"),
        F.countDistinct("p_type").alias("n_types"),
    )


@register(
    "r_regexp_extract_all",
    """
SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
  SELECT unnest(regexp_extract_all(text, '[a-z]{6,}')) AS w FROM documents)
GROUP BY w ORDER BY freq DESC, w LIMIT 15
""",
    doc="R22 depth: regexp_extract_all + explode + count — the "
        "multi-match-per-row extraction surface",
)
def q_regexp_extract_all(spark, sf):
    docs = T(spark, sf, "documents")
    return (
        docs.select(F.explode(F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w").limit(15)
    )


@register(
    "r_bitmap_flags",
    """
WITH m AS (SELECT user_id % 8 AS bucket,
                  CASE event_type WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2
                                  WHEN 'error' THEN 4 ELSE 8 END AS mask
           FROM events)
SELECT bucket, CAST(bit_or(mask) AS BIGINT) AS flags_any,
       CAST(bit_and(mask) AS BIGINT) AS flags_all,
       CAST(count(*) AS BIGINT) AS n
FROM m GROUP BY bucket
""",
    doc="Bitwise aggregate rollup (bit_or/bit_and flag sets) — the compact "
        "feature-flag/permission-mask reduction",
)
def q_bitmap_flags(spark, sf):
    ev = T(spark, sf, "events")
    mask = (
        F.when(F.col("event_type") == "purchase", 1)
        .when(F.col("event_type") == "signup", 2)
        .when(F.col("event_type") == "error", 4)
        .otherwise(8)
    )
    return (
        ev.select(F.pmod("user_id", F.lit(8)).alias("bucket"), mask.alias("mask"))
        .groupBy("bucket")
        .agg(F.bit_or("mask").cast("long").alias("flags_any"),
             F.bit_and("mask").cast("long").alias("flags_all"),
             F.count("*").alias("n"))
    )


@register(
    "r_asof_nearest",
    """
SELECT p.event_id AS p_id, s.event_id AS s_id, s.adiff AS diff_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p,
LATERAL (SELECT e.event_id, abs(epoch_us(e.ts) - epoch_us(p.ts)) AS adiff,
                CASE WHEN e.ts <= p.ts THEN 0 ELSE 1 END AS fwd
         FROM events e
         WHERE e.user_id = p.user_id AND e.event_type = 'signup'
         ORDER BY adiff, fwd, e.event_id LIMIT 1) s
""",
    doc="R10 completion: NEAREST-neighbor as-of (either direction, backward "
        "preferred on ties, event_id tiebreak) — key-bounded join + per-left "
        "rank window, no range blowup; oracle is DuckDB's LATERAL top-1",
)
def q_asof_nearest(spark, sf):
    ev = T(spark, sf, "events")
    # events.ts is TIMESTAMP_NTZ; the session is pinned UTC, so the cast
    # to TIMESTAMP is the identity instant duckdb's epoch_us sees
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("p_id"),
        us("ts").alias("p_us"), F.col("ts").alias("p_ts"))
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("s_id"),
        us("ts").alias("s_us"), F.col("ts").alias("s_ts"))
    j = p.join(s, "u").select(
        "p_id", "s_id",
        F.abs(F.col("s_us") - F.col("p_us")).alias("adiff"),
        F.when(F.col("s_ts") <= F.col("p_ts"), 0).otherwise(1).alias("fwd"),
    )
    w = Window.partitionBy("p_id").orderBy("adiff", "fwd", "s_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_id", "s_id", F.col("adiff").alias("diff_us"))
    )


@register(
    "r_null_impute_group_mean",
    """
WITH v AS (SELECT event_id, event_type,
                  CASE WHEN event_id % 7 = 0 THEN NULL
                       ELSE CAST(round(value*100,0) AS BIGINT) END AS vc
           FROM events),
m AS (SELECT event_id, vc,
             CAST(sum(vc) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             CAST(count(vc) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM v)
SELECT event_id,
       round(CAST(coalesce(vc, CAST(round(CAST(s AS DOUBLE)/n, 0) AS BIGINT)) AS DOUBLE)/100, 6) AS value_filled
FROM m
""",
    doc="Null imputation with the group mean (integer-cent mean, rounded to "
        "a cent, so the fill value is bit-identical across engines); the "
        "deterministic event_id%7 mask synthesizes the nulls",
)
def q_null_impute(spark, sf):
    ev = T(spark, sf, "events")
    vc = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(cents("value"))
    w = Window.partitionBy("event_type")
    filled = F.coalesce(
        F.col("vc"),
        F.round(F.sum("vc").over(w).cast("double") / F.count("vc").over(w), 0).cast("long"),
    )
    return (
        ev.select("event_id", "event_type", vc.alias("vc"))
        .select("event_id", F.round(filled.cast("double") / 100, 6).alias("value_filled"))
    )


@register(
    "r_pareto_cut",
    """
WITH pr AS (SELECT l_partkey,
                   CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS rev
            FROM lineitem GROUP BY 1),
r AS (SELECT rev,
             CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(rev) OVER () AS BIGINT) AS tot,
             row_number() OVER (ORDER BY rev DESC, l_partkey) AS rn
      FROM pr)
SELECT CAST(min(CASE WHEN cum*5 >= tot*4 THEN rn END) AS BIGINT) AS n_parts_80,
       CAST(count(*) AS BIGINT) AS total_parts
FROM r
""",
    doc="Pareto 80/20 cut: how many top parts carry 80% of revenue. "
        "Round 6: the running-share/rank/total windows moved from a "
        "single-task unpartitioned window to the DISTRIBUTED "
        "global_running_sum kernel (range-partition + prefix-sum offset "
        "composition; the grand total becomes a plan literal from the "
        "kernel's bounded stats job) — the part dimension scales with "
        "the corpus, so the old plan funneled it through one task.",
)
def q_pareto_cut(spark, sf):
    from .operators.sampling import global_running_sum

    li = T(spark, sf, "lineitem")
    pr = li.groupBy("l_partkey").agg(F.sum(cents("l_extendedprice")).alias("rev"))
    # order rev DESC via negation: the kernel range-partitions on plain
    # ascending columns, and -rev asc == rev desc for non-null longs
    r = global_running_sum(
        pr, [(-F.col("rev")), F.col("l_partkey")], "rev",
        out_col="cum", rn_col="rn", total_col="tot",
    )
    return r.agg(
        F.min(F.when(F.col("cum") * 5 >= F.col("tot") * 4, F.col("rn"))).cast("long").alias("n_parts_80"),
        F.count("*").alias("total_parts"),
    )


@register(
    "r_yoy_growth",
    """
WITH y AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revc
           FROM orders GROUP BY 1)
SELECT yr, CAST(revc AS DOUBLE)/100 AS revenue,
       round(CAST(revc AS DOUBLE) / lag(revc) OVER (ORDER BY yr) - 1, 6) AS yoy
FROM y
""",
    doc="Year-over-year growth: integerized yearly revenue + lag ratio "
        "(NULL first year) — the period-over-period report shape",
)
def q_yoy_growth(spark, sf):
    o = T(spark, sf, "orders")
    y = o.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.sum(cents("o_totalprice")).alias("revc"))
    w = Window.orderBy("yr")
    return y.select(
        "yr",
        (F.col("revc").cast("double") / 100).alias("revenue"),
        F.round(F.col("revc").cast("double") / F.lag("revc").over(w) - 1, 6).alias("yoy"),
    )


@register(
    "r_interp_linear",
    """
WITH v AS (SELECT user_id, event_id,
                  CASE WHEN event_id % 5 = 0 THEN NULL
                       ELSE CAST(round(value*100,0) AS BIGINT) END AS vc
           FROM events),
w AS (SELECT user_id, event_id, vc,
             last_value(vc IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN vc IS NOT NULL THEN event_id END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid,
             first_value(vc IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN vc IS NOT NULL THEN event_id END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nid
      FROM v)
SELECT event_id,
       round(CASE WHEN vc IS NOT NULL THEN CAST(vc AS DOUBLE)
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                       pv + CAST((nv - pv) * (event_id - pid) AS DOUBLE) / (nid - pid)
             END / 100, 6) AS value_interp
FROM w
""",
    doc="Linear interpolation of missing samples between bracketing "
        "non-nulls (gap-fill's second half: r_gap_fill_forward carries, "
        "this blends); integer numerators keep the division bit-identical",
)
def q_interp_linear(spark, sf):
    ev = T(spark, sf, "events")
    vc = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(cents("value"))
    v = ev.select("user_id", "event_id", vc.alias("vc"))
    back = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    fwd = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.currentRow, Window.unboundedFollowing)
    nn_id = F.when(F.col("vc").isNotNull(), F.col("event_id"))
    interp = (
        F.col("pv")
        + ((F.col("nv") - F.col("pv")) * (F.col("event_id") - F.col("pid"))).cast("double")
        / (F.col("nid") - F.col("pid"))
    )
    return (
        v.withColumn("pv", F.last("vc", ignorenulls=True).over(back))
        .withColumn("pid", F.last(nn_id, ignorenulls=True).over(back))
        .withColumn("nv", F.first("vc", ignorenulls=True).over(fwd))
        .withColumn("nid", F.first(nn_id, ignorenulls=True).over(fwd))
        .select(
            "event_id",
            F.round(
                F.when(F.col("vc").isNotNull(), F.col("vc").cast("double"))
                .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
                / 100, 6,
            ).alias("value_interp"),
        )
    )


@register(
    "r_rolling_zscore",
    """
WITH v AS (SELECT user_id, event_id, ts, CAST(round(value*100,0) AS BIGINT) AS vc
           FROM events),
w AS (SELECT user_id, event_id, vc,
             CAST(count(*) OVER win AS BIGINT) AS n,
             CAST(sum(vc) OVER win AS BIGINT) AS s1,
             CAST(sum(vc*vc) OVER win AS BIGINT) AS s2
      FROM v
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT event_id,
       CASE WHEN n*s2 - s1*s1 > 0
            THEN round((vc*n - s1) / sqrt(CAST(n*s2 - s1*s1 AS DOUBLE)), 6)
       END AS zscore
FROM w
""",
    doc="Rolling z-score anomaly signal over a 7-row trailing window; "
        "population variance via INTEGER moment sums (n*s2-s1^2), so both "
        "engines hit the same doubles at the single sqrt/divide",
)
def q_rolling_zscore(spark, sf):
    ev = T(spark, sf, "events")
    v = ev.select("user_id", "event_id", "ts", cents("value").alias("vc"))
    win = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    var_n = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        v.withColumn("n", F.count("*").over(win))
        .withColumn("s1", F.sum("vc").over(win))
        .withColumn("s2", F.sum(F.col("vc") * F.col("vc")).over(win))
        .select(
            "event_id",
            F.when(
                var_n > 0,
                F.round((F.col("vc") * F.col("n") - F.col("s1")) / F.sqrt(var_n.cast("double")), 6),
            ).alias("zscore"),
        )
    )


@register(
    "r_triangle_count",
    """
WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a
           JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT (SELECT CAST(count(*) AS BIGINT)
        FROM e e1 JOIN e e2 ON e1.v = e2.u
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles,
       CAST(count(*) AS BIGINT) AS n_edges
FROM e
""",
    doc="Triangle count on the co-purchase graph (parts sharing an order): "
        "ordered u<v<w edge orientation makes each triangle count once and "
        "keeps both joins equi-key (shuffle on node id, no enumeration "
        "blowup) — the graph-metric companion to connected components",
)
def q_triangle_count(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count("*").alias("n_triangles"))
    )
    return tri.crossJoin(e.agg(F.count("*").alias("n_edges")))


# == round-4 wave 2: LLM-pipeline / embedding / layout depth =============

@register(
    "t_bigram_top",
    """
WITH toks AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
              FROM documents),
bg AS (SELECT unnest(list_transform(generate_series(1, greatest(len(t)-1, 0)),
                                    i -> t[i] || ' ' || t[i+1])) AS bigram
       FROM toks)
SELECT bigram, CAST(count(*) AS BIGINT) AS freq
FROM bg GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 15
""",
    doc="R32 depth: corpus top word-bigrams (windowed token pairing via "
        "index transform — no self-join, one explode+groupBy)",
)
def q_bigram_top(spark, sf):
    from .functions.texthash import tokens

    docs = T(spark, sf, "documents")
    t = tokens("text")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram").agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "bigram").limit(15)
    )


@register(
    "t_sentence_stats",
    """
WITH s AS (SELECT doc_id,
                  list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                             x -> trim(x)), x -> x != '') AS sents
           FROM documents)
SELECT doc_id, CAST(len(sents) AS INTEGER) AS n_sentences,
       CAST(coalesce(list_sum(list_transform(sents,
              x -> len(list_filter(regexp_split_to_array(x, '\\s+'), w -> w != '')))), 0) AS BIGINT) AS n_words,
       round(CAST(coalesce(list_sum(list_transform(sents,
              x -> len(list_filter(regexp_split_to_array(x, '\\s+'), w -> w != '')))), 0) AS DOUBLE)
             / nullif(len(sents), 0), 6) AS avg_words_per_sentence
FROM s
""",
    doc="Sentence segmentation stats (regex split, trim, empty-drop): "
        "sentence count / word count / mean length per doc — zero-shuffle "
        "row-local higher-order functions",
)
def q_sentence_stats(spark, sf):
    docs = T(spark, sf, "documents")
    sents = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    wc = lambda x: F.size(F.filter(F.split(x, r"\s+"), lambda w: w != ""))  # noqa: E731
    # coalesce matches the oracle's coalesce(list_sum(..), 0): a NULL text
    # yields sents=NULL and the fold returns NULL where the contract (and
    # DuckDB) says 0 words (n_sentences stays NULL on NULL text in both
    # engines; found by the round-7 adversarial-corpus differential probe)
    n_words = F.coalesce(
        F.aggregate(F.col("sents"), F.lit(0).cast("long"), lambda acc, x: acc + wc(x)),
        F.lit(0).cast("long"),
    )
    return (
        docs.select("doc_id", sents.alias("sents"))
        .select(
            "doc_id",
            F.size("sents").alias("n_sentences"),
            n_words.alias("n_words"),
            F.round(n_words.cast("double") / F.nullif(F.size("sents"), F.lit(0)), 6)
            .alias("avg_words_per_sentence"),
        )
    )


def _centroid_assign_oracle(n_centroids: int = 4, dim: int = 64, seed: int = 123) -> str:
    import numpy as np

    cent = np.random.default_rng(seed).standard_normal((n_centroids, dim))
    dots = ", ".join(_ann_audit_dot_sql("embedding::DOUBLE[]", c) for c in cent)
    return f"""
WITH a AS (SELECT vec_id, list_indexof([{dots}],
                  list_aggregate([{dots}], 'max')) AS cell
           FROM embeddings)
SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM a GROUP BY cell
"""


@register(
    "e_centroid_assign",
    _centroid_assign_oracle(),
    doc="Distributed k-means E-step: nearest-centroid assignment against "
        "literal centroids (the scale shape: centroids are tiny plan "
        "constants, the corpus never shuffles — assignment is a map-only "
        "codegen'd projection), verified cell-for-cell vs the oracle's "
        "identical sequential-fold argmax",
)
def q_centroid_assign(spark, sf):
    import numpy as np

    cent = np.random.default_rng(123).standard_normal((4, 64))
    emb = T(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # transform over ONE nested centroid literal (round-14): identical
    # element values/order to the old unrolled F.array of folds, built
    # in a handful of py4j calls instead of n_centroids * dim
    dots = F.transform(
        lit_arr([[float(x) for x in c] for c in cent]),
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: x * y),
            F.lit(0.0), lambda a, x: a + x))
    cell = F.array_position(dots, F.array_max(dots)).cast("int")
    return (
        emb.select("vec_id", cell.alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


def _silhouette_oracle(n_centroids: int = 4, dim: int = 64, seed: int = 123) -> str:
    import numpy as np

    cent = np.random.default_rng(seed).standard_normal((n_centroids, dim))

    def dist_sql(c) -> str:
        lits = ",".join(repr(float(x)) for x in c)
        return ("sqrt(list_reduce(list_transform(list_zip(embedding::DOUBLE[], "
                f"[{lits}]::DOUBLE[]), x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y))")

    dists = ", ".join(dist_sql(c) for c in cent)
    return f"""
WITH d AS (SELECT vec_id, [{dists}] AS ds FROM embeddings),
s AS (SELECT vec_id,
             list_indexof(ds, list_aggregate(ds, 'min')) AS cell,
             list_sort(ds)[1] AS a, list_sort(ds)[2] AS b
      FROM d),
m AS (SELECT cell,
             CAST(round((b - a) / greatest(a, b) * 1e6, 0) AS BIGINT) AS sm
      FROM s)
SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(sm) AS DOUBLE) / count(*) / 1e6, 6) AS avg_silhouette
FROM m GROUP BY cell
"""


@register(
    "e_silhouette_by_cell",
    _silhouette_oracle(),
    doc="Clustering-quality audit: simplified silhouette (b-a)/max(a,b) per "
        "vector against the e_centroid_assign literal centroids (a = nearest, "
        "b = second-nearest Euclidean distance), micro-integerized and averaged "
        "per cell. Scale shape: centroids are plan constants, the metric is a "
        "map-only codegen'd projection + ONE aggregate shuffle — the corpus "
        "never joins anything. Hash-exact across engines: sequential IEEE "
        "folds, correctly-rounded sqrt, identical double sort.",
)
def q_silhouette(spark, sf):
    import numpy as np

    cent = np.random.default_rng(123).standard_normal((4, 64))
    emb = T(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dists = F.transform(
        lit_arr([[float(x) for x in c] for c in cent]),
        lambda c: F.sqrt(F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)))
    sorted_d = F.array_sort(dists)
    a, b = sorted_d[0], sorted_d[1]
    sm = F.round((b - a) / F.greatest(a, b) * 1e6, 0).cast("long")
    cell = F.array_position(dists, F.array_min(dists)).cast("int")
    return (
        emb.select(cell.alias("cell"), sm.alias("sm"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_vecs"),
             F.round(F.sum("sm").cast("double") / F.count("*") / 1e6, 6)
             .alias("avg_silhouette"))
    )


@register(
    "e_norm_audit",
    """
WITH n AS (SELECT label,
                  CAST(round(sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x),
                                              (x, y) -> x + y)) * 1e6, 0) AS BIGINT) AS nm
           FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(CAST(min(nm) AS DOUBLE)/1e6, 6) AS min_norm,
       round(CAST(max(nm) AS DOUBLE)/1e6, 6) AS max_norm,
       round(CAST(sum(nm) AS DOUBLE)/count(*)/1e6, 6) AS avg_norm
FROM n GROUP BY label
""",
    doc="Embedding norm audit per label (the vector-quality gate before "
        "indexing: zero/exploding norms break cosine): micro-integerized "
        "norms make min/max/avg exact under parallel aggregation",
)
def q_norm_audit(spark, sf):
    emb = T(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    nm = F.round(
        F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)) * 1e6, 0
    ).cast("long")
    return (
        emb.select("label", nm.alias("nm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("nm").cast("double") / 1e6, 6).alias("min_norm"),
            F.round(F.max("nm").cast("double") / 1e6, 6).alias("max_norm"),
            F.round(F.sum("nm").cast("double") / F.count("*") / 1e6, 6).alias("avg_norm"),
        )
    )


@register(
    "p_dataset_card",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS BIGINT) AS total_tokens,
       round(CAST(CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS DOUBLE)/count(*), 6) AS pct_en,
       round(CAST(sum(n_chars) AS DOUBLE)/count(*), 6) AS avg_chars
FROM documents GROUP BY source
""",
    doc="Dataset-card stats per source: doc/unique-text counts (md5 "
        "identity), token totals, language mix, size — the one-pass "
        "corpus manifest a training-data release ships with",
)
def q_dataset_card(spark, sf):
    from .functions.texthash import tokens

    docs = T(spark, sf, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.sum(F.size(tokens("text"))).cast("long").alias("total_tokens"),
        F.round(F.count(F.when(F.col("lang") == "en", 1)).cast("double") / F.count("*"), 6).alias("pct_en"),
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias("avg_chars"),
    )


CONTAINMENT_ORACLE = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
    FROM toks)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b, round(c * 1.0 / least(sa.sz, sb.sz), 6) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / least(sa.sz, sb.sz) >= 0.6
"""


@register(
    "d_jaccard_containment",
    CONTAINMENT_ORACLE,
    doc="Asymmetric near-dup: shingle containment |A∩B|/min(|A|,|B|) — "
        "catches short-doc-embedded-in-long (quotes, subsets) that "
        "symmetric Jaccard under-scores; same output-bound shared-shingle "
        "join as r30 (operators/dedup.containment_pairs)",
)
def q_containment(spark, sf):
    from .operators.dedup import containment_pairs

    return containment_pairs(T(spark, sf, "documents"), threshold=0.6)


@register(
    "p_token_budget_split",
    """
WITH t AS (SELECT doc_id, source,
                  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS BIGINT) AS n_tokens
           FROM documents)
SELECT doc_id, source, n_tokens,
       CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                  / 4000) AS BIGINT) AS shard
FROM t
""",
    doc="Token-budget sharding: deterministic greedy split of each "
        "source's doc stream into ~4000-token training shards via an "
        "EXCLUSIVE prefix sum (a doc never straddles shards; source "
        "partitioning keeps the window distributed at scale)",
)
def q_token_budget(spark, sf):
    from .functions.texthash import tokens

    docs = T(spark, sf, "documents")
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    return t.select(
        "doc_id", "source", "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("double") / 4000)
        .cast("long").alias("shard"),
    )


@register(
    "l_partition_manifest",
    """
SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS INTEGER) AS part_month,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key,
       CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY 1
""",
    doc="Partition manifest (l_zorder_layout's companion): per-month "
        "rowcount + key min/max + checksum — the column-stats index that "
        "drives file skipping; one map-side-combinable aggregation",
)
def q_partition_manifest(spark, sf):
    o = T(spark, sf, "orders")
    return (
        o.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("part_month"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
    )


# == round-4 wave 3: segmentation / monitoring / observability ===========

@register(
    "r_running_distinct",
    """
WITH f AS (SELECT user_id, CAST(ts AS DATE) AS d,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
nd AS (SELECT d, count(*) AS nu FROM f WHERE rn = 1 GROUP BY d),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
SELECT date_diff('day', DATE '1970-01-01', days.d) AS day,
       CAST(coalesce(nu, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(nu, 0)) OVER (ORDER BY days.d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM days LEFT JOIN nd ON nd.d = days.d
""",
    doc="Cumulative distinct users per day WITHOUT a distinct-over-window "
        "(unsupported everywhere): first-seen flag -> daily new-user count "
        "-> running sum. The scalable rewrite of COUNT(DISTINCT) OVER",
)
def q_running_distinct(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_seen = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("nu"))
    )
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(first_seen, "d", "left")
        .withColumn("nu", F.coalesce("nu", F.lit(0)))
        .select(
            F.datediff("d", F.lit("1970-01-01").cast("date")).alias("day"),
            F.col("nu").alias("new_users"),
            F.sum("nu").over(cum).alias("cum_users"),
        )
    )


SHARED_SQL_FILTER_AGG = """
SELECT l_returnflag,
       count(*) AS n_all,
       count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk
FROM lineitem GROUP BY l_returnflag
"""


@register(
    "sql_shared_dialect_filter_agg",
    SHARED_SQL_FILTER_AGG,
    doc="Shared-dialect FILTER (WHERE) aggregates — the standard-SQL "
        "conditional-count form, one literal query text on both engines "
        "(Spark lowers FILTER to aggregate-with-predicate)",
)
def q_filter_agg(spark, sf):
    return run_sql(spark, sf, SHARED_SQL_FILTER_AGG)


@register(
    "r_rfm_segmentation",
    """
WITH c AS (SELECT o_custkey,
                  date_diff('day', max(o_orderdate),
                            (SELECT max(o_orderdate) FROM orders)) AS recency_days,
                  count(*) AS frequency,
                  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS monetary_cents
           FROM orders GROUP BY o_custkey)
SELECT o_custkey,
       CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency, monetary_cents,
       CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) * 100
          + ntile(5) OVER (ORDER BY frequency DESC, o_custkey) * 10
          + ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS INTEGER) AS rfm_segment
FROM c
""",
    doc="RFM customer segmentation: recency/frequency/monetary quintiles "
        "(ntile with custkey tie-breaks -> deterministic) packed into one "
        "segment code — the classic mart-building composite",
)
def q_rfm(spark, sf):
    o = T(spark, sf, "orders")
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    c = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("mxd"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(cents("o_totalprice")).alias("monetary_cents"),
        )
    )
    from .operators.sampling import global_ntile

    # round 6: three distributed quintile passes replace three
    # single-task ntile windows (the customer dimension scales with the
    # corpus); DESC orders expressed as negated ascending columns.
    # materialize_input (round 7): each pass pins its (per-customer
    # aggregate, i.e. already-reduced) input once — without it the
    # kernel's rejoin re-executes upstream lineage per pass and chaining
    # compounds it (~8x re-execution of the orders aggregation)
    c = global_ntile(c, [F.col("recency_days"), F.col("o_custkey")], 5,
                     out_col="_r", materialize_input=True)
    c = global_ntile(c, [(-F.col("frequency")), F.col("o_custkey")], 5,
                     out_col="_f", materialize_input=True)
    c = global_ntile(c, [(-F.col("monetary_cents")), F.col("o_custkey")], 5,
                     out_col="_m", materialize_input=True)
    seg = F.col("_r") * 100 + F.col("_f") * 10 + F.col("_m")
    return c.select(
        "o_custkey",
        F.col("recency_days").cast("long").alias("recency_days"),
        "frequency", "monetary_cents",
        seg.cast("int").alias("rfm_segment"),
    )


@register(
    "r_streak_detection",
    """
WITH v AS (SELECT user_id, event_id, ts, CAST(round(value*100,0) AS BIGINT) AS vc FROM events),
l AS (SELECT user_id, event_id, ts, vc,
             CASE WHEN vc > lag(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 0 ELSE 1 END AS brk
      FROM v),
g AS (SELECT user_id,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
      FROM l),
s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_up_streak
FROM s GROUP BY user_id
""",
    doc="Longest strictly-increasing value streak per user: lag -> break "
        "flag -> running-sum group id -> max run length (the monotone-run "
        "variant of gaps-and-islands; no self-join)",
)
def q_streak(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = ev.select("user_id", "event_id", "ts", cents("value").alias("vc"))
    l = v.withColumn(
        "brk", F.when(F.col("vc") > F.lag("vc").over(w), 0).otherwise(1))
    g = l.withColumn("grp", F.sum("brk").over(cum))
    s = g.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return s.groupBy("user_id").agg(F.max("len").alias("longest_up_streak"))


@register(
    "r_cusum_drift",
    """
WITH v AS (SELECT event_id, user_id, ts, event_type,
                  CAST(round(value*100,0) AS BIGINT) AS vc FROM events),
m AS (SELECT event_type,
             CAST(round(CAST(sum(vc) AS DOUBLE)/count(*), 0) AS BIGINT) AS mu
      FROM v GROUP BY 1)
SELECT event_id,
       round(CAST(sum(vc - mu) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100, 6) AS cusum
FROM v JOIN m USING (event_type)
""",
    doc="CUSUM drift signal: running sum of deviations from the (cent-"
        "rounded) expected value per event type — integer partial sums "
        "keep the parallel aggregation exact; broadcast mean join",
)
def q_cusum(spark, sf):
    ev = T(spark, sf, "events")
    v = ev.select("event_id", "user_id", "ts", "event_type", cents("value").alias("vc"))
    m = v.groupBy("event_type").agg(
        F.round(F.sum("vc").cast("double") / F.count("*"), 0).cast("long").alias("mu"))
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        v.join(F.broadcast(m), "event_type")
        .select("event_id", "user_id", "ts", (F.col("vc") - F.col("mu")).alias("dev"))
        .select("event_id", F.round(F.sum("dev").over(cum).cast("double") / 100, 6).alias("cusum"))
    )


@register(
    "t_char_class_profile",
    """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_total,
       CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS n_space,
       round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
             / nullif(length(text), 0), 6) AS lower_ratio
FROM documents
""",
    doc="Character-class profile (upper/digit/space counts, lowercase "
        "ratio): the cheap boilerplate/table/code detector feeding quality "
        "gates — row-local, zero shuffle",
)
def q_char_class(spark, sf):
    docs = T(spark, sf, "documents")
    cc = lambda pat: F.length(F.regexp_replace("text", pat, ""))  # noqa: E731
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_total"),
        cc("[^A-Z]").cast("long").alias("n_upper"),
        cc("[^0-9]").cast("long").alias("n_digit"),
        cc("[^ ]").cast("long").alias("n_space"),
        F.round(cc("[^a-z]").cast("double") / F.nullif(F.length("text"), F.lit(0)), 6)
        .alias("lower_ratio"),
    )


@register(
    "p_quality_gate_funnel",
    """
WITH d0 AS (SELECT doc_id, text, n_chars,
                   list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
            FROM documents),
d1 AS (SELECT * FROM d0 WHERE n_chars >= 100),
d2 AS (SELECT * FROM d1 WHERE len(t) >= 20),
d3 AS (SELECT * FROM d2 WHERE CAST(len(list_distinct(t)) AS DOUBLE)/len(t) > 0.3),
d4 AS (SELECT * FROM (SELECT doc_id, row_number() OVER (PARTITION BY md5(text)
                             ORDER BY doc_id) AS rn FROM d3) WHERE rn = 1)
SELECT 0 AS stage, 'all' AS gate, (SELECT CAST(count(*) AS BIGINT) FROM d0) AS n_surviving
UNION ALL SELECT 1, 'min_chars', (SELECT CAST(count(*) AS BIGINT) FROM d1)
UNION ALL SELECT 2, 'min_tokens', (SELECT CAST(count(*) AS BIGINT) FROM d2)
UNION ALL SELECT 3, 'uniq_token_ratio', (SELECT CAST(count(*) AS BIGINT) FROM d3)
UNION ALL SELECT 4, 'exact_dedup', (SELECT CAST(count(*) AS BIGINT) FROM d4)
""",
    doc="Curation-funnel observability: per-gate survivor counts for the "
        "standard quality chain (chars -> tokens -> uniq-ratio -> exact "
        "dedup) — the accounting report every corpus release needs; gates "
        "evaluate once per doc, counts union at the end",
)
def q_gate_funnel(spark, sf):
    from .functions.texthash import tokens

    docs = T(spark, sf, "documents")
    d0 = docs.select("doc_id", "text", "n_chars", tokens("text").alias("t"))
    d1 = d0.filter(F.col("n_chars") >= 100)
    d2 = d1.filter(F.size("t") >= 20)
    d3 = d2.filter(F.size(F.array_distinct("t")).cast("double") / F.size("t") > 0.3)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    d4 = d3.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    stages = [(0, "all", d0), (1, "min_chars", d1), (2, "min_tokens", d2),
              (3, "uniq_token_ratio", d3), (4, "exact_dedup", d4)]
    outs = [
        d.agg(F.count("*").alias("n_surviving")).select(
            F.lit(i).alias("stage"), F.lit(name).alias("gate"), "n_surviving")
        for i, name, d in stages
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@register(
    "d_exact_hash_clusters",
    """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, count(*) AS n, min(doc_id) AS canon FROM h GROUP BY h)
SELECT doc_id, CAST(n AS BIGINT) AS n_copies,
       CAST(CASE WHEN doc_id = canon THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
FROM h JOIN g USING (h)
""",
    doc="Exact full-text dedup clusters via content hash (the zeroth, "
        "cheapest dedup stage before any MinHash): every doc labeled with "
        "its copy count and canonical flag — one groupBy + broadcast-able "
        "group join",
)
def q_exact_hash_clusters(spark, sf):
    docs = T(spark, sf, "documents")
    h = docs.select("doc_id", F.md5("text").alias("h"))
    g = h.groupBy("h").agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canon"))
    return h.join(g, "h").select(
        "doc_id", "n_copies",
        (F.col("doc_id") == F.col("canon")).cast("int").alias("is_canonical"),
    )


@register(
    "e_cosine_histogram",
    """
WITH p AS (SELECT a.vec_id,
  list_reduce(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
                             x -> x[1] * x[2]), (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(a.embedding::DOUBLE[], x -> x*x), (x, y) -> x + y))
   * sqrt(list_reduce(list_transform(b.embedding::DOUBLE[], x -> x*x), (x, y) -> x + y))) AS cos
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
SELECT CAST(floor(round(cos, 6) * 10) AS INTEGER) AS bin, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1
""",
    doc="Pairwise-cosine distribution histogram over consecutive vector "
        "pairs (shifted equi-join, not a cross join): the embedding-space "
        "health check (collapsed space -> mass near 1.0)",
)
def q_cosine_histogram(spark, sf):
    from .functions.vector import cosine_sim

    emb = T(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("aid"), F.col("embedding").alias("av"))
    b = emb.select((F.col("vec_id") - 1).alias("aid"), F.col("embedding").alias("bv"))
    return (
        a.join(b, "aid")
        .select(F.floor(F.round(cosine_sim(F.col("av"), F.col("bv").cast("array<double>")), 6) * 10)
                .cast("int").alias("bin"))
        .groupBy("bin").agg(F.count("*").alias("n"))
    )


@register(
    "g_message_size_audit",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(length(props)) AS BIGINT) AS total_props_bytes,
       CAST(max(length(props)) AS BIGINT) AS max_props_bytes,
       round(CAST(sum(length(props)) AS DOUBLE)/count(*), 6) AS avg_props_bytes
FROM events GROUP BY event_type
""",
    doc="G1-side payload accounting: per-message-type volume/size audit "
        "over the properties envelope — the capacity-planning readout of "
        "the ingest path",
)
def q_message_size_audit(spark, sf):
    ev = T(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.length("props")).cast("long").alias("total_props_bytes"),
        F.max(F.length("props")).cast("long").alias("max_props_bytes"),
        F.round(F.sum(F.length("props")).cast("double") / F.count("*"), 6).alias("avg_props_bytes"),
    )


# == round-4 wave 4: analytics depth to fill the 50-entry window =========

@register(
    "r_quartile_bands",
    """
WITH b AS (SELECT c_custkey, CAST(round(c_acctbal*100,0) AS BIGINT) AS bal,
                  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS band
           FROM customer)
SELECT band, CAST(count(*) AS BIGINT) AS n,
       round(CAST(min(bal) AS DOUBLE)/100, 6) AS min_bal,
       round(CAST(max(bal) AS DOUBLE)/100, 6) AS max_bal,
       round(CAST(sum(bal) AS DOUBLE)/count(*)/100, 6) AS avg_bal
FROM b GROUP BY band
""",
    doc="Quartile banding + per-band stats (ntile with key tiebreak, then "
        "integer-cent aggregates) — the decile-report shape",
)
def q_quartile_bands(spark, sf):
    from .operators.sampling import global_ntile

    c = T(spark, sf, "customer")
    # round 6: distributed quartile assignment (see q_lorenz_deciles)
    b = global_ntile(
        c.select("c_custkey", "c_acctbal", cents("c_acctbal").alias("bal")),
        [F.col("c_acctbal"), F.col("c_custkey")], 4, out_col="band",
    ).select("bal", "band")
    return b.groupBy("band").agg(
        F.count("*").alias("n"),
        F.round(F.min("bal").cast("double") / 100, 6).alias("min_bal"),
        F.round(F.max("bal").cast("double") / 100, 6).alias("max_bal"),
        F.round(F.sum("bal").cast("double") / F.count("*") / 100, 6).alias("avg_bal"),
    )


@register(
    "r_lead_time_buckets",
    """
SELECT o_orderpriority,
       CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 7) AS INTEGER) AS lead_weeks,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
""",
    doc="Order-to-ship lead-time distribution in week buckets per "
        "priority: fact-fact equi-join + derived-dimension rollup",
)
def q_lead_time(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderpriority",
            F.floor(F.datediff("l_shipdate", "o_orderdate") / 7).cast("int").alias("lead_weeks"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "r_self_excluding_agg",
    """
WITH b AS (SELECT c_custkey, c_nationkey, CAST(round(c_acctbal*100,0) AS BIGINT) AS bal
           FROM customer)
SELECT c_custkey,
       round(CAST(bal AS DOUBLE)/100, 6) AS own_bal,
       round(CAST(sum(bal) OVER (PARTITION BY c_nationkey) - bal AS DOUBLE)
             / nullif(count(*) OVER (PARTITION BY c_nationkey) - 1, 0) / 100, 6) AS peer_avg_bal
FROM b
""",
    doc="Self-excluding group aggregate (each row vs the average of its "
        "PEERS): group-window sum minus own value — no self-join, exact "
        "integer arithmetic until the final division",
)
def q_self_excluding(spark, sf):
    c = T(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey")
    b = c.select("c_custkey", "c_nationkey", cents("c_acctbal").alias("bal"))
    return b.select(
        "c_custkey",
        F.round(F.col("bal").cast("double") / 100, 6).alias("own_bal"),
        F.round(
            (F.sum("bal").over(w) - F.col("bal")).cast("double")
            / F.nullif(F.count("*").over(w) - 1, F.lit(0)) / 100, 6,
        ).alias("peer_avg_bal"),
    )


@register(
    "t_readability",
    """
WITH s AS (SELECT doc_id,
                  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS BIGINT) AS w,
                  CAST(len(list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                                      x -> trim(x)), x -> x != '')) AS BIGINT) AS s,
                  CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS vg
           FROM documents)
SELECT doc_id, w AS n_words, s AS n_sentences, vg AS n_vowel_groups,
       round(206.835 - 1.015 * (CAST(w AS DOUBLE) / nullif(s, 0))
                    - 84.6 * (CAST(vg AS DOUBLE) / nullif(w, 0)), 6) AS flesch
FROM s
""",
    doc="Flesch-style readability score (vowel-group syllable proxy): "
        "integer word/sentence/syllable counts, one shared float formula "
        "— the fluency prior quality gates layer on token stats",
)
def q_readability(spark, sf):
    from .functions.texthash import tokens

    docs = T(spark, sf, "documents")
    sents = F.filter(
        F.transform(F.split("text", "[.!?]+"), lambda x: F.trim(x)), lambda x: x != "")
    s = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("w"),
        F.size(sents).cast("long").alias("s"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiou]+"), 0)).cast("long").alias("vg"),
    )
    return s.select(
        "doc_id", F.col("w").alias("n_words"), F.col("s").alias("n_sentences"),
        F.col("vg").alias("n_vowel_groups"),
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("w").cast("double") / F.nullif(F.col("s"), F.lit(0)))
            - 84.6 * (F.col("vg").cast("double") / F.nullif(F.col("w"), F.lit(0))), 6,
        ).alias("flesch"),
    )


@register(
    "r_coverage_pct",
    """
WITH d AS (SELECT user_id,
                  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
           FROM events)
SELECT user_id, CAST(count(DISTINCT day) AS BIGINT) AS active_days,
       CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
       round(CAST(count(DISTINCT day) AS DOUBLE)/(max(day) - min(day) + 1), 6) AS coverage
FROM d GROUP BY user_id
""",
    doc="Activity coverage: distinct active days over the user's own "
        "observed span — the engagement-density counterpart of "
        "gaps-and-islands",
)
def q_coverage(spark, sf):
    ev = T(spark, sf, "events")
    d = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("day"))
    span = F.max("day") - F.min("day") + 1
    return d.groupBy("user_id").agg(
        F.countDistinct("day").alias("active_days"),
        span.cast("long").alias("span_days"),
        F.round(F.countDistinct("day").cast("double") / span, 6).alias("coverage"),
    )


@register(
    "r_keyset_pagination",
    """
WITH r AS (SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
           FROM orders)
SELECT CAST(floor(rn / 500) AS BIGINT) AS page, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(o_orderkey) AS BIGINT) AS first_key,
       CAST(max(o_orderkey) AS BIGINT) AS last_key
FROM r GROUP BY 1
""",
    doc="Keyset-pagination index: page boundaries (first/last key per "
        "500-row page) precomputed in one pass — what an API layer uses "
        "instead of OFFSET scans",
)
def q_keyset_pagination(spark, sf):
    from .operators.sampling import global_row_number

    o = T(spark, sf, "orders").select("o_orderkey")
    # distributed exact global position (range-partition + offset
    # composition) — an unpartitioned row_number window would pull every
    # order through one task
    r = global_row_number(o, [F.col("o_orderkey")], out_col="rn1")
    return (
        r.groupBy(F.floor((F.col("rn1") - 1) / 500).cast("long").alias("page"))
        .agg(F.count("*").alias("n_rows"),
             F.min("o_orderkey").alias("first_key"),
             F.max("o_orderkey").alias("last_key"))
    )


@register(
    "r_benford_digits",
    """
WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
           FROM orders WHERE o_totalprice >= 1)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE)/(SELECT count(*) FROM d), 6) AS pct
FROM d GROUP BY digit
""",
    doc="Benford first-digit distribution of amounts — the fraud/"
        "synthetic-data smell test; string-extract keeps the digit exact "
        "(float log10 is deliberately avoided: libm ulp differences)",
)
def q_benford(spark, sf):
    o = T(spark, sf, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int").alias("digit"))
    tot = d.agg(F.count("*").alias("tot"))
    return (
        d.groupBy("digit").agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select("digit", "n", F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("pct"))
    )


@register(
    "r_min_max_scale",
    """
WITH v AS (SELECT event_id, event_type, CAST(round(value*100,0) AS BIGINT) AS vc FROM events)
SELECT event_id,
       round(CAST(vc - min(vc) OVER (PARTITION BY event_type) AS DOUBLE)
             / nullif(max(vc) OVER (PARTITION BY event_type)
                      - min(vc) OVER (PARTITION BY event_type), 0), 6) AS scaled
FROM v
""",
    doc="Per-group min-max normalization to [0,1] (the feature-scaling "
        "staple): integer numerator/denominator, one group window",
)
def q_min_max_scale(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("event_type")
    v = ev.select("event_id", "event_type", cents("value").alias("vc"))
    return v.select(
        "event_id",
        F.round(
            (F.col("vc") - F.min("vc").over(w)).cast("double")
            / F.nullif(F.max("vc").over(w) - F.min("vc").over(w), F.lit(0)), 6,
        ).alias("scaled"),
    )


@register(
    "t_vocab_coverage",
    """
WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS w
             FROM documents),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
top AS (SELECT c FROM cnt ORDER BY c DESC, w LIMIT 100)
SELECT CAST((SELECT sum(c) FROM cnt) AS BIGINT) AS total_tokens,
       CAST((SELECT sum(c) FROM top) AS BIGINT) AS top100_tokens,
       round(CAST((SELECT sum(c) FROM top) AS DOUBLE)
             / (SELECT sum(c) FROM cnt), 6) AS coverage
""",
    doc="Vocabulary coverage: share of all token occurrences captured by "
        "the top-100 vocabulary (deterministic count-then-term tie-break) "
        "— the tokenizer-budget design metric",
)
def q_vocab_coverage(spark, sf):
    from .functions.texthash import exploded_nonnull, tokens

    docs = T(spark, sf, "documents")
    tok = exploded_nonnull(docs, [], tokens("text"), "w")
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    top = cnt.orderBy(F.col("c").desc(), "w").limit(100)
    return (
        cnt.agg(F.sum("c").alias("total_tokens"))
        .crossJoin(top.agg(F.sum("c").alias("top100_tokens")))
        .select(
            "total_tokens", "top100_tokens",
            F.round(F.col("top100_tokens").cast("double") / F.col("total_tokens"), 6)
            .alias("coverage"),
        )
    )


# == round-4 wave 5: hierarchy / allocation / calendar / regression ======


from .operators.graph import root_chase as _root_chase  # O(depth) chase; root_doubling is the O(log d) scale path


def _part_forest(spark, sf):
    """The fixture's functional graph: each part's parent is partkey//10
    (a decimal-digit forest); the loop consuming it works for ANY
    (child -> parent) edge table."""
    part = T(spark, sf, "part").select(F.col("p_partkey").cast("long").alias("node"))
    edges = part.filter(F.col("node") >= 10).select(
        F.col("node").alias("e_child"), F.floor(F.col("node") / 10).alias("e_parent")
    )
    return part, edges


@register(
    "r_reachability",
    """
WITH RECURSIVE walk AS (
  SELECT p_partkey AS node, p_partkey AS anc, 0 AS depth FROM part
  UNION ALL
  SELECT node, anc // 10, depth + 1 FROM walk WHERE anc >= 10
)
SELECT node, CAST(anc AS BIGINT) AS root, CAST(depth AS INTEGER) AS depth
FROM walk WHERE anc < 10
""",
    doc="Transitive closure over a functional graph (each part's parent is "
        "partkey//10, a decimal-digit forest): iterative left-join "
        "root-chase with localCheckpoint lineage truncation, O(depth) "
        "joins — vs DuckDB WITH RECURSIVE. Pointer-doubling (operators/graph.root_doubling, "
        "O(log depth) rounds, property-tested logarithmic on a depth-255 "
        "chain) is the implemented scale path for deep graphs; "
        "find_roots dispatches on expected depth like dedup_clusters.",
)
def q_reachability(spark, sf):
    part, edges = _part_forest(spark, sf)
    return _root_chase(part, edges)


@register(
    "r_topk_with_ties",
    """
SELECT l_returnflag, l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
       CAST(l_quantity AS BIGINT) AS qty
FROM (SELECT *, rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rk
      FROM lineitem)
WHERE rk <= 2
""",
    doc="Top-k WITH TIES per group (rank, not row_number): every row tied "
        "at the k-th value is kept — the SQL:2008 FETCH FIRST WITH TIES "
        "semantics r19_topk deliberately does not have",
)
def q_topk_with_ties(spark, sf):
    li = T(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return (
        li.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            "l_returnflag", "l_orderkey",
            F.col("l_linenumber").cast("long").alias("linenumber"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )


@register(
    "r_largest_remainder",
    """
WITH c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS cnt FROM customer GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c),
a AS (SELECT nk, cnt,
             CAST(1000 * cnt // tot AS BIGINT) AS base,
             CAST(1000 * cnt % tot AS BIGINT) AS rem
      FROM c, t),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, nk) AS rr,
             (SELECT CAST(1000 - sum(base) AS BIGINT) FROM a) AS leftover
      FROM a)
SELECT nk, cnt, base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS seats
FROM r
""",
    doc="Largest-remainder (Hamilton) apportionment: allocate 1000 integer "
        "seats proportionally to per-nation customer counts — floor share "
        "+ remainder-ranked top-up, all integer math, deterministic "
        "nk tie-break. The quota-allocation shape (budget splits, shard "
        "assignment) with an exactly-sums-to-N guarantee.",
)
def q_largest_remainder(spark, sf):
    c = T(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("tot"))
    a = c.crossJoin(F.broadcast(tot)).select(
        "nk", "cnt",
        F.floor(1000 * F.col("cnt") / F.col("tot")).alias("base"),
        ((1000 * F.col("cnt")) % F.col("tot")).alias("rem"),
    )
    leftover = a.agg((F.lit(1000) - F.sum("base")).alias("leftover"))
    rr = F.row_number().over(Window.orderBy(F.col("rem").desc(), "nk"))
    return (
        a.withColumn("rr", rr)
        .crossJoin(F.broadcast(leftover))
        .select(
            "nk", "cnt",
            (F.col("base") + (F.col("rr") <= F.col("leftover")).cast("long")).alias("seats"),
        )
    )


@register(
    "r_business_days",
    """
WITH d AS (
  SELECT o_orderpriority,
         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS nd,
         CAST(isodow(o_orderdate) - 1 AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= o_orderdate
),
b AS (SELECT o_orderpriority,
             (nd // 7) * 5
             + least(greatest(5 - w, 0), nd % 7)
             + greatest(nd % 7 - (7 - w), 0) AS bd
      FROM d)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bd) AS BIGINT) AS total_bdays,
       round(CAST(sum(bd) AS DOUBLE) / count(*), 6) AS avg_bdays
FROM b GROUP BY 1
""",
    doc="Business-day (Mon-Fri) lead time order->ship via closed-form "
        "calendar arithmetic (no per-day explode): full weeks x5 plus a "
        "start-weekday remainder correction; weekday convention pinned "
        "Spark weekday()==isodow()-1 (0=Monday). Filter drops the "
        "fixture's synthetic ship-before-order rows.",
)
def q_business_days(spark, sf):
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").cast("long").alias("nd"),
            F.weekday("o_orderdate").cast("long").alias("w"),
        )
    )
    bd = (
        (F.col("nd") / 7).cast("long") * 5
        + F.least(F.greatest(F.lit(5) - F.col("w"), F.lit(0)), F.col("nd") % 7)
        + F.greatest(F.col("nd") % 7 - (7 - F.col("w")), F.lit(0))
    )
    return d.select("o_orderpriority", bd.alias("bd")).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("bd").alias("total_bdays"),
        F.round(F.sum("bd").cast("double") / F.count("*"), 6).alias("avg_bdays"),
    )


@register(
    "r_rank_delta",
    """
WITH rev AS (
  SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revc
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2),
r AS (SELECT n_name, yr,
             CAST(row_number() OVER (PARTITION BY yr ORDER BY revc DESC, n_name) AS INTEGER) AS rk
      FROM rev)
SELECT a.n_name, a.rk AS rank_1996, b.rk AS rank_1997,
       CAST(a.rk - b.rk AS INTEGER) AS rank_gain
FROM r a JOIN r b ON a.n_name = b.n_name AND a.yr = 1996 AND b.yr = 1997
""",
    doc="Two-period rank movement (league-table 'movers' report): rank "
        "nations by integerized revenue in consecutive years, self-join "
        "on the entity, report the rank delta; deterministic name "
        "tie-break on equal revenue",
)
def q_rank_delta(spark, sf):
    o = T(spark, sf, "orders")
    cu = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    rev = (
        o.filter(F.year("o_orderdate").isin(1996, 1997))
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(cents("o_totalprice")).alias("revc"))
    )
    rk = rev.select(
        "n_name", "yr",
        F.row_number().over(
            Window.partitionBy("yr").orderBy(F.col("revc").desc(), "n_name")
        ).cast("int").alias("rk"),
    )
    a = rk.filter(F.col("yr") == 1996).select("n_name", F.col("rk").alias("rank_1996"))
    b = rk.filter(F.col("yr") == 1997).select(F.col("n_name").alias("n2"), F.col("rk").alias("rank_1997"))
    return (
        a.join(b, a.n_name == b.n2)
        .select(
            "n_name", "rank_1996", "rank_1997",
            (F.col("rank_1996") - F.col("rank_1997")).cast("int").alias("rank_gain"),
        )
    )


@register(
    "r_regr_grouped",
    """
WITH d AS (
  SELECT n_name,
         CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
         CAST(round(o_totalprice*100, 0) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey),
m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx
      FROM d GROUP BY 1)
SELECT n_name, n,
       round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx), 6) AS slope,
       round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * sx) / n, 4) AS intercept
FROM m
""",
    doc="Grouped ordinary-least-squares (order value in cents vs days "
        "since epoch, per nation) from EXACT integer moment sums — one "
        "map-side-combinable aggregate, no regr_* float-order "
        "nondeterminism; the final slope/intercept arithmetic is "
        "identical IEEE doubles in both engines",
)
def q_regr_grouped(spark, sf):
    o = T(spark, sf, "orders")
    cu = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    d = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).cast("long").alias("x"),
            cents("o_totalprice").alias("y"),
        )
    )
    m = d.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd, sxd, syd = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy")
    slope = (nd * F.col("sxy") - sxd * syd) / (nd * F.col("sxx") - sxd * F.col("sx"))
    return m.select(
        "n_name", "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"), 4).alias("intercept"),
    )


@register(
    "e_dim_stats",
    """
WITH v AS (
  SELECT d - 1 AS dim, CAST(round(embedding[d]*1000000, 0) AS BIGINT) AS v
  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d)),
m AS (SELECT dim, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v*v) AS BIGINT) AS svv
      FROM v GROUP BY 1)
SELECT CAST(dim AS INTEGER) AS dim, n,
       round(CAST(sv AS DOUBLE) / n / 1000000, 6) AS mean,
       round((CAST(n AS DOUBLE)*svv - CAST(sv AS DOUBLE)*sv)
             / (CAST(n AS DOUBLE)*n) / 1000000000000, 6) AS variance
FROM m
""",
    doc="Per-dimension embedding statistics (the normalization-stats pass "
        "a feature-scaling pipeline runs before training): posexplode to "
        "(dim, value), micro-integerize, exact integer moment sums -> "
        "mean/population-variance. One narrow shuffle on a 64-key "
        "dimension column; partial aggregation does the heavy lifting "
        "executor-side.",
)
def q_e_dim_stats(spark, sf):
    e = T(spark, sf, "embeddings")
    v = e.select(F.posexplode("embedding").alias("dim", "val")).select(
        "dim", F.round(F.col("val") * 1000000, 0).cast("long").alias("v"))
    m = v.groupBy("dim").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"))
    nd = F.col("n").cast("double")
    return m.select(
        F.col("dim").cast("int").alias("dim"), "n",
        F.round(F.col("sv").cast("double") / F.col("n") / 1e6, 6).alias("mean"),
        F.round((nd * F.col("svv") - F.col("sv").cast("double") * F.col("sv"))
                / (nd * F.col("n")) / 1e12, 6).alias("variance"),
    )


@register(
    "r_event_trigrams",
    """
WITH s AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt
FROM s WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY cnt DESC, e1, e2, e3
LIMIT 20
""",
    doc="Event-path trigrams (clickstream path analysis): per-user "
        "time-ordered lead(1)/lead(2) windows build 3-step transition "
        "sequences; top-20 with full deterministic tie-break. One "
        "shuffle on user_id, then a 3-column count.",
)
def q_event_trigrams(spark, sf):
    ev = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "e1", "e2", "e3")
        .limit(20)
    )


# == round-4 wave 6: profiling / clustering-quality / cross-source ======


@register(
    "r_calendar_profile",
    """
SELECT CAST(isodow(ts) - 1 AS INTEGER) AS dow, CAST(hour(ts) AS INTEGER) AS hr,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value*1000000,0) AS BIGINT)) AS BIGINT) AS value_micro
FROM events GROUP BY 1,2
""",
    doc="Weekday x hour activity calendar (the ops-dashboard heatmap "
        "profile): weekday convention pinned Spark weekday()==isodow()-1 "
        "(0=Monday), event values micro-integerized so the parallel sum "
        "is exact. One 168-key aggregate, fully map-side combinable.",
)
def q_calendar_profile(spark, sf):
    ev = T(spark, sf, "events")
    return ev.groupBy(
        F.weekday("ts").cast("int").alias("dow"), F.hour("ts").cast("int").alias("hr")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 1000000, 0).cast("long")).alias("value_micro"),
    )


def _cluster_inertia_oracle(n_centroids: int = 4, dim: int = 64, seed: int = 123) -> str:
    import numpy as np

    cent = np.random.default_rng(seed).standard_normal((n_centroids, dim))
    dots = ", ".join(_ann_audit_dot_sql("v", c) for c in cent)
    ccs = ",".join(repr(float((c * c).sum())) for c in cent)
    return f"""
WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
a AS (SELECT vec_id, [{dots}] AS dots,
        list_reduce(list_transform(v, x -> x*x), (x, y) -> x + y) AS vv
      FROM b),
c AS (SELECT vec_id,
        list_indexof(dots, list_aggregate(dots, 'max')) AS cell,
        CAST(round((vv - 2*list_extract(dots, list_indexof(dots, list_aggregate(dots, 'max')))
              + list_extract([{ccs}], list_indexof(dots, list_aggregate(dots, 'max')))) * 1e6, 0) AS BIGINT) AS d2m
      FROM a)
SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(sum(d2m) AS DOUBLE)/1e6, 6) AS inertia,
       round(CAST(sum(d2m) AS DOUBLE)/count(*)/1e6, 6) AS avg_d2
FROM c GROUP BY cell
"""


@register(
    "e_cluster_inertia",
    _cluster_inertia_oracle(),
    doc="K-means cluster quality (inertia / mean within-cluster squared "
        "distance) against the e_centroid_assign literal centroids: "
        "d2 = |v|2 - 2<v,c> + |c|2 per row via the sequential-fold dot "
        "kernels (bit-identical to duckdb list_reduce), micro-integerized "
        "before the parallel sum. The E-step quality gate a clustering "
        "curation pipeline monitors per iteration.",
)
def q_cluster_inertia(spark, sf):
    import numpy as np

    cent = np.random.default_rng(123).standard_normal((4, 64))
    emb = T(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dots = F.transform(
        lit_arr([[float(x) for x in c] for c in cent]),
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda x, y: x * y),
            F.lit(0.0), lambda a, x: a + x))
    vv = F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    ccs = lit_arr([float((c * c).sum()) for c in cent])
    cell = F.array_position(dots, F.array_max(dots))
    d2m = F.round(
        (vv - 2 * F.element_at(dots, cell.cast("int")) + F.element_at(ccs, cell.cast("int"))) * 1e6, 0
    ).cast("long")
    return (
        emb.select(cell.alias("cell"), d2m.alias("d2m"))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.sum("d2m").cast("double") / 1e6, 6).alias("inertia"),
            F.round(F.sum("d2m").cast("double") / F.count("*") / 1e6, 6).alias("avg_d2"),
        )
    )


@register(
    "p_source_overlap_matrix",
    """
WITH toks AS (SELECT doc_id, source, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
  FROM documents),
shd AS (SELECT DISTINCT doc_id, source,
               CAST('0x' || substr(md5(s0), 1, 15) AS BIGINT) AS s
  FROM (SELECT doc_id, source, unnest(list_transform(generate_series(1, len(t)-4),
                               i -> array_to_string(t[i:i+4], ' '))) AS s0
        FROM toks)),
dfc AS (SELECT s, count(*) AS df FROM shd GROUP BY 1),
sh AS (SELECT DISTINCT source, s FROM shd JOIN dfc USING (s) WHERE dfc.df <= 5),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
inter AS (SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source GROUP BY 1,2)
SELECT src_a, src_b, c AS shared_shingles,
       round(CAST(c AS DOUBLE)/least(sa.sz, sb.sz), 6) AS containment
FROM inter JOIN sizes sa ON sa.source = src_a JOIN sizes sb ON sb.source = src_b
WHERE c > 0
""",
    doc="Cross-source 5-gram-shingle overlap matrix (which corpora leak "
        "into which — the source-level contamination audit behind "
        "p_decontaminate's doc-level probe): distinct source-shingle "
        "sets over the non-hot shingle space (doc-frequency <= 5 "
        "stop-shingle cut: boilerplate shared by many docs carries no "
        "leak signal and densifies posting lists as the corpus grows), "
        "shared-shingle posting-list pairing (only sources sharing a "
        "shingle meet; pair space bounded by |sources|^2), containment "
        "vs the smaller set",
)
def q_source_overlap_matrix(spark, sf):
    from .functions.texthash import exploded_nonnull, shingles, tokens
    from .sources.tables import spread_small_input

    docs = spread_small_input(T(spark, sf, "documents"))
    # doc-granular rows so the hot-shingle guard measures DOCUMENT
    # frequency — dedup happens IN-ROW (array_distinct before the
    # explode), so the exploded relation has exactly one row per
    # (doc, shingle) by construction: df is a plain count(*) in the one
    # posting-list aggregate the pairing already needed (no positional
    # duplicates on the wire, no count_distinct expand, no extra
    # dedup shuffle), and the df<=5 stop-shingle cut is a free filter
    # on the aggregated row (see exact_jaccard_pairs.max_df).
    # the shuffle key is the PORTABLE 60-bit md5-prefix hash of the
    # shingle, computed in-row before the explode: ~50-char 5-gram
    # strings never hit the wire, only longs (BASELINE.md flagged the
    # shingle-string shuffle payload as this entry's 100-TB cost; the
    # oracle applies the identical hash, so even a collision would merge
    # identically in both engines — at 60 bits, odds are negligible)
    def _h60(c):
        return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

    shd = exploded_nonnull(
        docs, ["doc_id", "source"],
        F.transform(F.array_distinct(shingles(tokens("text"), 5)), _h60), "s",
    )
    # posting-list pair expansion instead of a shingle self-join: ONE
    # shuffle on the shingle builds the sorted distinct source list per
    # shingle (collect_set dedups, so no separate .distinct() pass);
    # the (a < b) pairs explode from the array — the same rows the join
    # would emit, minus the join's second full-relation shuffle. Sizes
    # come from the same posting lists (a 20-key explode), so the
    # (doc, source, shingle) relation is shuffled exactly once.
    posting = (
        shd.groupBy("s")
        .agg(
            F.array_sort(F.collect_set("source")).alias("srcs"),
            F.count("*").alias("__df"),
        )
        .filter(F.col("__df") <= 5)
        .drop("__df")
    )
    # NO persist here (round 7): the posting frame is read twice (sizes +
    # pairs) but both branches sit over the IDENTICAL shuffle exchange,
    # which ReuseExchange dedups within the one action; a persist() in a
    # registry entry is never unpersisted, so it leaked pinned blocks
    # into every subsequent query of the session (observed as nonsense
    # re-run timings in the sf1 gate and contaminated bench neighbors).
    sizes = posting.select(F.explode("srcs").alias("source")).groupBy("source").agg(
        F.count("*").alias("sz"))
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("srcs"),
                    lambda x, i: F.transform(
                        F.slice(F.col("srcs"), i + 2, F.size("srcs")),
                        lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    inter = pairs.groupBy("src_a", "src_b").agg(F.count("*").alias("c"))
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "src_a").join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", F.col("c").alias("shared_shingles"),
            F.round(F.col("c").cast("double") / F.least("sza", "szb"), 6).alias("containment"),
        )
    )


@register(
    "t_source_novelty",
    """
WITH toks AS (SELECT source, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
  FROM documents),
sh AS (SELECT DISTINCT source, s
  FROM (SELECT source, unnest(list_transform(generate_series(1, len(t)-4),
                               i -> array_to_string(t[i:i+4], ' '))) AS s
        FROM toks)),
u AS (SELECT s, count(*) AS n_sources FROM sh GROUP BY 1)
SELECT source, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(CASE WHEN n_sources = 1 THEN 1 END) AS BIGINT) AS n_unique,
       round(CAST(count(CASE WHEN n_sources = 1 THEN 1 END) AS DOUBLE)/count(*), 6) AS novelty
FROM sh JOIN u USING (s) GROUP BY source
""",
    doc="Per-source novelty: share of a source's 5-gram shingles found in "
        "NO other source — the redundancy score that decides whether a "
        "new corpus adds anything (complements p_source_overlap_matrix). "
        "Two shingle-keyed aggregations, no pair join at all.",
)
def q_source_novelty(spark, sf):
    from .functions.texthash import exploded_nonnull, shingles, tokens
    from .sources.tables import spread_small_input

    docs = spread_small_input(T(spark, sf, "documents"))
    sh = exploded_nonnull(
        docs, ["source"], shingles(tokens("text"), 5), "s"
    ).select("source", "s").distinct()
    u = sh.groupBy("s").agg(F.count("*").alias("n_sources"))
    return (
        sh.join(u, "s")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("n_sources") == 1, 1)).alias("n_unique"),
            F.round(
                F.count(F.when(F.col("n_sources") == 1, 1)).cast("double") / F.count("*"), 6
            ).alias("novelty"),
        )
    )


@register(
    "r_status_transitions",
    """
WITH s AS (SELECT o_orderstatus AS s1,
       lead(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS s2
  FROM orders)
SELECT s1, s2, CAST(count(*) AS BIGINT) AS n,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER (PARTITION BY s1) AS DOUBLE), 6) AS p
FROM s WHERE s2 IS NOT NULL GROUP BY 1,2
""",
    doc="Markov transition matrix over per-customer order-status "
        "sequences (lead window -> count -> row-normalized probability "
        "from exact integer counts) — the state-machine health report "
        "(churn modeling, process mining)",
)
def q_status_transitions(spark, sf):
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    s = o.select(
        F.col("o_orderstatus").alias("s1"),
        F.lead("o_orderstatus").over(w).alias("s2"),
    ).filter(F.col("s2").isNotNull())
    cnt = s.groupBy("s1", "s2").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("s1")
    return cnt.select(
        "s1", "s2", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6).alias("p"),
    )


@register(
    "r_gini_by_nation",
    """
WITH d AS (SELECT n_name, CAST(round(o_totalprice*100,0) AS BIGINT) AS y, o_orderkey
  FROM orders JOIN customer ON o_custkey=c_custkey JOIN nation ON c_nationkey=n_nationkey),
r AS (SELECT n_name, y, CAST(row_number() OVER (PARTITION BY n_name ORDER BY y, o_orderkey) AS BIGINT) AS i FROM d),
m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(i*y) AS BIGINT) AS siy FROM r GROUP BY 1)
SELECT n_name, n, round(2.0*siy/(CAST(n AS DOUBLE)*sy) - (CAST(n AS DOUBLE)+1)/n, 6) AS gini FROM m
""",
    doc="Gini inequality coefficient of order values per nation via the "
        "exact rank-weighted formula G = 2*sum(i*y_i)/(n*sum(y)) - (n+1)/n "
        "on integer cents with deterministic (value, key) ordering — one "
        "window sort per nation, one aggregate; all-integer moments",
)
def q_gini_by_nation(spark, sf):
    o = T(spark, sf, "orders")
    cu = T(spark, sf, "customer")
    n = T(spark, sf, "nation")
    d = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .select("n_name", cents("o_totalprice").alias("y"), "o_orderkey")
    )
    w = Window.partitionBy("n_name").orderBy("y", "o_orderkey")
    r = d.select("n_name", "y", F.row_number().over(w).cast("long").alias("i"))
    m = r.groupBy("n_name").agg(
        F.count("*").alias("n"), F.sum("y").alias("sy"),
        F.sum(F.col("i") * F.col("y")).alias("siy"))
    nd = F.col("n").cast("double")
    return m.select(
        "n_name", "n",
        F.round(2.0 * F.col("siy") / (nd * F.col("sy")) - (nd + 1) / F.col("n"), 6).alias("gini"),
    )


@register(
    "r_order_gap_stats",
    """
WITH g AS (SELECT c_nationkey AS nk,
       CAST(datediff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS BIGINT) AS gap
  FROM orders JOIN customer ON o_custkey=c_custkey)
SELECT nk, CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap, CAST(max(gap) AS BIGINT) AS max_gap,
       round(CAST(sum(gap) AS DOUBLE)/count(gap), 6) AS avg_gap
FROM g WHERE gap IS NOT NULL GROUP BY nk
""",
    doc="Inter-purchase gap statistics (repeat-order cadence per nation): "
        "per-customer lag over order dates -> integer day gaps -> exact "
        "min/max/avg. The recency-cadence signal behind replenishment "
        "and churn models; distinct from order->ship lead time "
        "(r_lead_time_buckets).",
)
def q_order_gap_stats(spark, sf):
    o = T(spark, sf, "orders")
    cu = T(spark, sf, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .select(
            F.col("c_nationkey").alias("nk"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("long").alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return g.groupBy("nk").agg(
        F.count("gap").alias("n_gaps"),
        F.min("gap").alias("min_gap"), F.max("gap").alias("max_gap"),
        F.round(F.sum("gap").cast("double") / F.count("gap"), 6).alias("avg_gap"),
    )


@register(
    "s_rate_limit_sliding",
    """
WITH e AS (SELECT CAST(user_id AS VARCHAR) AS key, event_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
c AS (SELECT key, event_id, ts_s,
        row_number() OVER (PARTITION BY key ORDER BY ts_s, event_id)
        - count(*) OVER (PARTITION BY key ORDER BY ts_s
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 86400 PRECEDING) AS in_window
      FROM e)
SELECT key, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(CASE WHEN in_window <= 3 THEN 1 END) AS BIGINT) AS n_admitted,
       CAST(count(CASE WHEN in_window > 3 THEN 1 END) AS BIGINT) AS n_shed
FROM c GROUP BY key
""",
    doc="Per-key sliding-log rate limiting (G11's per-tenant quota over "
        "event time, 3 per trailing day): the closed-form batch algebra "
        "(cumulative arrival rank minus out-of-window RANGE count — tie "
        "handling matches the stateful stream exactly) behind the "
        "transformWithStateInPandas operator in streaming/ratelimit.py, "
        "whose stream==batch golden pins the equivalence",
)
def q_rate_limit_sliding(spark, sf):
    from .streaming.ratelimit import rate_limit_batch

    ev = T(spark, sf, "events").select(
        F.col("user_id").alias("key"), "event_id", "ts")
    dec = rate_limit_batch(ev, window_s=86400, limit=3)
    return dec.groupBy("key").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("admitted"), 1)).alias("n_admitted"),
        F.count(F.when(~F.col("admitted"), 1)).alias("n_shed"),
    )


# == round-4 wave 7: growth accounting / conversion / inequality stats ==


@register(
    "r_time_to_convert",
    """
WITH f AS (SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
        min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY 1),
d AS (SELECT CAST(datediff('second', first_view, first_purchase) AS BIGINT) AS s
      FROM f WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
               AND first_purchase >= first_view)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
       CAST(min(s) AS BIGINT) AS min_s, CAST(max(s) AS BIGINT) AS max_s,
       round(CAST(sum(s) AS DOUBLE)/count(*), 6) AS avg_s
FROM d
""",
    doc="Conversion latency: first-view -> first-purchase per user "
        "(conditional min aggregates, one pass), integer-second gaps -> "
        "exact min/max/avg. The time-to-value funnel metric on top of "
        "r_funnel_sequence's step counts.",
)
def q_time_to_convert(spark, sf):
    ev = T(spark, sf, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    d = f.filter(
        F.col("first_view").isNotNull() & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view"))
        .cast("long").alias("s")
    )
    return d.agg(
        F.count("*").alias("n_converters"),
        F.min("s").alias("min_s"), F.max("s").alias("max_s"),
        F.round(F.sum("s").cast("double") / F.count("*"), 6).alias("avg_s"),
    )


@register(
    "r_seasonality_index",
    """
WITH m AS (SELECT CAST(month(o_orderdate) AS INTEGER) AS mon,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revc
           FROM orders GROUP BY 1),
t AS (SELECT CAST(sum(revc) AS BIGINT) AS tot, CAST(sum(n) AS BIGINT) AS ntot FROM m)
SELECT mon, n, round(CAST(revc AS DOUBLE)/100, 2) AS revenue,
       round((CAST(revc AS DOUBLE)/n) / (CAST(tot AS DOUBLE)/ntot), 6) AS seasonality_index
FROM m, t
""",
    doc="Monthly seasonality index (month's avg order value vs overall "
        "avg, exact integer sums, broadcast scalar denominator) — the "
        "demand-planning deflator",
)
def q_seasonality_index(spark, sf):
    o = T(spark, sf, "orders")
    m = o.groupBy(F.month("o_orderdate").cast("int").alias("mon")).agg(
        F.count("*").alias("n"), F.sum(cents("o_totalprice")).alias("revc"))
    t = m.agg(F.sum("revc").alias("tot"), F.sum("n").alias("ntot"))
    return m.crossJoin(F.broadcast(t)).select(
        "mon", "n",
        F.round(F.col("revc").cast("double") / 100, 2).alias("revenue"),
        F.round((F.col("revc").cast("double") / F.col("n"))
                / (F.col("tot").cast("double") / F.col("ntot")), 6).alias("seasonality_index"),
    )


@register(
    "r_new_vs_returning",
    """
WITH fs AS (SELECT user_id, min(date_trunc('day', ts)) AS first_d FROM events GROUP BY 1),
u AS (SELECT DISTINCT date_trunc('day', e.ts) AS d, e.user_id, fs.first_d
      FROM events e JOIN fs USING (user_id))
SELECT d, CAST(count(*) AS BIGINT) AS active_users,
       CAST(count(CASE WHEN first_d = d THEN 1 END) AS BIGINT) AS new_users,
       CAST(count(CASE WHEN first_d < d THEN 1 END) AS BIGINT) AS returning_users
FROM u GROUP BY d
""",
    doc="Daily growth accounting: first-seen day per user (one min agg, "
        "broadcast back), then per-day active/new/returning splits — the "
        "acquisition-vs-retention report every growth dashboard leads "
        "with",
)
def q_new_vs_returning(spark, sf):
    ev = T(spark, sf, "events")
    fs = ev.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("first_d"))
    u = (
        ev.select(F.date_trunc("day", "ts").alias("d"), "user_id")
        .distinct()
        .join(F.broadcast(fs), "user_id")
    )
    return u.groupBy("d").agg(
        F.count("*").alias("active_users"),
        F.count(F.when(F.col("first_d") == F.col("d"), 1)).alias("new_users"),
        F.count(F.when(F.col("first_d") < F.col("d"), 1)).alias("returning_users"),
    )


@register(
    "r_rolling_active_users",
    """
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du),
j AS (SELECT days.d AS d, du.user_id
      FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 1 DAY AND days.d)
SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS active_2d
FROM j GROUP BY d
""",
    doc="Rolling 2-day distinct active users per day (the DAU/WAU family; "
        "COUNT DISTINCT cannot ride a window frame, so the rewrite is a "
        "day-spine range join over the distinct day-user pairs — join "
        "fan-out bounded by window_days x daily actives, NOT by raw "
        "events). r_running_distinct covers the cumulative variant.",
)
def q_rolling_active_users(spark, sf):
    ev = T(spark, sf, "events")
    du = ev.select(F.date_trunc("day", "ts").alias("d"), "user_id").distinct()
    days = du.select("d").distinct()
    j = days.alias("spine").join(
        du.alias("du"),
        (F.col("du.d") >= F.col("spine.d") - F.expr("INTERVAL 1 DAY"))
        & (F.col("du.d") <= F.col("spine.d")),
    )
    return j.groupBy(F.col("spine.d").alias("d")).agg(
        F.countDistinct("du.user_id").alias("active_2d"))


@register(
    "r_lorenz_deciles",
    """
WITH c AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revc
           FROM orders GROUP BY 1),
d AS (SELECT revc, ntile(10) OVER (ORDER BY revc, o_custkey) AS decile FROM c)
SELECT CAST(decile AS INTEGER) AS decile, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(revc) AS BIGINT) AS revc,
       round(CAST(sum(revc) AS DOUBLE) / (SELECT CAST(sum(revc) AS DOUBLE) FROM c), 6) AS rev_share
FROM d GROUP BY 1
""",
    doc="Lorenz curve by customer decile (revenue share per ntile(10) "
        "with deterministic tie-break) — the concentration table behind "
        "r_gini_by_nation's scalar; integer cents end to end",
)
def q_lorenz_deciles(spark, sf):
    from .operators.sampling import global_ntile

    o = T(spark, sf, "orders")
    c = o.groupBy("o_custkey").agg(F.sum(cents("o_totalprice")).alias("revc"))
    # round 6: decile assignment via the distributed global_ntile kernel
    # (the customer dimension scales with the corpus; a bare
    # ntile() OVER (ORDER BY) is a single-task window)
    d = global_ntile(
        c, [F.col("revc"), F.col("o_custkey")], 10, out_col="decile"
    ).select("revc", "decile")
    tot = c.agg(F.sum("revc").cast("double").alias("tot"))
    return (
        d.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(F.count("*").alias("n_customers"), F.sum("revc").alias("revc"))
        .crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_customers", "revc",
            F.round(F.col("revc").cast("double") / F.col("tot"), 6).alias("rev_share"),
        )
    )


@register(
    "r_anova_dow",
    """
WITH d AS (SELECT CAST(isodow(o_orderdate) - 1 AS BIGINT) AS dow,
                  CAST(round(o_totalprice, 0) AS BIGINT) AS y
           FROM orders),
g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(round(CAST(sum(y) AS DOUBLE)*sum(y)/count(*), 0) AS BIGINT) AS term
      FROM d GROUP BY 1),
t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(sy) AS BIGINT) AS tsy, CAST(sum(syy) AS BIGINT) AS tsyy,
             CAST(sum(term) AS BIGINT) AS sterm FROM g)
SELECT CAST(k AS INTEGER) AS k_groups, nn AS n_total,
       round((sterm - CAST(tsy AS DOUBLE)*tsy/nn)/(k-1), 4) AS ms_between,
       round((CAST(tsyy AS DOUBLE) - sterm)/(nn-k), 4) AS ms_within,
       round(((sterm - CAST(tsy AS DOUBLE)*tsy/nn)/(k-1))
             / ((CAST(tsyy AS DOUBLE) - sterm)/(nn-k)), 6) AS f_stat
FROM t
""",
    doc="One-way ANOVA (does weekday move order value?): F statistic from "
        "integer moment sums in whole dollars; each group's sy^2/n term "
        "is rounded to BIGINT before the cross-group sum, so the parallel "
        "total is order-independent — the moment-sum determinism "
        "discipline applied to inferential statistics",
)
def q_anova_dow(spark, sf):
    o = T(spark, sf, "orders")
    d = o.select(
        F.weekday("o_orderdate").cast("long").alias("dow"),
        F.round(F.col("o_totalprice"), 0).cast("long").alias("y"),
    )
    g = d.groupBy("dow").agg(
        F.count("*").alias("n"), F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).withColumn(
        "term",
        F.round(F.col("sy").cast("double") * F.col("sy") / F.col("n"), 0).cast("long"),
    )
    t = g.agg(
        F.count("*").alias("k"), F.sum("n").alias("nn"),
        F.sum("sy").alias("tsy"), F.sum("syy").alias("tsyy"),
        F.sum("term").alias("sterm"),
    )
    ssb = F.col("sterm") - F.col("tsy").cast("double") * F.col("tsy") / F.col("nn")
    ssw = F.col("tsyy").cast("double") - F.col("sterm")
    # mirror DuckDB's x/0 -> NULL (ANSI Spark raises DIVIDE_BY_ZERO): one
    # group -> k-1 = 0, constant values -> ssw = 0; the F statistic is
    # undefined and both engines return NULL (ties fuzz sweep, round 8)
    ms_b = ssb / F.nullif(F.col("k") - 1, F.lit(0))
    ms_w = ssw / F.nullif(F.col("nn") - F.col("k"), F.lit(0))
    return t.select(
        F.col("k").cast("int").alias("k_groups"), F.col("nn").alias("n_total"),
        F.round(ms_b, 4).alias("ms_between"),
        F.round(ms_w, 4).alias("ms_within"),
        F.round(ms_b / F.nullif(ms_w, F.lit(0.0)), 6).alias("f_stat"),
    )


@register(
    "e_label_margin",
    """
WITH vm AS (SELECT vec_id, label,
        list_transform(embedding::DOUBLE[], x -> CAST(round(x*1000000, 0) AS BIGINT)) AS v
  FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL),
cd AS (SELECT label AS clabel, d,
        CAST(round(CAST(sum(v[d]) AS DOUBLE)/count(*), 0) AS BIGINT) AS c
       FROM vm CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) GROUP BY 1, 2),
cl AS (SELECT clabel, list(c ORDER BY d) AS cvec FROM cd GROUP BY 1),
dots AS (SELECT vm.vec_id, vm.label, cl.clabel,
          list_reduce(list_transform(list_zip(vm.v, cl.cvec), x -> x[1]*x[2]),
                      (a, b) -> a + b) AS dot
         FROM vm CROSS JOIN cl),
agg AS (SELECT vec_id, label,
          max(CASE WHEN clabel = label THEN dot END) AS own,
          max(CASE WHEN clabel != label THEN dot END) AS best_other
        FROM dots GROUP BY 1, 2)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(CASE WHEN own > best_other THEN 1 END) AS BIGINT) AS n_separated,
       round(CAST(sum(own - best_other) AS DOUBLE)/count(*)/1e12, 6) AS avg_margin
FROM agg GROUP BY label
""",
    doc="Embedding label-separability audit (the metric-learning QA gate: "
        "does each vector sit closer to its own label's centroid than to "
        "any other?): micro-integerized vectors -> exact integer centroid "
        "means -> exact integer dot products, so own-vs-best-other "
        "margins are bit-identical under any parallelism. Spark plan: "
        "centroids are a driver-side 640-value collect (tiny, like the "
        "IVF quantizer sample) baked back as plan literals — the corpus "
        "itself never joins or shuffles; map-only fold kernels + one "
        "10-key aggregate.",
)
def q_label_margin(spark, sf):
    # unlabeled / NULL-embedding vectors carry no separability signal:
    # dropped on BOTH sides (a NULL label key also crashed the driver-side
    # sorted(cent) below on a null-bearing corpus)
    emb = T(spark, sf, "embeddings").filter(
        F.col("label").isNotNull() & F.col("embedding").isNotNull())
    vm = emb.select(
        "vec_id", "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000000, 0).cast("long"),
        ).alias("v"),
    )
    cd = (
        vm.select("label", F.posexplode("v").alias("d", "val"))
        .groupBy("label", "d")
        .agg(F.round(F.sum("val").cast("double") / F.count("*"), 0).cast("long").alias("c"))
    )
    cent = {}
    for r in cd.collect():  # 10 labels x 64 dims — plan constants
        cent.setdefault(r["label"], {})[r["d"]] = r["c"]
    labels = sorted(cent)
    dots = F.transform(
        lit_arr([[int(cent[lab][d]) for d in sorted(cent[lab])]
                 for lab in labels], "long"),
        lambda cv: F.aggregate(
            F.zip_with(F.col("v"), cv, lambda x, y: x * y),
            F.lit(0).cast("long"), lambda a, x: a + x))
    idx = F.array_position(lit_arr([int(l) for l in labels], "long"),
                           F.col("label"))
    own = F.element_at(dots, idx.cast("int"))
    best_other = F.array_max(
        F.zip_with(
            dots,
            F.sequence(F.lit(1), F.lit(len(labels))),
            lambda x, i: F.when(i != idx, x),
        )
    )
    return (
        vm.select("label", own.alias("own"), best_other.alias("best_other"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.count(F.when(F.col("own") > F.col("best_other"), 1)).alias("n_separated"),
            F.round(
                F.sum(F.col("own") - F.col("best_other")).cast("double") / F.count("*") / 1e12, 6
            ).alias("avg_margin"),
        )
    )


@register(
    "r_survival_curve",
    """
WITH s AS (SELECT o_custkey,
        CAST(datediff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span
  FROM orders GROUP BY 1),
k AS (SELECT unnest(generate_series(0, 720, 90)) AS kday)
SELECT CAST(kday AS INTEGER) AS day_k,
       CAST(count(CASE WHEN span >= kday THEN 1 END) AS BIGINT) AS surviving,
       CAST(count(*) AS BIGINT) AS total,
       round(CAST(count(CASE WHEN span >= kday THEN 1 END) AS DOUBLE)/count(*), 6) AS survival_rate
FROM s CROSS JOIN k GROUP BY kday
""",
    doc="Customer survival curve (share still active k days after first "
        "order, k in 90-day steps; last order ≙ censoring point): "
        "per-customer first/last span, broadcast 9-point spine cross "
        "join, exact integer counts — the retention/churn lifetime "
        "table",
)
def q_survival_curve(spark, sf):
    o = T(spark, sf, "orders")
    s = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).cast("long").alias("span"))
    k = spark.range(0, 721, 90).select(F.col("id").cast("int").alias("day_k"))
    return (
        s.crossJoin(F.broadcast(k))
        .groupBy("day_k")
        .agg(
            F.count(F.when(F.col("span") >= F.col("day_k"), 1)).alias("surviving"),
            F.count("*").alias("total"),
            F.round(
                F.count(F.when(F.col("span") >= F.col("day_k"), 1)).cast("double")
                / F.count("*"), 6
            ).alias("survival_rate"),
        )
    )


# == round-4 wave 8: inventory / leakage / distribution drift ===========


@register(
    "r_backlog_aging",
    """
WITH snap AS (SELECT max(o_orderdate) AS sd FROM orders),
o AS (SELECT o_orderpriority,
        CAST(datediff('day', o_orderdate, sd) AS BIGINT) AS age,
        CAST(round(o_totalprice*100,0) AS BIGINT) AS cents
      FROM orders, snap WHERE o_orderstatus = 'O'),
b AS (SELECT o_orderpriority,
        CASE WHEN age <= 30 THEN '0-30' WHEN age <= 90 THEN '31-90'
             WHEN age <= 365 THEN '91-365' ELSE '365+' END AS bucket,
        cents FROM o)
SELECT o_orderpriority, bucket, CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(cents) AS DOUBLE)/100, 2) AS open_value
FROM b GROUP BY 1,2
""",
    doc="Open-order backlog aging (AR-aging shape): snapshot date is the "
        "corpus max (broadcast scalar), integer day ages bucketed "
        "0-30/31-90/91-365/365+, integer-cents value per "
        "priority x bucket",
)
def q_backlog_aging(spark, sf):
    o = T(spark, sf, "orders")
    snap = o.agg(F.max("o_orderdate").alias("sd"))
    age = F.datediff("sd", "o_orderdate").cast("long")
    bucket = (
        F.when(age <= 30, "0-30").when(age <= 90, "31-90")
        .when(age <= 365, "91-365").otherwise("365+")
    )
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select("o_orderpriority", bucket.alias("bucket"), cents("o_totalprice").alias("cents"))
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("open_value"),
        )
    )


@register(
    "r_abc_xyz",
    """
WITH pr AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS revc,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        CAST(sum(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS BIGINT) AS sqq
      FROM lineitem GROUP BY 1),
r AS (SELECT *,
        CAST(sum(revc) OVER (ORDER BY revc DESC, l_partkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        CAST(sum(revc) OVER () AS BIGINT) AS tot FROM pr),
cls AS (SELECT l_partkey, n,
        CASE WHEN cum*10 <= tot*8 THEN 'A' WHEN cum*100 <= tot*95 THEN 'B' ELSE 'C' END AS abc,
        CASE WHEN n < 2 THEN 'Z'
             ELSE CASE
               WHEN (CAST(n AS DOUBLE)*sqq - CAST(sq AS DOUBLE)*sq)
                    / (CAST(n AS DOUBLE)*n) <= 0.25 * (CAST(sq AS DOUBLE)/n)*(CAST(sq AS DOUBLE)/n) THEN 'X'
               WHEN (CAST(n AS DOUBLE)*sqq - CAST(sq AS DOUBLE)*sq)
                    / (CAST(n AS DOUBLE)*n) <= 1.0 * (CAST(sq AS DOUBLE)/n)*(CAST(sq AS DOUBLE)/n) THEN 'Y'
               ELSE 'Z' END END AS xyz
      FROM r)
SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts FROM cls GROUP BY 1,2
""",
    doc="ABC-XYZ inventory classification: cumulative-revenue cut at "
        "80/95% (integer cross-multiplication, no float thresholds) "
        "crossed with demand-variability classes from exact quantity "
        "moments (CV^2 vs 0.25/1.0) — the planner's 9-cell segmentation "
        "matrix",
)
def q_abc_xyz(spark, sf):
    li = T(spark, sf, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum(cents("l_extendedprice")).alias("revc"),
        F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        F.sum(F.col("l_quantity").cast("long") * F.col("l_quantity").cast("long")).alias("sqq"),
    )
    from .operators.sampling import global_running_sum

    # round 6: distributed running share (the part dimension scales with
    # the corpus; see q_pareto_cut) — cum/tot via the range-partitioned
    # prefix-sum kernel, rev DESC expressed as -revc asc
    r = global_running_sum(
        pr, [(-F.col("revc")), F.col("l_partkey")], "revc",
        out_col="cum", total_col="tot",
    ).select("l_partkey", "n", "sq", "sqq", "cum", "tot")
    nd, sqd = F.col("n").cast("double"), F.col("sq").cast("double")
    var = (nd * F.col("sqq") - sqd * F.col("sq")) / (nd * F.col("n"))
    mean2 = (sqd / F.col("n")) * (sqd / F.col("n"))
    abc = (
        F.when(F.col("cum") * 10 <= F.col("tot") * 8, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B").otherwise("C")
    )
    xyz = F.when(F.col("n") < 2, "Z").otherwise(
        F.when(var <= 0.25 * mean2, "X").when(var <= 1.0 * mean2, "Y").otherwise("Z"))
    return r.select(abc.alias("abc"), xyz.alias("xyz")).groupBy("abc", "xyz").agg(
        F.count("*").alias("n_parts"))


_LEAK_BUCKET = stable_bucket_sql("doc_id", 100)

@register(
    "p_split_leakage",
    f"""
WITH toks AS (SELECT doc_id,
        CASE WHEN {_LEAK_BUCKET} < 80 THEN 'train' ELSE 'eval' END AS split,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents),
sh AS (SELECT DISTINCT doc_id, split, s
       FROM (SELECT doc_id, split, unnest(list_transform(generate_series(1, len(t)-11),
                i -> array_to_string(t[i:i+11], ' '))) AS s FROM toks)),
g AS (SELECT s, max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS has_train FROM sh GROUP BY s),
ev AS (SELECT DISTINCT doc_id FROM sh WHERE split = 'eval'),
leak AS (SELECT DISTINCT sh.doc_id FROM sh JOIN g USING (s)
         WHERE sh.split = 'eval' AND g.has_train = 1)
SELECT CAST((SELECT count(*) FROM ev) AS BIGINT) AS n_eval_docs,
       CAST((SELECT count(*) FROM leak) AS BIGINT) AS n_leaking,
       round(CAST((SELECT count(*) FROM leak) AS DOUBLE)
             / (SELECT count(*) FROM ev), 6) AS leak_rate
""",
    doc="Train/eval contamination audit: share of eval-split documents "
        "(same stable md5 bucket as p_deterministic_split, 80/20) that "
        "share a 12-gram shingle with ANY train document — the "
        "cross-split leakage gate run before an eval set ships. "
        "Posting-list shape: one shuffle on the shingle.",
)
def q_split_leakage(spark, sf):
    from .functions.texthash import exploded_nonnull, shingles, tokens
    from .operators.sampling import stable_bucket
    from .sources.tables import spread_small_input

    docs = spread_small_input(T(spark, sf, "documents")).withColumn(
        "split",
        F.when(stable_bucket(F.col("doc_id"), 100) < 80, "train").otherwise("eval"),
    )
    sh = exploded_nonnull(
        docs, ["doc_id", "split"], shingles(tokens("text"), 12), "s"
    ).select("doc_id", "split", "s").distinct()
    g = sh.groupBy("s").agg(
        F.max((F.col("split") == "train").cast("int")).alias("has_train"))
    ev = sh.filter(F.col("split") == "eval").select("doc_id").distinct()
    leak = (
        sh.filter(F.col("split") == "eval")
        .join(g, "s")
        .filter(F.col("has_train") == 1)
        .select("doc_id").distinct()
    )
    ne = ev.agg(F.count("*").alias("n_eval_docs"))
    nl = leak.agg(F.count("*").alias("n_leaking"))
    return ne.crossJoin(nl).select(
        "n_eval_docs", "n_leaking",
        # nullif matches DuckDB's x/0 -> NULL (Spark ANSI raises instead);
        # only reachable when the eval split is empty
        F.round(
            F.col("n_leaking").cast("double") / F.nullif(F.col("n_eval_docs"), F.lit(0)),
            6,
        ).alias("leak_rate"),
    )


_LN2 = 0.6931471805599453


@register(
    "t_js_divergence",
    f"""
WITH tok AS (SELECT source, x AS w
  FROM documents, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS t(x)),
sc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1,2),
st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY 1),
gc AS (SELECT w, CAST(sum(c) AS BIGINT) AS gcw FROM sc GROUP BY 1),
gt AS (SELECT CAST(sum(gcw) AS BIGINT) AS gn FROM gc),
terms AS (SELECT sc.source, gc.gcw,
    CAST(round(((CAST(sc.c AS DOUBLE)/st.n) * ln((CAST(sc.c AS DOUBLE)/st.n) /
        (0.5*(CAST(sc.c AS DOUBLE)/st.n) + 0.5*(CAST(gc.gcw AS DOUBLE)/gt.gn)))) * 1e9, 0) AS BIGINT) AS pterm,
    CAST(round(((CAST(gc.gcw AS DOUBLE)/gt.gn) * ln((CAST(gc.gcw AS DOUBLE)/gt.gn) /
        (0.5*(CAST(sc.c AS DOUBLE)/st.n) + 0.5*(CAST(gc.gcw AS DOUBLE)/gt.gn)))) * 1e9, 0) AS BIGINT) AS qterm
  FROM sc JOIN st USING (source) JOIN gc USING (w) CROSS JOIN gt),
agg AS (SELECT source, CAST(sum(pterm) AS BIGINT) AS ps, CAST(sum(qterm) AS BIGINT) AS qs,
               CAST(sum(gcw) AS BIGINT) AS smass
        FROM terms GROUP BY 1)
SELECT source,
       round((CAST(ps AS DOUBLE) + qs)/2/1e9
             + {_LN2}/2 * (1 - CAST(smass AS DOUBLE)/(SELECT gn FROM gt)), 6) AS js_divergence
FROM agg
""",
    doc="Jensen-Shannon divergence of each source's unigram distribution "
        "vs the whole corpus (the mixture-drift monitor for weighted "
        "source blending): per-term contributions micro-rounded to 1e-9 "
        "BEFORE the parallel sum (the t_unigram_logprob determinism "
        "discipline); words absent from a source contribute their exact "
        "closed-form ln2 * missing-mass — full JS, not the "
        "overlap-truncated variant",
)
def q_js_divergence(spark, sf):
    from .functions.texthash import exploded_nonnull, tokens
    from .sources.tables import spread_small_input

    docs = spread_small_input(T(spark, sf, "documents"))
    tok = exploded_nonnull(docs, ["source"], tokens("text"), "w")
    sc = tok.groupBy("source", "w").agg(F.count("*").alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    gc = sc.groupBy("w").agg(F.sum("c").alias("gcw"))
    gt = gc.agg(F.sum("gcw").alias("gn"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("gcw").cast("double") / F.col("gn")
    m = 0.5 * p + 0.5 * q
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(gc, "w")
        .crossJoin(F.broadcast(gt))
        .select(
            "source", "gcw",
            F.round(p * F.log(p / m) * 1e9, 0).cast("long").alias("pterm"),
            F.round(q * F.log(q / m) * 1e9, 0).cast("long").alias("qterm"),
        )
    )
    agg = terms.groupBy("source").agg(
        F.sum("pterm").alias("ps"), F.sum("qterm").alias("qs"),
        F.sum("gcw").alias("smass"))
    return agg.crossJoin(F.broadcast(gt)).select(
        "source",
        F.round(
            (F.col("ps").cast("double") + F.col("qs")) / 2 / 1e9
            + _LN2 / 2 * (1 - F.col("smass").cast("double") / F.col("gn")), 6
        ).alias("js_divergence"),
    )


# == round-4 wave 9: hierarchy rollup / mix-shift / sequence entropy ====


@register(
    "r_hierarchy_rollup",
    """
WITH RECURSIVE walk AS (
  SELECT p_partkey AS node, p_partkey AS anc FROM part
  UNION ALL
  SELECT node, anc // 10 FROM walk WHERE anc >= 10
),
roots AS (SELECT node, anc AS root FROM walk WHERE anc < 10),
v AS (SELECT r.root, CAST(round(p.p_retailprice*100,0) AS BIGINT) AS cents
      FROM roots r JOIN part p ON p.p_partkey = r.node)
SELECT CAST(root AS BIGINT) AS root, CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(cents) AS DOUBLE)/100, 2) AS subtree_value
FROM v GROUP BY root
""",
    doc="Aggregate along the transitive closure (BOM-style subtree cost "
        "rollup): the r_reachability root-chase feeds a per-root value "
        "aggregation — closure once, any number of rollups after; "
        "integer cents",
)
def q_hierarchy_rollup(spark, sf):
    part_nodes, edges = _part_forest(spark, sf)
    roots = _root_chase(part_nodes, edges).select("node", "root")
    p = T(spark, sf, "part").select(
        F.col("p_partkey").cast("long").alias("node"), cents("p_retailprice").alias("cents"))
    return (
        roots.join(p, "node")
        .groupBy("root")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("subtree_value"),
        )
    )


@register(
    "r_chi_square_mix",
    """
WITH c AS (SELECT o_orderpriority AS pri, CAST(year(o_orderdate) AS INTEGER) AS yr,
                  CAST(count(*) AS BIGINT) AS n
           FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1,2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
mr  AS (SELECT pri, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY 1),
mc  AS (SELECT yr, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY 1),
term AS (SELECT c.pri, c.yr,
    CAST(round(power(CAST(c.n AS DOUBLE) - CAST(mr.rn AS DOUBLE)*mc.cn/tot.nn, 2)
               / (CAST(mr.rn AS DOUBLE)*mc.cn/tot.nn) * 1e9, 0) AS BIGINT) AS t
  FROM c JOIN mr USING (pri) JOIN mc USING (yr) CROSS JOIN tot)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(CAST(sum(t) AS DOUBLE)/1e9, 6) AS chi_square
FROM term
""",
    doc="Chi-square mix-shift test (did the order-priority mix change "
        "between 1996 and 1997?): contingency counts -> expected cells "
        "-> per-cell terms micro-rounded to 1e-9 before the parallel sum "
        "— the distribution-drift alarm for categorical columns, exact "
        "under any aggregation order",
)
def q_chi_square_mix(spark, sf):
    o = T(spark, sf, "orders")
    c = (
        o.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = c.agg(F.sum("n").alias("nn"))
    mr = c.groupBy("pri").agg(F.sum("n").alias("rn"))
    mc = c.groupBy("yr").agg(F.sum("n").alias("cn"))
    exp = F.col("rn").cast("double") * F.col("cn") / F.col("nn")
    term = (
        c.join(F.broadcast(mr), "pri")
        .join(F.broadcast(mc), "yr")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(F.pow(F.col("n").cast("double") - exp, 2) / exp * 1e9, 0)
            .cast("long").alias("t")
        )
    )
    return term.agg(
        F.count("*").alias("n_cells"),
        F.round(F.sum("t").cast("double") / 1e9, 6).alias("chi_square"),
    )


@register(
    "t_bigram_entropy",
    """
WITH toks AS (SELECT source, doc_id,
        list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t FROM documents),
bg AS (SELECT source, t[i] AS w1, t[i+1] AS w2
       FROM toks, unnest(generate_series(1, len(t)-1)) AS g(i)),
cnt AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1,2,3),
w1t AS (SELECT source, w1, CAST(sum(c) AS BIGINT) AS cw1 FROM cnt GROUP BY 1,2),
st  AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
term AS (SELECT cnt.source,
    CAST(round((CAST(cnt.c AS DOUBLE)/st.n) * ln(CAST(cnt.c AS DOUBLE)/w1t.cw1) * 1e9, 0) AS BIGINT) AS t
  FROM cnt JOIN w1t USING (source, w1) JOIN st USING (source))
SELECT source, round(-CAST(sum(t) AS DOUBLE)/1e9, 6) AS bigram_entropy_nats
FROM term GROUP BY source
""",
    doc="Conditional bigram entropy H(w2|w1) per source (lexical "
        "predictability — low entropy flags templated/boilerplate "
        "corpora before training): transition counts -> per-term "
        "p(w1,w2)*ln p(w2|w1) micro-rounded before the parallel sum "
        "(the t_unigram_logprob/t_js_divergence determinism discipline)",
)
def q_bigram_entropy(spark, sf):
    from .functions.texthash import tokens
    from .sources.tables import spread_small_input

    docs = spread_small_input(T(spark, sf, "documents"))
    t = tokens("text")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select("source", F.explode(bigrams).alias("b")).select(
        "source", "b.w1", "b.w2")
    cnt = bg.groupBy("source", "w1", "w2").agg(F.count("*").alias("c"))
    w1t = cnt.groupBy("source", "w1").agg(F.sum("c").alias("cw1"))
    st = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    term = (
        cnt.join(w1t, ["source", "w1"])
        .join(F.broadcast(st), "source")
        .select(
            "source",
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("c").cast("double") / F.col("cw1")) * 1e9, 0
            ).cast("long").alias("t"),
        )
    )
    return term.groupBy("source").agg(
        F.round(-F.sum("t").cast("double") / 1e9, 6).alias("bigram_entropy_nats"))


@register(
    "r_segment_migration",
    """
WITH s AS (SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
                  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS spend
           FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1,2),
q AS (SELECT o_custkey, yr,
             CAST(ntile(5) OVER (PARTITION BY yr ORDER BY spend, o_custkey) AS INTEGER) AS seg
      FROM s)
SELECT a.seg AS seg_1996, b.seg AS seg_1997, CAST(count(*) AS BIGINT) AS n_customers
FROM q a JOIN q b ON a.o_custkey = b.o_custkey AND a.yr = 1996 AND b.yr = 1997
GROUP BY 1,2
""",
    doc="Customer segment-migration matrix: spend quintile in 1996 vs "
        "1997 (deterministic ntile tie-break), self-joined on the "
        "customer — the CRM upgrade/downgrade flow report on top of "
        "r_rfm_segmentation's static quintiles",
)
def q_segment_migration(spark, sf):
    o = T(spark, sf, "orders")
    s = (
        o.filter(F.year("o_orderdate").isin(1996, 1997))
        .groupBy("o_custkey", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(cents("o_totalprice")).alias("spend"))
    )
    q = s.select(
        "o_custkey", "yr",
        F.ntile(5).over(Window.partitionBy("yr").orderBy("spend", "o_custkey"))
        .cast("int").alias("seg"),
    )
    a = q.filter(F.col("yr") == 1996).select("o_custkey", F.col("seg").alias("seg_1996"))
    b = q.filter(F.col("yr") == 1997).select(
        F.col("o_custkey").alias("ck2"), F.col("seg").alias("seg_1997"))
    return (
        a.join(b, a.o_custkey == b.ck2)
        .groupBy("seg_1996", "seg_1997")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "r_rolling_median",
    """
WITH d AS (SELECT date_trunc('day', ts) AS day,
                  CAST(sum(CAST(round(value*1000000,0) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1),
days AS (SELECT day FROM d),
j AS (SELECT days.day AS day, d.v
      FROM days JOIN d ON d.day BETWEEN days.day - INTERVAL 6 DAY AND days.day),
r AS (SELECT day, v,
             row_number() OVER (PARTITION BY day ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY day) AS n
      FROM j)
SELECT day,
       round(CAST(sum(CASE WHEN rn IN ((n+1)//2, (n+2)//2) THEN v END) AS DOUBLE)
             / count(CASE WHEN rn IN ((n+1)//2, (n+2)//2) THEN 1 END) / 1e6, 6) AS rolling_median_7d
FROM r GROUP BY day
""",
    doc="Rolling 7-day MEDIAN of the daily value total (no window frame "
        "supports median — the rewrite is a day-spine range join then a "
        "middle-rank pick, even windows averaging the two middle values; "
        "fan-out bounded by window_days x days, not events). The robust "
        "smoothing counterpart of r_ewma_smoothing; daily totals are "
        "micro-integerized so rank selection is exact.",
)
def q_rolling_median(spark, sf):
    ev = T(spark, sf, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 1000000, 0).cast("long")).alias("v"))
    days = d.select("day")
    j = days.alias("spine").join(
        d.alias("d"),
        (F.col("d.day") >= F.col("spine.day") - F.expr("INTERVAL 6 DAY"))
        & (F.col("d.day") <= F.col("spine.day")),
    ).select(F.col("spine.day").alias("day"), F.col("d.v").alias("v"))
    w = Window.partitionBy("day").orderBy("v")
    r = j.select(
        "day", "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("day")).alias("n"),
    )
    is_mid = (F.col("rn") == F.floor((F.col("n") + 1) / 2)) | (
        F.col("rn") == F.floor((F.col("n") + 2) / 2))
    return r.groupBy("day").agg(
        F.round(
            F.sum(F.when(is_mid, F.col("v"))).cast("double")
            / F.count(F.when(is_mid, 1)) / 1e6, 6
        ).alias("rolling_median_7d")
    )


_PR_SCALE = 10**12
_PR_ITERS = 3


def _pagerank_oracle(iters: int = _PR_ITERS, S: int = _PR_SCALE, damp: float = 0.85) -> str:
    """Chained-CTE PageRank with every per-node rank micro-integerized
    (units of 1/S) after each iteration — exact integer sums, identical
    half-away-from-zero rounding on both engines, so the iterative float
    algorithm gets a hash-exact oracle."""
    sql = """
WITH nodes AS (SELECT DISTINCT l_partkey AS node FROM lineitem),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
edges AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST(round(CAST(%(S)d AS DOUBLE)/n, 0) AS BIGINT) AS r FROM nodes, nc)
""" % {"S": S}
    prev = "r0"
    for i in range(1, iters + 1):
        cur = f"r{i}"
        sql += f""",
dang{i} AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS d
            FROM {prev} LEFT JOIN outdeg ON {prev}.node = outdeg.src
            WHERE outdeg.src IS NULL),
contrib{i} AS (SELECT e.dst AS node,
        CAST(sum(CAST(round(CAST(p.r AS DOUBLE)/o.od, 0) AS BIGINT)) AS BIGINT) AS s
    FROM edges e JOIN {prev} p ON e.src = p.node JOIN outdeg o ON e.src = o.src
    GROUP BY 1),
{cur} AS (SELECT n.node,
        CAST(round(0.15*%(S)d/nc.n + %(damp)r*(coalesce(c.s, 0)
             + round(CAST(d.d AS DOUBLE)/nc.n, 0)), 0) AS BIGINT) AS r
    FROM nodes n CROSS JOIN nc CROSS JOIN dang{i} d
    LEFT JOIN contrib{i} c ON n.node = c.node)
""" % {"S": S, "damp": damp}
        prev = cur
    sql += f"""
SELECT node, round(CAST(r AS DOUBLE)/{S}, 9) AS pagerank
FROM {prev} ORDER BY r DESC, node LIMIT 20
"""
    return sql


@register(
    "r_pagerank_iter3",
    _pagerank_oracle(),
    doc="Iterative PageRank (3 iterations, damping 0.85, dangling-mass "
        "redistribution) over the item-transition graph (consecutive "
        "lineitems within an order). Ranks are micro-integerized (1e-12 "
        "units) after EVERY iteration so the parallel contribution sums "
        "are exact integers — an iterative float algorithm with a "
        "hash-exact oracle. Spark plan: per iteration one edge-keyed "
        "join + one dst aggregation; dangling mass stays in-plan as a "
        "broadcast scalar (no driver collect). At 100x scale the edge "
        "join keys on src and AQE handles hub skew; rank state would "
        "localCheckpoint every few iterations like components.py.",
)
def q_pagerank(spark, sf):
    import math

    S, damp = _PR_SCALE, 0.85
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    nodes = li.select(F.col("l_partkey").alias("node")).distinct()
    a, b = li.alias("a"), li.alias("b")
    # Adjacency as a NON-EXTRACTABLE residual (b.ln - a.ln == 1 instead
    # of b.ln == a.ln + 1, r15): written as `b == a + 1` Catalyst lifts
    # the linenumber pair into the equi-join KEYS — the join then hashes
    # and compares the composite (l_orderkey, l_linenumber±1) on both
    # sides. Keyed on l_orderkey alone (the within-order fan-out is
    # bounded by orderline count, <= 7 in TPC-H) the hashed relation and
    # the shuffle key narrow to one long, and the adjacency check runs
    # as a row-local post-match filter. Rows verified identical (count +
    # value hash) at sf1; interleaved A/B median 5.4 -> 4.1 s for the
    # edge-list derivation (BroadcastHashJoin locally; the same key
    # narrowing applies to the SMJ shape a cluster-scale planner picks —
    # plan captures in plans/r15/).
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") - F.col("a.l_linenumber") == 1),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    # Loop-invariant relations: materialize once instead of re-deriving
    # the scan+self-join in every iteration's lineage (r14). An explicit
    # hash-repartition pin on each checkpoint's join key was prototyped
    # for r15 (the guide §2.4 layout-reuse shape) and REJECTED with
    # measurements: under AQE, localCheckpoint's LogicalRDD comes back
    # with UnknownPartitioning (the adaptive plan's partitioning is not
    # recorded), so every iteration re-exchanges the loop state no matter
    # how the checkpoint was laid out — the pins only added three
    # shuffles (sf1 A/B: pinned 10.1 s vs unpinned 9.45 s median, rows
    # equal). The iteration joins instead go through AQE's runtime
    # broadcast conversion (contrib and the rank state are node-sized),
    # which keeps the 6M-row edge side un-shuffled — the same effect the
    # pins were after, decided from actual sizes.
    edges = edges.localCheckpoint(eager=True)  # self-join runs exactly once
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    outdeg = outdeg.localCheckpoint(eager=True)
    edges_od = edges.join(outdeg, "src").localCheckpoint(eager=True)
    # The dangling-node SET is loop-invariant: precompute it as a boolean
    # on the node state so each iteration's dangling mass is a filter +
    # scalar agg over the node-sized checkpoint instead of a per-iteration
    # anti-join (row-equality of this rewrite was verified at sf0.1 and
    # sf1 in round 14; the integer sum is order-independent, so the
    # dangling total is bit-identical).
    nodes = (
        nodes.join(outdeg.select(F.col("src").alias("node"),
                                 F.lit(True).alias("has_out")),
                   "node", "left")
        .select("node", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one tiny count job; n is a plan constant below
    if n == 0:
        # empty graph: no nodes to rank (S/n below would divide by zero);
        # the oracle likewise yields zero rows
        return nodes.select(
            "node", F.lit(None).cast("double").alias("pagerank"))
    r0 = int(math.floor(S / n + 0.5))  # half-away round, = both engines
    r = nodes.withColumn("r", F.lit(r0).cast("long"))
    for _ in range(_PR_ITERS):
        dang = r.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("d"))
        contrib = (
            edges_od.join(r.select("node", "r"), edges_od.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.round(F.col("r").cast("double") / F.col("od"), 0)
                       .cast("long")).alias("s"))
        )
        r = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node", "has_out",
                F.round(
                    F.lit(0.15 * S / n)
                    + damp * (F.coalesce(F.col("s"), F.lit(0))
                              + F.round(F.col("d").cast("double") / n, 0)), 0
                ).cast("long").alias("r"),
            )
            # rank state is node-sized; truncating per round keeps every
            # iteration's plan flat (components.py discipline). Coarser
            # cadences were measured and rejected at sf1: checkpoint
            # every-other-iteration 9.81 s, no checkpoints 11.16 s (the
            # dang + contrib branches recompute the un-truncated state),
            # per-iteration 9.45 s median.
            .localCheckpoint(eager=True)
        )
    return r.orderBy(F.col("r").desc(), "node").limit(20).select(
        "node", F.round(F.col("r").cast("double") / S, 9).alias("pagerank"))


@register(
    "r_degree_distribution",
    """
WITH edges AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1)
SELECT d AS out_degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY d
""",
    doc="Out-degree distribution of the item-transition graph (the "
        "power-law sanity check run before any graph algorithm — "
        "r_pagerank_iter3's hub-skew advisory comes from exactly this "
        "histogram): two narrow aggregations, no joins beyond the edge "
        "build",
)
def q_degree_distribution(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
    ).select(F.col("a.l_partkey").alias("src"))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    return deg.groupBy(F.col("d").alias("out_degree")).agg(F.count("*").alias("n_nodes"))


SHARED_SQL_GROUP_BY_ALL = """
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ALL
"""


@register(
    "sql_shared_dialect_group_by_all",
    SHARED_SQL_GROUP_BY_ALL,
    doc="SQL entry point: GROUP BY ALL — the modern grouping shorthand, "
        "the LITERAL SAME string through Catalyst and DuckDB",
)
def q_sql_group_by_all(spark, sf):
    return run_sql(spark, sf, SHARED_SQL_GROUP_BY_ALL)


SHARED_SQL_LATERAL = """
SELECT n.n_name, top.ck AS top_customer, top.bal_cents
FROM nation n, LATERAL (
    SELECT c_custkey AS ck, CAST(round(c_acctbal*100,0) AS BIGINT) AS bal_cents
    FROM customer WHERE c_nationkey = n.n_nationkey
    ORDER BY bal_cents DESC, c_custkey LIMIT 1
) AS top
"""


@register(
    "sql_shared_dialect_lateral",
    SHARED_SQL_LATERAL,
    doc="SQL entry point: correlated LATERAL subquery with per-row "
        "ORDER/LIMIT (top-1-per-group as the optimizer sees it — Spark "
        "plans a lateral join, DuckDB a dependent join), identical text "
        "on both engines, deterministic tie-break",
)
def q_sql_lateral(spark, sf):
    return run_sql(spark, sf, SHARED_SQL_LATERAL)


@register(
    "r_variant_shred",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
    doc="Semi-structured shredding via the Spark 4 VARIANT type: "
        "parse_json(props) -> variant_get('$.k') typed extraction, "
        "aggregated per event type — the open-schema ingestion path "
        "(oracle: DuckDB JSON '->>')",
)
def q_variant_shred(spark, sf):
    ev = T(spark, sf, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "r_basket_lift",
    """
WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
nord AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM items),
sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY 1),
pairs AS (SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS spair
          FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1,2),
l AS (SELECT pa, pb, spair,
        round(CAST(spair AS DOUBLE)*n / (CAST(sa.s AS DOUBLE)*sb.s), 6) AS lift
      FROM pairs JOIN sup sa ON sa.pk = pa JOIN sup sb ON sb.pk = pb CROSS JOIN nord
      WHERE spair >= 3)
SELECT pa, pb, spair, lift FROM l ORDER BY lift DESC, pa, pb LIMIT 20
""",
    doc="Association-rule lift on top of r_market_basket's co-occurrence "
        "counts: P(ab)/(P(a)P(b)) over order baskets, min-support 3, "
        "top-20 with deterministic tie-break — exact integer supports, "
        "one double division at the end. Same basket-keyed self-join "
        "plan as the co-occurrence entry (pair space bounded by "
        "basket-size^2 per order).",
)
def q_basket_lift(spark, sf):
    li = T(spark, sf, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    nord = items.agg(F.countDistinct("ok").alias("n"))
    sup = items.groupBy("pk").agg(F.count("*").alias("s"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count("*").alias("spair"))
        .filter(F.col("spair") >= 3)
    )
    sa = sup.select(F.col("pk").alias("pa"), F.col("s").alias("sa"))
    sb = sup.select(F.col("pk").alias("pb"), F.col("s").alias("sb"))
    return (
        # sup is |parts|-sized: let AQE choose broadcast at small SF;
        # at 100 TB these become shuffle joins on the (tiny) filtered
        # pair set — do NOT force broadcast
        pairs.join(sa, "pa").join(sb, "pb")
        .crossJoin(F.broadcast(nord))
        .select(
            "pa", "pb", "spair",
            F.round(F.col("spair").cast("double") * F.col("n")
                    / (F.col("sa").cast("double") * F.col("sb")), 6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(20)
    )


@register(
    "r21_except_intersect_all",
    """
WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE year(o_orderdate) = 1996),
b AS (SELECT o_orderpriority AS p FROM orders WHERE year(o_orderdate) = 1997),
ea AS (SELECT p FROM a EXCEPT ALL SELECT p FROM b),
ia AS (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
SELECT 'except_all' AS op, p, CAST(count(*) AS BIGINT) AS n FROM ea GROUP BY 2
UNION ALL
SELECT 'intersect_all' AS op, p, CAST(count(*) AS BIGINT) AS n FROM ia GROUP BY 2
""",
    doc="R21 depth: EXCEPT ALL / INTERSECT ALL multiset semantics "
        "(duplicate-preserving set ops — Spark exceptAll/intersectAll), "
        "aggregated to per-value multiplicities for a stable compare",
)
def q_except_intersect_all(spark, sf):
    o = T(spark, sf, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_orderpriority").alias("p"))
    b = o.filter(F.year("o_orderdate") == 1997).select(F.col("o_orderpriority").alias("p"))
    ea = a.exceptAll(b).groupBy("p").agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "p", "n")
    ia = a.intersectAll(b).groupBy("p").agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "p", "n")
    return ea.unionByName(ia)


_DIFF_BASE = "/root/testdata/sf0.001"


@register(
    "l_dataset_diff",
    f"""
WITH v1 AS (SELECT doc_id, md5(text) AS h FROM read_parquet('{_DIFF_BASE}/documents.parquet')),
v2 AS (SELECT doc_id, md5(text) AS h FROM documents),
j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, v1.h AS h1, v2.h AS h2
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
SELECT CAST(count(CASE WHEN h1 IS NULL THEN 1 END) AS BIGINT) AS n_added,
       CAST(count(CASE WHEN h2 IS NULL THEN 1 END) AS BIGINT) AS n_removed,
       CAST(count(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL AND h1 != h2 THEN 1 END) AS BIGINT) AS n_changed,
       CAST(count(CASE WHEN h1 = h2 THEN 1 END) AS BIGINT) AS n_unchanged
FROM j
""",
    doc="Dataset-version diff audit (the CDC / release-notes shape: what "
        "changed between corpus v1 and v2): full-outer join on the key, "
        "md5 content compare, added/removed/changed/unchanged counts. "
        "v1 is pinned to the sf0.001 fixture so the entry exercises a "
        "REAL cross-version diff at every driver scale. At lake scale "
        "both sides bucket on the key and the join is shuffle-free.",
)
def q_dataset_diff(spark, sf):
    v1 = load_table(spark, _DIFF_BASE, "documents").select(
        "doc_id", F.md5("text").alias("h1"))
    v2 = T(spark, sf, "documents").select("doc_id", F.md5("text").alias("h2"))
    j = v1.join(v2, "doc_id", "full_outer")
    return j.agg(
        F.count(F.when(F.col("h1").isNull(), 1)).alias("n_added"),
        F.count(F.when(F.col("h2").isNull(), 1)).alias("n_removed"),
        F.count(F.when(F.col("h1").isNotNull() & F.col("h2").isNotNull()
                       & (F.col("h1") != F.col("h2")), 1)).alias("n_changed"),
        F.count(F.when(F.col("h1") == F.col("h2"), 1)).alias("n_unchanged"),
    )


@register(
    "r_autocorr_daily",
    """
WITH d AS (SELECT date_trunc('day', ts) AS day,
                  CAST(sum(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1),
p AS (SELECT v AS x, lead(v) OVER (ORDER BY day) AS y FROM d),
m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy
      FROM p WHERE y IS NOT NULL)
SELECT n,
       round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             / sqrt((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                    * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)), 6) AS autocorr_lag1
FROM m
""",
    doc="Lag-1 autocorrelation of the daily value series (the time-series "
        "diagnostics scalar behind seasonality/trend alarms): Pearson r "
        "on (x_t, x_{t+1}) pairs from exact integer moments in cents "
        "(cent not micro scaling keeps x*x inside BIGINT at sf0.1+)",
)
def q_autocorr_daily(spark, sf):
    ev = T(spark, sf, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("v"))
    w = Window.orderBy("day")
    p = d.select(F.col("v").alias("x"), F.lead("v").over(w).alias("y")).filter(
        F.col("y").isNotNull())
    m = p.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select("n", F.round(num / den, 6).alias("autocorr_lag1"))


# == round-10 additions: PQ-ADC ANN + BM25 lexical retrieval =============
#
# Product quantization completes the ANN family (brute / LSH / IVF /
# MIPS / PQ): memory-side compression with asymmetric-distance scan,
# hash-checkable through the same fixed-literal strategy as
# s_ann_ivf_topk. BM25 is the sparse half of a RAG retrieval stack
# (pipeline_rag_index's tf-idf is the indexing side; this is query-time
# ranking) with an order-deterministic per-term contribution sum.


def _pq_fixed_codebooks(m: int = 8, ksub: int = 16, sub_dim: int = 8,
                        seed: int = 11) -> list[list[list[float]]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    # scale roughly to the embedding component spread so codes spread too
    books = rng.standard_normal((m, ksub, sub_dim)) * 0.25
    return [[[float(x) for x in cw] for cw in book] for book in books]


_PQ_CODEBOOKS = _pq_fixed_codebooks()


def _pq_sq_l2_sql(vexpr: str, consts) -> str:
    lits = ",".join(repr(float(c)) for c in consts)
    return _pq_sq_l2_sql_expr(vexpr, f"[{lits}]::DOUBLE[]")


def _pq_sq_l2_sql_expr(vexpr: str, other: str) -> str:
    # sequential left-fold of squared diffs — bit-matches Spark's
    # F.aggregate(zip_with(...), 0.0, +) since 0.0 + x1 == x1
    return (f"list_reduce(list_transform(list_zip({vexpr}, {other}), "
            "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")


def _pq_oracle_exprs() -> tuple[str, str]:
    """(codes-projection SQL, ADC-sum SQL) over a `v`/`qv` scope —
    shared by the top-k oracle and the recall audit."""
    sub_dim = len(_PQ_CODEBOOKS[0][0])
    code_exprs, dist_exprs = [], []
    for mi, book in enumerate(_PQ_CODEBOOKS):
        lo, hi = mi * sub_dim + 1, (mi + 1) * sub_dim
        ds = ",\n          ".join(
            _pq_sq_l2_sql(f"v[{lo}:{hi}]", cw) for cw in book)
        code_exprs.append(
            f"list_indexof([{ds}], list_aggregate([{ds}], 'min')) - 1 AS code{mi}")
        cw_lits = ",".join(
            "[" + ",".join(repr(float(x)) for x in cw) + "]::DOUBLE[]"
            for cw in book)
        dist_exprs.append(_pq_sq_l2_sql_expr(
            f"qv[{lo}:{hi}]", f"list_extract([{cw_lits}], code{mi} + 1)"))
    return ",\n       ".join(code_exprs), " + ".join(f"({d})" for d in dist_exprs)


def _pq_adc_topk_oracle(k: int = 10) -> str:
    codes, adc = _pq_oracle_exprs()
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
enc AS (SELECT vec_id,
       {codes}
        FROM raw)
SELECT vec_id, round({adc}, 6) AS pq_dist
FROM enc, q
ORDER BY round({adc}, 6), vec_id
LIMIT {k}
"""


@register(
    "e_pq_adc_topk",
    _pq_adc_topk_oracle(),
    doc="R31 scale path 3: product-quantization ANN top-k via asymmetric "
        "distance — M=8 subspace codes against fixed literal codebooks "
        "(32x vector compression at scan time), query-side M x K LUT; "
        "encode argmin + ADC add chain bit-match the oracle's list_reduce "
        "folds",
)
def q_pq_adc(spark, sf):
    from .operators.similarity import pq_adc_topk

    emb = T(spark, sf, "embeddings")
    return _ann_entry(emb, 0, lambda qv: pq_adc_topk(
        emb, qv, _PQ_CODEBOOKS, k=10))


def pq_codes_dir(spark: SparkSession, sf: str) -> str:
    """Persisted PQ code columns (operators/similarity.pq_encode): one
    parquet of (vec_id, _code0.._code7 tinyint) — the 32x-compressed
    scan artifact the inline entry's docstring promises, written once
    per corpus."""
    def build(tmp: str) -> None:
        from .operators.similarity import pq_encode

        pq_encode(T(spark, sf, "embeddings"), _PQ_CODEBOOKS).write.mode(
            "overwrite").parquet(tmp)

    return _ingest_artifact_dir(sf, "embeddings", "pq-codes-v1", build)


@register(
    "e_pq_codes_topk",
    _pq_adc_topk_oracle(),
    doc="VERDICT r10 item 3 — PQ-ADC over INGEST-PERSISTED codes: the "
        "M=8 tinyint code columns are encoded once per corpus and "
        "written to parquet; the query-time plan scans ONLY the codes "
        "table (9 columns, ~M bytes/vector — the embedding array is "
        "gone by construction, plan-pinned in tests/test_plans.py) and "
        "applies the M-lookup ADC add chain into TakeOrderedAndProject. "
        "Same oracle as e_pq_adc_topk (codes are a deterministic "
        "function of the corpus), proving index-path parity; the "
        "4-second fixed Catalyst analysis cost of the inline "
        "literal-codebook encode drops out of the query path entirely.",
)
def q_pq_codes(spark, sf):
    from .operators.similarity import pq_adc_scan

    emb = T(spark, sf, "embeddings")
    codes = spark.read.parquet(pq_codes_dir(spark, sf))
    return _ann_entry(emb, 0, lambda qv: pq_adc_scan(
        codes, qv, _PQ_CODEBOOKS, k=10))


def _pq_recall_audit_oracle(k: int = 10) -> str:
    m_codes, adc = _pq_oracle_exprs()
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
enc AS (SELECT vec_id,
       {m_codes}
        FROM raw),
ann AS (SELECT vec_id FROM enc, q
        ORDER BY round({adc}, 6), vec_id LIMIT {k}),
exact AS (SELECT vec_id FROM raw, q
          ORDER BY {raw_cos} DESC, vec_id LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM ann JOIN exact USING (vec_id)) AS hits
"""


@register(
    "e_pq_recall_audit",
    _pq_recall_audit_oracle(),
    doc="R31 audit for the PQ path (the s_ann_recall_audit strategy "
        "applied to product quantization): recall@10 of the ADC top-k "
        "vs the exact cosine top-k as integer counts — fixed literal "
        "codebooks make the approximation itself deterministic, so the "
        "recall is hash-checkable, completing the audit symmetry "
        "(LSH had one; PQ now does too). The measured recall on the "
        "fixtures is LOW by construction — random untrained codebooks "
        "on isotropic embeddings — which is exactly what the audit is "
        "for: it pins the measurement machinery a real deployment "
        "points at its trained codebooks.",
)
def q_pq_recall_audit(spark, sf):
    from .operators.similarity import brute_force_topk, pq_adc_topk

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    if qv is None:
        return spark.range(1).select(
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("hits"),
        )
    ann = pq_adc_topk(emb, qv, _PQ_CODEBOOKS, k=k).select("vec_id")
    exact = brute_force_topk(emb, qv, k=k).select("vec_id")
    return (
        ann.join(exact, "vec_id")
        .agg(F.count("*").cast("long").alias("hits"))
        .select(F.lit(k).cast("long").alias("k"), "hits")
    )


_BM25_TERMS = ["hash", "join", "scan", "filter"]
_BM25_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')"


def _bm25_oracle(k: int = 20, query_terms: list[str] | None = None) -> str:
    qterms = _BM25_TERMS if query_terms is None else query_terms
    terms = ", ".join(f"'{t}'" for t in qterms)
    csum = " + ".join(
        f"coalesce(c{i}, 0.0)" for i in range(len(qterms)))
    filters = ",\n         ".join(
        f"sum(c) FILTER (WHERE term = '{t}') AS c{i}"
        for i, t in enumerate(qterms))
    return f"""
WITH toks AS (
  SELECT doc_id, len({_BM25_TOKS}) AS dl,
         unnest({_BM25_TOKS}) AS term
  FROM documents),
hits AS (SELECT doc_id, dl, term FROM toks WHERE term IN ({terms})),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM hits GROUP BY 1, 2, 3),
dfq AS (SELECT term, count(*) AS dfreq
        FROM (SELECT DISTINCT doc_id, term FROM hits) GROUP BY 1),
stats AS (SELECT count(*) AS n,
                 CAST(sum(len({_BM25_TOKS})) AS BIGINT) AS tot
          FROM documents),
c AS (
  SELECT tf.doc_id, tf.term,
         ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
         * (tf * 2.2)
         / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(tot AS DOUBLE) / n))) AS c
  FROM tf JOIN dfq USING (term) CROSS JOIN stats),
by_doc AS (
  SELECT doc_id,
         {filters}
  FROM c GROUP BY 1)
SELECT doc_id, round({csum}, 6) AS bm25
FROM by_doc
ORDER BY round({csum}, 6) DESC, doc_id
LIMIT {k}
"""


@register(
    "t_bm25_search",
    _bm25_oracle(),
    doc="Lexical retrieval: BM25 top-20 for a literal 4-term query "
        "(Lucene-form idf, k1=1.2, b=0.75). Term filter BEFORE any "
        "shuffle (postings-proportional, not corpus-proportional), doc "
        "length carried through the explode (no doc-length join), df "
        "broadcast, per-term contributions summed in fixed query order "
        "for an order-deterministic float — the sparse complement to "
        "the dense ANN family in a RAG stack",
)
def q_bm25(spark, sf):
    from .operators.text import bm25_topk

    return bm25_topk(T(spark, sf, "documents"), _BM25_TERMS, k=20)


_BM25_IDX_TERMS = ["stream", "window", "merge", "sort"]


def _ingest_artifact_dir(sf: str, table: str, tag: str, build) -> str:
    """Build-once cache of INGEST-SIDE parquet artifacts (BM25 postings,
    PQ code columns) for a testdata directory — the stand-in for the
    ingest pipeline that would maintain these as rows land. Keyed by
    the source file's identity (path, mtime, size) plus an artifact tag
    so a regenerated fixture or a changed recipe rebuilds; ``build``
    writes into a tmp dir which is atomically renamed, so concurrent
    callers never read a partial artifact."""
    import hashlib
    import os
    import shutil

    src = os.path.join(sf, f"{table}.parquet")
    st = os.stat(src)
    key = hashlib.sha1(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:{tag}".encode()
    ).hexdigest()[:16]
    d = os.path.join("/tmp/pbs-ingest-artifacts", key)
    if not os.path.isdir(d):
        import uuid

        # uuid, not pid: two sessions in ONE process (threaded test
        # runners) must not share a half-written build dir
        tmp = f"{d}.build-{uuid.uuid4().hex[:12]}"
        build(tmp)
        try:
            os.rename(tmp, d)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent builder won
    return d


# -- topic-dir index builds, routed through the lifecycle contract -------
# VERDICT r12 task 3: `_ingest_artifact_dir` keys on a FIXTURE file's
# (path, mtime, size) — right for the immutable testdata parquet, but it
# bypasses model/artifacts.py, so the "compaction => accept WITHOUT
# rebuild" contract never guarded a real query path. These variants
# build the SAME artifacts the registry entries query (same operators,
# same layout under the artifact dir) from a LIVING TopicDirStore topic
# directory, with staleness decided by ensure_artifact/artifact_staleness:
# append -> stale -> rebuild; compact() -> compacted -> served as-is.
# Golden-tested end-to-end in tests/test_artifact_lifecycle.py (compact
# does NOT rebuild and the indexed query stays hash-equal; append does).


def topic_docs_frame(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Exact-once documents view of a living topic: payloads as text,
    message ids as doc ids. Reads `model/artifacts.topic_live_files`
    — the whole-scan authority rule (present compaction outputs replace
    their transitive sources; lingering sources are duplicates)."""
    from .model.artifacts import topic_live_files

    import os

    files = [os.path.join(topic_dir, f) for f in topic_live_files(topic_dir)]
    if not files:
        # loud, not an opaque reader error: a never-appended topic has
        # nothing to index (round-13 self-probe)
        raise ValueError(f"topic dir {topic_dir} has no parquet to index")
    return spark.read.parquet(*files).select(
        F.col("message_id").alias("doc_id"),
        F.col("payload").cast("string").alias("text"))


def topic_emb_frame(spark: SparkSession, topic_dir: str) -> DataFrame:
    """Exact-once embeddings view of a living topic: JSON payloads
    ``{"vec_id": n, "embedding": [...]}`` shredded to the (vec_id,
    embedding) shape every vector-index trainer consumes."""
    from .model.artifacts import topic_live_files

    import os

    files = [os.path.join(topic_dir, f) for f in topic_live_files(topic_dir)]
    if not files:
        raise ValueError(f"topic dir {topic_dir} has no parquet to index")
    return (spark.read.parquet(*files)
            .select(F.from_json(
                F.col("payload").cast("string"),
                "vec_id long, embedding array<double>").alias("j"))
            .select("j.vec_id", "j.embedding"))


def ensure_topic_bm25_index(spark: SparkSession, topic_dir: str,
                            artifact_dir: str) -> tuple[str, str]:
    """BM25 postings/dictionary/stats built from a living topic, served
    through the lifecycle contract; returns ``(artifact_dir, verdict)``
    where verdict is the PRE-build staleness classification ('fresh' |
    'compacted' | 'stale'). Renamed from topic_bm25_index_dir (ADVICE
    r13): the *_dir name/str annotation suggested a path return while
    the value was the verdict — siblings bm25_index_dir/
    ivfpq_artifacts_dir DO return paths, so a caller pattern-matching
    them would have fed 'stale' to spark.read.parquet."""
    import os

    from .model.artifacts import ensure_artifact

    def rebuild(adir: str) -> None:
        from .operators.text import bm25_build_index

        postings, dictionary, stats = bm25_build_index(
            topic_docs_frame(spark, topic_dir))
        postings.write.mode("overwrite").parquet(os.path.join(adir, "postings"))
        dictionary.write.mode("overwrite").parquet(
            os.path.join(adir, "dictionary"))
        stats.write.mode("overwrite").parquet(os.path.join(adir, "stats"))

    verdict = ensure_artifact(topic_dir, artifact_dir, rebuild,
                              recipe="bm25-v1")
    return artifact_dir, verdict


def ensure_topic_pq_codes(spark: SparkSession, topic_dir: str,
                          artifact_dir: str, codebooks) -> tuple[str, str]:
    """PQ code columns from a living topic under FIXED float codebooks
    (operators/similarity.pq_encode); the recipe digests the codebooks
    so a changed table misses, exactly like the fixture tag discipline.
    Returns ``(artifact_dir, verdict)``. The digest serializes the
    codebooks as json over plain int/float lists (ADVICE r13):
    ``repr`` of a large numpy array elides values with '...', so two
    different big codebooks could collide and a stale artifact would
    classify fresh."""
    import hashlib
    import json
    import os

    from .model.artifacts import ensure_artifact

    def rebuild(adir: str) -> None:
        from .operators.similarity import pq_encode

        pq_encode(topic_emb_frame(spark, topic_dir), codebooks) \
            .write.mode("overwrite").parquet(os.path.join(adir, "codes"))

    canon = json.dumps(
        [[[float(x) for x in centroid] for centroid in book]
         for book in codebooks])
    recipe = ("pq-codes-v2-"
              + hashlib.sha1(canon.encode()).hexdigest()[:12])
    verdict = ensure_artifact(topic_dir, artifact_dir, rebuild, recipe=recipe)
    return artifact_dir, verdict


def ensure_topic_ivf_cells(spark: SparkSession, topic_dir: str,
                           artifact_dir: str, *, n_cells: int, iters: int,
                           dim: int, scale: int,
                           offset: float) -> tuple[str, str]:
    """Trained IVF cells/ + centroids/ from a living topic, lifecycle-
    routed; recipe encodes every training hyperparameter. Returns
    ``(artifact_dir, verdict)``."""
    import os

    from .model.artifacts import ensure_artifact

    def rebuild(adir: str) -> None:
        from .operators.clustering import ivf_assign_cells

        cells, cents = ivf_assign_cells(
            topic_emb_frame(spark, topic_dir), n_cells=n_cells,
            iters=iters, dim=dim, scale=scale, offset=offset)
        cells.write.mode("overwrite").parquet(os.path.join(adir, "cells"))
        spark.createDataFrame(
            [(j, [int(x) for x in c]) for j, c in enumerate(cents)],
            "cell long, v array<long>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(adir, "centroids"))

    recipe = f"ivf-cells-v1-k{n_cells}-i{iters}-d{dim}-s{scale}-o{offset}"
    verdict = ensure_artifact(topic_dir, artifact_dir, rebuild, recipe=recipe)
    return artifact_dir, verdict


def ensure_topic_ivfpq_artifacts(spark: SparkSession, topic_dir: str,
                                 artifact_dir: str, *, n_cells: int, m: int,
                                 ksub: int, iters: int, sample_cap: int,
                                 dim: int, scale: int,
                                 offset: float) -> tuple[str, str]:
    """Composite IVFPQ codes/ + centroids/ + books/ from a living
    topic, lifecycle-routed; recipe encodes every hyperparameter.
    Returns ``(artifact_dir, verdict)``."""
    import os

    from .model.artifacts import ensure_artifact

    def rebuild(adir: str) -> None:
        from .operators.clustering import ivfpq_build_artifacts

        codes, cents, books = ivfpq_build_artifacts(
            topic_emb_frame(spark, topic_dir), n_cells=n_cells, m=m,
            ksub=ksub, iters=iters, sample_cap=sample_cap, dim=dim,
            scale=scale, offset=offset)
        codes.write.mode("overwrite").parquet(os.path.join(adir, "codes"))
        spark.createDataFrame(
            [(j, [int(x) for x in c]) for j, c in enumerate(cents)],
            "cell long, v array<long>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(adir, "centroids"))
        spark.createDataFrame(
            [(mi, ci, [int(x) for x in cw])
             for mi, book in enumerate(books) for ci, cw in enumerate(book)],
            "mi long, code long, v array<long>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(adir, "books"))

    recipe = (f"ivfpq-v1-c{n_cells}-m{m}-k{ksub}-i{iters}-cap{sample_cap}"
              f"-d{dim}-s{scale}-o{offset}")
    verdict = ensure_artifact(topic_dir, artifact_dir, rebuild, recipe=recipe)
    return artifact_dir, verdict


def bm25_index_dir(spark: SparkSession, sf: str) -> str:
    """Persisted BM25 index artifacts (operators/text.bm25_build_index):
    postings/, dictionary/, stats/ parquet under one cached dir."""
    import os

    def build(tmp: str) -> None:
        from .operators.text import bm25_build_index

        postings, dictionary, stats = bm25_build_index(T(spark, sf, "documents"))
        postings.write.mode("overwrite").parquet(os.path.join(tmp, "postings"))
        dictionary.write.mode("overwrite").parquet(os.path.join(tmp, "dictionary"))
        stats.write.mode("overwrite").parquet(os.path.join(tmp, "stats"))

    return _ingest_artifact_dir(sf, "documents", "bm25-v1", build)


@register(
    "t_bm25_indexed",
    _bm25_oracle(query_terms=_BM25_IDX_TERMS),
    doc="VERDICT r10 item 2 — BM25 over INGEST-PERSISTED artifacts: the "
        "corpus is tokenized exactly once into parquet postings "
        "(term, doc_id, tf, dl), a dictionary (term, dfreq) and a one-"
        "row stats table; the query-time plan reads ONLY those — the "
        "term filter lands in the postings scan's PushedFilters, the "
        "documents table (and its text column) never appears "
        "(plan-pinned in tests/test_plans.py). Scoring is term-for-term "
        "identical to t_bm25_search, so the oracle recomputes from the "
        "raw corpus and must hash-match — proving index-path parity.",
)
def q_bm25_indexed(spark, sf):
    import os

    from .operators.text import bm25_topk_indexed

    d = bm25_index_dir(spark, sf)
    return bm25_topk_indexed(
        spark.read.parquet(os.path.join(d, "postings")),
        spark.read.parquet(os.path.join(d, "dictionary")),
        spark.read.parquet(os.path.join(d, "stats")),
        _BM25_IDX_TERMS, k=20,
    )


@register(
    "t_bm25_index_merge",
    _bm25_oracle(),
    doc="Incremental BM25 index maintenance: build artifacts over the "
        "even-doc_id half of the corpus, FOLD the odd half in via "
        "bm25_merge_index (postings append, dictionary re-sum, stats "
        "add — only the new batch is tokenized), then score the query. "
        "The oracle scores the FULL corpus from raw text, so a "
        "hash-match proves merged-index == full-rebuild bit-for-bit — "
        "the maintenance story that makes the persisted index honest "
        "at 100 TB (same terms/k as t_bm25_search by construction).",
)
def q_bm25_index_merge(spark, sf):
    from .operators.text import bm25_build_index, bm25_merge_index, bm25_topk_indexed

    docs = T(spark, sf, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    p1, d1, s1 = bm25_build_index(old)
    p2, d2, s2 = bm25_merge_index(p1, d1, s1, new)
    return bm25_topk_indexed(p2, d2, s2, _BM25_TERMS, k=20)


def _hybrid_rrf_oracle(k: int = 10, topn: int = 20, c: int = 60) -> str:
    return f"""
WITH sparse AS ({_bm25_oracle(k=topn)}),
s AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS sr
      FROM sparse),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
cvec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
cs AS (SELECT vec_id,
              list_reduce(list_transform(list_zip(cvec.v, q.qv), x -> x[1] * x[2]), (x, y) -> x + y)
              / (sqrt(list_reduce(list_transform(cvec.v, x -> x * x), (x, y) -> x + y))
                 * sqrt(list_reduce(list_transform(q.qv, x -> x * x), (x, y) -> x + y))) AS c
       FROM cvec, q
       ORDER BY c DESC, vec_id LIMIT {topn}),
dn AS (SELECT vec_id AS doc_id,
              CAST(row_number() OVER (ORDER BY round(c, 6) DESC, vec_id) AS INT) AS dr
       FROM cs),
f AS (SELECT coalesce(s.doc_id, dn.doc_id) AS doc_id, sr, dr
      FROM s FULL OUTER JOIN dn ON s.doc_id = dn.doc_id)
SELECT doc_id,
       CAST(coalesce(sr, 0) AS INT) AS sparse_rank,
       CAST(coalesce(dr, 0) AS INT) AS dense_rank,
       round(coalesce(1.0/({c} + sr), 0) + coalesce(1.0/({c} + dr), 0), 6) AS rrf
FROM f
ORDER BY round(coalesce(1.0/({c} + sr), 0) + coalesce(1.0/({c} + dr), 0), 6) DESC, doc_id
LIMIT {k}
"""


def _rrf_fuse(sparse: DataFrame, dense: DataFrame, k: int = 10,
              c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of a (doc_id, bm25) sparse top-N and a
    (vec_id, cosine) dense top-N: two rank windows over LIMIT-bounded
    inputs (allowlisted), a full-outer join of two N-row frames, rank
    reciprocals summed in fixed system order so the float is
    order-deterministic and hash-exact. Shared by the inline and
    artifact-backed hybrid entries — the fusion is identical; only
    where the legs COME FROM differs."""
    s = sparse.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
        ).cast("int").alias("sr"))
    dn = dense.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(
            Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
        ).cast("int").alias("dr"))
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.col("sr") + c), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.col("dr") + c), F.lit(0.0)), 6)
    return (
        s.join(dn, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("sr", F.lit(0)).cast("int").alias("sparse_rank"),
            F.coalesce("dr", F.lit(0)).cast("int").alias("dense_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(k)
    )



@register(
    "t_hybrid_rrf",
    _hybrid_rrf_oracle(),
    doc="Hybrid retrieval: reciprocal-rank fusion (c=60) of the BM25 "
        "sparse top-20 and the brute-cosine dense top-20 for the "
        "anchored query — the standard RAG fusion step joining the two "
        "retrieval families this repo already verifies separately. "
        "Both rank windows run over LIMIT-20 inputs (bounded by "
        "construction, allowlisted); the fuse is a full-outer join of "
        "two 20-row frames; rank reciprocals sum in fixed system order "
        "so the float is order-deterministic and hash-exact.",
)
def q_hybrid_rrf(spark, sf):
    from .operators.similarity import brute_force_topk
    from .operators.text import bm25_topk

    docs = T(spark, sf, "documents")
    emb = T(spark, sf, "embeddings")
    sparse = bm25_topk(docs, _BM25_TERMS, k=20)
    qv = _query_vec(emb, 0)
    dense = brute_force_topk(emb, qv if qv is not None else [0.0], k=20)
    if qv is None:  # guarded like _ann_entry: dense side collapses empty
        dense = dense.where(F.lit(False))
    return _rrf_fuse(sparse, dense, k=10, c=60)


# == round-11 additions: BPE token accounting ============================


def _bpe_string_sql(word: str) -> str:
    """DuckDB mirror of the bracket-delimited rank sweep: the reduced
    ``[tok][tok]...`` string after the full literal merge chain (both
    engines' replace() is left-to-right non-overlapping, and the
    bracket delimiting makes adjacent matches character-disjoint, so
    the sweeps agree exactly)."""
    s = f"regexp_replace({word}, '(.)', '[\\1]', 'g')"
    for a, b in BPE_MERGES:
        s = f"replace({s}, '[{a}][{b}]', '[{a}{b}]')"
    return s


def _bpe_count_sql(word: str) -> str:
    """Per-word subword count: '[' delimiters of the reduced string."""
    s = _bpe_string_sql(word)
    return f"length({s}) - length(replace({s}, '[', ''))"


_BPE_WORDS_SQL = "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')"


@register(
    "t_bpe_token_count",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                         x -> x != '') AS wtoks,
             {_BPE_WORDS_SQL} AS words
      FROM documents)
    SELECT doc_id,
           CAST(len(wtoks) AS BIGINT) AS n_ws_tokens,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(words,
                w -> {_bpe_count_sql('w')})), 0) AS BIGINT) AS n_bpe_tokens
    FROM t
    """,
    doc="VERDICT r10 item 4 — real-tokenizer token accounting: per-doc "
        "greedy-BPE subword counts under a literal rank-ordered merge "
        "table, next to the whitespace and alnum-word counts the budget "
        "operators used before. Pure JVM built-ins (regexp + literal "
        "replace chain inside transform/aggregate lambdas): codegen, "
        "zero shuffles, no Python; the oracle replays the identical "
        "merge chain in DuckDB, so the counts are hash-exact.",
)
def q_bpe_count(spark, sf):
    return bpe_token_stats(T(spark, sf, "documents"))


@register(
    "p_sequence_packing_bpe",
    f"""
    WITH t AS (
      SELECT doc_id,
             greatest(1, CAST(coalesce(list_sum(list_transform({_BPE_WORDS_SQL},
                w -> {_bpe_count_sql('w')})), 0) AS BIGINT)) AS toks,
             {stable_bucket_sql("doc_id", 8)} AS shard,
             {stable_bucket_sql("doc_id", 1 << 60)} AS ord
      FROM documents),
    p AS (
      SELECT shard, toks,
             sum(toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                             ROWS UNBOUNDED PRECEDING) - toks AS start_offset
      FROM t)
    SELECT shard, CAST(floor(start_offset/2048.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS pack_tokens
    FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id
    """,
    doc="VERDICT r10 item 4 wiring — p_sequence_packing with REAL "
        "subword budgets: the greedy-BPE count feeds sequence_pack's "
        "tokens_col in place of the chars/4 heuristic. Same shard-"
        "parallel cumulative-sum layout (one shuffle); the token "
        "counting itself adds zero exchanges, so the plan shape is "
        "identical to the heuristic entry — budgets just stop lying.",
)
def q_packing_bpe(spark, sf):
    d = T(spark, sf, "documents").withColumn(
        "toks", F.greatest(F.lit(1).cast("long"), bpe_token_count("text"))
    )
    packed = sequence_pack(d, "doc_id", "toks", context_len=2048, n_shards=8)
    return (
        packed.groupBy("shard", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("pack_tokens"))
        .orderBy("shard", "pack_id")
    )


@register(
    "t_bpe_top_subwords",
    f"""
    WITH w AS (SELECT unnest({_BPE_WORDS_SQL}) AS w FROM documents),
    s AS (SELECT {_bpe_string_sql('w')} AS s FROM w),
    t AS (SELECT unnest(regexp_split_to_array(trim(s, '[]'), '\\]\\[')) AS token
          FROM s)
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    doc="Subword-vocabulary audit: the top-20 BPE tokens by corpus "
        "frequency under the literal merge table — what a tokenizer's "
        "vocab actually absorbs on THIS corpus (the subword counterpart "
        "of t_vocab_coverage; in a training pipeline this is how you "
        "check a candidate merge table against your data before "
        "committing to it). Same bracket-delimited rank sweep as "
        "t_bpe_token_count but returning the TOKENS: strip outer "
        "brackets, split on ][. Pure codegen explode + one count "
        "shuffle + TakeOrderedAndProject; the oracle replays the sweep "
        "and the split verbatim.",
)
def q_bpe_top_subwords(spark, sf):
    from .operators.text import bpe_top_subwords

    return bpe_top_subwords(T(spark, sf, "documents"), k=20)


_BPE_1K = gen_bpe_merges(1024)


def _bpe_1k_oracle() -> str:
    """The merge table as DATA on the oracle side too: DuckDB 1.0 has no
    3-arg list_reduce, so the string accumulator rides inside the
    element type — elements are VARCHAR[2], the initial element wraps
    the bracketized word, each step rewrites slot 1. One literal list
    of 1024 pairs (linear parse).

    VERDICT r12 task 1: the sweep runs at VOCAB-rate, not corpus-rate —
    aggregate to DISTINCT words first (materialized CTE, evaluated
    once), run the 1024-rank fold once per distinct word, then join the
    per-word subword count back to the occurrences and sum per doc.
    This is the oracle-side mirror of the Arrow kernel's per-batch
    distinct-word cache, and it deletes the doc_id%10 corpus slice the
    old corpus-rate form needed (124 s full-corpus then; ~31 distinct
    words on this corpus now). Docs with zero words survive via the
    LEFT JOIN + coalesce."""
    ml = "[" + ",".join(f"['{a}','{b}']" for a, b in _BPE_1K) + "]"
    reduced = (
        "list_reduce(list_prepend([regexp_replace(w, '(.)', '[\\1]', 'g'), ''], "
        + ml
        + "), (acc, mm) -> [replace(acc[1], '[' || mm[1] || '][' || mm[2] || "
          "']', '[' || mm[1] || mm[2] || ']'), ''])[1]")
    return f"""
WITH t AS (
  SELECT doc_id,
         {_BPE_WORDS_SQL} AS words
  FROM documents),
occ AS (SELECT doc_id, unnest(words) AS w FROM t),
enc AS MATERIALIZED (
  SELECT w, length(s) - length(replace(s, '[', '')) AS n_sub
  FROM (SELECT w, {reduced} AS s
        FROM (SELECT DISTINCT w FROM occ))),
agg AS (SELECT o.doc_id, CAST(sum(e.n_sub) AS BIGINT) AS n_bpe
        FROM occ o JOIN enc e USING (w) GROUP BY o.doc_id)
SELECT t.doc_id,
       CAST(len(t.words) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
FROM t LEFT JOIN agg a USING (doc_id)
"""


@register(
    "t_bpe_token_count_1k",
    _bpe_1k_oracle(),
    doc="VERDICT r11 item 4 — BPE accounting at REALISTIC merge-table "
        "scale (1024 ranks; t_bpe_token_count's 24-rank literal chain "
        "is one expression node per rank, which StackOverflows driver-"
        "side conversion at ~512 ranks — measured, bound pinned as "
        "BPE_NESTED_MAX_RANKS with a loud raise). Past the bound the "
        "merge table becomes DATA: one literal array<array<string>> "
        "folded per word (bpe_token_count_hof — O(1) plan nodes, any "
        "rank count, exact oracle mirror via DuckDB's accumulator-in-"
        "element list_reduce trick), executed here by the Arrow-batched "
        "twin (bpe_token_count_arrow: C-level rank sweep + per-batch "
        "distinct-word cache, bit-equality gated against the HOF form). "
        "FULL corpus (r12 task 1): the oracle now pays vocab-rate too "
        "(distinct-word sweep + count join-back), so the doc_id%10 "
        "slice that bounded its interpreter cost is gone.",
)
def q_bpe_count_1k(spark, sf):
    from .operators.text import bpe_token_count_arrow

    docs = T(spark, sf, "documents")
    n_words = F.size(F.regexp_extract_all(
        F.lower(F.coalesce(F.col("text"), F.lit(""))),
        F.lit("[a-z0-9]+"), F.lit(0)))
    return docs.select(
        F.col("doc_id"),
        n_words.cast("long").alias("n_words"),
        bpe_token_count_arrow("text", _BPE_1K).alias("n_bpe_tokens"),
    )


# == round-13: BPE merge-table TRAINING (VERDICT r12 task 2) ==============
# The token family's training half, completing for tokens what rounds
# 11-12 completed for vectors (fixed table -> LEARNED table -> composed
# apply). Most-frequent-adjacent-pair merge learning (Sennrich 2016) is
# oracle-replayable by the k-means discipline: occurrence-weighted pair
# counts are exact integers, the argmax tie-break is total (count DESC,
# then lexicographic pair — binary collation over [a-z0-9]+ on both
# engines), and each iteration's merge-apply is the same left-to-right
# non-overlapping bracket replace the encoder uses — so DuckDB unrolls
# the identical chain as CTEs, one (pair-count, argmax, apply) triple
# per rank.

_BPE_TRAIN_RANKS = 12


def _bpe_train_ctes(ranks: int) -> list[str]:
    """Unrolled training chain: ``w0`` distinct-word counts (the ONE
    corpus-rate step, mirroring the trainer's localCheckpointed
    wordcount), ``s0`` bracketized words, then per rank i: ``p{i}``
    adjacent-pair occurrences (lateral generate_series over the symbol
    array — counts OVERLAPPING adjacencies, same as the Spark side's
    zip_with of shifted slices), ``m{i}`` the argmax pair
    (MATERIALIZED: it is referenced three times by s{i}; DuckDB
    re-inlines plain CTEs per reference), ``s{i}`` the merge applied."""
    parts = [f"""
w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({_BPE_WORDS_SQL}) AS w FROM documents)
  GROUP BY w),
s0 AS (SELECT w, regexp_replace(w, '(.)', '[\\1]', 'g') AS s, n FROM w0)"""]
    for i in range(1, ranks + 1):
        parts.append(f"""
p{i} AS (SELECT syms[gi] AS a, syms[gi+1] AS b, n
  FROM (SELECT regexp_split_to_array(trim(s, '[]'), '\\]\\[') AS syms, n
        FROM s{i - 1}),
       unnest(generate_series(1, len(syms) - 1)) AS g(gi)),
m{i} AS MATERIALIZED (SELECT a, b, CAST(sum(n) AS BIGINT) AS cnt
  FROM p{i} GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
s{i} AS (SELECT w, replace(s,
           '[' || (SELECT a FROM m{i}) || '][' || (SELECT b FROM m{i}) || ']',
           '[' || (SELECT a || b FROM m{i}) || ']') AS s, n FROM s{i - 1})""")
    return parts


def _bpe_train_merges_oracle() -> str:
    ctes = ",".join(_bpe_train_ctes(_BPE_TRAIN_RANKS))
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, a, b, cnt AS pair_n "
        f"FROM m{i}"
        for i in range(1, _BPE_TRAIN_RANKS + 1))
    return (f"WITH {ctes} SELECT merge_rank, a, b, pair_n FROM ({union}) "
            "ORDER BY merge_rank")


def _bpe_train_apply_oracle() -> str:
    ctes = _bpe_train_ctes(_BPE_TRAIN_RANKS)
    union = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, a, b FROM m{i}"
        for i in range(1, _BPE_TRAIN_RANKS + 1))
    reduced = (
        "list_reduce(list_prepend([s, ''], (SELECT ml FROM ml)), "
        "(acc, mm) -> [replace(acc[1], '[' || mm[1] || '][' || mm[2] || "
        "']', '[' || mm[1] || mm[2] || ']'), ''])[1]")
    ctes.append(f"""
ml AS MATERIALIZED (SELECT list([a, b] ORDER BY merge_rank) AS ml
  FROM ({union}))""")
    ctes.append(f"""
enc AS MATERIALIZED (
  SELECT w, length(r) - length(replace(r, '[', '')) AS n_sub
  FROM (SELECT w, {reduced} AS r FROM s0))""")
    ctes.append(f"""
t AS (SELECT doc_id, {_BPE_WORDS_SQL} AS words FROM documents),
occ AS (SELECT doc_id, unnest(words) AS w FROM t),
agg AS (SELECT o.doc_id, CAST(sum(e.n_sub) AS BIGINT) AS n_bpe
        FROM occ o JOIN enc e USING (w) GROUP BY o.doc_id)""")
    return ("WITH " + ",".join(ctes) + """
SELECT t.doc_id,
       CAST(len(t.words) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
FROM t LEFT JOIN agg a USING (doc_id)
""")


@register(
    "t_bpe_train_merges",
    _bpe_train_merges_oracle(),
    doc="VERDICT r12 task 2 — BPE merge-table TRAINING, oracle-replayed "
        "(operators/text.bpe_train_merges): 12 iterations of most-"
        "frequent-adjacent-pair learning over the corpus's occurrence-"
        "weighted distinct words. Spark pays corpus-rate ONCE (the "
        "wordcount shuffle, then localCheckpoint); every iteration is a "
        "vocab-rate pair count (zip_with of shifted symbol slices + one "
        "small agg) and a 1-row argmax collect — kmeans_fit's bounded-"
        "collect loop applied to tokens. Matches a pure-Python Sennrich "
        "reference exactly (tests/test_operators.py); the oracle "
        "unrolls the identical integer chain, one CTE triple per rank, "
        "so the learned table is hash-verified end to end.",
)
def q_bpe_train_merges(spark, sf):
    from .operators.text import bpe_train_merges

    learned = bpe_train_merges(T(spark, sf, "documents"), _BPE_TRAIN_RANKS)
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(learned)],
        "merge_rank long, a string, b string, pair_n long")


@register(
    "t_bpe_train_apply",
    _bpe_train_apply_oracle(),
    doc="Composed train->encode entry: the table LEARNED by "
        "t_bpe_train_merges feeds bpe_token_count as its merge list "
        "(the k-means assign-under-trained-centroids shape for tokens). "
        "Spark trains via the bounded-collect loop then counts with the "
        "learned literal chain (12 ranks — codegen nested replaces, "
        "zero shuffles on the count side); the oracle unrolls training "
        "AND applies the learned list vocab-rate (distinct-word sweep + "
        "count join-back, the r12-task-1 shape).",
)
def q_bpe_train_apply(spark, sf):
    from .operators.text import bpe_token_count, bpe_train_merges

    docs = T(spark, sf, "documents")
    learned = tuple(
        (a, b) for a, b, _ in bpe_train_merges(docs, _BPE_TRAIN_RANKS))
    n_words = F.size(F.regexp_extract_all(
        F.lower(F.coalesce(F.col("text"), F.lit(""))),
        F.lit("[a-z0-9]+"), F.lit(0)))
    return docs.select(
        F.col("doc_id"),
        n_words.cast("long").alias("n_words"),
        bpe_token_count("text", learned).alias("n_bpe_tokens"))


def bpe_merges_dir(spark: SparkSession, sf: str) -> str:
    """Persisted LEARNED merge table (train once per corpus, cached by
    source identity like every index artifact): one tiny parquet of
    (merge_rank, a, b, pair_n) rows — the tokenizer artifact a real
    pipeline ships, produced by the same bounded-collect trainer the
    inline entries run."""
    def build(tmp: str) -> None:
        from .operators.text import bpe_train_merges

        learned = bpe_train_merges(T(spark, sf, "documents"),
                                   _BPE_TRAIN_RANKS)
        spark.createDataFrame(
            [(i + 1, a, b, n) for i, (a, b, n) in enumerate(learned)],
            "merge_rank long, a string, b string, pair_n long",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)

    return _ingest_artifact_dir(
        sf, "documents", f"bpe-merges-v1-r{_BPE_TRAIN_RANKS}", build)


@register(
    "t_bpe_learned_apply",
    _bpe_train_apply_oracle(),
    doc="The persisted twin of t_bpe_train_apply, completing for tokens "
        "the train-once/persist/query-flat arc every vector family has "
        "(e_ivfpq_topk vs e_ivfpq_codes_topk): the merge table is "
        "LEARNED once per corpus and persisted (bpe_merges_dir), and "
        "the query path collects the 12-row artifact and runs ONLY the "
        "codegen encode scan — no training jobs. Shares "
        "t_bpe_train_apply's oracle (the learned table is a "
        "deterministic function of the corpus), proving tokenizer-"
        "artifact parity the same way the persisted index entries do.",
)
def q_bpe_learned_apply(spark, sf):
    from .operators.text import bpe_token_count

    d = bpe_merges_dir(spark, sf)
    rows = _read_tiny_parquet(d, ["merge_rank"])
    learned = tuple((r["a"], r["b"]) for r in rows)
    docs = T(spark, sf, "documents")
    n_words = F.size(F.regexp_extract_all(
        F.lower(F.coalesce(F.col("text"), F.lit(""))),
        F.lit("[a-z0-9]+"), F.lit(0)))
    return docs.select(
        F.col("doc_id"),
        n_words.cast("long").alias("n_words"),
        bpe_token_count("text", learned).alias("n_bpe_tokens"))


def _packing_learned_bpe_oracle() -> str:
    """Composed train -> persist -> tokenize -> pack oracle: the
    unrolled training chain (shared CTE prefix, _bpe_train_ctes) yields
    the learned merge list, per-word subword counts under it encode the
    corpus at vocab rate, and the per-doc budgets feed the same shard-
    parallel cumulative-sum packing SQL as p_sequence_packing_bpe."""
    ctes = _bpe_train_ctes(_BPE_TRAIN_RANKS)
    union = " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, a, b FROM m{i}"
        for i in range(1, _BPE_TRAIN_RANKS + 1))
    reduced = (
        "list_reduce(list_prepend([s, ''], (SELECT ml FROM ml)), "
        "(acc, mm) -> [replace(acc[1], '[' || mm[1] || '][' || mm[2] || "
        "']', '[' || mm[1] || mm[2] || ']'), ''])[1]")
    ctes.append(f"""
ml AS MATERIALIZED (SELECT list([a, b] ORDER BY merge_rank) AS ml
  FROM ({union}))""")
    ctes.append(f"""
enc AS MATERIALIZED (
  SELECT w, length(r) - length(replace(r, '[', '')) AS n_sub
  FROM (SELECT w, {reduced} AS r FROM s0))""")
    ctes.append(f"""
t AS (SELECT doc_id, {_BPE_WORDS_SQL} AS words FROM documents),
occ AS (SELECT doc_id, unnest(words) AS w FROM t),
agg AS (SELECT o.doc_id, CAST(sum(e.n_sub) AS BIGINT) AS n_bpe
        FROM occ o JOIN enc e USING (w) GROUP BY o.doc_id),
tt AS (SELECT t.doc_id,
              greatest(1, CAST(coalesce(a.n_bpe, 0) AS BIGINT)) AS toks,
              {stable_bucket_sql("t.doc_id", 8)} AS shard,
              {stable_bucket_sql("t.doc_id", 1 << 60)} AS ord
       FROM t LEFT JOIN agg a USING (doc_id)),
pp AS (SELECT shard, toks,
              sum(toks) OVER (PARTITION BY shard ORDER BY ord, doc_id
                              ROWS UNBOUNDED PRECEDING) - toks AS start_offset
       FROM tt)""")
    return ("WITH " + ",".join(ctes) + """
SELECT shard, CAST(floor(start_offset/2048.0) AS BIGINT) AS pack_id,
       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS pack_tokens
FROM pp GROUP BY shard, pack_id ORDER BY shard, pack_id""")


@register(
    "p_packing_learned_bpe",
    _packing_learned_bpe_oracle(),
    doc="VERDICT r13 task 3 — the token pipeline composed END TO END: "
        "merges TRAINED once per corpus and persisted (bpe_merges_dir, "
        "the tokenizer artifact a real pipeline ships), the query path "
        "collects the 12-row table and tokenizes with the learned "
        "codegen chain, and the real subword budgets feed sequence_pack "
        "— p_sequence_packing_bpe's twin with the synthetic "
        "gen_bpe_merges table replaced by the TRAINED one. Plan shape "
        "is identical to the synthetic twin (one shard-partitioned "
        "cumulative-sum shuffle; the encode adds zero exchanges, no "
        "training jobs on the query path); the oracle replays training "
        "via the shared CTE prefix, encodes at vocab rate and packs "
        "with the same cumulative-sum SQL.",
)
def q_packing_learned_bpe(spark, sf):
    from .operators.text import bpe_token_count

    d = bpe_merges_dir(spark, sf)
    rows = _read_tiny_parquet(d, ["merge_rank"])
    learned = tuple((r["a"], r["b"]) for r in rows)
    docs = T(spark, sf, "documents").withColumn(
        "toks", F.greatest(F.lit(1).cast("long"),
                           bpe_token_count("text", learned)))
    packed = sequence_pack(docs, "doc_id", "toks", context_len=2048,
                           n_shards=8)
    return (
        packed.groupBy("shard", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("toks").alias("pack_tokens"))
        .orderBy("shard", "pack_id")
    )


# == round-11 additions: fixed-point Lloyd k-means ========================
# The one family the LLM-pipeline set still lacked as a FIRST-CLASS
# oracle-bearing entry: distributed cluster TRAINING (the quantizers in
# operators/similarity.py train on bounded driver samples and are
# consumed by ANN entries whose oracles hold the centroids as literals).
# Float Lloyd iterations are not oracle-checkable — per-cluster means are
# partition-order-dependent float sums — so operators/clustering.py runs
# the whole loop in FIXED-POINT integer arithmetic (see its module
# docstring for the offset/scale/floor-division contract); the oracle
# below unrolls the exact same iterations as DuckDB CTEs over BIGINTs,
# where every sum is associative and every tie-break is first-index on
# both engines.

_KMEANS_K, _KMEANS_ITERS, _KMEANS_DIM = 8, 2, 64
_KMEANS_SCALE, _KMEANS_OFFSET = 100_000, 1.0
from .operators.clustering import MAX_QUANT as _MAX_QUANT  # noqa: E402


_FP_FOLD = ("list_reduce(list_transform(list_zip(v, c), "
            "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")


def _fp_quantize_cte(name: str, dim: int, scale: int, offset: float,
                     materialized: bool = False) -> str:
    """(vec_id, v BIGINT[]) fixed-point image of `embeddings` under the
    operators/clustering.quantizable guard, mirrored clause-for-clause.
    ``materialized`` forces DuckDB to evaluate the CTE once: a chain
    referenced from several scalar subqueries gets RE-INLINED per
    reference otherwise, which turns the composite IVFPQ oracle
    super-linear (observed: >400 s vs ~20 s materialized)."""
    v_dbl = "embedding::DOUBLE[]"
    kw = "MATERIALIZED " if materialized else ""
    return f"""
{name} AS {kw}(SELECT vec_id,
        list_transform({v_dbl},
                       x -> CAST(round((x + {offset}) * {float(scale)}, 0) AS BIGINT)) AS v
      FROM embeddings
      WHERE {_finite_vec_sql(v_dbl)}
        AND len({v_dbl}) = {dim}
        AND len(list_filter({v_dbl},
              x -> x + {offset} < 0
                   OR (x + {offset}) * {float(scale)} > {float(_MAX_QUANT)})) = 0)"""


def _fp_kmeans_chain(src: str, prefix: str, k: int, iters: int, dim: int,
                     final_assign: bool = False,
                     materialized: bool = False) -> list[str]:
    """Unrolled fixed-point Lloyd chain over CTE ``src`` (vec_id, v):
    ``{prefix}c0`` init (k smallest ids) → iters x (assign ``{prefix}a{i}``
    → update-with-carryover ``{prefix}c{i}``), plus one extra assignment
    when ``final_assign``. Every value is integral; the ``CAST(... AS
    BIGINT)`` on the update mean collapses DuckDB's HUGEINT sum/`//`
    widening back to the BIGINT domain the Spark side (long ``div`` /
    Python ``//``) lives in. Shared by the k-means entries and the
    trained-PQ oracle (which runs one chain per subspace over a strided
    sample)."""
    kw = "MATERIALIZED " if materialized else ""
    parts = [f"""
{prefix}c0 AS {kw}(SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v
       FROM (SELECT vec_id, v FROM {src} ORDER BY vec_id LIMIT {k}))"""]
    last = iters + 1 if final_assign else iters
    for i in range(1, last + 1):
        parts.append(f"""
{prefix}a{i} AS {kw}(SELECT vec_id, v,
        list_indexof(ds, list_aggregate(ds, 'min')) - 1 AS cluster,
        list_aggregate(ds, 'min') AS sq_dist
        FROM (SELECT vec_id, v,
               list_transform((SELECT list(v ORDER BY cluster) FROM {prefix}c{i-1}),
                              c -> {_FP_FOLD}) AS ds
              FROM {src}))""")
        if i <= iters:
            parts.append(f"""
{prefix}c{i} AS {kw}(SELECT p.cluster, coalesce(u.nv, p.v) AS v
        FROM {prefix}c{i-1} p LEFT JOIN (
          SELECT cluster, list(m ORDER BY d) AS nv
          FROM (SELECT cluster, d, CAST(sum(x) // count(*) AS BIGINT) AS m
                FROM (SELECT cluster, t.d AS d, v[t.d] AS x
                      FROM {prefix}a{i} CROSS JOIN range(1, {dim + 1}) t(d))
                GROUP BY cluster, d)
          GROUP BY cluster) u USING (cluster))""")
    return parts


def _kmeans_ctes(k: int, iters: int, dim: int, scale: int, offset: float) -> str:
    parts = [_fp_quantize_cte("q", dim, scale, offset)]
    parts += _fp_kmeans_chain("q", "", k, iters, dim, final_assign=True)
    return "WITH " + ",".join(parts)


def _kmeans_assign_oracle() -> str:
    pre = _kmeans_ctes(_KMEANS_K, _KMEANS_ITERS, _KMEANS_DIM,
                       _KMEANS_SCALE, _KMEANS_OFFSET)
    return (pre + f"""
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
       CAST(sq_dist AS BIGINT) AS sq_dist
FROM a{_KMEANS_ITERS + 1}""")


def _kmeans_means_oracle() -> str:
    pre = _kmeans_ctes(_KMEANS_K, _KMEANS_ITERS, _KMEANS_DIM,
                       _KMEANS_SCALE, _KMEANS_OFFSET)
    return (pre + f"""
SELECT CAST(cluster AS BIGINT) AS cluster, CAST(t.d - 1 AS BIGINT) AS d,
       CAST(sum(v[t.d]) // count(*) AS BIGINT) AS m
FROM a{_KMEANS_ITERS + 1} CROSS JOIN range(1, {_KMEANS_DIM + 1}) t(d)
GROUP BY cluster, t.d""")


@register(
    "e_kmeans_lloyd",
    _kmeans_assign_oracle(),
    doc="Distributed Lloyd k-means (k=8, 2 update iterations), hash-exact "
        "via fixed-point integers: quantize round((x+1)*1e5) makes "
        "distances associative integer sums (no fold-order coupling), "
        "argmin ties first-index on both engines, and the centroid "
        "update an all-non-negative integer division where Spark div == "
        "DuckDB // == Python //. Assignment is a literal-centroid "
        "vectorized kernel (no join); each update emits k*dim-per-task "
        "Arrow partials fused into the assignment pass (row-equal to "
        "the oracle's posexplode+groupBy shape, gated) and collects "
        "exactly k*dim bounded rows — the Spark MLlib KMeans loop "
        "shape, so per-iteration cost at 100 TB is one scan + one tiny "
        "shuffle. Output: the final (vec_id, cluster, sq_dist) "
        "assignment.",
)
def q_kmeans_lloyd(spark, sf):
    from .operators.clustering import kmeans_assign

    return kmeans_assign(T(spark, sf, "embeddings"), k=_KMEANS_K,
                         iters=_KMEANS_ITERS, dim=_KMEANS_DIM,
                         scale=_KMEANS_SCALE, offset=_KMEANS_OFFSET)


@register(
    "e_kmeans_centroids",
    _kmeans_means_oracle(),
    doc="The k-means UPDATE arithmetic itself as hash-checked output: "
        "per-dimension integer means of the final assignment (the "
        "iters+1-th update step), computed distributively via fused "
        "Arrow partials + groupBy(cluster, d) + integer div — k*dim "
        "rows, row-equal to the oracle's posexplode shape (gated). "
        "Non-empty clusters only (carryover is an intra-loop concern; "
        "the oracle's final step group-bys identically).",
)
def q_kmeans_centroids(spark, sf):
    from .operators.clustering import kmeans_cluster_means

    return kmeans_cluster_means(T(spark, sf, "embeddings"), k=_KMEANS_K,
                                iters=_KMEANS_ITERS, dim=_KMEANS_DIM,
                                scale=_KMEANS_SCALE, offset=_KMEANS_OFFSET)


# -- trained PQ on the fixed-point contract ------------------------------
# e_pq_recall_audit (round 10) measured recall@10 of ADC under RANDOM
# codebooks and documented the gap as "the caller's training concern".
# This closes it WITH the oracle kept: because the fixed-point Lloyd
# loop above is SQL-replayable, the whole training — deterministic
# id-strided sample, per-subspace k-means — can run inside the oracle,
# so the driver hash-checks recall under codebooks trained on the
# corpus itself, side by side with the untrained-random number.

_PQT_M, _PQT_KSUB, _PQT_ITERS, _PQT_CAP = 8, 16, 2, 256


def _pq_trained_recall_oracle(k: int = 10) -> str:
    dim, scale, offset = _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET
    m, ksub, iters, cap = _PQT_M, _PQT_KSUB, _PQT_ITERS, _PQT_CAP
    sub = dim // m
    parts = [_fp_quantize_cte("fq", dim, scale, offset)]
    parts.append(f"""
st AS (SELECT greatest(1, CAST((count(*) + {cap - 1}) // {cap} AS BIGINT)) AS stride
       FROM fq)""")
    parts.append(f"""
samp AS (SELECT vec_id, v FROM fq, st
         WHERE vec_id % st.stride = 0 ORDER BY vec_id LIMIT {cap})""")
    enc_cols, adc_terms = [], []
    for mi in range(m):
        lo, hi = mi * sub + 1, (mi + 1) * sub
        parts.append(f"""
ss{mi} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM samp)""")
        parts += _fp_kmeans_chain(f"ss{mi}", f"s{mi}", ksub, iters, sub)
        book = f"(SELECT list(v ORDER BY cluster) FROM s{mi}c{iters})"
        fold = ("list_reduce(list_transform(list_zip(v[" + str(lo) + ":" + str(hi) +
                "], c), x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")
        enc_cols.append(
            f"list_indexof(list_transform({book}, c -> {fold}),"
            f" list_aggregate(list_transform({book}, c -> {fold}), 'min')) - 1"
            f" AS code{mi}")
        qfold = ("list_reduce(list_transform(list_zip(qv[" + str(lo) + ":" + str(hi) +
                 f"], list_extract({book}, code{mi} + 1)), "
                 "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")
        adc_terms.append(f"({qfold})")
    enc_sql = ",\n       ".join(enc_cols)
    adc_sql = " + ".join(adc_terms)
    r_codes, r_adc = _pq_oracle_exprs()
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    parts.append(f"""
enc_t AS (SELECT vec_id,
       {enc_sql}
        FROM fq)""")
    parts.append(f"""
qq AS (SELECT v AS qv FROM fq WHERE vec_id = 0)""")
    parts.append(f"""
ann_t AS (SELECT vec_id FROM enc_t, qq ORDER BY {adc_sql}, vec_id LIMIT {k})""")
    parts.append(f"""
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')})""")
    parts.append(f"""
rq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')})""")
    parts.append(f"""
enc_r AS (SELECT vec_id,
       {r_codes}
        FROM raw)""")
    parts.append(f"""
ann_r AS (SELECT vec_id FROM enc_r, rq ORDER BY round({r_adc}, 6), vec_id LIMIT {k})""")
    parts.append(f"""
exact AS (SELECT vec_id FROM raw, rq ORDER BY {raw_cos} DESC, vec_id LIMIT {k})""")
    return ("WITH " + ",".join(parts) + f"""
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM ann_t JOIN exact USING (vec_id)) AS hits_trained,
       (SELECT CAST(count(*) AS BIGINT) FROM ann_r JOIN exact USING (vec_id)) AS hits_random
""")


@register(
    "e_pq_trained_recall",
    _pq_trained_recall_oracle(),
    doc="Trained-codebook PQ recall, ORACLE-VERIFIED TRAINING INCLUDED: "
        "per-subspace codebooks are fit with the fixed-point Lloyd loop "
        "over a deterministic id-strided sample (ceil(n/256) stride, "
        "bounded collect), so the DuckDB oracle replays the ENTIRE "
        "training as unrolled CTEs — one k-means chain per subspace — "
        "then encodes the corpus, ADC-ranks (every distance an exact "
        "integer: no rounding, no fold-order caveats), and reports "
        "recall@10 vs the exact cosine top-k next to the untrained-"
        "random-codebook recall of e_pq_recall_audit. The improvement "
        "itself is gated in tests/test_clustering.py; at 100 TB training "
        "stays a once-at-ingest bounded-sample cost (FAISS-style) and "
        "the query path is the same codes-only ADC scan.",
)
def q_pq_trained_recall(spark, sf):
    from .operators.clustering import (
        pq_adc_int_topk, pq_train_fixedpoint, quantized_frame)
    from .operators.similarity import brute_force_topk, pq_adc_scan

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    exact = (brute_force_topk(emb, qv, k=k) if qv is not None
             else brute_force_topk(emb, [1.0], k=k).where(F.lit(False)))
    # the random-codebook leg reads the persisted codes artifact (the
    # e_pq_codes_topk path — identical values by construction, and the
    # inline literal-codebook encode's ~4 s fixed Catalyst analysis
    # stays out of this entry)
    codes_r = spark.read.parquet(pq_codes_dir(spark, sf))
    ann_r = (pq_adc_scan(codes_r, qv, _PQ_CODEBOOKS, k=k) if qv is not None
             else pq_adc_scan(codes_r, [1.0], _PQ_CODEBOOKS, k=k).where(F.lit(False)))
    books = pq_train_fixedpoint(emb, m=_PQT_M, ksub=_PQT_KSUB,
                                iters=_PQT_ITERS, sample_cap=_PQT_CAP,
                                dim=_KMEANS_DIM, scale=_KMEANS_SCALE,
                                offset=_KMEANS_OFFSET)
    # the query's fixed-point image comes from the SAME Spark expression
    # the corpus uses (collected, not recomputed in Python: Python round
    # is banker's, Spark/DuckDB round is half-up — recomputing could
    # diverge on exact .5 products)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if books and qrow is not None:
        ann_t = pq_adc_int_topk(emb, [int(x) for x in qrow["qv"]], books, k=k,
                                dim=_KMEANS_DIM, scale=_KMEANS_SCALE,
                                offset=_KMEANS_OFFSET)
    else:
        ann_t = ann_r.select("vec_id").where(F.lit(False))
    # one tagged union + one equi-join + one global agg — both recall
    # counters in a single exchange, no scalar cross-join (the BNLJ
    # allowlist in tests/test_plans.py stays untouched)
    tagged = (
        ann_t.select("vec_id", F.lit(True).alias("is_trained"))
        .unionByName(ann_r.select("vec_id", F.lit(False).alias("is_trained")))
    )
    return (
        tagged.join(exact.select("vec_id"), "vec_id")
        .agg(
            F.count(F.when(F.col("is_trained"), 1)).cast("long").alias("hits_trained"),
            F.count(F.when(~F.col("is_trained"), 1)).cast("long").alias("hits_random"),
        )
        .select(F.lit(k).cast("long").alias("k"), "hits_trained", "hits_random")
    )


# -- trained IVF on the fixed-point contract ------------------------------

_IVFT_CELLS, _IVFT_NPROBE, _IVFT_ITERS = 16, 4, 2


def _ivf_trained_oracle(k: int = 10) -> str:
    dim, scale, offset = _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET
    cells, nprobe, iters = _IVFT_CELLS, _IVFT_NPROBE, _IVFT_ITERS
    parts = [_fp_quantize_cte("fq", dim, scale, offset)]
    parts += _fp_kmeans_chain("fq", "", cells, iters, dim, final_assign=True)
    probe_fold = ("list_reduce(list_transform(list_zip(qq.qv, cc.v), "
                  "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")
    raw_cos = (
        "list_reduce(list_transform(list_zip(cand.v, rqf.qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(cand.v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(rqf.qv, x -> x * x), (x, y) -> x + y)))")
    parts.append("""
qq AS (SELECT v AS qv FROM fq WHERE vec_id = 0)""")
    parts.append(f"""
probe AS (SELECT cc.cluster FROM c{iters} cc, qq
          ORDER BY {probe_fold}, cc.cluster LIMIT {nprobe})""")
    parts.append(f"""
cand AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v
         FROM embeddings e
         JOIN (SELECT vec_id, cluster FROM a{iters + 1}) a ON e.vec_id = a.vec_id
         JOIN probe USING (cluster))""")
    parts.append(f"""
rqf AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')})""")
    return ("WITH " + ",".join(parts) + f"""
SELECT cand.vec_id, round({raw_cos}, 6) AS cosine
FROM cand, rqf
ORDER BY {raw_cos} DESC, cand.vec_id
LIMIT {k}""")


@register(
    "e_ivf_trained_topk",
    _ivf_trained_oracle(),
    doc="IVF ANN top-k whose coarse quantizer is TRAINED and the "
        "training ORACLE-REPLAYED: cells from the fixed-point Lloyd "
        "loop over the corpus (16 cells, 2 iterations — the "
        "e_kmeans_lloyd chain), query probes its 4 nearest cells by "
        "exact integer distance (ties by cell index), candidates rank "
        "by exact float cosine (sequential fold, rank on raw, round in "
        "projection — r31's boundary contract). s_ann_ivf_topk pins "
        "the probe/rank mechanics against FIXED literal centroids; "
        "this is the full index lifecycle — train, assign, probe — "
        "hash-checked end to end. Plan: one scan, cell-IN filter, "
        "TakeOrderedAndProject; at scale the trained cell column is "
        "persisted at ingest like the PQ codes.",
)
def q_ivf_trained(spark, sf):
    from .operators.clustering import ivf_trained_topk, quantized_frame

    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    return ivf_trained_topk(
        emb, qv, [int(x) for x in qrow["qv"]] if qrow is not None else None,
        k=10, n_cells=_IVFT_CELLS, nprobe=_IVFT_NPROBE, iters=_IVFT_ITERS,
        dim=_KMEANS_DIM, scale=_KMEANS_SCALE, offset=_KMEANS_OFFSET)


def ivf_cells_dir(spark: SparkSession, sf: str) -> str:
    """Persisted IVF artifacts (operators/clustering.ivf_assign_cells):
    cells/ — the (vec_id, cell) column a 100 TB deployment stores next
    to the corpus — and centroids/ — the tiny (cell, v) quantizer table
    the query path probes. Trained once per corpus, cached by source
    identity like the PQ codes and BM25 index."""
    import os

    def build(tmp: str) -> None:
        from .operators.clustering import ivf_assign_cells

        cells, cents = ivf_assign_cells(
            T(spark, sf, "embeddings"), n_cells=_IVFT_CELLS,
            iters=_IVFT_ITERS, dim=_KMEANS_DIM, scale=_KMEANS_SCALE,
            offset=_KMEANS_OFFSET)
        cells.write.mode("overwrite").parquet(os.path.join(tmp, "cells"))
        cent_rows = [(j, [int(x) for x in c]) for j, c in enumerate(cents)]
        spark.createDataFrame(cent_rows, "cell long, v array<long>") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(tmp, "centroids"))

    # the tag encodes the training hyperparameters: a parameter change
    # must MISS the cache, not silently serve an artifact trained under
    # the old recipe (the oracle retrains live and would go red)
    tag = (f"ivf-cells-v1-k{_IVFT_CELLS}-i{_IVFT_ITERS}-d{_KMEANS_DIM}"
           f"-s{_KMEANS_SCALE}-o{_KMEANS_OFFSET}")
    return _ingest_artifact_dir(sf, "embeddings", tag, build)


@register(
    "e_ivf_cells_topk",
    _ivf_trained_oracle(),
    doc="Trained IVF over INGEST-PERSISTED artifacts: the (vec_id, "
        "cell) assignment and the centroid table are written once per "
        "corpus (ivf_cells_dir); the query-time plan probes the 4 "
        "nearest cells from the persisted centroids (bounded 16-row "
        "collect), IN-filters the cells parquet scan (PushedFilters — "
        "plan-pinned), and joins candidates back to the corpus for the "
        "exact cosine ranking. NO training job in the query path. Same "
        "oracle as e_ivf_trained_topk (the cell assignment is a "
        "deterministic function of the corpus), proving index-path "
        "parity — the e_pq_codes_topk story for the IVF family.",
)
def q_ivf_cells(spark, sf):
    from .operators.clustering import ivf_cells_scan_topk, ivf_probe_cells, quantized_frame

    emb = T(spark, sf, "embeddings")
    d = ivf_cells_dir(spark, sf)
    cells = spark.read.parquet(f"{d}/cells")
    cents = [[int(x) for x in r["v"]] for r in
             _read_tiny_parquet(f"{d}/centroids", ["cell"])]
    qv = _query_vec(emb, 0)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or qv is None or qrow is None:
        return ivf_cells_scan_topk(cells, emb, [1.0], [], k=10).where(F.lit(False))
    probe = ivf_probe_cells([int(x) for x in qrow["qv"]], cents, _IVFT_NPROBE)
    return ivf_cells_scan_topk(cells, emb, qv, probe, k=10)


def _hybrid_rrf_indexed_oracle(k: int = 10, topn: int = 20, c: int = 60) -> str:
    """Sparse leg recomputed from raw text, dense leg replaying the full
    trained-IVF index (quantize -> Lloyd chain -> probe -> candidate
    cosine) — the oracle PROVES both artifact paths by recomputation,
    exactly like each leg's own entry does."""
    return f"""
WITH sparse AS ({_bm25_oracle(k=topn)}),
s AS (SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS sr
      FROM sparse),
dense AS ({_ivf_trained_oracle(k=topn)}),
dn AS (SELECT vec_id AS doc_id,
              CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS dr
       FROM dense),
f AS (SELECT coalesce(s.doc_id, dn.doc_id) AS doc_id, sr, dr
      FROM s FULL OUTER JOIN dn ON s.doc_id = dn.doc_id)
SELECT doc_id,
       CAST(coalesce(sr, 0) AS INT) AS sparse_rank,
       CAST(coalesce(dr, 0) AS INT) AS dense_rank,
       round(coalesce(1.0/({c} + sr), 0) + coalesce(1.0/({c} + dr), 0), 6) AS rrf
FROM f
ORDER BY round(coalesce(1.0/({c} + sr), 0) + coalesce(1.0/({c} + dr), 0), 6) DESC, doc_id
LIMIT {k}
"""


@register(
    "t_hybrid_rrf_indexed",
    _hybrid_rrf_indexed_oracle(),
    doc="VERDICT r11 item 3 — the full RAG read path over "
        "INGEST-PERSISTED artifacts end to end: the sparse leg scores "
        "BM25 from the persisted postings/dictionary/stats (documents. "
        "text never scanned — plan-pinned), the dense leg probes the "
        "persisted IVF cells + centroids (no training, no re-assignment "
        "— only the probed candidates' embeddings are read for the "
        "exact cosine), and reciprocal-rank fusion (c=60) joins the two "
        "LIMIT-20 legs. The oracle recomputes BOTH legs from raw data "
        "(text tokenization + the full trained-IVF replay), so a hash "
        "match proves the composed artifact read path bit-equal to "
        "recomputation — index-path parity for the whole pipeline, not "
        "just each index alone.",
)
def q_hybrid_rrf_indexed(spark, sf):
    import os

    from .operators.clustering import (
        ivf_cells_scan_topk, ivf_probe_cells, quantized_frame)
    from .operators.text import bm25_topk_indexed

    emb = T(spark, sf, "embeddings")
    bd = bm25_index_dir(spark, sf)
    sparse = bm25_topk_indexed(
        spark.read.parquet(os.path.join(bd, "postings")),
        spark.read.parquet(os.path.join(bd, "dictionary")),
        spark.read.parquet(os.path.join(bd, "stats")),
        _BM25_TERMS, k=20,
    )
    vd = ivf_cells_dir(spark, sf)
    cells = spark.read.parquet(f"{vd}/cells")
    cents = [[int(x) for x in r["v"]] for r in
             _read_tiny_parquet(f"{vd}/centroids", ["cell"])]
    qv = _query_vec(emb, 0)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or qv is None or qrow is None:
        dense = ivf_cells_scan_topk(cells, emb, [1.0], [], k=20).where(
            F.lit(False))
    else:
        probe = ivf_probe_cells([int(x) for x in qrow["qv"]], cents,
                                _IVFT_NPROBE)
        dense = ivf_cells_scan_topk(cells, emb, qv, probe, k=20)
    return _rrf_fuse(sparse, dense, k=10, c=60)


# -- IVFPQ: residual product quantization under probed cells --------------
# The composite FAISS IVFPQ shape: coarse cells prune the corpus, PQ
# codes compress the RESIDUAL v - centroid[cell], and the query builds
# one ADC LUT set PER PROBED CELL from its residual against that cell.
# The fixed-point contract extends with one move: residuals are signed,
# so they are SHIFTED by MAX_QUANT back into the non-negative domain
# (distances are shift-invariant; the update division stays floor ==
# truncation). Every quantity end to end — training, codes, LUTs, adc —
# is an exact integer, so the oracle replays the ENTIRE composite index.

def _ivfpq_parts(k: int = 10):
    """Shared CTE prefix of every IVFPQ oracle: quantize, coarse Lloyd
    chain, shifted residuals, strided sample, per-subspace residual
    training, corpus encode and the quantized query — everything that
    does NOT depend on nprobe. Returns (parts, adc_sql, probe_fold);
    callers append probe/qr CTEs per nprobe (r12 task 4: the recall
    sweep replays training ONCE and probes four ways, instead of four
    full replays)."""
    from .operators.clustering import MAX_QUANT as shift

    dim, scale, offset = _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET
    cells, iters = _IVFT_CELLS, _IVFT_ITERS
    m, ksub, cap = _PQT_M, _PQT_KSUB, _PQT_CAP
    sub = dim // m
    # every chain CTE is MATERIALIZED: the residual training chains are
    # referenced from scalar subqueries in enc and the final adc, and
    # DuckDB re-inlines non-materialized CTEs per reference (observed:
    # the composite oracle went super-linear, >400 s; materialized it
    # evaluates each chain once)
    parts = [_fp_quantize_cte("fq", dim, scale, offset, materialized=True)]
    parts += _fp_kmeans_chain("fq", "", cells, iters, dim,
                              final_assign=True, materialized=True)
    parts.append(f"""
res AS MATERIALIZED (SELECT a.vec_id, a.cluster AS cell,
        list_transform(list_zip(a.v, cc.v), x -> x[1] - x[2] + {shift}) AS v
        FROM a{iters + 1} a JOIN c{iters} cc ON a.cluster = cc.cluster)""")
    parts.append(f"""
st AS MATERIALIZED (SELECT greatest(1, CAST((count(*) + {cap - 1}) // {cap} AS BIGINT)) AS stride
       FROM fq)""")
    parts.append(f"""
samp AS MATERIALIZED (SELECT vec_id, v FROM res, st
         WHERE vec_id % st.stride = 0 ORDER BY vec_id LIMIT {cap})""")
    ds_cols, enc_cols, adc_terms = [], [], []
    for mi in range(m):
        lo, hi = mi * sub + 1, (mi + 1) * sub
        parts.append(f"""
rs{mi} AS MATERIALIZED (SELECT vec_id, v[{lo}:{hi}] AS v FROM samp)""")
        parts += _fp_kmeans_chain(f"rs{mi}", f"r{mi}", ksub, iters, sub,
                                  materialized=True)
        book = f"(SELECT list(v ORDER BY cluster) FROM r{mi}c{iters})"
        fold = (f"list_reduce(list_transform(list_zip(v[{lo}:{hi}], c), "
                "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")
        # ds{mi} computed ONCE in the inner projection; argmin reads it
        # twice without re-instantiating the chain
        ds_cols.append(f"list_transform({book}, c -> {fold}) AS ds{mi}")
        enc_cols.append(
            f"list_indexof(ds{mi}, list_aggregate(ds{mi}, 'min')) - 1"
            f" AS code{mi}")
        qfold = (f"list_reduce(list_transform(list_zip(qr.qv[{lo}:{hi}], "
                 f"list_extract({book}, e.code{mi} + 1)), "
                 "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")
        adc_terms.append(f"({qfold})")
    ds_sql = ",\n       ".join(ds_cols)
    enc_sql = ",\n       ".join(enc_cols)
    adc_sql = " + ".join(adc_terms)
    probe_fold = ("list_reduce(list_transform(list_zip(qq.qv, cc.v), "
                  "x -> (x[1]-x[2])*(x[1]-x[2])), (x, y) -> x + y)")
    parts.append("""
qq AS MATERIALIZED (SELECT v AS qv FROM fq WHERE vec_id = 0)""")
    parts.append(f"""
enc AS MATERIALIZED (SELECT vec_id, cell,
       {enc_sql}
        FROM (SELECT vec_id, cell,
       {ds_sql}
              FROM res))""")
    return parts, adc_sql, probe_fold


def _ivfpq_probe_parts(nprobe: int, probe_fold: str,
                       sfx: str = "") -> list[str]:
    """probe/qr CTE pair for one nprobe; ``sfx`` disambiguates names
    when several probes share one WITH (the sweep oracle)."""
    from .operators.clustering import MAX_QUANT as shift

    iters = _IVFT_ITERS
    return [f"""
probe{sfx} AS MATERIALIZED (SELECT cc.cluster FROM c{iters} cc, qq
          ORDER BY {probe_fold}, cc.cluster LIMIT {nprobe})""", f"""
qr{sfx} AS MATERIALIZED (SELECT p.cluster AS cell,
       list_transform(list_zip(qq.qv, cc.v), x -> x[1] - x[2] + {shift}) AS qv
       FROM probe{sfx} p JOIN c{iters} cc ON p.cluster = cc.cluster CROSS JOIN qq)"""]


def _ivfpq_oracle(k: int = 10) -> str:
    parts, adc_sql, probe_fold = _ivfpq_parts(k)
    parts += _ivfpq_probe_parts(_IVFT_NPROBE, probe_fold)
    # adc is an exact integer, so ordering by the projected alias is
    # identical to ordering by the raw expression (no float rounding
    # asymmetry) — and evaluates the LUT folds once
    return ("WITH " + ",".join(parts) + f"""
SELECT vec_id, adc FROM (
  SELECT e.vec_id, CAST({adc_sql} AS BIGINT) AS adc
  FROM enc e JOIN qr ON e.cell = qr.cell)
ORDER BY adc, vec_id
LIMIT {k}""")


@register(
    "e_ivfpq_topk",
    _ivfpq_oracle(),
    doc="FAISS-shape IVFPQ, the composite index, ORACLE-REPLAYED END TO "
        "END: fixed-point Lloyd cells prune to 4 probed cells, PQ "
        "codebooks train on a strided sample of SHIFTED residuals "
        "(v - centroid[cell] + MAX_QUANT — re-entering the non-negative "
        "domain; distances are shift-invariant), and the query ADC "
        "builds one LUT set per probed cell from ITS residual (the "
        "defining IVFPQ detail). Training, codes, LUTs and the ranked "
        "adc are all exact integers — the DuckDB oracle replays cells, "
        "residuals, per-subspace training and the per-cell ADC, and the "
        "top-k hashes exactly. Completes the ANN family: brute / LSH / "
        "IVF(fixed) / IVF(trained) / MIPS / PQ / trained-PQ / IVFPQ.",
)
def q_ivfpq(spark, sf):
    from .operators.clustering import ivfpq_topk, quantized_frame

    emb = T(spark, sf, "embeddings")
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    return ivfpq_topk(
        emb, [int(x) for x in qrow["qv"]] if qrow is not None else None,
        k=10, n_cells=_IVFT_CELLS, nprobe=_IVFT_NPROBE, m=_PQT_M,
        ksub=_PQT_KSUB, iters=_IVFT_ITERS, sample_cap=_PQT_CAP,
        dim=_KMEANS_DIM, scale=_KMEANS_SCALE, offset=_KMEANS_OFFSET)


def _ivfpq_recall_oracle(k: int = 10) -> str:
    """The composite index's ANN leg is the FULL _ivfpq_oracle replay
    (nested WITH, like the hybrid fusion's legs); the exact leg is the
    family's raw-cosine top-k. Probed-cell pruning means the ann side
    ranks only ~nprobe/n_cells of the corpus — the recall number is the
    hash-checked measurement of what that pruning + residual
    quantization costs against exact search."""
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH ann AS ({_ivfpq_oracle(k)}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
rq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
exact AS (SELECT vec_id FROM raw, rq ORDER BY {raw_cos} DESC, vec_id LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM ann JOIN exact USING (vec_id)) AS hits
"""


@register(
    "e_ivfpq_recall_audit",
    _ivfpq_recall_oracle(),
    doc="Recall@10 of the composite IVFPQ against the exact cosine "
        "top-k, completing the audit symmetry (LSH, PQ and trained-PQ "
        "each carry one; the composite did not): the ann leg runs the "
        "PERSISTED-artifact query path (probe + codes-only ADC — the "
        "production read), the exact leg is brute cosine, and the "
        "oracle replays the entire index (cells, residual training, "
        "per-cell ADC) before counting hits — so the recall number "
        "itself is hash-checked, pinning what nprobe/n_cells pruning + "
        "residual quantization cost vs exact search on this corpus.",
)
def q_ivfpq_recall_audit(spark, sf):
    from .operators.similarity import brute_force_topk

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    if qv is None:
        return spark.range(1).select(
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("hits"),
        )
    ann = q_ivfpq_codes(spark, sf).select("vec_id")
    exact = brute_force_topk(emb, qv, k=k).select("vec_id")
    return (
        ann.join(exact, "vec_id")
        .agg(F.count("*").cast("long").alias("hits"))
        .select(F.lit(k).cast("long").alias("k"), "hits")
    )


_IVFPQ_SWEEP_PROBES = (2, 4, 8, 16)


def _ivfpq_recall_sweep_oracle(k: int = 10) -> str:
    """Four probe variants over ONE training replay: the shared
    _ivfpq_parts prefix (quantize, Lloyd, residual training, encode) is
    evaluated once, then each nprobe gets its own probe/qr/top chain,
    all counted against the same exact-cosine top-k."""
    parts, adc_sql, probe_fold = _ivfpq_parts(k)
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    sels = []
    for n in _IVFPQ_SWEEP_PROBES:
        parts += _ivfpq_probe_parts(n, probe_fold, sfx=f"_{n}")
        parts.append(f"""
top_{n} AS MATERIALIZED (SELECT vec_id FROM (
  SELECT e.vec_id, CAST({adc_sql} AS BIGINT) AS adc
  FROM enc e JOIN qr_{n} qr ON e.cell = qr.cell)
ORDER BY adc, vec_id LIMIT {k})""")
        sels.append(
            f"SELECT CAST({n} AS BIGINT) AS nprobe, "
            f"CAST({k} AS BIGINT) AS k, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM top_{n} "
            f"JOIN exact USING (vec_id)) AS hits")
    parts.append(f"""
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
rq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
exact AS MATERIALIZED (SELECT vec_id FROM raw, rq
         ORDER BY {raw_cos} DESC, vec_id LIMIT {k})""")
    return ("WITH " + ",".join(parts) + " "
            + " UNION ALL ".join(sels) + " ORDER BY nprobe")


@register(
    "e_ivfpq_recall_sweep",
    _ivfpq_recall_sweep_oracle(),
    doc="VERDICT r12 task 4 — the recall/cost CURVE, not one gauge "
        "point: recall@10 of the PERSISTED IVFPQ path at nprobe = 2, 4, "
        "8, 16 (= all cells, isolating pure PQ quantization loss from "
        "cell-pruning loss) against the exact cosine top-k, one row per "
        "nprobe. The artifacts are built once (ivfpq_artifacts_dir "
        "cache); each row is one codes-scan ADC rank + a k-row join. "
        "The oracle replays training ONCE (shared _ivfpq_parts prefix) "
        "and probes four ways, so all four hash-checked recall numbers "
        "pin the pruning-vs-recall trade as data. Curve recorded in "
        "BASELINE.md.",
)
def q_ivfpq_recall_sweep(spark, sf):
    from .operators.clustering import ivfpq_adc_scan, quantized_frame
    from .operators.similarity import brute_force_topk

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or not books or qv is None or qrow is None:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("nprobe"),
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("hits"))
    qqv = [int(x) for x in qrow["qv"]]
    exact = brute_force_topk(emb, qv, k=k).select("vec_id")
    out = None
    for n in _IVFPQ_SWEEP_PROBES:
        ann = ivfpq_adc_scan(codes, cents, books, qqv,
                             nprobe=n, k=k).select("vec_id")
        row = (ann.join(exact, "vec_id")
               .agg(F.count("*").cast("long").alias("hits"))
               .select(F.lit(n).cast("long").alias("nprobe"),
                       F.lit(k).cast("long").alias("k"), "hits"))
        out = row if out is None else out.unionAll(row)
    return out.orderBy("nprobe")


_IVFPQ_RERANK_C = 64


def _read_tiny_parquet(path: str, order_cols: list[str]) -> list[dict]:
    """Driver-local read of a TINY artifact table (n_cells / m*ksub
    rows) — r14: the two trained-table loads were one Spark collect job
    each (~0.2 s of job launch per artifact-served entry for 16-144
    rows); pyarrow reads the same files in milliseconds with identical
    values (plain int64 columns). The CODES table — the only
    corpus-sized artifact — stays a Spark scan."""
    import glob as _glob

    import pyarrow.parquet as _pq

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    tbl = _pq.ParquetDataset(files if files else path).read()
    rows = tbl.to_pylist()
    rows.sort(key=lambda r: tuple(r[c] for c in order_cols))
    return rows


def _load_ivfpq_artifacts(spark: SparkSession, sf: str):
    """(codes frame, centroids, books) from the persisted artifact dir
    — the two trained tables are bounded DRIVER-LOCAL reads (n_cells
    rows / m x ksub rows; no Spark job), the codes a lazy frame."""
    d = ivfpq_artifacts_dir(spark, sf)
    codes = spark.read.parquet(f"{d}/codes")
    cents = [[int(x) for x in r["v"]] for r in
             _read_tiny_parquet(f"{d}/centroids", ["cell"])]
    books: list[list[list[int]]] = []
    for r in _read_tiny_parquet(f"{d}/books", ["mi", "code"]):
        while len(books) <= r["mi"]:
            books.append([])
        books[r["mi"]].append([int(x) for x in r["v"]])
    return codes, cents, books


def _ivfpq_rerank_candidates(spark, sf) -> list[int] | None:
    """The bounded driver collect at the heart of the refine stage: the
    persisted ADC top-C candidate ids (C = 64 rows — the probe-cells
    collect pattern). None when the index/query is degenerate."""
    from .operators.clustering import ivfpq_adc_scan, quantized_frame

    emb = T(spark, sf, "embeddings")
    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or not books or qrow is None:
        return None
    cand = ivfpq_adc_scan(codes, cents, books,
                          [int(x) for x in qrow["qv"]],
                          nprobe=_IVFT_NPROBE, k=_IVFPQ_RERANK_C)
    return [int(r["vec_id"]) for r in cand.select("vec_id").collect()]


def _ivfpq_rerank_oracle(k: int = 10) -> str:
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH annc AS ({_ivfpq_oracle(_IVFPQ_RERANK_C)}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
rq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')})
SELECT vec_id, round({raw_cos}, 6) AS cosine
FROM raw JOIN annc USING (vec_id), rq
ORDER BY {raw_cos} DESC, vec_id
LIMIT {k}
"""


@register(
    "e_ivfpq_rerank_topk",
    _ivfpq_rerank_oracle(),
    doc="The FAISS refine stage the recall sweep's adjudication calls "
        "for (r13; e_ivfpq_recall_sweep measured the curve FLAT in "
        "nprobe — the ceiling is residual-quantization RANKING error, "
        "not pruning, so the fix is exact re-scoring of a candidate "
        "buffer, not more probe IO): the persisted ADC path returns its "
        "top-64 candidate ids (one bounded collect, the probe-cells "
        "pattern), the ids become an IN filter PUSHED into the "
        "embeddings parquet scan (64 rows read at 100 TB, not a "
        "corpus scan — plan-pinned), and the exact cosine re-ranks to "
        "top-10. Oracle: the full composite replay at C=64 nested "
        "under an exact-cosine rerank, so the refined ranking is "
        "hash-verified end to end.",
)
def q_ivfpq_rerank(spark, sf):
    from .operators.similarity import brute_force_topk

    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    ids = _ivfpq_rerank_candidates(spark, sf)
    if qv is None or ids is None:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("vec_id"),
            F.lit(0.0).alias("cosine"))
    return brute_force_topk(emb.filter(F.col("vec_id").isin(ids)), qv, k=10)


def _ivfpq_rerank_recall_oracle(k: int = 10) -> str:
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    return f"""
WITH ann AS ({_ivfpq_rerank_oracle(k)}),
raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
rq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
exact AS (SELECT vec_id FROM raw, rq ORDER BY {raw_cos} DESC, vec_id LIMIT {k})
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM ann JOIN exact USING (vec_id)) AS hits
"""


@register(
    "e_ivfpq_rerank_recall",
    _ivfpq_rerank_recall_oracle(),
    doc="Recall@10 of the REFINED path (persisted ADC top-64 -> exact "
        "cosine re-rank) against exact search — the hash-checked proof "
        "that the refine stage recovers what quantization ranking "
        "loses: the sweep pinned the un-refined path at 3-4/10 "
        "regardless of nprobe; the residual misses here are true "
        "cell-pruning losses (exact-top-k members whose cell the probe "
        "never opened). Numbers recorded per SF in BASELINE.md.",
)
def q_ivfpq_rerank_recall(spark, sf):
    from .operators.similarity import brute_force_topk

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    if qv is None:
        return spark.range(1).select(
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("hits"))
    ann = q_ivfpq_rerank(spark, sf).select("vec_id")
    exact = brute_force_topk(emb, qv, k=k).select("vec_id")
    return (
        ann.join(exact, "vec_id")
        .agg(F.count("*").cast("long").alias("hits"))
        .select(F.lit(k).cast("long").alias("k"), "hits"))


def _ivfpq_rerank_sweep_oracle(k: int = 10) -> str:
    """Refined recall per nprobe over ONE training replay: per probe
    count, the composite ADC top-C candidates re-ranked by exact
    cosine, counted against the same exact top-k. The refined curve's
    residual misses are pure cell-pruning losses, so THIS curve must
    rise with nprobe (unlike the un-refined sweep, which the
    quantization ranking error holds flat)."""
    parts, adc_sql, probe_fold = _ivfpq_parts(k)
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    sels = []
    for n in _IVFPQ_SWEEP_PROBES:
        parts += _ivfpq_probe_parts(n, probe_fold, sfx=f"_{n}")
        parts.append(f"""
cand_{n} AS MATERIALIZED (SELECT vec_id FROM (
  SELECT e.vec_id, CAST({adc_sql} AS BIGINT) AS adc
  FROM enc e JOIN qr_{n} qr ON e.cell = qr.cell)
ORDER BY adc, vec_id LIMIT {_IVFPQ_RERANK_C})""")
        parts.append(f"""
rr_{n} AS (SELECT vec_id FROM raw JOIN cand_{n} USING (vec_id), rq
  ORDER BY {raw_cos} DESC, vec_id LIMIT {k})""")
        sels.append(
            f"SELECT CAST({n} AS BIGINT) AS nprobe, "
            f"CAST({k} AS BIGINT) AS k, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM rr_{n} "
            f"JOIN exact USING (vec_id)) AS hits")
    # raw/rq/exact appear BEFORE their uses textually via WITH scoping:
    # DuckDB resolves same-WITH references in order, so put them first
    pre = [f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
rq AS MATERIALIZED (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
exact AS MATERIALIZED (SELECT vec_id FROM raw, rq
         ORDER BY {raw_cos} DESC, vec_id LIMIT {k})"""]
    return ("WITH " + ",".join(pre + parts) + " "
            + " UNION ALL ".join(sels) + " ORDER BY nprobe")


@register(
    "e_ivfpq_rerank_sweep",
    _ivfpq_rerank_sweep_oracle(),
    doc="The refined recall/cost curve, closing the adjudication loop: "
        "e_ivfpq_recall_sweep showed un-refined recall FLAT in nprobe "
        "(quantization ranking error dominates); e_ivfpq_rerank_recall "
        "showed refinement recovering it at nprobe=4. This entry "
        "measures refined recall AT EACH nprobe (2/4/8/16) under the "
        "FIXED C=64 candidate buffer — and the measured curve "
        "DISPROVED the naive expectation that it rises to k at full "
        "probe: at sf0.1 recall drops 7 -> 6 as nprobe grows 2 -> 16, "
        "because widening the probe makes the fixed ADC-top-C buffer "
        "draw from a larger pool, DILUTING true winners below rank C "
        "(the standard IVFPQ result that the refine budget must scale "
        "with probe width; C is the third axis of the trade, now "
        "pinned as hash-checked data in BASELINE.md). One training "
        "replay; per-probe candidate+rerank chains.",
)
def q_ivfpq_rerank_sweep(spark, sf):
    from .operators.clustering import ivfpq_adc_scan, quantized_frame
    from .operators.similarity import brute_force_topk

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or not books or qv is None or qrow is None:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("nprobe"),
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("hits"))
    qqv = [int(x) for x in qrow["qv"]]
    exact = brute_force_topk(emb, qv, k=k).select("vec_id")
    out = None
    for n in _IVFPQ_SWEEP_PROBES:
        ids = [int(r["vec_id"]) for r in
               ivfpq_adc_scan(codes, cents, books, qqv, nprobe=n,
                              k=_IVFPQ_RERANK_C).select("vec_id").collect()]
        rr = brute_force_topk(
            emb.filter(F.col("vec_id").isin(ids)), qv, k=k).select("vec_id")
        row = (rr.join(exact, "vec_id")
               .agg(F.count("*").cast("long").alias("hits"))
               .select(F.lit(n).cast("long").alias("nprobe"),
                       F.lit(k).cast("long").alias("k"), "hits"))
        out = row if out is None else out.unionAll(row)
    return out.orderBy("nprobe")


def _ivfpq_rerank_scaled_oracle(k: int = 10) -> str:
    """The C-scaling counterpart of _ivfpq_rerank_sweep_oracle: the
    candidate budget grows with the probe width (C = 16*nprobe, i.e.
    a FIXED fraction of the probed pool), testing the operating
    guidance the fixed-C sweep's dilution result implies."""
    parts, adc_sql, probe_fold = _ivfpq_parts(k)
    raw_cos = (
        "list_reduce(list_transform(list_zip(v, qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)))")
    sels = []
    for n in _IVFPQ_SWEEP_PROBES:
        c = 16 * n
        parts += _ivfpq_probe_parts(n, probe_fold, sfx=f"_s{n}")
        parts.append(f"""
cand_s{n} AS MATERIALIZED (SELECT vec_id FROM (
  SELECT e.vec_id, CAST({adc_sql} AS BIGINT) AS adc
  FROM enc e JOIN qr_s{n} qr ON e.cell = qr.cell)
ORDER BY adc, vec_id LIMIT {c})""")
        parts.append(f"""
rr_s{n} AS (SELECT vec_id FROM raw JOIN cand_s{n} USING (vec_id), rq
  ORDER BY {raw_cos} DESC, vec_id LIMIT {k})""")
        sels.append(
            f"SELECT CAST({n} AS BIGINT) AS nprobe, "
            f"CAST({c} AS BIGINT) AS c, CAST({k} AS BIGINT) AS k, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM rr_s{n} "
            f"JOIN exact USING (vec_id)) AS hits")
    pre = [f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
rq AS MATERIALIZED (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = 0 AND {_finite_vec_sql('embedding::DOUBLE[]')}),
exact AS MATERIALIZED (SELECT vec_id FROM raw, rq
         ORDER BY {raw_cos} DESC, vec_id LIMIT {k})"""]
    return ("WITH " + ",".join(pre + parts) + " "
            + " UNION ALL ".join(sels) + " ORDER BY nprobe")


@register(
    "e_ivfpq_rerank_scaled_sweep",
    _ivfpq_rerank_scaled_oracle(),
    doc="Validates (rather than asserts) the operating guidance the "
        "fixed-C sweep's dilution result implies: scale the refine "
        "budget WITH the probe width (C = 16*nprobe — a fixed fraction "
        "of the probed pool) and the refined recall curve should stop "
        "falling as nprobe grows. Hash-checked like its fixed-C twin; "
        "measured numbers + the guidance verdict in BASELINE.md.",
)
def q_ivfpq_rerank_scaled(spark, sf):
    from .operators.clustering import ivfpq_adc_scan, quantized_frame
    from .operators.similarity import brute_force_topk

    k = 10
    emb = T(spark, sf, "embeddings")
    qv = _query_vec(emb, 0)
    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or not books or qv is None or qrow is None:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("nprobe"),
            F.lit(0).cast("long").alias("c"),
            F.lit(k).cast("long").alias("k"),
            F.lit(0).cast("long").alias("hits"))
    qqv = [int(x) for x in qrow["qv"]]
    exact = brute_force_topk(emb, qv, k=k).select("vec_id")
    out = None
    for n in _IVFPQ_SWEEP_PROBES:
        c = 16 * n
        ids = [int(r["vec_id"]) for r in
               ivfpq_adc_scan(codes, cents, books, qqv, nprobe=n,
                              k=c).select("vec_id").collect()]
        rr = brute_force_topk(
            emb.filter(F.col("vec_id").isin(ids)), qv, k=k).select("vec_id")
        row = (rr.join(exact, "vec_id")
               .agg(F.count("*").cast("long").alias("hits"))
               .select(F.lit(n).cast("long").alias("nprobe"),
                       F.lit(c).cast("long").alias("c"),
                       F.lit(k).cast("long").alias("k"), "hits"))
        out = row if out is None else out.unionAll(row)
    return out.orderBy("nprobe")


_IVFPQ_BATCH_Q, _IVFPQ_BATCH_K = 5, 5


def _ivfpq_batch_oracle() -> str:
    """Multi-query replay over the shared training prefix: per query
    (vec_id < Q), rank the coarse cells (row_number per qid), take the
    nprobe nearest, build the per-(qid, cell) shifted query residual,
    join the encoded corpus on cell and rank the per-cell ADC per qid."""
    from .operators.clustering import MAX_QUANT as shift

    q, k, nprobe, iters = (_IVFPQ_BATCH_Q, _IVFPQ_BATCH_K, _IVFT_NPROBE,
                           _IVFT_ITERS)
    parts, adc_sql, probe_fold = _ivfpq_parts(k)
    mq_fold = probe_fold.replace("qq.qv", "mqq.qv")
    parts.append(f"""
mqq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM fq
       WHERE vec_id < {q})""")
    parts.append(f"""
mprobe AS MATERIALIZED (SELECT qid, cluster FROM (
    SELECT mqq.qid, cc.cluster,
           row_number() OVER (PARTITION BY mqq.qid
                              ORDER BY {mq_fold}, cc.cluster) AS prn
    FROM c{iters} cc, mqq) WHERE prn <= {nprobe})""")
    parts.append(f"""
mqr AS MATERIALIZED (SELECT p.qid, p.cluster AS cell,
       list_transform(list_zip(mqq.qv, cc.v), x -> x[1] - x[2] + {shift}) AS qv
       FROM mprobe p JOIN c{iters} cc ON p.cluster = cc.cluster
       JOIN mqq ON p.qid = mqq.qid)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT qid, vec_id, adc, CAST(rn AS INTEGER) AS rn FROM (
  SELECT qr.qid, e.vec_id, CAST({adc_sql} AS BIGINT) AS adc,
         row_number() OVER (PARTITION BY qr.qid
                            ORDER BY {adc_sql}, e.vec_id) AS rn
  FROM enc e JOIN mqr qr ON e.cell = qr.cell)
WHERE rn <= {k}
ORDER BY qid, rn""")


@register(
    "e_ivfpq_batch_topk",
    _ivfpq_batch_oracle(),
    doc="BATCH multi-query retrieval over the PERSISTED composite index "
        "— the retrieval-for-training shape (every training example "
        "needs k neighbors) that e_grouped_topk's brute Q x N batch "
        "join exists to contrast with: Q=5 queries' probes + per-cell "
        "ADC LUTs are computed driver-side (bounded ints) and broadcast "
        "as ONE (qid, cell, luts) table joined to the codes on cell, so "
        "the codes artifact is scanned ONCE for all queries with the "
        "union of probed cells pushed as an IN filter; the per-query "
        "rank is a window over the pruned candidates (the one shuffle, "
        "candidate-proportional). No float IO, no training in the "
        "plan. Oracle: multi-query replay over the shared training "
        "prefix (per-qid probe ranking, per-(qid, cell) residual, ADC "
        "rank per qid).",
)
def q_ivfpq_batch(spark, sf):
    from .operators.clustering import ivfpq_adc_batch_scan, quantized_frame

    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    emb = T(spark, sf, "embeddings")
    qrows = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
             .filter(F.col("_kid") < _IVFPQ_BATCH_Q)
             .orderBy("_kid").select("_kid", "qv").collect())
    queries = [(int(r["_kid"]), [int(x) for x in r["qv"]]) for r in qrows]
    if not cents or not books or not queries:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("qid"),
            F.lit(0).cast("long").alias("vec_id"),
            F.lit(0).cast("long").alias("adc"),
            F.lit(0).cast("int").alias("rn"))
    # no final orderBy: it would add a global range-sort exchange for
    # pure cosmetics (the driver compare is row-order-insensitive; rows
    # are already uniquely keyed by (qid, rn))
    return ivfpq_adc_batch_scan(
        codes, cents, books, queries,
        nprobe=_IVFT_NPROBE, k=_IVFPQ_BATCH_K)


def _ivfpq_batch_rerank_oracle() -> str:
    """Batch + refine composed: per qid, the ADC top-C candidates from
    the multi-query replay are re-ranked by exact cosine against that
    query's raw vector."""
    q, k, nprobe, iters = (_IVFPQ_BATCH_Q, _IVFPQ_BATCH_K, _IVFT_NPROBE,
                           _IVFT_ITERS)
    c = _IVFPQ_RERANK_C
    from .operators.clustering import MAX_QUANT as shift

    parts, adc_sql, probe_fold = _ivfpq_parts(k)
    mq_fold = probe_fold.replace("qq.qv", "mqq.qv")
    raw_cos = (
        "list_reduce(list_transform(list_zip(raw.v, qraw.qv), x -> x[1] * x[2]), (x, y) -> x + y)"
        " / (sqrt(list_reduce(list_transform(raw.v, x -> x * x), (x, y) -> x + y))"
        " * sqrt(list_reduce(list_transform(qraw.qv, x -> x * x), (x, y) -> x + y)))")
    parts.append(f"""
mqq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM fq
       WHERE vec_id < {q})""")
    parts.append(f"""
mprobe AS MATERIALIZED (SELECT qid, cluster FROM (
    SELECT mqq.qid, cc.cluster,
           row_number() OVER (PARTITION BY mqq.qid
                              ORDER BY {mq_fold}, cc.cluster) AS prn
    FROM c{iters} cc, mqq) WHERE prn <= {nprobe})""")
    parts.append(f"""
mqr AS MATERIALIZED (SELECT p.qid, p.cluster AS cell,
       list_transform(list_zip(mqq.qv, cc.v), x -> x[1] - x[2] + {shift}) AS qv
       FROM mprobe p JOIN c{iters} cc ON p.cluster = cc.cluster
       JOIN mqq ON p.qid = mqq.qid)""")
    parts.append(f"""
mcand AS MATERIALIZED (SELECT qid, vec_id FROM (
  SELECT qr.qid, e.vec_id,
         row_number() OVER (PARTITION BY qr.qid
                            ORDER BY {adc_sql}, e.vec_id) AS crn
  FROM enc e JOIN mqr qr ON e.cell = qr.cell) WHERE crn <= {c})""")
    parts.append(f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
qraw AS MATERIALIZED (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        FROM embeddings
        WHERE vec_id < {q} AND {_finite_vec_sql('embedding::DOUBLE[]')})""")
    return ("WITH " + ",".join(parts) + f"""
SELECT qid, vec_id, cosine, CAST(rn AS INTEGER) AS rn FROM (
  SELECT mc.qid, mc.vec_id, round({raw_cos}, 6) AS cosine,
         row_number() OVER (PARTITION BY mc.qid
                            ORDER BY {raw_cos} DESC, mc.vec_id) AS rn
  FROM mcand mc JOIN raw ON mc.vec_id = raw.vec_id
  JOIN qraw ON mc.qid = qraw.qid)
WHERE rn <= {k}""")


@register(
    "e_ivfpq_batch_rerank_topk",
    _ivfpq_batch_rerank_oracle(),
    doc="The COMPLETE production read path composed: batch multi-query "
        "ADC over the persisted codes (one pruned scan for Q queries) "
        "selects top-64 candidates PER QUERY, the per-query candidate "
        "ids + raw query vectors broadcast against the embeddings scan "
        "(union-of-candidates IN filter pushed), and the exact cosine "
        "re-ranks per query — batch retrieval with the refine stage "
        "the recall surface showed is where recall lives. Q=5, C=64, "
        "k=5; oracle replays training once and composes the multi-"
        "query ADC rank with a per-qid exact re-rank.",
)
def q_ivfpq_batch_rerank(spark, sf):
    from pyspark.sql import Window

    from .operators.clustering import ivfpq_adc_batch_scan, quantized_frame
    from .functions.vector import cosine_sim, valid_vector

    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    emb = T(spark, sf, "embeddings")
    qrows = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
             .filter(F.col("_kid") < _IVFPQ_BATCH_Q)
             .orderBy("_kid").select("_kid", "qv").collect())
    queries = [(int(r["_kid"]), [int(x) for x in r["qv"]]) for r in qrows]
    if not cents or not books or not queries:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("qid"),
            F.lit(0).cast("long").alias("vec_id"),
            F.lit(0.0).alias("cosine"),
            F.lit(0).cast("int").alias("rn"))
    # per-query ADC top-C candidate ids: ONE bounded collect (Q*C rows)
    cand = ivfpq_adc_batch_scan(codes, cents, books, queries,
                                nprobe=_IVFT_NPROBE, k=_IVFPQ_RERANK_C)
    crows = cand.select("qid", "vec_id").collect()
    by_q: dict[int, list[int]] = {}
    for r in crows:
        by_q.setdefault(int(r["qid"]), []).append(int(r["vec_id"]))
    all_ids = sorted({v for ids in by_q.values() for v in ids})
    # raw query vectors, broadcast beside the candidate memberships
    qraw = {int(r["vec_id"]): r["embedding"] for r in
            emb.filter(valid_vector("embedding"))
            .filter(F.col("vec_id") < _IVFPQ_BATCH_Q)
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("embedding")).collect()}
    pairs = [(q_, v) for q_, ids in by_q.items() for v in ids if q_ in qraw]
    memb = spark.createDataFrame(pairs, "qid long, vec_id long")
    qvecs = spark.createDataFrame(
        [(q_, [float(x) for x in qraw[q_]]) for q_ in sorted(by_q) if q_ in qraw],
        "qid long, qv array<double>")
    w = Window.partitionBy("qid").orderBy(F.col("_cos_raw").desc(),
                                          F.col("vec_id").asc())
    return (
        emb.filter(valid_vector("embedding"))
        .filter(F.col("vec_id").isin(all_ids))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(F.broadcast(memb), "vec_id")
        .join(F.broadcast(qvecs), "qid")
        .withColumn("_cos_raw", cosine_sim(F.col("v"), F.col("qv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _IVFPQ_BATCH_K)
        .select("qid", "vec_id", F.round("_cos_raw", 6).alias("cosine"),
                F.col("rn").cast("int").alias("rn"))
    )


# == round-14: corpus-scale semantic dedup served by the persisted index
# (VERDICT r13 task 1 — the SemDeDup shape). The embedding near-dup
# entry (d_embedding_near_dup) exact-scans within spherical cells; this
# pipeline instead READS the persisted IVFPQ index with the corpus
# itself as the query set: chunked batch ADC (one pruned codes scan per
# chunk, driver state bounded per chunk) proposes top-C approximate
# neighbors per doc, a DISTRIBUTED exact-cosine refine joins the
# candidate pairs back to the raw vectors (no driver-side IN list — the
# candidate set is corpus-sized here, unlike the k-row single-query
# refine), a threshold keeps semantic duplicates, and connected
# components pick one canonical doc per cluster.

# chunk bounds the per-chunk driver LUT state (chunk x nprobe x m x
# ksub ints ~ 8 MB at 2048) and NOT the result: each query's candidate
# set is independent, so the oracle doesn't model chunking. Larger
# chunk = fewer codes scans; 2048 keeps the collect far under driver
# memory while sf0.1 fits in one chunk.
_SEMD_CHUNK, _SEMD_C, _SEMD_THRESHOLD = 2048, 16, 0.4


_SEMD_RAW_COS = (
    "list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]), (x, y) -> x + y)"
    " / (sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y))"
    " * sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)))")


def _semantic_chain(sfx: str, nprobe: int, c: int, adc_sql: str,
                    mq_fold: str) -> list[str]:
    """One (nprobe, c) variant of the corpus-as-queries SemDeDup chain:
    mprobe{sfx} (per-query probed cells) -> mqr{sfx} (shifted residual
    queries) -> mcand{sfx} (ADC top-c per query) -> pe{sfx} (undirected
    candidate pairs) -> pj{sfx} (exact-cosine refined pair set,
    id_a < id_b). References the shared mqq/c{iters}/enc/raw CTEs, so
    a sweep appends several chains over ONE training replay (the
    e_ivfpq_recall_sweep shape applied to pair recall)."""
    from .operators.clustering import MAX_QUANT as shift

    iters, th = _IVFT_ITERS, _SEMD_THRESHOLD
    return [f"""
mprobe{sfx} AS MATERIALIZED (SELECT qid, cluster FROM (
    SELECT mqq.qid, cc.cluster,
           row_number() OVER (PARTITION BY mqq.qid
                              ORDER BY {mq_fold}, cc.cluster) AS prn
    FROM c{iters} cc, mqq) WHERE prn <= {nprobe})""", f"""
mqr{sfx} AS MATERIALIZED (SELECT p.qid, p.cluster AS cell,
       list_transform(list_zip(mqq.qv, cc.v), x -> x[1] - x[2] + {shift}) AS qv
       FROM mprobe{sfx} p JOIN c{iters} cc ON p.cluster = cc.cluster
       JOIN mqq ON p.qid = mqq.qid)""", f"""
mcand{sfx} AS MATERIALIZED (SELECT qid, vec_id FROM (
  SELECT qr.qid, e.vec_id,
         row_number() OVER (PARTITION BY qr.qid
                            ORDER BY {adc_sql}, e.vec_id) AS crn
  FROM enc e JOIN mqr{sfx} qr ON e.cell = qr.cell) WHERE crn <= {c})""", f"""
pe{sfx} AS (SELECT DISTINCT least(qid, vec_id) AS id_a,
              greatest(qid, vec_id) AS id_b
       FROM mcand{sfx} WHERE qid <> vec_id)""", f"""
pj{sfx} AS (SELECT id_a, id_b FROM pe{sfx}
       JOIN raw a ON pe{sfx}.id_a = a.vec_id
       JOIN raw b ON pe{sfx}.id_b = b.vec_id
       WHERE {_SEMD_RAW_COS} >= {th})"""]


def _semantic_parts() -> list[str]:
    """Shared oracle prefix of the SemDeDup family: the _ivfpq_parts
    training replay + the corpus-as-queries probe/residual/ADC-rank
    chain + the exact-cosine refine down to the thresholded undirected
    pair set ``pj (id_a < id_b)``."""
    parts, adc_sql, probe_fold = _ivfpq_parts(_SEMD_C)
    mq_fold = probe_fold.replace("qq.qv", "mqq.qv")
    parts.append("""
mqq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM fq)""")
    parts.append(f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')})""")
    parts += _semantic_chain("", _IVFT_NPROBE, _SEMD_C, adc_sql, mq_fold)
    return parts


def _semantic_dedup_oracle() -> str:
    """Composed replay: shared training prefix (_ivfpq_parts), the
    multi-query probe/residual/ADC-rank chain with mqq = the WHOLE
    quantized corpus, exact-cosine refine over the thresholded
    candidate pairs, then the recursive-CTE closure and canonical
    keep (the DEDUP_CLUSTERS_ORACLE tail)."""
    parts = _semantic_parts()
    parts.append("""
edges AS (SELECT id_a AS u, id_b AS v FROM pj
          UNION SELECT id_b, id_a FROM pj),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)""")
    return ("WITH RECURSIVE " + ",".join(parts) + """
SELECT u AS vec_id,
       CAST(min(r) AS BIGINT) AS component,
       CAST(CASE WHEN u = min(r) THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM reach GROUP BY u""")


@register(
    "pipeline_semantic_dedup",
    _semantic_dedup_oracle(),
    doc="VERDICT r13 task 1 — corpus-scale SEMANTIC dedup served by the "
        "persisted IVFPQ index (the SemDeDup shape): the whole corpus "
        "flows as the query set through chunked batch ADC "
        "(operators/clustering.ivfpq_corpus_candidates — one pruned "
        "codes scan per 512-query chunk, per-chunk driver state "
        "bounded at chunk x nprobe x m x ksub ints), candidate pairs "
        "are refined by a DISTRIBUTED exact-cosine join against the "
        "raw vectors (both sides shuffle-join on vec_id; no driver IN "
        "list — the candidate set is corpus-sized), cosine >= 0.4 "
        "keeps semantic duplicates, and connected components mark the "
        "min-id canonical per cluster. No all-pairs anywhere: "
        "candidates are index-pruned, the refine touches only "
        "candidate pairs. Oracle replays training once (shared "
        "_ivfpq_parts prefix), the corpus-wide multi-query ADC rank, "
        "the exact refine and the recursive-CTE closure.",
)
def q_semantic_dedup(spark, sf):
    pairs = _semantic_pair_frame(spark, sf)
    if pairs is None:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("vec_id"),
            F.lit(0).cast("long").alias("component"),
            F.lit(0).cast("int").alias("is_canonical"))
    return dedup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "component", "is_canonical")


def _semantic_pair_frame(spark, sf, nprobe: int = _IVFT_NPROBE,
                         c: int = _SEMD_C) -> DataFrame | None:
    """The SemDeDup pair set served by the persisted index — shared by
    the components pipeline, the recall audit and the (nprobe, c)
    sweep: chunked corpus-as-queries batch ADC candidates, undirected
    pair dedup, distributed exact-cosine refine, threshold.
    (id_a < id_b); None when the corpus/index is empty."""
    from .functions.vector import cosine_sim, valid_vector
    from .operators.clustering import (ivfpq_corpus_candidates,
                                       quantized_frame)

    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    emb = T(spark, sf, "embeddings")
    qf = quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
    cand = ivfpq_corpus_candidates(
        qf, codes, cents, books, chunk=_SEMD_CHUNK, nprobe=nprobe,
        k=c)
    if cand is None:
        return None
    v = (emb.filter(valid_vector("embedding"))
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("v")))
    return (
        cand.filter(F.col("qid") != F.col("vec_id"))
        .select(F.least("qid", "vec_id").alias("id_a"),
                F.greatest("qid", "vec_id").alias("id_b"))
        .distinct()
        .join(v.select(F.col("vec_id").alias("id_a"),
                       F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("vec_id").alias("id_b"),
                       F.col("v").alias("vb")), "id_b")
        .filter(cosine_sim(F.col("va"), F.col("vb")) >= _SEMD_THRESHOLD)
        .select("id_a", "id_b"))


def _semantic_recall_oracle() -> str:
    """Plain-WITH composition: the shared SemDeDup prefix down to the
    index-served pair set pj, an exact all-pairs reference over the
    same guarded corpus, and the counted LEFT JOIN."""
    parts = _semantic_parts()
    parts.append(f"""
ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM raw a JOIN raw b ON a.vec_id < b.vec_id
       WHERE {_SEMD_RAW_COS} >= {_SEMD_THRESHOLD}),
hit AS (SELECT ex.id_a, CASE WHEN pj.id_a IS NULL THEN 0 ELSE 1 END AS h
        FROM ex LEFT JOIN pj ON ex.id_a = pj.id_a AND ex.id_b = pj.id_b)""")
    return ("WITH " + ",".join(parts) + """
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(coalesce(sum(h), 0) AS BIGINT) AS n_hit,
       round(coalesce(sum(h), 0) * 1.0 / nullif(count(*), 0), 6) AS recall
FROM hit""")


@register(
    "d_semantic_dedup_recall",
    _semantic_recall_oracle(),
    doc="Recall audit of the index-served SemDeDup pair set against the "
        "EXACT all-pairs reference (d_embedding_near_dup's kernel, same "
        "threshold): what fraction of true cosine>=0.4 duplicate pairs "
        "the chunked batch-ADC candidate stage recovers — the number "
        "that tells you whether nprobe/C are adequate BEFORE shipping "
        "the dedup (the e_ivfpq_recall_audit discipline applied to the "
        "pipeline). The index pair set is a mathematical SUBSET of the "
        "exact set (its refine applies the same exact-cosine "
        "threshold), so n_hit counts the LEFT JOIN matches and recall "
        "= n_hit/n_exact. Oracle composes the shared SemDeDup prefix "
        "with the exact all-pairs reference.",
)
def q_semantic_recall(spark, sf):
    from .sources.tables import table_rowcount

    emb = T(spark, sf, "embeddings")
    exact = embedding_near_dup_pairs(
        emb, threshold=_SEMD_THRESHOLD,
        n_hint=table_rowcount(sf, "embeddings")).select("id_a", "id_b")
    idx = _semantic_pair_frame(spark, sf)
    if idx is None:
        idx = spark.range(0).select(
            F.lit(0).cast("long").alias("id_a"),
            F.lit(0).cast("long").alias("id_b"))
    joined = exact.join(idx.withColumn("_hit", F.lit(1)),
                        ["id_a", "id_b"], "left")
    agg = joined.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"))
    return agg.select(
        "n_exact", "n_hit",
        F.round(F.col("n_hit") / F.when(F.col("n_exact") > 0,
                                        F.col("n_exact")), 6)
        .alias("recall"))


# (nprobe, c) grid for the pair-recall sweep: nprobe 2->8 at the
# pipeline's C=16, plus a scaled-C point at the widest probe (the r13
# rerank lesson: candidate-list width must grow with probe width or the
# extra probed cells dilute into a fixed-length list).
_SEMD_SWEEP = ((2, 16), (4, 16), (8, 16), (8, 64))


def _semantic_sweep_oracle() -> str:
    """One training replay (_ivfpq_parts), one exact all-pairs
    reference, four (nprobe, c) candidate/refine chains, four counted
    rows — the e_ivfpq_recall_sweep composition applied to SemDeDup
    pair recall."""
    parts, adc_sql, probe_fold = _ivfpq_parts(_SEMD_C)
    mq_fold = probe_fold.replace("qq.qv", "mqq.qv")
    parts.append("""
mqq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM fq)""")
    parts.append(f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')})""")
    parts.append(f"""
ex AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM raw a JOIN raw b ON a.vec_id < b.vec_id
       WHERE {_SEMD_RAW_COS} >= {_SEMD_THRESHOLD})""")
    sels = []
    for nprobe, c in _SEMD_SWEEP:
        sfx = f"_{nprobe}_{c}"
        parts += _semantic_chain(sfx, nprobe, c, adc_sql, mq_fold)
        sels.append(
            f"SELECT CAST({nprobe} AS BIGINT) AS nprobe, "
            f"CAST({c} AS BIGINT) AS c, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM ex "
            f"JOIN pj{sfx} USING (id_a, id_b)) AS n_hit, "
            f"round((SELECT count(*) FROM ex JOIN pj{sfx} "
            f"USING (id_a, id_b)) * 1.0 "
            f"/ nullif((SELECT count(*) FROM ex), 0), 6) AS recall")
    return ("WITH " + ",".join(parts) + " "
            + " UNION ALL ".join(sels) + " ORDER BY nprobe, c")


@register(
    "d_semantic_dedup_recall_sweep",
    _semantic_sweep_oracle(),
    doc="The tuning surface behind d_semantic_dedup_recall's single "
        "gauge point (0.49 at the fixture's nprobe=4, C=16): pair "
        "recall of the index-served candidate stage at nprobe 2/4/8 "
        "with C=16, plus (8, 64) — the scaled-C point the r13 rerank "
        "sweep showed is required for wider probes to actually help "
        "(a fixed-length candidate list dilutes as more cells pour "
        "into it). The exact reference pair set is computed once and "
        "localCheckpointed; each grid point is one chunked batch-ADC "
        "pass + refine + a counted join against it. Oracle replays "
        "training once and appends four suffixed candidate/refine "
        "chains over the shared prefix.",
)
def q_semantic_recall_sweep(spark, sf):
    from .sources.tables import table_rowcount

    emb = T(spark, sf, "embeddings")
    exact = embedding_near_dup_pairs(
        emb, threshold=_SEMD_THRESHOLD,
        n_hint=table_rowcount(sf, "embeddings")).select("id_a", "id_b")
    exact = exact.localCheckpoint(eager=True)
    out = None
    for nprobe, c in _SEMD_SWEEP:
        idx = _semantic_pair_frame(spark, sf, nprobe=nprobe, c=c)
        if idx is None:
            idx = spark.range(0).select(
                F.lit(0).cast("long").alias("id_a"),
                F.lit(0).cast("long").alias("id_b"))
        row = (exact.join(idx.withColumn("_hit", F.lit(1)),
                          ["id_a", "id_b"], "left")
               .agg(F.count("*").cast("long").alias("n_exact"),
                    F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                    .alias("n_hit"))
               .select(F.lit(nprobe).cast("long").alias("nprobe"),
                       F.lit(c).cast("long").alias("c"),
                       "n_exact", "n_hit",
                       F.round(F.col("n_hit")
                               / F.when(F.col("n_exact") > 0,
                                        F.col("n_exact")), 6)
                       .alias("recall")))
        out = row if out is None else out.unionAll(row)
    return out.orderBy("nprobe", "c")


def _semantic_incremental_oracle() -> str:
    """Incremental twin: mqq restricted to the NEW batch (vec_id%5=0),
    candidates restricted to the EXISTING corpus (vec_id%5<>0), best
    corpus match per flagged batch doc — the d_incremental_near_dup
    output shape under the persisted index."""
    from .operators.clustering import MAX_QUANT as shift

    nprobe, iters, c, th = (_IVFT_NPROBE, _IVFT_ITERS, _SEMD_C,
                            _SEMD_THRESHOLD)
    parts, adc_sql, probe_fold = _ivfpq_parts(c)
    mq_fold = probe_fold.replace("qq.qv", "mqq.qv")
    parts.append("""
mqq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM fq
       WHERE vec_id % 5 = 0)""")
    parts.append(f"""
mprobe AS MATERIALIZED (SELECT qid, cluster FROM (
    SELECT mqq.qid, cc.cluster,
           row_number() OVER (PARTITION BY mqq.qid
                              ORDER BY {mq_fold}, cc.cluster) AS prn
    FROM c{iters} cc, mqq) WHERE prn <= {nprobe})""")
    parts.append(f"""
mqr AS MATERIALIZED (SELECT p.qid, p.cluster AS cell,
       list_transform(list_zip(mqq.qv, cc.v), x -> x[1] - x[2] + {shift}) AS qv
       FROM mprobe p JOIN c{iters} cc ON p.cluster = cc.cluster
       JOIN mqq ON p.qid = mqq.qid)""")
    parts.append(f"""
mcand AS MATERIALIZED (SELECT qid, vec_id FROM (
  SELECT qr.qid, e.vec_id,
         row_number() OVER (PARTITION BY qr.qid
                            ORDER BY {adc_sql}, e.vec_id) AS crn
  FROM enc e JOIN mqr qr ON e.cell = qr.cell
  WHERE e.vec_id % 5 <> 0) WHERE crn <= {c})""")
    parts.append(f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
sel AS (SELECT mc.qid, mc.vec_id, {_SEMD_RAW_COS} AS cos,
        row_number() OVER (PARTITION BY mc.qid
                           ORDER BY {_SEMD_RAW_COS} DESC, mc.vec_id) AS rn
        FROM mcand mc JOIN raw a ON mc.qid = a.vec_id
        JOIN raw b ON mc.vec_id = b.vec_id
        WHERE {_SEMD_RAW_COS} >= {th})""")
    return ("WITH " + ",".join(parts) + """
SELECT qid AS vec_id, vec_id AS dup_of, round(cos, 6) AS cosine
FROM sel WHERE rn = 1""")


@register(
    "d_semantic_incremental_near_dup",
    _semantic_incremental_oracle(),
    doc="Production SEMANTIC dedup shape: screen a NEW ingest batch "
        "(vec_id%5=0) against the EXISTING corpus (rest) through the "
        "persisted IVFPQ index — d_incremental_near_dup's asymmetric "
        "contract for embeddings (there the batch re-signs MinHash; "
        "here the batch quantizes and probes). Queries = the batch "
        "only (chunked batch ADC), candidates = corpus codes only "
        "(the %5<>0 filter composes with the probed-cell IN in the "
        "codes scan), exact-cosine refine, best corpus match per "
        "flagged batch doc. Steady state cost is batch-proportional: "
        "the corpus is touched only through its pruned codes cells. "
        "Oracle restricts mqq to the batch and the ADC rank to corpus "
        "rows, then replays the refine and the per-qid argmax.",
)
def q_semantic_incremental(spark, sf):
    from .functions.vector import cosine_sim, valid_vector
    from .operators.clustering import (ivfpq_corpus_candidates,
                                       quantized_frame)

    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    emb = T(spark, sf, "embeddings")
    empty = spark.range(0).select(
        F.lit(0).cast("long").alias("vec_id"),
        F.lit(0).cast("long").alias("dup_of"),
        F.lit(0.0).alias("cosine"))
    qf = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
          .filter(F.col("_kid") % 5 == 0))
    cand = ivfpq_corpus_candidates(
        qf, codes.filter(F.col("vec_id") % 5 != 0), cents, books,
        chunk=_SEMD_CHUNK, nprobe=_IVFT_NPROBE, k=_SEMD_C)
    if cand is None:
        return empty
    v = (emb.filter(valid_vector("embedding"))
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("v")))
    w = Window.partitionBy("qid").orderBy(F.col("_cos").desc(),
                                          F.col("vec_id").asc())
    return (
        cand
        .join(v.select(F.col("vec_id").alias("qid"),
                       F.col("v").alias("qv")), "qid")
        .join(v, "vec_id")
        .withColumn("_cos", cosine_sim(F.col("v"), F.col("qv")))
        .filter(F.col("_cos") >= _SEMD_THRESHOLD)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("qid").alias("vec_id"),
                F.col("vec_id").alias("dup_of"),
                F.round("_cos", 6).alias("cosine")))


# anchors = every 7th vector; candidates per anchor must survive PAST
# the duplicate band to reach negatives, hence C=64 (vs the dedup's 16);
# the band's upper bound IS the dedup threshold: a hard negative is by
# definition the most similar pair the dedup itself would NOT merge.
_HNEG_C, _HNEG_M, _HNEG_LO = 64, 4, 0.15


def _anchor_chain_parts() -> list[str]:
    """Shared oracle prefix of the contrastive-mining family: the
    _ivfpq_parts training replay, the ANCHOR-restricted (vec_id%7=0)
    batch ADC chain at C=64, and the exact-cosine refine over every
    non-self candidate (`selc` — unfiltered by band, so both the
    positive and the negative legs rank over the same frame)."""
    from .operators.clustering import MAX_QUANT as shift

    nprobe, iters, c = _IVFT_NPROBE, _IVFT_ITERS, _HNEG_C
    parts, adc_sql, probe_fold = _ivfpq_parts(c)
    mq_fold = probe_fold.replace("qq.qv", "mqq.qv")
    parts.append("""
mqq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM fq
       WHERE vec_id % 7 = 0)""")
    parts.append(f"""
mprobe AS MATERIALIZED (SELECT qid, cluster FROM (
    SELECT mqq.qid, cc.cluster,
           row_number() OVER (PARTITION BY mqq.qid
                              ORDER BY {mq_fold}, cc.cluster) AS prn
    FROM c{iters} cc, mqq) WHERE prn <= {nprobe})""")
    parts.append(f"""
mqr AS MATERIALIZED (SELECT p.qid, p.cluster AS cell,
       list_transform(list_zip(mqq.qv, cc.v), x -> x[1] - x[2] + {shift}) AS qv
       FROM mprobe p JOIN c{iters} cc ON p.cluster = cc.cluster
       JOIN mqq ON p.qid = mqq.qid)""")
    # NB: self-candidates stay IN the top-C rank (the Spark kernel
    # keeps them — they occupy an ADC slot on both engines identically)
    # and are dropped at the refine, mirroring the entry's post-kernel
    # qid != vec_id filter.
    parts.append(f"""
mcand AS MATERIALIZED (SELECT qid, vec_id FROM (
  SELECT qr.qid, e.vec_id,
         row_number() OVER (PARTITION BY qr.qid
                            ORDER BY {adc_sql}, e.vec_id) AS crn
  FROM enc e JOIN mqr qr ON e.cell = qr.cell) WHERE crn <= {c})""")
    parts.append(f"""
raw AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE {_finite_vec_sql('embedding::DOUBLE[]')}),
selc AS MATERIALIZED (SELECT mc.qid, mc.vec_id, {_SEMD_RAW_COS} AS cos
        FROM mcand mc JOIN raw a ON mc.qid = a.vec_id
        JOIN raw b ON mc.vec_id = b.vec_id
        WHERE mc.qid <> mc.vec_id)""")
    return parts


def _hard_negative_oracle() -> str:
    """Anchor chain + the [lo, dup) band filter and per-anchor top-m
    rank (filter BEFORE rank == the entry's filter-then-row_number)."""
    lo, hi, m = _HNEG_LO, _SEMD_THRESHOLD, _HNEG_M
    parts = _anchor_chain_parts()
    parts.append(f"""
sel AS (SELECT qid, vec_id, cos,
        row_number() OVER (PARTITION BY qid
                           ORDER BY cos DESC, vec_id) AS rn
        FROM selc WHERE cos >= {lo} AND cos < {hi})""")
    return ("WITH " + ",".join(parts) + f"""
SELECT qid AS anchor_id, vec_id AS negative_id, round(cos, 6) AS cosine
FROM sel WHERE rn <= {m}""")


@register(
    "e_hard_negative_mining",
    _hard_negative_oracle(),
    doc="Contrastive-training data op: per anchor (every 7th vector), "
        "the top-4 HARD negatives — the most similar corpus vectors "
        "that are still below the dedup threshold (cosine in "
        "[0.15, 0.4)) — mined through the persisted IVFPQ index. The "
        "anchors flow through the chunked batch-ADC kernel with a "
        "WIDER candidate list (C=64 vs the dedup's 16: negatives sit "
        "past the duplicate band by construction, so the list must "
        "reach deeper), self-candidates dropped in-kernel, then the "
        "distributed exact-cosine refine keeps the band and a per-"
        "anchor rank takes the hardest 4. This is the embedding-model "
        "fine-tuning feed (in-batch negatives are easy; these are "
        "mined), and at 100 TB it reads the corpus only through pruned "
        "codes cells. Oracle replays the anchor-restricted chain with "
        "the band filter and top-m rank.",
)
def q_hard_negative_mining(spark, sf):
    refined = _anchor_refined_frame(spark, sf)
    if refined is None:
        return spark.range(0).select(
            F.lit(0).cast("long").alias("anchor_id"),
            F.lit(0).cast("long").alias("negative_id"),
            F.lit(0.0).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.col("_cos").desc(),
                                          F.col("vec_id").asc())
    return (
        refined
        .filter((F.col("_cos") >= _HNEG_LO)
                & (F.col("_cos") < _SEMD_THRESHOLD))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HNEG_M)
        .select(F.col("qid").alias("anchor_id"),
                F.col("vec_id").alias("negative_id"),
                F.round("_cos", 6).alias("cosine")))


def _anchor_refined_frame(spark, sf) -> DataFrame | None:
    """(qid, vec_id, _cos) for every non-self candidate of every anchor
    (vec_id%7=0) through the persisted index at C=64 — the shared frame
    the negative band rank AND the positive top-1 both consume; None
    when the corpus/index is empty."""
    from .functions.vector import cosine_sim, valid_vector
    from .operators.clustering import (ivfpq_corpus_candidates,
                                       quantized_frame)

    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    emb = T(spark, sf, "embeddings")
    qf = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
          .filter(F.col("_kid") % 7 == 0))
    cand = ivfpq_corpus_candidates(
        qf, codes, cents, books, chunk=_SEMD_CHUNK, nprobe=_IVFT_NPROBE,
        k=_HNEG_C)
    if cand is None:
        return None
    v = (emb.filter(valid_vector("embedding"))
         .select("vec_id", F.col("embedding").cast("array<double>")
                 .alias("v")))
    return (
        cand.filter(F.col("qid") != F.col("vec_id"))
        .join(v.select(F.col("vec_id").alias("qid"),
                       F.col("v").alias("qv")), "qid")
        .join(v, "vec_id")
        .withColumn("_cos", cosine_sim(F.col("v"), F.col("qv")))
        .select("qid", "vec_id", "_cos"))


def _contrastive_triplets_oracle() -> str:
    """Anchor chain + BOTH legs over the shared refined frame: the
    positive is the top-1 candidate at-or-above the dup threshold, the
    negatives are the band top-m; anchors lacking a positive drop at
    the inner join (a contrastive pair needs one)."""
    lo, hi, m = _HNEG_LO, _SEMD_THRESHOLD, _HNEG_M
    parts = _anchor_chain_parts()
    parts.append(f"""
pos AS (SELECT qid, vec_id, cos FROM (
    SELECT qid, vec_id, cos,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos DESC, vec_id) AS rn
    FROM selc WHERE cos >= {hi}) WHERE rn = 1)""")
    parts.append(f"""
neg AS (SELECT qid, vec_id, cos FROM (
    SELECT qid, vec_id, cos,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos DESC, vec_id) AS rn
    FROM selc WHERE cos >= {lo} AND cos < {hi}) WHERE rn <= {m})""")
    return ("WITH " + ",".join(parts) + """
SELECT p.qid AS anchor_id, p.vec_id AS positive_id,
       round(p.cos, 6) AS pos_cosine,
       n.vec_id AS negative_id, round(n.cos, 6) AS neg_cosine
FROM pos p JOIN neg n ON p.qid = n.qid""")


@register(
    "pipeline_contrastive_triplets",
    _contrastive_triplets_oracle(),
    doc="The composed contrastive-training deliverable: (anchor, "
        "positive, hard-negative) triplets from ONE index read. The "
        "anchor set's C=64 batch-ADC candidates are refined with exact "
        "cosine once, then BOTH legs rank the same frame — positive = "
        "top-1 at-or-above the dedup threshold (the anchor's best "
        "duplicate), negatives = the [0.15, 0.4) band top-4 "
        "(e_hard_negative_mining's contract) — and an inner join on "
        "the anchor emits one row per (anchor, negative) with both "
        "cosines; anchors without a positive drop (a triplet needs "
        "one). The refined frame is localCheckpointed so the kernel's "
        "chunked collects run once, not once per leg. Oracle ranks the "
        "shared `selc` frame twice over one training replay.",
)
def q_contrastive_triplets(spark, sf):
    refined = _anchor_refined_frame(spark, sf)
    empty = spark.range(0).select(
        F.lit(0).cast("long").alias("anchor_id"),
        F.lit(0).cast("long").alias("positive_id"),
        F.lit(0.0).alias("pos_cosine"),
        F.lit(0).cast("long").alias("negative_id"),
        F.lit(0.0).alias("neg_cosine"))
    if refined is None:
        return empty
    refined = refined.localCheckpoint(eager=True)
    w = Window.partitionBy("qid").orderBy(F.col("_cos").desc(),
                                          F.col("vec_id").asc())
    pos = (refined.filter(F.col("_cos") >= _SEMD_THRESHOLD)
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select(F.col("qid").alias("anchor_id"),
                   F.col("vec_id").alias("positive_id"),
                   F.round("_cos", 6).alias("pos_cosine")))
    neg = (refined.filter((F.col("_cos") >= _HNEG_LO)
                          & (F.col("_cos") < _SEMD_THRESHOLD))
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= _HNEG_M)
           .select(F.col("qid").alias("anchor_id"),
                   F.col("vec_id").alias("negative_id"),
                   F.round("_cos", 6).alias("neg_cosine")))
    return pos.join(neg, "anchor_id").select(
        "anchor_id", "positive_id", "pos_cosine",
        "negative_id", "neg_cosine")


# == trained quality classifier (depth-2 CART, exact integer) ==========

_QTREE_STOPS = "['the','a','of','and','to','in','is','on','for','with']"


def _qtree_fv(b: str, row: str = "t") -> str:
    """The b{n}-selected feature's value on row ``row`` (scalar
    subqueries so an empty b{n} folds to NULL, never an error)."""
    return (f"(CASE (SELECT feat FROM {b}) WHEN 'alpha' THEN {row}.alpha "
            f"WHEN 'mlen' THEN {row}.mlen WHEN 'ntok' THEN {row}.ntok "
            f"ELSE {row}.stop END)")


def _qtree_node_parts(src: str, b: str) -> list[str]:
    """m/s/b CTE chain for one tree node: melt -> per-(feat, val)
    class histogram -> window cumsum (every candidate split's left
    counts in one pass) -> scaled-Gini arg-min with the (imp, feat,
    val) tie-break, LIMIT 1. Mirrors operators.tree.best_split."""
    from .operators.tree import FEATURES, IMP_SCALE

    melt = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, y FROM {src}" for f in FEATURES)
    return [f"""
m{b} AS (SELECT feat, val, CAST(count(*) AS BIGINT) AS n_v,
         CAST(sum(y) AS BIGINT) AS p_v
         FROM ({melt}) GROUP BY feat, val)""", f"""
s{b} AS (SELECT feat, val,
    CAST(sum(n_v) OVER (PARTITION BY feat ORDER BY val
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nL,
    CAST(sum(p_v) OVER (PARTITION BY feat ORDER BY val
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pL,
    CAST(sum(n_v) OVER (PARTITION BY feat) AS BIGINT) AS n,
    CAST(sum(p_v) OVER (PARTITION BY feat) AS BIGINT) AS p
    FROM m{b})""", f"""
b{b} AS (SELECT feat, val AS thr, n, p,
    (pL * (nL - pL) * {IMP_SCALE}) // nL
    + ((p - pL) * ((n - nL) - (p - pL)) * {IMP_SCALE}) // (n - nL) AS imp
    FROM s{b} WHERE nL < n ORDER BY imp, feat, val LIMIT 1)"""]


def _qtree_parts() -> list[str]:
    """Shared prefix of the quality-tree family: integer quality
    features + rule label, the doc_id%4 training slice, and the
    bit-exact replay of the three histogram split-finding passes and
    the four-leaf stats (operators/tree.py fit_depth2)."""
    from .operators.tree import FEAT_SCALE

    parts = [f"""
fx AS MATERIALIZED (SELECT doc_id,
       (alpha_len * {FEAT_SCALE}) // greatest(n_chars, 1) AS alpha,
       least(((n_chars - n_tokens + 1) * 64) // greatest(n_tokens, 1), 512) AS mlen,
       least(n_tokens, 512) AS ntok,
       (stop_hits * {FEAT_SCALE}) // greatest(n_tokens, 1) AS stop,
       CASE WHEN n_tokens >= 20 AND stop_hits * 100 >= n_tokens
                 AND alpha_len * 2 >= n_chars THEN 1 ELSE 0 END AS y
  FROM (SELECT doc_id, length(text) AS n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_len,
               CAST(len(list_filter(toks, t2 -> list_contains({_QTREE_STOPS}, lower(t2)))) AS BIGINT) AS stop_hits
        FROM (SELECT doc_id, text,
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS toks
              FROM (SELECT doc_id, coalesce(text, '') AS text
                    FROM documents))))""", """
tr0 AS MATERIALIZED (SELECT * FROM fx WHERE doc_id % 4 = 0)"""]
    parts += _qtree_node_parts("tr0", "0")
    parts.append(f"""
trL AS MATERIALIZED (SELECT t.* FROM tr0 t, b0
      WHERE (CASE b0.feat WHEN 'alpha' THEN t.alpha WHEN 'mlen' THEN t.mlen
             WHEN 'ntok' THEN t.ntok ELSE t.stop END) <= b0.thr)""")
    parts.append(f"""
trR AS MATERIALIZED (SELECT t.* FROM tr0 t, b0
      WHERE (CASE b0.feat WHEN 'alpha' THEN t.alpha WHEN 'mlen' THEN t.mlen
             WHEN 'ntok' THEN t.ntok ELSE t.stop END) > b0.thr)""")
    parts += _qtree_node_parts("trL", "1")
    parts += _qtree_node_parts("trR", "2")
    parts.append(f"""
lv AS (SELECT CASE WHEN {_qtree_fv('b1')} <= (SELECT thr FROM b1)
              THEN 3 ELSE 4 END AS node,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(t.y) AS BIGINT) AS pos
       FROM trL t WHERE EXISTS (SELECT 1 FROM b1) GROUP BY 1
       UNION ALL
       SELECT 1, CAST(count(*) AS BIGINT), CAST(sum(y) AS BIGINT)
       FROM trL WHERE NOT EXISTS (SELECT 1 FROM b1) GROUP BY 1
       UNION ALL
       SELECT CASE WHEN {_qtree_fv('b2')} <= (SELECT thr FROM b2)
              THEN 5 ELSE 6 END,
       CAST(count(*) AS BIGINT), CAST(sum(t.y) AS BIGINT)
       FROM trR t WHERE EXISTS (SELECT 1 FROM b2) GROUP BY 1
       UNION ALL
       SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(y) AS BIGINT)
       FROM trR WHERE NOT EXISTS (SELECT 1 FROM b2) GROUP BY 1)""")
    return parts


def _qtree_pred_sql(row: str = "t") -> str:
    """The fitted tree as one nested CASE over scalar subqueries —
    NULL-free because a leaf row exists for exactly the paths the
    fitted tree has (node 1 xor nodes 3/4; node 2 xor nodes 5/6)."""
    def lbl(node: int) -> str:
        return (f"(SELECT CASE WHEN 2 * pos >= n THEN 1 ELSE 0 END "
                f"FROM lv WHERE node = {node})")
    left = (f"CASE WHEN EXISTS (SELECT 1 FROM b1) THEN "
            f"(CASE WHEN {_qtree_fv('b1', row)} <= (SELECT thr FROM b1) "
            f"THEN {lbl(3)} ELSE {lbl(4)} END) ELSE {lbl(1)} END")
    right = (f"CASE WHEN EXISTS (SELECT 1 FROM b2) THEN "
             f"(CASE WHEN {_qtree_fv('b2', row)} <= (SELECT thr FROM b2) "
             f"THEN {lbl(5)} ELSE {lbl(6)} END) ELSE {lbl(2)} END")
    return (f"CASE WHEN {_qtree_fv('b0', row)} <= (SELECT thr FROM b0) "
            f"THEN ({left}) ELSE ({right}) END")


def _qtree_train_oracle() -> str:
    parts = _qtree_parts()
    return ("WITH " + ",".join(parts) + """
SELECT CAST(0 AS BIGINT) AS node, 'split' AS kind, feat AS feature,
       CAST(thr AS BIGINT) AS threshold, n, p AS pos,
       CAST(NULL AS BIGINT) AS label FROM b0
UNION ALL
SELECT 1, 'split', feat, thr, n, p, NULL FROM b1
UNION ALL
SELECT 2, 'split', feat, thr, n, p, NULL FROM b2
UNION ALL
SELECT node, 'leaf', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), n, pos,
       CAST(CASE WHEN 2 * pos >= n THEN 1 ELSE 0 END AS BIGINT) FROM lv""")


_QTREE_TRAIN_SCHEMA = ("node long, kind string, feature string, "
                       "threshold long, n long, pos long, label long")


@register(
    "t_quality_tree_train",
    _qtree_train_oracle(),
    doc="TRAIN a quality classifier on a labeled slice (doc_id%4=0) — "
        "the fastText-filter curation step, here a depth-2 CART fitted "
        "by exact integer histogram split-finding (operators/tree.py): "
        "one distributed (feat, val) class-histogram pass per node, a "
        "window cumsum turning the histogram into every candidate "
        "split's left/right counts, scaled-Gini (x65536, floor "
        "division) arg-min with (imp, feat, val) tie-break. Driver "
        "state is ONE collected row per node (kmeans_fit / "
        "bpe_train_merges discipline) — at 100 TB each pass is a "
        "shuffle on (feat, val) with map-side partials; nothing "
        "corpus-sized leaves the cluster. Label = the hand-written "
        "quality keep rule (t_quality_scores) restated in exact "
        "rational arithmetic — the distillation target. Output: the 3 "
        "split nodes + the fitted leaves with class counts. Oracle "
        "replays the whole fit bit-exactly (integer-only math).",
)
def q_qtree_train(spark, sf):
    from .operators.tree import fit_depth2, leaf_label, quality_features

    fx = quality_features(T(spark, sf, "documents"))
    tree = fit_depth2(fx.filter(F.col("doc_id") % 4 == 0))
    if tree is None:
        return spark.createDataFrame([], _QTREE_TRAIN_SCHEMA)
    rows = [(0, "split", tree.root.feat, tree.root.thr, tree.root.n,
             tree.root.pos, None)]
    for nid, sp in ((1, tree.left), (2, tree.right)):
        if sp is not None:
            rows.append((nid, "split", sp.feat, sp.thr, sp.n, sp.pos, None))
    for nid, (n, pos) in sorted(tree.leaves.items()):
        rows.append((nid, "leaf", None, None, n, pos, leaf_label(n, pos)))
    return spark.createDataFrame(rows, _QTREE_TRAIN_SCHEMA)


def _qtree_eval_oracle() -> str:
    parts = _qtree_parts()
    parts.append(f"""
pr AS (SELECT t.y, {_qtree_pred_sql()} AS pred
       FROM fx t WHERE t.doc_id % 4 <> 0
         AND EXISTS (SELECT 1 FROM b0))""")
    return ("WITH " + ",".join(parts) + """
SELECT CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       round(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS accuracy
FROM pr GROUP BY 1 = 1""")


@register(
    "t_quality_tree_eval",
    _qtree_eval_oracle(),
    doc="HOLDOUT evaluation of the trained quality tree: confusion "
        "matrix + accuracy on the doc_id%4<>0 rows the fit never saw — "
        "the number that says whether the distilled scorer can replace "
        "the rule (fixture: 0.93-0.94 vs 0.86-0.87 majority baseline). "
        "The fitted tree is a literal nested-CASE projection, so the "
        "eval plan is one scan + one 1-row aggregate. Oracle replays "
        "the fit and the same CASE via scalar subqueries.",
)
def q_qtree_eval(spark, sf):
    from .operators.tree import fit_depth2, predict_expr, quality_features

    fx = quality_features(T(spark, sf, "documents"))
    tree = fit_depth2(fx.filter(F.col("doc_id") % 4 == 0))
    empty = spark.createDataFrame(
        [], "tp long, fp long, fn long, tn long, accuracy double")
    if tree is None:
        return empty
    ho = (fx.filter(F.col("doc_id") % 4 != 0)
          .withColumn("pred", predict_expr(tree)))
    return (ho.groupBy(F.lit(1).alias("_g"))
            .agg(F.sum(((F.col("pred") == 1) & (F.col("y") == 1)).cast("long")).alias("tp"),
                 F.sum(((F.col("pred") == 1) & (F.col("y") == 0)).cast("long")).alias("fp"),
                 F.sum(((F.col("pred") == 0) & (F.col("y") == 1)).cast("long")).alias("fn"),
                 F.sum(((F.col("pred") == 0) & (F.col("y") == 0)).cast("long")).alias("tn"),
                 F.round(F.sum((F.col("pred") == F.col("y")).cast("long"))
                         / F.count("*"), 6).alias("accuracy"))
            .drop("_g"))


def _qtree_apply_oracle() -> str:
    parts = _qtree_parts()
    return ("WITH " + ",".join(parts) + f"""
SELECT t.doc_id,
       CAST(CASE WHEN t.doc_id % 4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_train,
       CAST(t.y AS BIGINT) AS label,
       CAST({_qtree_pred_sql()} AS BIGINT) AS pred
FROM fx t WHERE EXISTS (SELECT 1 FROM b0)""")


@register(
    "t_quality_tree_apply",
    _qtree_apply_oracle(),
    doc="CORPUS-WIDE apply of the trained quality tree — the 100 TB "
        "read shape: the fitted tree is collapsed into a literal "
        "nested-CASE column (predict_expr), so scoring is a single "
        "whole-stage-codegen'd scan-and-project with ZERO joins and "
        "ZERO exchanges; per-doc (is_train, label, pred) is the frame "
        "a filter/mixing stage consumes downstream. Oracle replays "
        "the fit and applies the same CASE to every row.",
)
def q_qtree_apply(spark, sf):
    from .operators.tree import fit_depth2, predict_expr, quality_features

    fx = quality_features(T(spark, sf, "documents"))
    tree = fit_depth2(fx.filter(F.col("doc_id") % 4 == 0))
    empty = spark.createDataFrame(
        [], "doc_id long, is_train long, label long, pred long")
    if tree is None:
        return empty
    return fx.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_train"),
        F.col("y").cast("long").alias("label"),
        predict_expr(tree).alias("pred"))


def _qtree_artifact_rows(tree) -> list[tuple]:
    """The train entry's node rows + an `imp` column so the fitted
    Split objects round-trip exactly; [] for the no-tree case."""
    from .operators.tree import leaf_label

    if tree is None:
        return []
    rows = [(0, "split", tree.root.feat, tree.root.thr,
             tree.root.n, tree.root.pos, None, tree.root.imp)]
    for nid, sp in ((1, tree.left), (2, tree.right)):
        if sp is not None:
            rows.append((nid, "split", sp.feat, sp.thr, sp.n,
                         sp.pos, None, sp.imp))
    for nid, (n, pos) in sorted(tree.leaves.items()):
        rows.append((nid, "leaf", None, None, n, pos,
                     leaf_label(n, pos), None))
    return rows


def _tree_from_node_rows(rows):
    """Depth2Tree back from persisted node rows; None when no root."""
    from .operators.tree import Depth2Tree, Split

    splits = {int(r["node"]): Split(r["feature"], int(r["threshold"]),
                                    int(r["n"]), int(r["pos"]), int(r["imp"]))
              for r in rows if r["kind"] == "split"}
    if 0 not in splits:
        return None
    leaves = {int(r["node"]): (int(r["n"]), int(r["pos"]))
              for r in rows if r["kind"] == "leaf"}
    return Depth2Tree(splits[0], splits.get(1), splits.get(2), leaves)


def quality_tree_dir(spark: SparkSession, sf: str) -> str:
    """Persisted TRAINED quality-tree artifact (train once per corpus,
    cached by source identity like every index artifact): one tiny
    parquet of node rows — the classifier artifact a curation pipeline
    ships."""
    def build(tmp: str) -> None:
        from .operators.tree import fit_depth2, quality_features

        fx = quality_features(T(spark, sf, "documents"))
        tree = fit_depth2(fx.filter(F.col("doc_id") % 4 == 0))
        spark.createDataFrame(
            _qtree_artifact_rows(tree), _QTREE_TRAIN_SCHEMA + ", imp long"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)

    return _ingest_artifact_dir(sf, "documents", "quality-tree-v1-d2", build)


def _load_quality_tree(spark: SparkSession, sf: str):
    """Depth2Tree from the persisted nodes table — a <=7-row collect."""
    return _tree_from_node_rows(
        _read_tiny_parquet(quality_tree_dir(spark, sf), ["node"]))


def ensure_topic_quality_tree(spark: SparkSession, topic_dir: str,
                              artifact_dir: str) -> tuple[str, str]:
    """The classifier joins the lifecycle contract as its 5th artifact
    family (BM25 / PQ codes / IVF cells / IVFPQ precedent): the
    depth-2 tree is trained from a LIVING topic's documents and
    persisted under `nodes`; the training slice is the md5
    stable_bucket < 25 of the STRING message id (the fixture entries'
    doc_id%4 works only for integer ids; the hash split is the
    p_deterministic_split discipline and reproduces on any engine);
    staleness is decided by ensure_artifact — append => stale
    => retrain picks up the new rows; compact() => compacted => the
    fitted tree is served AS-IS (it is a deterministic function of
    content, which compaction preserves). Returns
    ``(artifact_dir, verdict)`` with the PRE-build classification."""
    import os

    from .model.artifacts import ensure_artifact

    def rebuild(adir: str) -> None:
        from .operators.sampling import stable_bucket
        from .operators.tree import fit_depth2, leaf_label, quality_features

        fx = quality_features(topic_docs_frame(spark, topic_dir))
        tree = fit_depth2(fx.filter(stable_bucket(F.col("doc_id")) < 25))
        if tree is None or len({leaf_label(*v)
                                for v in tree.leaves.values()}) < 2:
            # degenerate hash slice: on a tiny topic the 25% md5 bucket
            # can catch <2 feature-distinct rows (rootless tree) — or
            # rows of a SINGLE label class, which trains a structurally
            # valid tree that cannot separate (every leaf votes the
            # same way). Message ids are wall-clock-stamped, so WHICH
            # rows land in the slice is not reproducible run to run
            # (r14: both modes found as intermittent lifecycle-golden
            # failures). Fall back to training on the whole topic:
            # still a deterministic function of content, which is
            # exactly what the compact-serves-as-is lifecycle verdict
            # requires. (`or tree` keeps the slice tree when the whole
            # topic is itself too degenerate to fit.)
            tree = fit_depth2(fx) or tree
        spark.createDataFrame(
            _qtree_artifact_rows(tree), _QTREE_TRAIN_SCHEMA + ", imp long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(adir, "nodes"))

    verdict = ensure_artifact(topic_dir, artifact_dir, rebuild,
                              recipe="quality-tree-v1-d2")
    return artifact_dir, verdict


@register(
    "t_quality_tree_learned_apply",
    _qtree_apply_oracle(),
    doc="The persisted twin of t_quality_tree_apply, completing the "
        "train-once/persist/query-flat arc for the classifier family "
        "(t_bpe_learned_apply's contract): the fitted tree is persisted "
        "as a <=7-row nodes parquet (quality_tree_dir), and the query "
        "path collects that artifact and runs ONLY the nested-CASE "
        "projection scan — no histogram passes, no training jobs. "
        "Shares t_quality_tree_apply's oracle (the fitted tree is a "
        "deterministic function of the corpus), proving classifier-"
        "artifact parity the way the persisted index entries do.",
)
def q_qtree_learned_apply(spark, sf):
    from .operators.tree import predict_expr, quality_features

    tree = _load_quality_tree(spark, sf)
    if tree is None:
        return spark.createDataFrame(
            [], "doc_id long, is_train long, label long, pred long")
    fx = quality_features(T(spark, sf, "documents"))
    return fx.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("is_train"),
        F.col("y").cast("long").alias("label"),
        predict_expr(tree).alias("pred"))


def ivfpq_artifacts_dir(spark: SparkSession, sf: str) -> str:
    """Persisted composite-index artifacts (operators/clustering.
    ivfpq_build_artifacts): codes/ — (vec_id, cell, _code0.._code7
    tinyint), the per-cell residual PQ codes next to the corpus —
    plus centroids/ (cell, v) and books/ (mi, code, v), the tiny
    trained tables the query path collects. Built once per corpus,
    cached by source identity; the tag encodes every training
    hyperparameter so a recipe change misses the cache (the oracle
    retrains live and would go red against a stale artifact)."""
    import os

    def build(tmp: str) -> None:
        from .operators.clustering import ivfpq_build_artifacts

        codes, cents, books = ivfpq_build_artifacts(
            T(spark, sf, "embeddings"), n_cells=_IVFT_CELLS, m=_PQT_M,
            ksub=_PQT_KSUB, iters=_IVFT_ITERS, sample_cap=_PQT_CAP,
            dim=_KMEANS_DIM, scale=_KMEANS_SCALE, offset=_KMEANS_OFFSET)
        codes.write.mode("overwrite").parquet(os.path.join(tmp, "codes"))
        spark.createDataFrame(
            [(j, [int(x) for x in c]) for j, c in enumerate(cents)],
            "cell long, v array<long>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "centroids"))
        spark.createDataFrame(
            [(mi, ci, [int(x) for x in cw])
             for mi, book in enumerate(books) for ci, cw in enumerate(book)],
            "mi long, code long, v array<long>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "books"))

    tag = (f"ivfpq-v1-c{_IVFT_CELLS}-p{_IVFT_NPROBE}-m{_PQT_M}-k{_PQT_KSUB}"
           f"-i{_IVFT_ITERS}-cap{_PQT_CAP}-d{_KMEANS_DIM}-s{_KMEANS_SCALE}"
           f"-o{_KMEANS_OFFSET}")
    return _ingest_artifact_dir(sf, "embeddings", tag, build)


@register(
    "e_ivfpq_codes_topk",
    _ivfpq_oracle(),
    doc="VERDICT r11 item 1 — the composite IVFPQ over INGEST-PERSISTED "
        "artifacts, completing the persisted-artifact symmetry (PQ and "
        "IVF each already have a codes/cells twin): per-cell residual "
        "PQ codes, coarse centroids and residual codebooks are trained "
        "+ encoded once per corpus (ivfpq_artifacts_dir); the "
        "query-time plan collects the two tiny trained tables, probes "
        "the 4 nearest cells driver-side, IN-filters the codes parquet "
        "scan on cell (PushedFilters — plan-pinned) and ranks by the "
        "per-probed-cell ADC CASE into TakeOrderedAndProject. NO "
        "training job and NO float-vector IO in the query path; the "
        "embedding column is gone by construction. Same oracle as "
        "e_ivfpq_topk (the artifacts are a deterministic function of "
        "the corpus), proving index-path parity.",
)
def q_ivfpq_codes(spark, sf):
    from .operators.clustering import ivfpq_adc_scan, quantized_frame

    emb = T(spark, sf, "embeddings")
    codes, cents, books = _load_ivfpq_artifacts(spark, sf)
    qrow = (quantized_frame(emb, _KMEANS_DIM, _KMEANS_SCALE, _KMEANS_OFFSET)
            .filter(F.col("_kid") == 0).select("qv").head())
    if not cents or not books or qrow is None:
        return codes.select(
            F.col("vec_id"), F.lit(None).cast("long").alias("adc")
        ).where(F.lit(False))
    return ivfpq_adc_scan(codes, cents, books, [int(x) for x in qrow["qv"]],
                          nprobe=_IVFT_NPROBE, k=10)


# == exports consumed by __spark_entry__.py ==============================

# The driver's CORRECTNESS gate hashes the FIRST 50 entries of queries() in
# insertion order.  Rounds 1-6 burned down the unverified remainder; as of
# round 6 every one of the 238 registry entries has a hash-green driver row
# (CORRECTNESS_r01-r06 union, zero reds).  The window policy therefore
# flipped in round 7 from BURN-DOWN to STALENESS ROTATION (VERDICT r06
# item 2): never-green entries (new registrations, or entries whose
# implementation changed after being green — REMOVE those from their round
# set) still jump the queue, and the remaining slots re-front the entries
# whose last green row is OLDEST, so no entry's driver verification ages
# past ~5 rounds while shared helpers keep changing underneath it.
# _LAST_GREEN is built by applying the round sets in ascending order, so a
# name listed in several sets (a re-green) takes the latest round.
# Round-14 window: 2 never-green (p_packing_learned_bpe,
# pipeline_semantic_dedup) + the 25 stalest r08 greens
# (pipeline_corpus_curation, t_repetition_scores, p_weighted_mix,
# the tpch_q8..q15 block, ...) + 23 r09 greens — stalest-first, shown
# by scripts/preflight_window.py.
_ROUND1_VERIFIED = frozenset({
    "flagship_revenue_by_nation", "r01_scan_project", "r03_filter",
    "r04_inner_join", "r05_broadcast_join", "r06_left_join",
    "r06_full_outer_join", "r07_semi_join", "r07_anti_join",
    "r08_range_join", "r09_cross_join", "r10_asof_join", "r11_tpch_q1_agg",
    # r11_stats_aggregates re-fronted (round 8): zero-variance/zero-dof
    # denominators now nullif to mirror DuckDB's x/0 -> NULL.
    "r12_distinct", "r12_count_distinct",
    # r13_approx_count_distinct had a rows-only r01 row; it gained a
    # verdict-style DuckDB oracle in round 6 and re-enters the window.
    "r14_rollup", "r14_cube",
    "r15_window_rank", "r16_lag_lead", "r17_window_frames",
    "r18_sort_with_position", "r19_topk", "r20_union_all", "r21_intersect",
    "r21_except", "r22_string_fns", "r23_date_fns", "r24_math_fns",
    "r25_array_fns", "r25_higher_order_fns", "r25_nested_array_fns",
    "r26_map_fns", "r27_json_fns", "r28_conditional",
    # d_minhash_lsh_near_dup, d_simhash_near_dup and s_ann_lsh_topk had
    # rows-only r01 rows; they gained full DuckDB oracles in round 5
    # (portable hash family / inlined plane literals) and re-enter the
    # window for a HASH row.
    # r30_ngram_jaccard_pairs was r01-green but gained the hot-shingle
    # df<=5 cap in round 7 (plan + oracle changed) — re-fronted.
    "r29_dedup_exact_latest",
    # r31_cosine_topk re-fronted (round 8): oracle q CTE gained the
    # missing/NULL-query-vector guard (embedding IS NOT NULL).
    "r32_top_terms", "t_language_id",
    "t_quality_scores", "t_token_stats", "t_tfidf", "t_fingerprint",
    "r33_python_udf",
})

# Round-2 driver-green rows (CORRECTNESS_r02.json, hash_match=true).
# r11_misc_aggregates had rows+schema green but a hash mismatch (DuckDB
# count_if returns HUGEINT -> float64 in pandas; now cast to BIGINT in the
# oracle), so it is intentionally NOT listed and re-enters the window.
_ROUND2_VERIFIED = frozenset({
    # d_embedding_near_dup / r34_pandas_grouped_map re-fronted (round 7):
    # NULL-vector filter added to the pairing operator; grouped-map kernel
    # made null-safe (nullable-Int64 out) per the oracle window form.
    "r34_pandas_scalar_udf",
    "r35_udtf_posexplode", "g06_topic_tokenize", "g07_sha1_key",
    "g08_changelog_snapshot", "g10_tenant_isolation", "s3_tumbling_window",
    "s4_sliding_window", "s5_session_window", "s6_stateful_dedup",
    "s7_bounded_poll", "m_binary_columns", "r15_percent_rank",
    "r16_first_last_value", "r16_nth_value", "r17_range_frame",
    "r_pivot_conditional", "r13_percentile_exact", "r_scalar_subquery",
    "r_correlated_subquery_q17", "r_having", "r14_grouping_sets",
    "tpch_q3_shipping_priority", "tpch_q7_volume_shipping",
    "tpch_q10_returned_items", "tpch_q18_large_orders",
    "tpch_q4_exists_late_ship", "tpch_q2_correlated_min",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q12_priority_by_year", "tpch_q14_promo_effect",
    "tpch_q16_supplier_part_count", "tpch_q19_disjunctive_filter",
    "tpch_q22_dormant_customers", "p_deterministic_split",
    "p_stratified_sample", "p_sequence_packing", "r18_nulls_ordering",
    # r34_pandas_grouped_agg re-fronted (round 7): SQL-sum NULL semantics.
    "r35_python_udtf", "r23_date_arith",
    "r27_from_json_struct", "r27_to_json_roundtrip",
    "sql_shared_dialect_agg", "sql_shared_dialect_window",
    "pipeline_corpus_curation",
})

# Round-3 driver-green rows (CORRECTNESS_r03.json, hash_match=true; 47/47
# oracle-bearing entries in the window were green, zero reds).
_ROUND3_VERIFIED = frozenset({
    "r11_misc_aggregates", "r_unpivot", "r_gap_fill_forward",
    "t_repetition_scores", "t_pii_scrub", "p_weighted_mix",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q13_order_distribution", "tpch_q15_top_supplier",
    "tpch_q21_waiting_suppliers", "r_sessionize_gap", "r_scd2_intervals",
    "p_decontaminate", "p_chunk_documents", "p_shard_shuffle",
    # e_vector_quantize re-fronted (round 7): NULL vectors dropped both sides.
    # e_mips_topk and e_range_search re-fronted (round 8): oracle q CTEs
    # gained the missing/NULL-query-vector guard (embedding IS NOT NULL —
    # DuckDB's list_reduce ERRORS on the empty list a NULL qv zips to).
    "r_merge_upsert", "p_span_dedup",
    # d_dedup_clusters / pipeline_curation_clustered: components.py gained
    # a non-convergence escalation in round 7 (propagation -> star when
    # max_iters exhausts). NOT re-fronted: the change is unreachable on
    # any converging input (fixture near-dup graphs converge in <10
    # rounds; the converged path is byte-identical), and both entries
    # re-verified hash-green at sf0.01 in-session after the change.
    "m_frame_sample", "d_dedup_clusters", "d_incremental_near_dup",
    "pipeline_curation_clustered", "r_skew_salted_agg", "r_skew_salted_join",
    "r_funnel_sequence", "d_fuzzy_name_pairs", "l_zorder_layout",
    # r10_asof_forward re-fronted (round 7): asof.py atomic struct carry.
    "t_unigram_logprob",
    # e_grouped_topk re-fronted (round 9): query+corpus sides gained the
    # family-wide valid_vector drop, mirrored by _finite_vec_sql in the
    # oracle (ADVICE r08 — a NaN corpus vector ranked engine-dependently).
    "r_ewma_smoothing", "r_histogram_bins",
    "r_partial_agg_merge", "r_robust_stats", "r_union_by_name",
    "sql_shared_dialect_not_in", "r_cohort_retention", "r_market_basket",
    "pipeline_rag_index", "r_data_quality_audit", "t_keyword_extraction",
    "r_interval_union_days", "r_percent_of_total", "r_ohlc_bars",
})

# Round-4 driver-green rows (CORRECTNESS_r04.json, hash_match=true; 48/48
# oracle-bearing entries in the window were green, zero reds).
_ROUND4_VERIFIED = frozenset({
    # s_ann_recall_audit re-fronted (round 8): oracle q CTE gained the
    # missing/NULL-query-vector guard (v IS NOT NULL); Spark side returns
    # the (k, 0, 0) row on a None query.
    "r_gaps_islands", "r_mode_per_group",
    "r_weighted_median", "r_string_agg", "r_regexp_extract_all",
    # r_asof_nearest re-fronted (round 7): asof.py atomic struct carry.
    "r_bitmap_flags", "r_null_impute_group_mean",
    "r_yoy_growth", "r_interp_linear", "r_rolling_zscore",
    # t_sentence_stats re-fronted (round 7): n_words now coalesces to 0
    # on NULL text, matching the oracle (adversarial-corpus probe find).
    "r_triangle_count", "t_bigram_top",
    "e_centroid_assign", "e_norm_audit", "p_dataset_card",
    "d_jaccard_containment", "p_token_budget_split", "l_partition_manifest",
    "r_running_distinct", "sql_shared_dialect_filter_agg",
    # r_rfm_segmentation, r_pareto_cut and r_quartile_bands were r04-green
    # but moved to the distributed global_ntile/global_running_sum kernels
    # in round 6 — re-fronted for fresh driver hashes against the new plans.
    "r_streak_detection", "r_cusum_drift",
    "t_char_class_profile", "p_quality_gate_funnel", "d_exact_hash_clusters",
    "e_cosine_histogram", "g_message_size_audit",
    "r_lead_time_buckets", "r_self_excluding_agg", "t_readability",
    # r_keyset_pagination was r04-green but its implementation changed in
    # round 5 (distributed global row_number) — re-fronted for a fresh
    # driver hash row against the new plan.
    "r_coverage_pct", "r_benford_digits",
    "r_min_max_scale", "t_vocab_coverage", "r_reachability",
    "r_topk_with_ties", "r_largest_remainder", "r_business_days",
    "r_rank_delta", "r_regr_grouped", "e_dim_stats",
})

# Round-5 driver-green rows (CORRECTNESS_r05.json, hash_match=true; 44/44
# oracle-bearing entries in the window were green, zero reds —
# flagship_revenue_by_nation and r01_scan_project re-greened too, already
# listed under round 1).
_ROUND5_VERIFIED = frozenset({
    # s_ann_lsh_topk re-fronted (round 8): oracle q CTE gained the
    # missing/NULL-query-vector guard (v IS NOT NULL).
    "d_minhash_lsh_near_dup", "d_simhash_near_dup",
    "p_packing_efficiency", "e_silhouette_by_cell",
    # p_rank_calibrate and r_keyset_pagination were r05-green but their
    # shared kernel changed in round 6 (narrow checkpoint + rank rejoin in
    # operators/sampling._global_rank) — re-fronted for fresh driver
    # hashes against the new plan.
    "r_event_trigrams", "r_calendar_profile",
    # p_source_overlap_matrix was r05-green but gained the hot-shingle
    # df<=5 cap in round 7 (plan + oracle changed) — re-fronted.
    "e_cluster_inertia", "t_source_novelty",
    "r_status_transitions", "r_gini_by_nation", "r_order_gap_stats",
    "s_rate_limit_sliding", "r_time_to_convert", "r_seasonality_index",
    "r_new_vs_returning", "r_rolling_active_users",
    # e_label_margin re-fronted (round 7): NULL label/embedding dropped both sides.
    # r_anova_dow re-fronted (round 8): k-1 / nn-k / ms_within
    # denominators now nullif to mirror DuckDB's x/0 -> NULL.
    "r_survival_curve", "r_backlog_aging",
    # r_abc_xyz and r_lorenz_deciles r05-green -> round-6 distributed
    # ranking kernels; re-fronted.
    # p_split_leakage re-fronted (round 7): leak_rate denominator gained
    # nullif(0) to match DuckDB's x/0 -> NULL on an empty eval split.
    "t_js_divergence", "r_hierarchy_rollup",
    # r_pagerank_iter3 re-fronted (round 15): the iteration loop moved to
    # the pinned P-wide co-partitioned layout + precomputed dangling flag
    # (results bit-identical, but the plan changed — fresh hash wanted).
    "r_chi_square_mix", "t_bigram_entropy", "r_segment_migration",
    "r_rolling_median", "r_degree_distribution",
    "sql_shared_dialect_group_by_all", "sql_shared_dialect_lateral",
    "r_variant_shred", "r_basket_lift", "r21_except_intersect_all",
    "l_dataset_diff", "r_autocorr_daily",
})

# Round-6 driver-green rows (CORRECTNESS_r06.json, hash_match=true; 50/50
# green, zero reds — the round that closed the burn-down: 15 first-time
# hashes incl. the former no-oracle sketch/media entries and the five
# entries migrated to the distributed ranking kernels, plus 35 re-greens
# of round-1 names).
_ROUND6_VERIFIED = frozenset({
    "flagship_revenue_by_nation", "m_media_features", "m_resize_media",
    "p_rank_calibrate", "r01_scan_project", "r03_filter", "r04_inner_join",
    "r05_broadcast_join", "r06_full_outer_join", "r06_left_join",
    "r07_anti_join", "r07_semi_join", "r08_range_join", "r09_cross_join",
    # r10_asof_join was r06-green but operators/asof.py switched to the
    # atomic struct carry in round 7 (NULL-valued right rows no longer
    # stitch across rows; one window pass instead of per-column passes) —
    # re-fronted for a fresh hash against the new plan.
    "r11_tpch_q1_agg",
    "r12_count_distinct", "r12_distinct", "r13_approx_count_distinct",
    "r13_approx_percentile", "r13_hll_mergeable", "r14_cube", "r14_rollup",
    "r15_window_rank", "r16_lag_lead", "r17_window_frames",
    "r18_sort_with_position", "r19_topk", "r20_union_all", "r21_except",
    "r21_intersect", "r22_string_fns", "r23_date_fns", "r24_math_fns",
    "r25_array_fns", "r25_higher_order_fns", "r25_nested_array_fns",
    "r26_map_fns", "r27_json_fns", "r28_conditional",
    "r_keyset_pagination", "r_lorenz_deciles",
    # r_rfm_segmentation (three ntile passes gained materialize_input
    # pins) and r_pareto_cut/r_abc_xyz (global_running_sum gained the
    # NULL-coalesce) were r06-green but their plans changed in round 7 —
    # re-fronted for fresh driver hashes.
    # s_ann_ivf_topk re-fronted (round 8): oracle q CTE gained the
    # missing/NULL-query-vector guard (embedding IS NOT NULL).
    "r_quartile_bands",
    "tpch_q11_important_stock", "tpch_q20_promo_suppliers",
})

# Round-7 driver-green rows (CORRECTNESS_r07.json, hash_match=true; 50/50
# green, zero reds — the first pure staleness-rotation window: the 5
# round-7 re-fronts (hot-shingle cap, ranking-kernel pins) + the entries
# re-fronted by the round-7 self-probe/fuzz fixes (asof struct carry,
# NULL-vector contracts, t_sentence_stats) + the stalest r01/r02 greens).
_ROUND7_VERIFIED = frozenset({
    # d_embedding_near_dup and e_vector_quantize re-fronted (round 9):
    # their oracles' corpus CTEs gained the full _finite_vec_sql guard
    # (was `embedding IS NOT NULL` only — ADVICE r08: a NaN/Inf/zero-norm
    # corpus vector diverged the oracle from the valid_vector-filtered
    # implementation).
    "r30_ngram_jaccard_pairs",
    "r34_pandas_grouped_map", "r34_pandas_grouped_agg",
    "r10_asof_forward", "r_asof_nearest", "r_pareto_cut",
    "t_sentence_stats", "r_rfm_segmentation", "p_source_overlap_matrix",
    "e_label_margin", "r_abc_xyz", "p_split_leakage", "r10_asof_join",
    "r29_dedup_exact_latest",
    "r32_top_terms", "t_language_id",
    "t_quality_scores", "t_token_stats", "t_tfidf", "t_fingerprint",
    "r33_python_udf", "r34_pandas_scalar_udf", "r35_udtf_posexplode",
    "g06_topic_tokenize", "g07_sha1_key", "g08_changelog_snapshot",
    "g10_tenant_isolation", "s3_tumbling_window", "s4_sliding_window",
    "s5_session_window", "s6_stateful_dedup", "s7_bounded_poll",
    "m_binary_columns", "r15_percent_rank", "r16_first_last_value",
    "r16_nth_value", "r17_range_frame", "r_pivot_conditional",
    "r13_percentile_exact", "r_scalar_subquery", "r_correlated_subquery_q17",
    "r_having", "r14_grouping_sets", "tpch_q3_shipping_priority",
    "tpch_q7_volume_shipping", "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    # r31_cosine_topk was r07-green but its oracle gained the
    # missing/NULL-query-vector guard in round 8 (q CTE filters
    # embedding IS NOT NULL; Spark side early-returns an empty typed
    # frame) — re-fronted for a fresh hash.
})

# Round-8 driver-green rows (CORRECTNESS_r08.json, hash_match=true; 50/50
# green, zero reds — the window that cleared the last weak flag: the r08
# re-fronts (ANN query guards, zero-dof nullif fixes) plus staleness
# rotation). The six ANN entries (r31_cosine_topk, s_ann_lsh_topk,
# s_ann_ivf_topk, s_ann_recall_audit, e_range_search, e_mips_topk) and
# d_embedding_near_dup were r08-green but are intentionally NOT listed:
# round 9 spliced the full _finite_vec_sql guard into their oracles'
# corpus and query CTEs (ADVICE r08) — re-fronted for fresh hashes
# against the guarded oracle text.
_ROUND8_VERIFIED = frozenset({
    "r11_stats_aggregates", "r_anova_dow", "tpch_q4_exists_late_ship",
    "tpch_q2_correlated_min", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q12_priority_by_year",
    "tpch_q14_promo_effect", "tpch_q16_supplier_part_count",
    "tpch_q19_disjunctive_filter", "tpch_q22_dormant_customers",
    "p_deterministic_split", "p_stratified_sample", "p_sequence_packing",
    "r18_nulls_ordering", "r35_python_udtf", "r23_date_arith",
    "r27_from_json_struct", "r27_to_json_roundtrip",
    "sql_shared_dialect_agg", "sql_shared_dialect_window",
    "pipeline_corpus_curation", "r11_misc_aggregates", "r_unpivot",
    "r_gap_fill_forward", "t_repetition_scores", "t_pii_scrub",
    "p_weighted_mix", "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q13_order_distribution", "tpch_q15_top_supplier",
    "tpch_q21_waiting_suppliers", "r_sessionize_gap", "r_scd2_intervals",
    "p_decontaminate", "p_chunk_documents", "p_shard_shuffle",
    "r_merge_upsert", "p_span_dedup", "m_frame_sample", "d_dedup_clusters",
    "d_incremental_near_dup", "pipeline_curation_clustered",
})

# r31_cosine_topk was r09-green but is NOT listed: round 11 changed
# brute_force_topk to rank on the UNROUNDED cosine (the family/oracle
# convention — the rounded rank diverged from the oracle at a 1e-6
# k-th-slot boundary, boundary-probe golden in test_adversarial_corpus)
# — re-fronted for a fresh hash against the raw-ranked plan.
_ROUND9_VERIFIED = frozenset({
    "d_embedding_near_dup", "s_ann_lsh_topk",
    "s_ann_ivf_topk", "s_ann_recall_audit", "e_vector_quantize",
    "e_range_search", "e_mips_topk", "e_grouped_topk", "r_skew_salted_agg",
    "r_skew_salted_join", "r_funnel_sequence", "d_fuzzy_name_pairs",
    "l_zorder_layout", "t_unigram_logprob", "r_ewma_smoothing",
    "r_histogram_bins", "r_partial_agg_merge", "r_robust_stats",
    "r_union_by_name", "sql_shared_dialect_not_in", "r_cohort_retention",
    "r_market_basket", "pipeline_rag_index", "r_data_quality_audit",
    "t_keyword_extraction", "r_interval_union_days", "r_percent_of_total",
    "r_ohlc_bars", "r_gaps_islands", "r_mode_per_group",
    "r_weighted_median", "r_string_agg", "r_regexp_extract_all",
    "r_bitmap_flags", "r_null_impute_group_mean", "r_yoy_growth",
    "r_interp_linear", "r_rolling_zscore", "r_triangle_count",
    "t_bigram_top", "e_centroid_assign", "e_norm_audit", "p_dataset_card",
    "d_jaccard_containment", "p_token_budget_split", "l_partition_manifest",
    "r_running_distinct", "sql_shared_dialect_filter_agg",
    "r_streak_detection",
})

# Round-10 driver-green rows (CORRECTNESS_r10.json, hash_match=true;
# 50/50 green, zero reds — the two round-10 registrations plus the
# stalest round-4/5 greens). e_pq_adc_topk was r10-green but is
# intentionally NOT listed: round 11 split its implementation into the
# pq_encode + pq_adc_scan halves (operators/similarity.py — codes now
# cast through tinyint) for the persisted-codes entry, so it re-enters
# the window for a fresh hash against the recomposed plan.
_ROUND10_VERIFIED = frozenset({
    "t_bm25_search", "r_cusum_drift", "t_char_class_profile",
    "p_quality_gate_funnel", "d_exact_hash_clusters", "e_cosine_histogram",
    "g_message_size_audit", "r_lead_time_buckets", "r_self_excluding_agg",
    "t_readability", "r_coverage_pct", "r_benford_digits", "r_min_max_scale",
    "t_vocab_coverage", "r_reachability", "r_topk_with_ties",
    "r_largest_remainder", "r_business_days", "r_rank_delta",
    "r_regr_grouped", "e_dim_stats", "d_minhash_lsh_near_dup",
    "d_simhash_near_dup", "p_packing_efficiency", "e_silhouette_by_cell",
    "r_event_trigrams", "r_calendar_profile", "e_cluster_inertia",
    "t_source_novelty", "r_status_transitions", "r_gini_by_nation",
    "r_order_gap_stats", "s_rate_limit_sliding", "r_time_to_convert",
    "r_seasonality_index", "r_new_vs_returning", "r_rolling_active_users",
    "r_survival_curve", "r_backlog_aging", "t_js_divergence",
    "r_hierarchy_rollup", "r_chi_square_mix", "t_bigram_entropy",
    "r_segment_migration", "r_rolling_median",
    "r_degree_distribution", "sql_shared_dialect_group_by_all",
    "sql_shared_dialect_lateral",
})

# Round-11 driver-green rows (CORRECTNESS_r11.json, hash_match=true;
# 50/50 green, zero reds — the clustering/persisted-artifact wave plus
# staleness rotation). Four r11 greens are intentionally NOT listed and
# re-enter the window for fresh hashes against round-12 changes:
# e_ivfpq_topk (inline composite re-built on the shared
# build/scan halves — the residual-sample collect is now codegen-side
# with driver-side residuals, and encode is the fused single-crossing
# kernel); t_hybrid_rrf (fusion extracted into the shared _rrf_fuse
# helper); t_bpe_token_count and p_sequence_packing_bpe (bpe_token_count
# gained the BPE_NESTED_MAX_RANKS guard and the shared alphabet check).
_ROUND11_VERIFIED = frozenset({
    "r31_cosine_topk", "e_pq_adc_topk", "e_pq_codes_topk",
    "e_pq_recall_audit", "t_bm25_indexed", "t_bm25_index_merge",
    "e_kmeans_lloyd", "e_kmeans_centroids", "e_pq_trained_recall",
    "e_ivf_trained_topk", "e_ivf_cells_topk",
    "r_variant_shred", "r_basket_lift", "r21_except_intersect_all",
    "l_dataset_diff", "r_autocorr_daily", "flagship_revenue_by_nation",
    "r01_scan_project", "r03_filter", "r04_inner_join",
    "r05_broadcast_join", "r06_left_join", "r06_full_outer_join",
    "r07_semi_join", "r07_anti_join", "r08_range_join", "r09_cross_join",
    "r11_tpch_q1_agg", "r12_distinct", "r12_count_distinct",
    "r13_approx_count_distinct", "r14_rollup", "r14_cube",
    "r15_window_rank", "r16_lag_lead", "r17_window_frames",
    "r18_sort_with_position", "r19_topk", "r20_union_all",
    "r21_intersect", "r21_except", "r22_string_fns", "r23_date_fns",
    "r24_math_fns", "r25_array_fns", "r25_higher_order_fns",
})

# Round-12 driver-green rows (CORRECTNESS_r12.json, hash_match=true;
# 50/50 green, zero reds — the persisted-IVFPQ/BPE-scale wave plus
# staleness rotation). One r12 green is intentionally NOT listed and
# re-enters the window for a fresh hash against round-13 changes:
# t_bpe_token_count_1k (VERDICT r12 task 1 — the doc_id%10 corpus slice
# is deleted; both engines now run the FULL corpus, the oracle at
# vocab-rate via a materialized distinct-word sweep).
# e_ivfpq_topk / e_ivfpq_recall_audit / e_ivfpq_codes_topk are KEPT
# despite the round-13 _ivfpq_parts refactor reordering their oracle
# CTE text (enc before probe/qr — no semantic change): all three were
# re-verified hash-green side-by-side vs DuckDB at sf0.001 AND sf0.01
# in-session after the refactor (the r03 d_dedup_clusters precedent).
_ROUND12_VERIFIED = frozenset({
    "t_hybrid_rrf", "t_bpe_token_count", "p_sequence_packing_bpe",
    "t_bpe_top_subwords", "t_hybrid_rrf_indexed", "e_ivfpq_topk",
    "e_ivfpq_recall_audit", "e_ivfpq_codes_topk", "r25_nested_array_fns",
    "r26_map_fns", "r27_json_fns", "r28_conditional", "m_media_features",
    "tpch_q11_important_stock", "tpch_q20_promo_suppliers",
    "p_rank_calibrate", "r13_approx_percentile", "m_resize_media",
    "r13_hll_mergeable", "r_quartile_bands", "r_keyset_pagination",
    "r_lorenz_deciles", "r10_asof_join", "r29_dedup_exact_latest",
    "r30_ngram_jaccard_pairs", "r32_top_terms", "t_language_id",
    "t_quality_scores", "t_token_stats", "t_tfidf", "t_fingerprint",
    "r33_python_udf", "r34_pandas_scalar_udf", "r34_pandas_grouped_map",
    "r35_udtf_posexplode", "g06_topic_tokenize", "g07_sha1_key",
    "g08_changelog_snapshot", "g10_tenant_isolation", "s3_tumbling_window",
    "s4_sliding_window", "s5_session_window", "s6_stateful_dedup",
    "s7_bounded_poll", "m_binary_columns", "r15_percent_rank",
    "r16_first_last_value", "r16_nth_value", "r17_range_frame",
})

# Round-13 driver-green rows (CORRECTNESS_r13.json: 50/50 hash-green,
# zero reds — the 11 round-13 additions fronted first, then the stalest
# r07/r08 greens). e_ivfpq_batch_topk / e_ivfpq_batch_rerank_topk are
# KEPT despite the round-14 kernel change (ivfpq_adc_batch_scan gained
# duplicate-qid dedup — a no-op for these entries, whose query sets are
# distinct by construction; plans unchanged): both were re-verified
# in-session r14 hash-green vs DuckDB at sf0.01 through the driver
# contract AND at sf0.001 through the adversarial-corpus gates.
_ROUND13_VERIFIED = frozenset({
    "t_bpe_token_count_1k", "t_bpe_train_merges", "t_bpe_train_apply",
    "t_bpe_learned_apply", "e_ivfpq_recall_sweep", "e_ivfpq_rerank_topk",
    "e_ivfpq_rerank_recall", "e_ivfpq_rerank_sweep",
    "e_ivfpq_rerank_scaled_sweep", "e_ivfpq_batch_topk",
    "e_ivfpq_batch_rerank_topk", "r_pivot_conditional",
    "r13_percentile_exact", "r_scalar_subquery",
    "r_correlated_subquery_q17", "r_having", "r14_grouping_sets",
    "tpch_q3_shipping_priority", "tpch_q7_volume_shipping",
    "tpch_q10_returned_items", "tpch_q18_large_orders",
    "r34_pandas_grouped_agg", "r10_asof_forward", "r_asof_nearest",
    "r_pareto_cut", "t_sentence_stats", "r_rfm_segmentation",
    "p_source_overlap_matrix", "e_label_margin", "r_abc_xyz",
    "p_split_leakage", "r11_stats_aggregates", "tpch_q4_exists_late_ship",
    "tpch_q2_correlated_min", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q12_priority_by_year",
    "tpch_q14_promo_effect", "tpch_q16_supplier_part_count",
    "tpch_q19_disjunctive_filter", "tpch_q22_dormant_customers",
    "p_deterministic_split", "p_stratified_sample", "p_sequence_packing",
    "r18_nulls_ordering", "r35_python_udtf", "r23_date_arith",
    "r27_from_json_struct", "r27_to_json_roundtrip",
    "sql_shared_dialect_agg",
})

# Round-14 driver-green rows (CORRECTNESS_r14.json: 50/50 hash-green,
# zero reds — the round-14 build additions (semantic-dedup family,
# quality tree, learned-BPE packing) fronted first, then the stalest
# r03/r08/r09 greens).
_ROUND14_VERIFIED = frozenset({
    "p_packing_learned_bpe", "pipeline_semantic_dedup",
    "d_semantic_dedup_recall", "d_semantic_dedup_recall_sweep",
    "d_semantic_incremental_near_dup", "e_hard_negative_mining",
    "pipeline_contrastive_triplets", "t_quality_tree_train",
    "t_quality_tree_eval", "t_quality_tree_apply",
    "t_quality_tree_learned_apply", "sql_shared_dialect_window",
    "r11_misc_aggregates", "r_unpivot", "r_gap_fill_forward",
    "pipeline_corpus_curation", "t_repetition_scores", "t_pii_scrub",
    "p_weighted_mix", "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q13_order_distribution", "tpch_q15_top_supplier",
    "tpch_q21_waiting_suppliers", "r_sessionize_gap", "r_scd2_intervals",
    "p_decontaminate", "p_chunk_documents", "p_shard_shuffle",
    "r_merge_upsert", "p_span_dedup", "m_frame_sample", "d_dedup_clusters",
    "d_incremental_near_dup", "pipeline_curation_clustered", "r_anova_dow",
    "d_embedding_near_dup", "s_ann_lsh_topk", "s_ann_ivf_topk",
    "s_ann_recall_audit", "e_vector_quantize", "e_range_search",
    "r_skew_salted_agg", "r_skew_salted_join", "r_funnel_sequence",
    "d_fuzzy_name_pairs", "l_zorder_layout", "t_unigram_logprob",
    "e_mips_topk", "r_ewma_smoothing",
})

# name -> most recent round with a hash-green driver row; later sets win.
_LAST_GREEN: dict[str, int] = {}
for _rnd, _names in enumerate(
    (_ROUND1_VERIFIED, _ROUND2_VERIFIED, _ROUND3_VERIFIED,
     _ROUND4_VERIFIED, _ROUND5_VERIFIED, _ROUND6_VERIFIED,
     _ROUND7_VERIFIED, _ROUND8_VERIFIED, _ROUND9_VERIFIED,
     _ROUND10_VERIFIED, _ROUND11_VERIFIED, _ROUND12_VERIFIED,
     _ROUND13_VERIFIED, _ROUND14_VERIFIED),
    start=1,
):
    for _n in _names:
        _LAST_GREEN[_n] = _rnd

# Fixed round-over-round PERF overlap (VERDICT r14 "Next round" item 6):
# the disjoint-sample rotation made consecutive CORRECTNESS windows share
# ZERO names (PERF_r14: n_common=0, per_query={}), so the driver's
# round-over-round diff was vacuous. These 15 entries — all hash-green in
# CORRECTNESS_r14.json, spanning the heavy bench families (semantic
# dedup, quality tree, MinHash screens, clustering, TPCH joins) — are
# pinned at the FRONT of every window from round 15 on, so every PERF
# diff has n_common >= 15 while the remaining ~35 slots keep rotating
# stalest-first.
_PERF_OVERLAP: tuple[str, ...] = (
    "pipeline_semantic_dedup", "d_semantic_incremental_near_dup",
    "e_hard_negative_mining", "pipeline_contrastive_triplets",
    "t_quality_tree_train", "t_quality_tree_apply",
    "d_incremental_near_dup", "pipeline_curation_clustered",
    "d_embedding_near_dup", "d_dedup_clusters",
    "tpch_q9_product_profit", "tpch_q21_waiting_suppliers",
    "r_sessionize_gap", "s_ann_ivf_topk", "e_vector_quantize",
)


def _driver_order() -> list[str]:
    """Driver verification order (the CORRECTNESS window is the first 50).

    1. oracle-bearing entries with no green row — new registrations and
       entries invalidated by an implementation change (their name is
       removed from the round sets above);
    2. no-oracle entries that never got even a rows-only row (empty since
       round 6: every entry carries an oracle — machinery kept for any
       future genuinely non-SQL-expressible entry);
    3. the fixed _PERF_OVERLAP subset — pinned in every window so the
       driver's round-over-round PERF diff always has common entries;
    4. everything else green, STALEST FIRST (ascending last-green round,
       then registry insertion order) — the rotation that keeps old
       hashes from silently drifting as shared helpers change.
    """
    reg_idx = {n: i for i, n in enumerate(REGISTRY)}
    front = [n for n, s in REGISTRY.items()
             if n not in _LAST_GREEN and s.oracle is not None]
    never_rowed = [n for n, s in REGISTRY.items()
                   if n not in _LAST_GREEN and s.oracle is None]
    pinned = [n for n in _PERF_OVERLAP
              if n in _LAST_GREEN and n not in front and n not in never_rowed]
    rest = set(pinned)
    back = sorted(
        (n for n in REGISTRY if n in _LAST_GREEN and n not in rest),
        key=lambda n: (_LAST_GREEN[n], reg_idx[n]),
    )
    return never_rowed + front + pinned + back


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    return {name: REGISTRY[name].oracle for name in _driver_order()
            if REGISTRY[name].oracle is not None}
