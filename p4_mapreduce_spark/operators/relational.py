"""Core relational operators: scan, filter, project, aggregate, sort.

The reference engine expresses all of these through user-supplied
executables piped over sorted text streams (SURVEY.md §2.1-2.2: map =
project/filter, group = sort+partition, reduce = aggregate). Here each
one is a declarative DataFrame plan so Catalyst gives us predicate
pushdown, column pruning, partial (map-side) aggregation, and
whole-stage codegen — none of which the reference has (SURVEY.md §4).

Scale notes, verified via ``plans.explain`` helpers in tests:

- filters in this module reach the parquet scan (``PushedFilters``);
- aggregations are hash-based with a partial/final split, so the
  shuffle moves one row per (group x partition), not per input row;
- global sorts are range-partitioned (sampled boundaries), the same
  external-sort-merge shape the reference hand-rolls with
  ``heapq.merge`` (reference ``mapreduce/worker/__main__.py:113``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import (
    favg,
    favg_sql,
    fix,
    fix_sql,
    fsum,
    fsum_sql,
)
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary. Same dataflow shape as the
# reference's map -> group -> reduce pipeline (scan -> partial agg ->
# shuffle on group key -> final agg -> sort), which is why it's the
# smoke-check query in __spark_entry__.entry().
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "2001-09-02"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {fsum_sql('l_quantity')} AS sum_qty,
           {fsum_sql('l_extendedprice')} AS sum_base_price,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS sum_disc_price,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)'))} AS sum_charge,
           {favg_sql('l_quantity')} AS avg_qty,
           {favg_sql('l_extendedprice')} AS avg_price,
           {favg_sql('l_discount', 4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan→filter→hash-agg→sort.",
    headline=True,
    tags=("aggregation", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = fix(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit(f"{_Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fsum("l_quantity").alias("sum_qty"),
            fsum("l_extendedprice").alias("sum_base_price"),
            fsum(disc_price).alias("sum_disc_price"),
            fsum(charge).alias("sum_charge"),
            favg("l_quantity").alias("avg_qty"),
            favg("l_extendedprice").alias("avg_price"),
            favg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection + filter: the reference's grep map/reduce pair is exactly
# this (SURVEY.md §2.2); here the predicate is pushed into the scan.
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price
    FROM lineitem
    WHERE l_quantity >= 45 AND l_discount > 0.05 AND l_returnflag = 'R'
    """,
    doc="Conjunctive pushed-down filter + computed projection.",
    tags=("filter", "projection"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_quantity") >= 45)
            & (F.col("l_discount") > 0.05)
            & (F.col("l_returnflag") == "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            fix(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@register(
    "predicate_zoo",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey % 10 = 3)
    """,
    doc="isin / between / like / negation predicates in one pushed filter.",
    tags=("filter",),
)
def predicate_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").like("%URGENT%")
        & ~(F.col("o_custkey") % 10 == 3)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@register(
    "agg_orders_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {fsum_sql('o_totalprice')} AS total_revenue,
           {favg_sql('o_totalprice')} AS avg_revenue,
           {fix_sql('min(o_totalprice)')} AS min_revenue,
           {fix_sql('max(o_totalprice)')} AS max_revenue
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Hash aggregate with count/sum/avg/min/max (partial+final).",
    headline=True,
    tags=("aggregation",),
)
def agg_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        fsum("o_totalprice").alias("total_revenue"),
        favg("o_totalprice").alias("avg_revenue"),
        fix(F.min("o_totalprice")).alias("min_revenue"),
        fix(F.max("o_totalprice")).alias("max_revenue"),
    )


@register(
    "distinct_counts",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
    doc="Multi count-distinct (expand + two-phase agg under the hood).",
    tags=("aggregation", "distinct"),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT via shuffle on all projected columns.",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "approx_distinct_users",
    oracle="""
    SELECT count(DISTINCT user_id) AS n_exact_users,
           true AS approx_within_2pct
    FROM events
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale path for "
    "cardinality estimation — single pass, fixed memory, no exact shuffle. "
    "Bounded oracle: HLL estimates are engine-specific numerics, so the "
    "query emits the exact cardinality plus a |approx-exact|/exact <= 2% "
    "verdict (rsd=0.01, so 2% is a ~2-sigma bound); the oracle asserts "
    "the verdict is true. The exact arm exists only to score the sketch "
    "— the production shape at 100 TB is the sketch-only aggregate.",
    tags=("aggregation", "sketch"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.count_distinct("user_id").alias("n_exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
    ).select(
        "n_exact_users",
        (
            F.abs(F.col("approx") - F.col("n_exact_users"))
            / F.col("n_exact_users")
            <= 0.02
        ).alias("approx_within_2pct"),
    )


@register(
    "rollup_revenue",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {fsum_sql('o_totalprice')} AS revenue,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP hierarchy totals (status, priority) → status → grand total.",
    tags=("aggregation", "grouping-sets"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        fsum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two low-cardinality dims.",
    tags=("aggregation", "grouping-sets"),
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "case_when_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                WHEN o_totalprice < 10000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS n,
           {fsum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY 1
    """,
    doc="CASE WHEN bucketization feeding an aggregate.",
    tags=("projection", "aggregation"),
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        fsum("o_totalprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Global sort / limit / top-k — the reference's group stage produces a
# single totally-ordered merged stream (SURVEY.md §2.1 O3+O4); Spark's
# orderBy is the scalable version (sampled range partitioning, external
# sort-merge per partition).
# ---------------------------------------------------------------------------


@register(
    "global_sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject — per-partition "
    "heap + driver merge, no full sort at any scale.",
    tags=("sort", "limit"),
)
def global_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )
