"""Window functions: ranking, analytic, running aggregates, frames.

Absent from the reference (SURVEY.md §2.4) except implicitly — its
rotated round-robin reduce partitioner is a dense_rank in disguise
(SURVEY.md §1.5, replayed in operators.mapreduce_compat).

Scale notes: a window = one shuffle on partitionBy + per-partition
sort. All windows here partition on real keys (custkey/user_id/...) so
work distributes; none uses an empty partitionBy (which would funnel
100 TB through one task — the cardinal window sin). Tie-breaks are
total orders so results are deterministic for the oracle hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from p4_mapreduce_spark.functions.deterministic import fix, fix_sql
from p4_mapreduce_spark.functions.timeutil import epoch_seconds
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer via row_number — the distributed "
    "top-k-per-group pattern (no global sort).",
    headline=True,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           {fix_sql('''sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_spend
    FROM orders
    """,
    doc="Running per-customer spend (cumulative frame).",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        fix(F.sum("o_totalprice").over(w)).alias("running_spend"),
    )


@register(
    "window_lag_lead",
    oracle=f"""
    SELECT user_id, event_id, ts,
           {fix_sql('value - lag(value) OVER w')} AS value_delta,
           date_diff('second', lag(ts) OVER w, ts) AS secs_since_prev,
           lead(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead analytics per user ordered by time.",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load(spark, sf_dir, "events")
    # NTZ-safe integer epoch seconds (timeutil): date_diff('second')
    # truncates each side to the second, then differences
    ev = raw.withColumn("ts_s", epoch_seconds(raw))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        fix(F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (F.col("ts_s") - F.lag("ts_s").over(w)).alias("secs_since_prev"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT p_type, p_partkey, p_retailprice,
           rank()       OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank,
           ntile(4)     OVER w AS price_quartile
    FROM part
    WINDOW w AS (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey)
    """,
    doc="rank / dense_rank / ntile per part type.",
    tags=("window",),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_type").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_type",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


@register(
    "window_range_frame",
    oracle=f"""
    SELECT c_nationkey, c_custkey, c_acctbal,
           count(*) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS n_peers,
           {fix_sql('''sum(c_acctbal) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal
               RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)''')} AS peer_balance
    FROM customer
    """,
    doc="RANGE frame: customers within ±500 acctbal inside the nation.",
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PySpark's Window.rangeBetween only takes ints; fractional range
    # bounds go through the SQL frame syntax instead.
    c = load(spark, sf_dir, "customer")
    over = (
        "OVER (PARTITION BY c_nationkey ORDER BY c_acctbal "
        "RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)"
    )
    return c.selectExpr(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        f"count(1) {over} AS n_peers",
        fix_sql(f"sum(c_acctbal) {over}") + " AS peer_balance",
    )
