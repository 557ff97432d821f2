"""Subquery surface through the SQL front door.

The engine is DataFrame-first, but a user of the reference switching
here gets full SparkSQL too; these pin the subquery planner shapes:
scalar subqueries (broadcast one-row), correlated EXISTS / NOT IN
(rewritten to semi/anti joins — never a per-row re-execution), and
CTEs. All run via spark.sql over temp views of the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fix_sql, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import register_views


@register(
    "subquery_scalar",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           {fix_sql("o_totalprice - (SELECT floor(sum(o_totalprice) * 100 + 0.5) / 100 / count(*) FROM orders)")}
               AS diff_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT floor(sum(o_totalprice) * 100 + 0.5) / 100 / count(*)
                          FROM orders) * 1.5
    """,
    doc="Scalar subquery (global average) used in both projection and "
    "filter — planned as a broadcast single-row subquery, evaluated once.",
    tags=("subquery", "sql"),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    avg_expr = "(SELECT floor(sum(o_totalprice) * 100 + 0.5) / 100 / count(*) FROM orders)"
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice,
               {fix_sql(f"o_totalprice - {avg_expr}")} AS diff_from_avg
        FROM orders
        WHERE o_totalprice > {avg_expr} * 1.5
        """
    )


@register(
    "subquery_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey AND l_quantity >= 49
    )
    ORDER BY s_suppkey
    """,
    doc="Correlated EXISTS — decorrelated by Catalyst into a left-semi "
    "join on the correlation key (one shuffle, not per-row loops).",
    tags=("subquery", "sql", "join"),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey AND l_quantity >= 49
        )
        ORDER BY s_suppkey
        """
    )


@register(
    "subquery_not_in",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 45
    )
    ORDER BY p_partkey
    """,
    doc="NOT IN subquery (null-safe anti join).",
    tags=("subquery", "sql", "join"),
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey NOT IN (
            SELECT l_partkey FROM lineitem WHERE l_quantity > 45
        )
        ORDER BY p_partkey
        """
    )


@register(
    "cte_chain",
    oracle=f"""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               {fsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1
    ),
    stats AS (
        SELECT floor(sum(rev) * 100 + 0.5) / 100 / count(*) AS avg_rev FROM monthly
    )
    SELECT m AS month_start, rev AS revenue
    FROM monthly, stats
    WHERE rev > avg_rev
    ORDER BY m
    """,
    doc="CTE chain: monthly rollup → global stat → filter (above-average "
    "months).",
    tags=("sql", "aggregation"),
)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   {fsum_sql('o_totalprice')} AS rev
            FROM orders GROUP BY 1
        ),
        stats AS (
            SELECT floor(sum(rev) * 100 + 0.5) / 100 / count(*) AS avg_rev FROM monthly
        )
        SELECT m AS month_start, rev AS revenue
        FROM monthly, stats
        WHERE rev > avg_rev
        ORDER BY m
        """
    )
