"""Set operations: union / intersect / except.

The reference's only set-op analog is multi-file concatenation at scan
time (UNION ALL; reference ``mapreduce/manager/__main__.py:313-319``).
These are all shuffle-on-all-columns ops in Spark except UNION ALL,
which is a free plan concatenation — worth knowing at 100 TB: prefer
``unionAll + groupBy`` over ``intersect/except`` when a key exists.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


def _big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )


def _building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


@register(
    "union_all_counts",
    oracle="""
    SELECT custkey, count(*) AS n
    FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ) GROUP BY custkey
    """,
    doc="UNION ALL (plan concat, no shuffle) + group count.",
    tags=("setop",),
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _big_customers(spark, sf_dir)
    b = _building_customers(spark, sf_dir)
    return a.unionAll(b).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="UNION DISTINCT (dedup shuffle).",
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_customers(spark, sf_dir).union(_building_customers(spark, sf_dir)).distinct()


@register(
    "intersect_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="INTERSECT (rich customers in the BUILDING segment).",
    tags=("setop",),
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_customers(spark, sf_dir).intersect(_building_customers(spark, sf_dir))


@register(
    "except_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="EXCEPT (rich customers outside the BUILDING segment).",
    tags=("setop",),
)
def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract() is EXCEPT (set) semantics; exceptAll().distinct() is NOT
    # equivalent when the left side has duplicates of a row the right
    # side also has
    return _big_customers(spark, sf_dir).subtract(_building_customers(spark, sf_dir))


@register(
    "union_by_name",
    oracle="""
    SELECT entity, label FROM (
        SELECT n_name AS entity, 'nation' AS label FROM nation
        UNION ALL
        SELECT r_name AS entity, 'region' AS label FROM region
    )
    """,
    doc="unionByName across differently-shaped inputs (aligned by column name).",
    tags=("setop",),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation").select(
        F.col("n_name").alias("entity"), F.lit("nation").alias("label")
    )
    r = load(spark, sf_dir, "region").select(
        F.lit("region").alias("label"), F.col("r_name").alias("entity")
    )
    return n.unionByName(r)
