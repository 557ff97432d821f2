"""Advanced aggregation surface: moments, argmin/argmax, pivot,
grouping sets, deterministic sampling, skew-salted aggregation.

Cross-engine determinism notes:

- stddev/variance are *not* called via the builtins (their reduction
  order varies); they are recomposed from normalized sums —
  var = (Σx² - (Σx)²/n) / (n-1) with Σx and Σx² floor-normalized
  first, so both engines divide identical doubles.
- "sampling" is hash-mod Bernoulli (md5-based), not TABLESAMPLE:
  deterministic, reproducible, and exactly what a 100 TB pipeline
  should use anyway (resumable, stable across retries).
- the salted aggregation demonstrates the two-phase skew recipe; its
  result equals the plain group-by, which is what the oracle checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fix_sql, fsum, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


@register(
    "stats_moments",
    oracle=f"""
    SELECT c_nationkey,
           count(*) AS n,
           {fsum_sql('c_acctbal')} AS sum_bal,
           {fix_sql(f"(({fsum_sql('c_acctbal * c_acctbal', 2)}) - ({fsum_sql('c_acctbal')}) * ({fsum_sql('c_acctbal')}) / count(*)) / (count(*) - 1)", 2)}
               AS var_bal
    FROM customer GROUP BY c_nationkey
    """,
    doc="Variance recomposed from normalized sums — var = (Σx² - (Σx)²/n)"
    "/(n-1) — so both engines divide identical doubles (the stddev/var "
    "builtins' reduction order would not hash-match). Uses acctbal "
    "(~1e4 magnitude): the sum-of-squares float error stays far below "
    "the normalization boundary, which would not hold for 1e15-scale "
    "sums of squared prices.",
    tags=("aggregation", "stats"),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = F.count(F.lit(1))
    s1 = fsum("c_acctbal")
    s2 = fsum(F.col("c_acctbal") * F.col("c_acctbal"), 2)
    var = F.floor(((s2 - s1 * s1 / n) / (n - 1)) * 100.0 + F.lit(0.5)) / 100.0
    return c.groupBy("c_nationkey").agg(
        n.alias("n"),
        s1.alias("sum_bal"),
        var.alias("var_bal"),
    )


@register(
    "argmin_argmax",
    oracle="""
    SELECT o_orderstatus,
           min_by(o_orderkey, o_totalprice) AS cheapest_order,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="min_by/max_by (argmin/argmax) per group. Deterministic here "
    "because o_totalprice has no ties per status group at test scale; "
    "production recipe for ties is struct-ordering min.",
    tags=("aggregation",),
)
def argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "pivot_status_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           {fsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS F,
           {fsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS O,
           {fsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END")} AS P
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (long→wide) with an explicit column list — at scale "
    "always enumerate pivot values; value-discovery is an extra job.",
    tags=("aggregation", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(fsum("o_totalprice"))
        # absent (priority, status) combos are NULL from pivot but 0.0
        # from the oracle's CASE-sum formulation
        .na.fill(0.0, ["F", "O", "P"])
    )


@register(
    "grouping_sets_sql",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           {fsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS through the SQL front door (spark.sql), "
    "complementing the DataFrame rollup/cube queries.",
    tags=("aggregation", "grouping-sets", "sql"),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               {fsum_sql('o_totalprice')} AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "sample_hash_bernoulli",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) <= 2
    """,
    doc="Deterministic ~12.5% Bernoulli sample via content hash (md5 "
    "first nibble) — reproducible across engines, retries, and runs, "
    "unlike TABLESAMPLE.",
    tags=("sampling",),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1),
    )
    return o.where(nibble <= 2).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "salted_skew_agg",
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n, {fsum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Two-phase salted aggregation: group on (key, salt) first (fans "
    "hot keys over N reducers), then recombine per key. Result equals "
    "the plain group-by — the oracle checks exactly that. The recipe "
    "for skewed keys when AQE skew handling isn't enough.",
    tags=("aggregation", "skew"),
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    n_salts = 8
    salt = (F.col("o_orderkey") % n_salts).alias("salt")
    partial = (
        o.withColumn("salt", salt)
        .groupBy("o_orderstatus", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("o_totalprice").alias("psum"))
    )
    return partial.groupBy("o_orderstatus").agg(
        F.sum("pn").alias("n"),
        (F.floor(F.sum("psum") * 100.0 + F.lit(0.5)) / 100.0).alias("revenue"),
    )


@register(
    "exact_median_via_window",
    oracle="""
    WITH ranked AS (
        SELECT c_nationkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS rn,
               count(*) OVER (PARTITION BY c_nationkey) AS cnt
        FROM customer
    )
    SELECT c_nationkey,
           floor(avg(c_acctbal) * 100.0 + 0.5) / 100.0 AS median_acctbal
    FROM ranked
    WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
    GROUP BY c_nationkey
    """,
    doc="Exact median per group via rank window (avg of the middle one "
    "or two rows) — deterministic, unlike percentile interpolation "
    "whose float formula differs across engines. At 100 TB prefer "
    "approx_percentile; this is the exact-path recipe.",
    tags=("aggregation", "window", "stats"),
)
def exact_median_via_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wc = Window.partitionBy("c_nationkey")
    ranked = c.select(
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    # avg of <=2 middle values: sum/count of identical doubles, then fix
    return mid.groupBy("c_nationkey").agg(
        (
            F.floor((F.sum("c_acctbal") / F.count(F.lit(1))) * 100.0 + F.lit(0.5))
            / 100.0
        ).alias("median_acctbal")
    )


@register(
    "grouped_exact_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {fix_sql('quantile_cont(l_extendedprice, 0.25)', 4)} AS p25_price,
           {fix_sql('quantile_cont(l_extendedprice, 0.50)', 4)} AS p50_price,
           {fix_sql('quantile_cont(l_extendedprice, 0.75)', 4)} AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact linear-interpolation percentiles per group (Spark "
    "percentile() == DuckDB quantile_cont(), both rank p*(n-1) type-7) "
    "as three scalar columns. Deterministic despite interpolation: "
    "2-decimal inputs at quartile probabilities make the true value an "
    "exact 4-decimal number, so floor-normalizing at d=4 absorbs the "
    "engines' formula difference ((1-f)*lo+f*hi vs lo+f*(hi-lo), "
    "~1e-11 apart) with a 0.5e-4 margin. Exact percentile sorts each "
    "group — at 100 TB use approx_percentile or t-digest instead; "
    "this is the exact-path contract the approximation is tested "
    "against.",
    tags=("aggregation", "stats"),
)
def grouped_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    def q(p: float, alias: str):
        return (
            F.floor(F.percentile("l_extendedprice", F.lit(p)) * 10000.0 + F.lit(0.5))
            / 10000.0
        ).alias(alias)
    return li.groupBy("l_returnflag").agg(
        q(0.25, "p25_price"), q(0.50, "p50_price"), q(0.75, "p75_price")
    )


@register(
    "percentile_approx_audit",
    oracle=f"""
    SELECT l_returnflag,
           {fix_sql('quantile_cont(l_extendedprice, 0.50)', 4)} AS exact_p50,
           {fix_sql('quantile_cont(l_extendedprice, 0.95)', 4)} AS exact_p95,
           true AS p50_within_1pct,
           true AS p95_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Quantile-sketch audit: approx_percentile (Spark's KLL-style "
    "mergeable sketch, accuracy 10000) scored against the exact "
    "interpolated percentile per group — the 100 TB quantile path is "
    "the sketch (single pass, fixed memory, merges associatively "
    "across partitions); the exact arm exists only to measure it, "
    "exactly like the HLL and Misra-Gries audits. Sketch outputs are "
    "engine-specific numerics, so the query emits the exact values "
    "plus |approx-exact|/exact <= 1% verdict booleans and the oracle "
    "asserts them true (the sketch at this accuracy is rank-exact to "
    "~1e-4 of the group size; 1% value tolerance is conservative for "
    "this price distribution).",
    tags=("aggregation", "sketch", "stats"),
)
def percentile_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def q(p: float, alias: str):
        return (
            F.floor(
                F.percentile("l_extendedprice", F.lit(p)) * 10000.0 + F.lit(0.5)
            )
            / 10000.0
        ).alias(alias)

    a = li.groupBy("l_returnflag").agg(
        q(0.50, "exact_p50"),
        q(0.95, "exact_p95"),
        F.percentile_approx("l_extendedprice", F.lit(0.50), F.lit(10000)).alias(
            "a50"
        ),
        F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(10000)).alias(
            "a95"
        ),
    )
    ok = lambda a_, e: (  # noqa: E731
        F.abs(F.col(a_) - F.col(e)) / F.col(e) <= 0.01
    )
    return a.select(
        "l_returnflag",
        "exact_p50",
        "exact_p95",
        ok("a50", "exact_p50").alias("p50_within_1pct"),
        ok("a95", "exact_p95").alias("p95_within_1pct"),
    )


@register(
    "grouping_id_cube",
    oracle=f"""
    SELECT CASE WHEN o_orderstatus IS NULL AND GROUPING(o_orderstatus) = 1
                THEN '<all>' ELSE o_orderstatus END AS status,
           CASE WHEN o_orderpriority IS NULL AND GROUPING(o_orderpriority) = 1
                THEN '<all>' ELSE o_orderpriority END AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n,
           {fsum_sql('o_totalprice')} AS revenue
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE with GROUPING()/grouping-id disambiguation: the bitmask "
    "that tells a subtotal row apart from a genuine NULL group key — "
    "without it every rollup consumer mis-reads aggregates over "
    "nullable dimensions. Each aggregation level is labeled (gid 0-3) "
    "and NULL-from-subtotal is rewritten to '<all>' ONLY when the "
    "grouping bit says so. Same expansion-then-aggregate plan as "
    "cube_counts (4 grouping sets, map-side combined); the bitmask is "
    "free metadata the Expand operator already carries.",
    tags=("aggregation", "sql"),
)
def grouping_id_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    relabel = lambda c, g: (  # noqa: E731
        F.when(F.col(c).isNull() & (F.col(g) == 1), "<all>").otherwise(
            F.col(c)
        )
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_s"),
            F.grouping("o_orderpriority").cast("int").alias("g_p"),
            F.count(F.lit(1)).alias("n"),
            fsum("o_totalprice").alias("revenue"),
        )
        .select(
            relabel("o_orderstatus", "g_s").alias("status"),
            relabel("o_orderpriority", "g_p").alias("priority"),
            (F.col("g_s") * 2 + F.col("g_p")).cast("bigint").alias("gid"),
            "n",
            "revenue",
        )
    )
