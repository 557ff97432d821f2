"""Additional TPC-H-shaped queries: the classic plan shapes at scale.

Each exercises a distinct physical pattern the 100 TB engine must get
right: Q6 pure scan-agg (bandwidth-bound, no shuffle), Q4 EXISTS
(semi join), Q12 join + conditional agg, Q14 promo ratio (two
conditional sums in one pass), Q18 HAVING-IN (agg-filtered semi join
feeding a star join), Q19 disjunctive multi-column predicates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fix, fix_sql, fsum, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {fsum_sql(fix_sql('l_extendedprice * l_discount'))} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan + pushed filters + global agg — no shuffle "
    "beyond the single-row final combine; the bandwidth-bound baseline.",
    headline=True,
    tags=("aggregation", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fsum(fix(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4: EXISTS correlated subquery → left-semi join → agg.",
    tags=("join", "subquery", "aggregation"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: fact join + conditional counts per group.",
    tags=("join", "aggregation"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT {fsum_sql(fix_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"))}
               AS promo_revenue,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
    doc="TPC-H Q14: broadcast dim join + two conditional sums in one pass.",
    tags=("join", "aggregation"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        fsum(fix(promo)).alias("promo_revenue"),
        fsum(fix(net)).alias("total_revenue"),
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {fsum_sql('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 250
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18: agg-filtered IN subquery (semi join on a grouped "
    "HAVING) feeding a star join + top-k.",
    tags=("join", "subquery", "aggregation", "topk"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(fsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive multi-table "
    "predicates — Catalyst pushes the common join key, evaluates the "
    "residual disjunction post-join.",
    tags=("join", "filter", "aggregation"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.where(cond).agg(
        fsum(fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: customers who returned items — star join with two "
    "broadcast dims, agg, top-20 by lost revenue.",
    tags=("join", "aggregation", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(fsum(fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {fsum_sql(fix_sql('volume'))} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: bilateral trade volume — the two-aliased-dim pattern "
    "(nation joined twice under different roles) + year rollup.",
    tags=("join", "aggregation"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nations = ("NATION_1", "NATION_2")
    n1 = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(fsum(fix(F.col("volume"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: customer order-count distribution — outer join with "
    "a join-time residual predicate, then a double aggregation.",
    tags=("join", "aggregation"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, floor(sum(l_quantity) * 100 + 0.5) / 100 / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {fsum_sql('l_extendedprice')} AS total_price,
           count(*) AS n_items
    FROM lineitem JOIN part_avg USING (l_partkey)
    WHERE l_quantity < 0.5 * avg_qty
    """,
    doc="TPC-H Q17 shape: per-part average quantity (the correlated "
    "scalar subquery, decorrelated into an aggregate + self-join) "
    "filtering small-quantity line items.",
    tags=("join", "subquery", "aggregation"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.floor(F.sum("l_quantity") * 100 + F.lit(0.5)) / 100 / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            fsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH avg_bal AS (
        SELECT floor(sum(c_acctbal) * 100 + 0.5) / 100 / count(*) AS v
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           {fsum_sql('c_acctbal')} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H Q22: above-average-balance customers with no recent "
    "orders — scalar subquery + anti join + agg.",
    tags=("join", "subquery", "aggregation"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.floor(F.sum("c_acctbal") * 100 + F.lit(0.5)) / 100 / F.count(F.lit(1))).alias("v")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            fsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_Q8_NATION_SUM = fsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")
_Q8_SHARE = fix_sql(f"({_Q8_NATION_SUM}) / ({fsum_sql('volume')})", 6)


@register(
    "q8_market_share",
    oracle=f"""
    WITH volumes AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {fix_sql('l_extendedprice * (1 - l_discount)')} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT o_year, {_Q8_SHARE} AS mkt_share
    FROM volumes GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8: market share — conditional share ratio per year over "
    "a 7-way star join (two nation roles).",
    tags=("join", "aggregation"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    volumes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            fix(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        volumes.groupBy("o_year")
        .agg(
            fix(fsum(nation_vol) / fsum("volume"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey, l_extendedprice AS price,
               s_name, s_acctbal, n_name
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ),
    min_cost AS (
        SELECT l_partkey, min(price) AS min_price FROM offers GROUP BY l_partkey
    )
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, min_price
    FROM offers
    JOIN min_cost ON offers.l_partkey = min_cost.l_partkey AND price = min_price
    JOIN part ON p_partkey = offers.l_partkey
    WHERE p_size <= 10 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: min-cost supplier per part within a region — "
    "the correlated MIN subquery decorrelated into a per-key aggregate "
    "joined back to the offer set (lineitem stands in for partsupp, "
    "which the schema omits). The part filter is applied before the "
    "min computation in the Spark plan — semantics-preserving because "
    "the MIN is per-partkey, and it prunes the aggregate input. The "
    "offers subtree appears twice; Spark's ReuseExchange dedups the "
    "scan+join work at runtime.",
    tags=("join", "subquery", "aggregation"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part_f = load(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    supp_geo = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(load(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.select("l_partkey", "l_suppkey", F.col("l_extendedprice").alias("price"))
        .join(F.broadcast(part_f.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_geo), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "price", "s_name", "s_acctbal", "n_name")
    )
    min_cost = offers.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("price").alias("min_price")
    )
    return (
        offers.join(
            min_cost,
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("price") == F.col("min_price")),
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("p_partkey"), "min_price",
        )
        .distinct()
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity'))} AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%ring%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit per supplier-nation per year over a "
    "star join; 0.1 * p_retailprice * l_quantity stands in for the "
    "missing ps_supplycost. Dims (filtered part, supplier, nation) "
    "broadcast; the only shuffles are the fact-fact orderkey join and "
    "the final group-by.",
    tags=("join", "aggregation"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part_f = load(spark, sf_dir, "part").where(F.col("p_name").like("%ring%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    amount = fix(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(fsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_values",
    oracle=f"""
    WITH vals AS (
        SELECT l_partkey AS partkey,
               {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
    )
    SELECT partkey, value FROM vals
    WHERE value > (SELECT {fsum_sql('value')} FROM vals) * 0.0005
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 shape: per-part value from one region's suppliers, "
    "kept only when above a fraction of the grand total — the scalar "
    "subquery in HAVING becomes a single-row broadcast joined to the "
    "per-part aggregate (lineitem revenue stands in for the missing "
    "partsupp stock value). The vals subtree appears twice; "
    "ReuseExchange dedups it.",
    tags=("join", "subquery", "aggregation"),
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp_asia = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(load(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    vals = (
        li.join(F.broadcast(supp_asia), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(fsum(fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("value"))
    )
    total = vals.agg(fix(F.sum("value")).alias("total"))
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("total") * 0.0005)
        .select("partkey", "value")
        .orderBy(F.col("value").desc(), "partkey")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey,
               {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — the view + "
    "scalar MAX becomes a per-supplier aggregate with a single-row "
    "max frame broadcast back onto it (ties kept, like the spec). "
    "MAX over floor-normalized doubles is exact, so the equality is "
    "engine-stable.",
    tags=("join", "subquery", "aggregation"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(fsum(fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per (brand, type, "
    "size) with a NOT IN supplier exclusion — anti join against a "
    "broadcast exclusion list (s_suppkey is non-null, so anti == NOT "
    "IN), then count(distinct) over the association pairs (lineitem "
    "stands in for partsupp).",
    tags=("join", "aggregation", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part_f = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promo_volume_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 100.0)
    ORDER BY s_name, s_acctbal
    """,
    doc="TPC-H Q20 shape: the nested semi-join chain — suppliers in "
    "one nation that shipped over 100 units of PROMO parts in 1997. "
    "Aggregate-with-HAVING feeds a left-semi join; l_quantity is "
    "integral so the float sum is exact with no normalization needed "
    "(lineitem volume stands in for the missing partsupp availqty).",
    tags=("join", "subquery", "aggregation"),
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    promo_parts = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    heavy = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(promo_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100.0)
        .select("l_suppkey")
    )
    nation7 = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation7), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name IN ('NATION_2', 'NATION_7')
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21 shape: suppliers who alone were late on "
    "multi-supplier finished orders ('late' = shipped >90 days after "
    "order date; the schema has no commit/receipt dates). The spec's "
    "EXISTS + correlated NOT EXISTS (the oracle SQL) are per-order "
    "facts, so instead of two lineitem self-joins the engine computes "
    "them in one pass: aggregate per (order, supplier), then per "
    "order — an order qualifies when it has >1 supplier and exactly "
    "one late supplier, contributing its late-line count to that "
    "supplier. One lineitem scan, no self-joins; the naive semi/anti "
    "form was 5x slower at 8x sf0.1 because Catalyst pushed the semi "
    "join below the orders join, self-joining unfiltered lineitem.",
    tags=("join", "subquery", "aggregation"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders_f = load(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    nations = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_2", "NATION_7")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    ).cast("int")
    lines = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    per_pair = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("late").alias("n_late_lines"), F.max("late").alias("any_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
        F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
        F.sum("n_late_lines").alias("n_late_lines"),
    )
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
