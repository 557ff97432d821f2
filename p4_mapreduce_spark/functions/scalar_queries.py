"""Scalar function surface: string / date / math / JSON / array.

The reference's entire scalar surface is "whatever your executable
does to the line" (SURVEY.md §2.1 O7). Here each family is the
built-in JVM expression — whole-stage-codegen'd, no Python in the hot
path. Transcendentals (ln/exp) are *not* correctly-rounded by IEEE, so
cross-engine queries normalize them harder (fix(…, 6)); everything
else (+,-,*,/,sqrt,floor,abs) is bit-deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fix, fix_sql, fsum, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substring(p_name, 1, 3) AS name_prefix,
           replace(p_name, ' ', '_') AS name_snake,
           concat_ws(':', p_brand, p_type) AS brand_type,
           strpos(p_name, 'e') AS first_e,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget
    FROM part
    """,
    doc="String surface: case, length, substring, replace, concat, "
    "position, regex extract, LIKE.",
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.instr(F.col("p_name"), "e").alias("first_e"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.when(F.col("p_name").like("%widget%"), 1).otherwise(0).alias("is_widget"),
    )


@register(
    "date_functions",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           count(*) AS n_orders,
           {fsum_sql('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    """,
    doc="date_trunc month rollup of orders.",
    headline=True,
    tags=("scalar", "date", "aggregation"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            fsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month_num,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS order_day,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
               AS days_to_2002
    FROM orders
    """,
    doc="Datetime part extraction + day difference.",
    tags=("scalar", "date"),
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month_num"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
    )


@register(
    "math_functions",
    oracle=f"""
    SELECT o_orderkey,
           abs(o_totalprice - 10000.0) AS dist_from_10k,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
           {fix_sql('sqrt(o_totalprice)', 6)} AS price_sqrt,
           {fix_sql('ln(o_totalprice + 1.0)', 6)} AS price_ln,
           o_totalprice * o_totalprice AS price_sq,
           o_custkey % 7 AS custkey_mod7
    FROM orders
    """,
    doc="Math surface: abs/floor/ceil/sqrt/ln/power/mod.",
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(price - 10000.0).alias("dist_from_10k"),
        F.floor(price / 1000.0).alias("price_k_floor"),
        F.ceil(price / 1000.0).alias("price_k_ceil"),
        fix(F.sqrt(price), 6).alias("price_sqrt"),
        fix(F.log(price + 1.0), 6).alias("price_ln"),
        (price * price).alias("price_sq"),
        (F.col("o_custkey") % 7).alias("custkey_mod7"),
    )


@register(
    "json_extraction",
    oracle=f"""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           {fsum_sql('value')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction from the events.props string column, "
    "aggregated per event type (from_json/get_json_object path).",
    headline=True,
    tags=("scalar", "json", "aggregation"),
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        fsum("value").alias("sum_value"),
    )


@register(
    "conditional_functions",
    oracle="""
    SELECT s_suppkey,
           coalesce(nullif(s_name, ''), 'unknown') AS supplier_name,
           greatest(s_acctbal, 0.0) AS nonneg_balance,
           least(s_acctbal, 5000.0) AS capped_balance,
           CASE WHEN s_acctbal < 0 THEN 'debt' ELSE 'credit' END AS balance_side
    FROM supplier
    """,
    doc="coalesce / nullif / greatest / least / case.",
    tags=("scalar",),
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "supplier_name"
        ),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("nonneg_balance"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("capped_balance"),
        F.when(F.col("s_acctbal") < 0, "debt").otherwise("credit").alias("balance_side"),
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(list_max(embedding) AS DOUBLE) AS max_component,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
    doc="Array surface over the embedding column: size, element_at, "
    "array_max, lambda filter — all JVM-side, no UDF.",
    tags=("scalar", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "variant_semi_structured",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod7,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL
                THEN 'bigint' ELSE 'missing' END AS k_type
    FROM events
    """,
    doc="Semi-structured access via Spark 4's VARIANT type: parse_json "
    "once into the binary VARIANT encoding, then typed variant_get "
    "path extraction — the schema-on-read path for ragged JSON where "
    "from_json's fixed schema can't be declared up front. Unlike "
    "repeated get_json_object calls (one string re-parse per path), "
    "the VARIANT value parses once per row and every extraction walks "
    "the binary encoding; columnar stores can shred it. Oracle uses "
    "DuckDB's JSON path functions over the same column.",
    tags=("scalar", "json", "variant"),
)
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("pv"))
    k = F.variant_get("pv", "$.k", "bigint")
    return v.select(
        "event_id",
        k.alias("k"),
        (k % 7).alias("k_mod7"),
        F.when(k.isNotNull(), F.lit("bigint"))
        .otherwise(F.lit("missing"))
        .alias("k_type"),
    )
