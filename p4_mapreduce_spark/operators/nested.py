"""Nested-data surface: structs, maps, JSON structs, explode/unnest.

The reference's data model is flat text lines (SURVEY.md §1.3); this
is the typed nested-data surface a Spark-native engine owes its users.
``events.props`` (a JSON string) is parsed with an explicit schema via
``from_json`` — never schema inference at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fsum, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


@register(
    "json_struct_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
    doc="from_json with an explicit schema into a struct column, then "
    "field access (typed JSON parse — no inference, one pass).",
    tags=("json", "nested"),
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json("props", "k bigint").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod10"),
    )


@register(
    "struct_build_collect",
    oracle="""
    SELECT n_nationkey,
           string_agg(CAST(s_suppkey AS VARCHAR), ',' ORDER BY s_suppkey)
               AS supplier_keys,
           count(*) AS n_suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    doc="collect_list into a sorted list per group (order-normalized so "
    "the aggregation's arrival order doesn't leak into results), emitted "
    "as a comma-joined string so result canonicalizers can sort/hash "
    "the column.",
    tags=("nested", "aggregation"),
)
def struct_build_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s_suppkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("supplier_keys"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "explode_tokens_agg",
    oracle="""
    SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    HAVING count(*) >= 5
    """,
    doc="explode (lateral unnest) + doc-frequency aggregation — the "
    "inverted-index / TF-DF building block.",
    tags=("nested", "text", "aggregation"),
)
def explode_tokens_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ", -1)).alias("word")
    ).where(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n") >= 5)
    )


@register(
    "map_from_entries",
    oracle="""
    SELECT event_type AS etype,
           CAST(map_extract(m, 'n')[1] AS BIGINT) AS n_events,
           floor(CAST(map_extract(m, 'sum')[1] AS DOUBLE) * 100 + 0.5) / 100
               AS sum_value
    FROM (
        SELECT event_type,
               MAP {'n': CAST(count(*) AS DOUBLE),
                    'sum': sum(value)} AS m
        FROM events GROUP BY event_type
    )
    """,
    doc="Map construction + key lookup (map_from_entries / element_at): "
    "per-type stats packed into a map column and read back out.",
    tags=("nested", "map"),
)
def map_from_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.create_map(
            F.lit("n"),
            F.count(F.lit(1)).cast("double"),
            F.lit("sum"),
            F.sum("value"),
        ).alias("m")
    )
    return agg.select(
        F.col("event_type").alias("etype"),
        F.element_at("m", "n").cast("long").alias("n_events"),
        (F.floor(F.element_at("m", "sum") * 100 + F.lit(0.5)) / 100).alias("sum_value"),
    )
