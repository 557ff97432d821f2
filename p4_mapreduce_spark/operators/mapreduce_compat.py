"""Reference-parity queries: word count, grep, kv contract, partitioner.

These reproduce the reference's shipped "query library" (SURVEY.md
§2.2) as declarative plans:

- word count (``tests/testdata/exec/wc_map.sh`` /
  ``wc_reduce.sh`` in the reference): tokenize on space/tab (the
  mapper's ``tr '[ \\t]' '\\n'`` also translates literal ``[``/``]``,
  and empty lines become an empty-string key — both reproduced
  faithfully; the golden file's first line is ``\\t9``);
- grep (``grep_map.py`` / ``grep_reduce.py``): substring filter +
  project, query hardwired to ``"product"`` by the reference's
  shell=True argv quirk (SURVEY.md §2.1 O7);
- the key<TAB>value pair contract between stages (SURVEY.md §1.1);
- the rotated round-robin reduce partitioner (SURVEY.md §1.5):
  ``bucket = (dense_rank over sorted keys % R - 1) mod R`` — replayed
  declaratively for parity; the scalable engine uses hash partitioning
  (plans.job) because a global dense_rank funnels all keys through one
  ordering.

The same pipelines run against the reference's own text fixtures and
golden outputs in ``tests/test_reference_parity.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

# The wc mapper splits on space, tab, and literal [ ] (tr set quirk).
WC_TOKEN_PATTERN = r"[ \t\[\]]"
GREP_DEFAULT_QUERY = "product"  # reference grep_map.py:14-17 default


def wordcount(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """Reference word count over a line DataFrame → (word, count).

    Keeps empty tokens (split limit -1): an empty line counts the
    empty-string word, matching the reference mapper's awk behavior.
    """
    words = lines.select(
        F.explode(F.split(F.lower(F.col(text_col)), WC_TOKEN_PATTERN, -1)).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def grep(lines: DataFrame, query: str = GREP_DEFAULT_QUERY, text_col: str = "value") -> DataFrame:
    """Reference grep: strip, drop empties, keep lines containing query."""
    stripped = lines.select(F.trim(F.col(text_col)).alias("line"))
    return stripped.where(
        (F.col("line") != "") & F.lower(F.col("line")).contains(query.lower())
    )


@register(
    "mr_wordcount",
    oracle=r"""
    SELECT word, count(*) AS count
    FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[ \t\[\]]')) AS word
        FROM documents
    )
    GROUP BY word
    """,
    doc="Reference word count (map→group→reduce) over documents.text, "
    "as explode+split → hash agg.",
    headline=True,
    tags=("mapreduce", "aggregation"),
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    return wordcount(docs)


@register(
    "mr_grep",
    oracle="""
    SELECT doc_id, trim(text) AS line
    FROM documents
    WHERE trim(text) <> '' AND contains(lower(trim(text)), 'join')
    """,
    doc="Reference grep (filter+project) over documents.text.",
    tags=("mapreduce", "filter"),
)
def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    stripped = docs.select("doc_id", F.trim(F.col("text")).alias("line"))
    return stripped.where(
        (F.col("line") != "") & F.lower(F.col("line")).contains("join")
    )


@register(
    "mr_kv_contract",
    oracle="""
    SELECT kv_line,
           split_part(kv_line, chr(9), 1) AS key,
           split_part(kv_line, chr(9), 2) AS value
    FROM (SELECT lang || chr(9) || source AS kv_line FROM documents)
    """,
    doc="The key<TAB>value line contract between stages: encode then parse.",
    tags=("mapreduce",),
)
def mr_kv_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    encoded = docs.select(
        F.concat_ws("\t", "lang", "source").alias("kv_line")
    )
    return encoded.select(
        "kv_line",
        F.split_part(F.col("kv_line"), F.lit("\t"), F.lit(1)).alias("key"),
        F.split_part(F.col("kv_line"), F.lit("\t"), F.lit(2)).alias("value"),
    )


@register(
    "mr_partition_replay",
    oracle=r"""
    WITH words AS (
        SELECT DISTINCT unnest(regexp_split_to_array(lower(text), '[ \t\[\]]')) AS word
        FROM documents
    )
    SELECT word,
           CAST(((dense_rank() OVER (ORDER BY word) % 2) + 1) % 2 AS INTEGER) AS bucket
    FROM words
    """,
    doc="Byte-parity replay of the reference's rotated round-robin reduce "
    "partitioner: unique keys in globally-sorted first-seen order get "
    "bucket (rank % R) - 1 mod R (SURVEY.md §1.5). Parity-only: the "
    "global rank funnels through one partition; production path is "
    "hash partitioning.",
    tags=("mapreduce", "window"),
)
def mr_partition_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    num_reducers = 2
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), WC_TOKEN_PATTERN, -1)).alias("word")
    ).distinct()
    rank = F.dense_rank().over(Window.orderBy("word"))
    # reference: indx = uniq_key_count % R - 1 (python modulo) — in SQL
    # terms ((rank % R) + R - 1) % R to keep the result nonnegative
    bucket = ((rank % num_reducers) + num_reducers - 1) % num_reducers
    return words.select("word", bucket.cast("int").alias("bucket"))


@register(
    "mr_rdd_wordcount",
    oracle=r"""
    SELECT word, count(*) AS count
    FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[ \t\[\]]')) AS word
        FROM documents
    )
    GROUP BY word
    """,
    doc="Word count through the RDD compat path (flatMap → reduceByKey), "
    "the plans.job execution model; same oracle as mr_wordcount.",
    tags=("mapreduce", "rdd"),
)
def mr_rdd_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    docs = load(spark, sf_dir, "documents").select("text")
    pattern = re.compile(WC_TOKEN_PATTERN)
    counts = (
        docs.rdd.flatMap(lambda row: pattern.split(row.text.lower()))
        .map(lambda w: (w, 1))
        .reduceByKey(lambda a, b: a + b)
    )
    return spark.createDataFrame(counts, schema="word string, count long")
