"""Frequency sketches: Misra-Gries heavy hitters with exact verify.

The two-phase shape every 100 TB frequent-items job wants:

1. **sketch**: each partition folds its token stream into a bounded
   Misra-Gries summary (K counters) via ``mapInPandas`` — constant
   memory per partition, one pass, no shuffle. Summaries are merged by
   the same add-then-reduce rule (Agarwal et al., "Mergeable
   Summaries", PODS'12): any item with global count > n/(K+1) is
   guaranteed to survive into the merged candidate set.
2. **verify**: the (tiny) candidate set broadcasts back against the
   stream for exact counts, so the final answer is EXACT — the sketch
   only bounds how much of the key space the second pass touches.

Because the verify pass is exact, the whole operator admits a plain
SQL oracle (GROUP BY + HAVING against the same threshold), unlike
sketch-only outputs. The eviction path (vocabulary ≫ K) is covered by
a property test with skewed synthetic data; the corpus query keeps the
guarantee trivially (its vocabulary is smaller than K) but runs the
identical code path.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

MG_CAPACITY = 63  # counters per partition summary; error <= n/(K+1)


def _mg_reduce(counters: dict[str, int], k: int) -> dict[str, int]:
    """Shrink a counter dict to <= k entries (Misra-Gries step): subtract
    the (k+1)-th largest count from all, drop non-positives."""
    if len(counters) <= k:
        return counters
    cut = sorted(counters.values(), reverse=True)[k]
    return {w: c - cut for w, c in counters.items() if c - cut > 0}


def misra_gries_candidates(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``tokens[col]``.

    Returns DataFrame[item string, mg_count bigint] — the union of the
    partition summaries (candidate superset of every item with global
    frequency > n/(k+1); counts are lower bounds, not exact).
    """

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            # batch-merge: add the batch's exact counts, then reduce —
            # the mergeable-summaries rule, O(K log K) per batch instead
            # of per-row branching
            for w, c in pdf[col].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            counters = _mg_reduce(counters, k)
        yield pd.DataFrame(
            {"item": list(counters), "mg_count": list(counters.values())}
        )

    return tokens.mapInPandas(sketch, schema="item string, mg_count bigint")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("word")
    )


@register(
    "heavy_hitters_words",
    oracle=f"""
    WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS word
        FROM documents
    )
    SELECT word, count(*) AS n FROM w GROUP BY word
    HAVING count(*) >= (SELECT count(*) FROM w) // {MG_CAPACITY + 1} + 1
    """,
    doc=f"Heavy-hitter words (count > n/{MG_CAPACITY + 1}): bounded-"
    "memory Misra-Gries summaries per partition (mapInPandas, one pass, "
    "no shuffle), merged candidates broadcast back for an exact count "
    "— so the result is exact and SQL-oracled even though the first "
    "pass is a sketch. At 100 TB the candidate set is K items per "
    "partition summary at most; only those keys pay for a second pass.",
    headline=True,
    tags=("sketch", "text", "aggregation"),
)
def heavy_hitters_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    # Threshold as a lazy 1-row frame crossJoin-broadcast into the final
    # filter (the pmi_collocations pattern) — no eager .count() action in
    # the query builder, and the exact-verify pass is the only second
    # corpus scan (sketch + verify, not count + sketch + verify).
    threshold = toks.agg(
        (F.floor(F.count(F.lit(1)) / F.lit(MG_CAPACITY + 1)) + 1).alias(
            "threshold"
        )
    )
    candidates = (
        misra_gries_candidates(toks, "word", MG_CAPACITY)
        .select(F.col("item").alias("word"))
        .distinct()
    )
    return (
        toks.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(threshold))
        .where(F.col("n") >= F.col("threshold"))
        .select("word", "n")
    )
