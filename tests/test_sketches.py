"""Misra-Gries sketch: guarantee + eviction path on skewed data.

The corpus query (`heavy_hitters_words`) never evicts because the
document vocabulary is smaller than the sketch capacity; these tests
drive the same code with a Zipf-ish synthetic stream whose vocabulary
is far larger than K, so eviction and the merge rule actually run.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from p4_mapreduce_spark.operators.sketches import (
    _mg_reduce,
    misra_gries_candidates,
)


def _skewed_items():
    # 3 hot items dominate a 500-item uniform tail
    items = []
    for hot, n in (("alpha", 4000), ("beta", 2500), ("gamma", 1200)):
        items += [hot] * n
    for i in range(500):
        items += [f"tail_{i}"] * 8
    return items  # n = 11700, tail freq 8


def test_mg_candidates_contain_all_heavy_hitters(spark):
    items = _skewed_items()
    n = len(items)
    k = 20  # vocabulary (503) >> K: eviction must fire
    df = spark.createDataFrame(
        [(w,) for w in items], "item string"
    ).repartition(8)
    cands = {
        r["item"] for r in misra_gries_candidates(df, "item", k).collect()
    }
    # guarantee: every item with count > n/(k+1) is present
    threshold = n / (k + 1)
    for hot, cnt in (("alpha", 4000), ("beta", 2500), ("gamma", 1200)):
        assert cnt > threshold
        assert hot in cands, f"{hot} missing from candidates"
    # boundedness: each of the 8 partition summaries holds <= k entries
    per_part = (
        misra_gries_candidates(df, "item", k)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert all(r["count"] <= k for r in per_part)


def test_mg_reduce_rule():
    counters = {"a": 10, "b": 7, "c": 5, "d": 2, "e": 1}
    out = _mg_reduce(counters, 2)
    # cut = 3rd largest (5): a->5, b->2, rest dropped
    assert out == {"a": 5, "b": 2}
    assert _mg_reduce({"a": 1}, 2) == {"a": 1}


def test_heavy_hitters_exact_after_verify(spark):
    """End-to-end on skewed data: sketch candidates + exact verify
    reproduces the exact GROUP BY / HAVING answer."""
    items = _skewed_items()
    n = len(items)
    k = 20
    threshold = n // (k + 1) + 1
    df = spark.createDataFrame([(w,) for w in items], "item string").repartition(8)
    cands = (
        misra_gries_candidates(df, "item", k)
        .select("item")
        .distinct()
    )
    got = {
        (r["item"], r["n"])
        for r in df.join(F.broadcast(cands), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
        .collect()
    }
    want = {
        (r["item"], r["n"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= threshold)
        .collect()
    }
    assert got == want and len(want) == 3
