#!/usr/bin/env python3
"""Empirical scaling probe: run the heavy operators at 1x/2x/4x/8x sf0.1.

Builds scaled corpora by unioning the sf0.1 tables K times with
key offsets (each copy keeps the planted near-dup structure, and the
copies add realistic cross-copy exact duplicates), writes them to a
temp dir, and runs the SAME registered queries against it. Prints a
runtime table; near-linear growth is the pass criterion for the
shuffle-light designs documented in SCALE.md.

Usage: python tools/scale_probe.py [max_scale=8]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from p4_mapreduce_spark.registry import load_all
from p4_mapreduce_spark.session import get_spark
from p4_mapreduce_spark.sources.tables import load

BASE_SF = "/root/testdata/sf0.1"
PROBES = [
    "mr_wordcount",
    "dedup_exact",
    "dedup_minhash_lsh",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "q21_waiting_suppliers",
    "heavy_hitters_words",
    "text_bigram_stats",
    "zorder_cluster_key",
    "sessionize_events",
    "asof_join_clicks_purchases",
]
KEY_OFFSET = 10_000_000
SMALL_TABLES = ("region", "nation", "customer", "supplier", "part", "embeddings")


def build_scaled(spark, k: int, out_dir: str) -> None:
    """K-fold union with orderkey offsets: lineitem and orders scale
    together (referential integrity preserved, so the fact-fact join
    probes stay honest); dims stay fixed, like a real star schema
    growing in facts."""
    docs = load(spark, BASE_SF, "documents")
    li = load(spark, BASE_SF, "lineitem")
    orders = load(spark, BASE_SF, "orders")
    # events scale with event_id offsets but FIXED user_ids: per-user
    # streams get K-fold denser — the worst case for sessionization /
    # as-of windows (state per user grows), which is what we want to
    # stress. ts is re-emitted as micros (the nanos column was already
    # converted by load()).
    events = load(spark, BASE_SF, "events")
    docs_k = None
    li_k = None
    ord_k = None
    ev_k = None
    for i in range(k):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET))
        l = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * KEY_OFFSET))
        o = orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * KEY_OFFSET))
        e = events.withColumn("event_id", F.col("event_id") + F.lit(i * KEY_OFFSET))
        docs_k = d if docs_k is None else docs_k.union(d)
        li_k = l if li_k is None else li_k.union(l)
        ord_k = o if ord_k is None else ord_k.union(o)
        ev_k = e if ev_k is None else ev_k.union(e)
    docs_k.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    li_k.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    ord_k.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    ev_k.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    for t in SMALL_TABLES:
        shutil.copy(
            os.path.join(BASE_SF, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    scales = [1]
    while scales[-1] * 2 <= max_scale:
        scales.append(scales[-1] * 2)

    root = tempfile.mkdtemp(prefix="p4mr-scale-")
    results: dict[str, dict[int, float]] = {n: {} for n in PROBES}
    try:
        for k in scales:
            sf_dir = os.path.join(root, f"x{k}")
            build_scaled(spark, k, sf_dir)
            for name in PROBES:
                fn = registry[name].fn
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                results[name][k] = round(time.perf_counter() - t0, 2)
            print(f"scale x{k} done", file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    header = "| query | " + " | ".join(f"x{k}" for k in scales) + " |"
    sep = "|---" * (len(scales) + 1) + "|"
    print(header)
    print(sep)
    for name in PROBES:
        row = " | ".join(f"{results[name][k]:.2f}s" for k in scales)
        print(f"| {name} | {row} |")


if __name__ == "__main__":
    main()
