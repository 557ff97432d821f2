#!/usr/bin/env python3
"""Empirical scaling probe: run the heavy operators at Kx sf0.1.

Builds scaled corpora by unioning the sf0.1 tables K times with
key offsets (each copy keeps the planted near-dup structure, and the
copies add realistic cross-copy exact duplicates), writes them to a
temp dir, and runs the SAME registered queries against it. Prints a
runtime table; near-linear growth is the pass criterion for the
shuffle-light designs documented in SCALE.md.

Usage:
    python tools/scale_probe.py [max_scale=8]       # 1,2,4,..,max
    python tools/scale_probe.py --scales 1,8,60 \
        --queries pmi_collocations,inverted_index_build --docs-only

``--scales`` takes any ascending integer list (x60 of sf0.1 documents
is the sf1-equivalent corpus: ~300k docs / ~16M tokens). ``--docs-only``
scales just the documents table and links the rest at 1x — use it when
every probed query reads only ``documents`` (the text operators); it
makes a 60x corpus build ~20x cheaper.
"""

from __future__ import annotations

import argparse
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
DEFAULT_PROBES = [
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
FACT_TABLES = ("lineitem", "orders", "events")


def _k_union(base, key_col: str, k: int):
    out = None
    for i in range(k):
        c = base.withColumn(key_col, F.col(key_col) + F.lit(i * KEY_OFFSET))
        out = c if out is None else out.union(c)
    return out


def build_scaled_embeddings(spark, k: int, out_dir: str) -> None:
    """K-fold embeddings with vec_id offsets AND label offsets.

    Offsetting the label per copy (label + i*1000) keeps the
    within-block vector count CONSTANT as the corpus grows — exactly
    SemDeDup's scale posture (cluster count grows proportionally so
    cluster granularity caps the quadratic term). Probing with FIXED
    labels would instead grow every block K-fold and show the known
    O(block^2) wall, which is a property of the blocking choice, not
    the plan."""
    os.makedirs(out_dir, exist_ok=True)
    base = load(spark, BASE_SF, "embeddings")
    out = None
    for i in range(k):
        c = base.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * KEY_OFFSET)
        ).withColumn("label", F.col("label") + F.lit(i * 1000))
        out = c if out is None else out.union(c)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    for t in SMALL_TABLES + FACT_TABLES + ("documents",):
        if t == "embeddings":
            continue
        shutil.copy(
            os.path.join(BASE_SF, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )


def build_scaled(spark, k: int, out_dir: str, docs_only: bool = False) -> None:
    """K-fold union with key offsets: lineitem and orders scale
    together (referential integrity preserved, so the fact-fact join
    probes stay honest); dims stay fixed, like a real star schema
    growing in facts. events scale with event_id offsets but FIXED
    user_ids: per-user streams get K-fold denser — the worst case for
    sessionization / as-of windows (state per user grows), which is
    what we want to stress. With ``docs_only`` the non-document tables
    stay at 1x (valid only for probes that read just ``documents``)."""
    os.makedirs(out_dir, exist_ok=True)
    _k_union(load(spark, BASE_SF, "documents"), "doc_id", k).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "documents.parquet"))
    if docs_only:
        for t in FACT_TABLES:
            shutil.copy(
                os.path.join(BASE_SF, f"{t}.parquet"),
                os.path.join(out_dir, f"{t}.parquet"),
            )
    else:
        for t, key in (
            ("lineitem", "l_orderkey"),
            ("orders", "o_orderkey"),
            ("events", "event_id"),
        ):
            _k_union(load(spark, BASE_SF, t), key, k).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, f"{t}.parquet"))
    for t in SMALL_TABLES:
        shutil.copy(
            os.path.join(BASE_SF, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("max_scale", nargs="?", type=int, default=8)
    ap.add_argument(
        "--scales", help="comma-separated ascending scale factors (overrides max_scale)"
    )
    ap.add_argument("--queries", help="comma-separated registry names to probe")
    ap.add_argument(
        "--docs-only",
        action="store_true",
        help="scale only the documents table (text-operator probes)",
    )
    ap.add_argument(
        "--embeddings-only",
        action="store_true",
        help="scale only the embeddings table, offsetting labels per "
        "copy (vector-operator probes; see build_scaled_embeddings)",
    )
    args = ap.parse_args()

    probes = args.queries.split(",") if args.queries else DEFAULT_PROBES
    if args.scales:
        scales = [int(s) for s in args.scales.split(",")]
    else:
        scales = [1]
        while scales[-1] * 2 <= args.max_scale:
            scales.append(scales[-1] * 2)

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    unknown = [n for n in probes if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    root = tempfile.mkdtemp(prefix="p4mr-scale-")
    results: dict[str, dict[int, float]] = {n: {} for n in probes}
    try:
        for k in scales:
            sf_dir = os.path.join(root, f"x{k}")
            if args.embeddings_only:
                build_scaled_embeddings(spark, k, sf_dir)
            else:
                build_scaled(spark, k, sf_dir, docs_only=args.docs_only)
            for name in probes:
                fn = registry[name].fn
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                results[name][k] = round(time.perf_counter() - t0, 2)
                print(
                    f"  x{k} {name}: {results[name][k]:.2f}s",
                    file=sys.stderr,
                    flush=True,
                )
            print(f"scale x{k} done", file=sys.stderr, flush=True)
            shutil.rmtree(sf_dir, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    header = "| query | " + " | ".join(f"x{k}" for k in scales) + " |"
    sep = "|---" * (len(scales) + 1) + "|"
    print(header)
    print(sep)
    for name in probes:
        row = " | ".join(f"{results[name][k]:.2f}s" for k in scales)
        print(f"| {name} | {row} |")


if __name__ == "__main__":
    main()
