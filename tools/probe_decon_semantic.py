#!/usr/bin/env python3
"""Scaling probe for decontaminate_semantic (r13): adaptive band-width
ladder vs the fixed-4-bit arm it replaced.

Builds Kx corpora from sf0.1 (embeddings + documents unioned K times
with id offsets that preserve the %10 train/bench split), then runs
the registered query end-to-end (noop write, min-of-2) per scale:

- adaptive arm: the shipped bits ladder (+1 bit per doubling of the
  benchmark count past the bucket target) — expected candidates
  ~N_train x bands x target, LINEAR;
- fixed arm (--fixed-bits 4): constant 1/16 per-band collision rate —
  candidates O(N_train x N_bench / 16), QUADRATIC. Its candidate set
  is a SUPERSET of the adaptive arm's (agreement on low 10 bits
  implies agreement on low 4), so its n_contaminated bounds the
  recall the ladder trades; both numbers print.

Run ALONE (timings are garbage under co-load).

Usage:
    python tools/probe_decon_semantic.py [--scales 1,8,60] [--fixed-bits 4]
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

import p4_mapreduce_spark.operators.similarity as sim
from p4_mapreduce_spark.session import get_spark
from p4_mapreduce_spark.sources.tables import load

BASE = "/root/testdata/sf0.1"
OFF = 10_000_000  # multiple of 10: preserves the %10 split


def build(spark, k: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for tbl, key in (("embeddings", "vec_id"), ("documents", "doc_id")):
        base = load(spark, BASE, tbl)
        parts = [
            base.withColumn(key, F.col(key) + F.lit(i * OFF))
            for i in range(k)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,8,60")
    ap.add_argument("--fixed-bits", type=int, default=None)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark(app_name="probe-decon-semantic")
    spark.sparkContext.setLogLevel("ERROR")

    if args.fixed_bits is not None:
        fb = args.fixed_bits
        sim._decon_bits = lambda nb: fb
        print(f"FIXED bits={fb} arm", file=sys.stderr)

    tmp = tempfile.mkdtemp(prefix="decon_probe_")
    try:
        for k in scales:
            d = os.path.join(tmp, f"x{k}")
            build(spark, k, d)
            fn = lambda: sim.decontaminate_semantic(spark, d)  # noqa: E731
            nb = (
                load(spark, d, "embeddings")
                .where(F.col("vec_id") % 10 >= 8)
                .count()
            )
            bits = sim._decon_bits(nb)
            fn().write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row = (
                fn()
                .agg(
                    F.sum("n_contaminated").alias("nc"),
                    F.sum("n_train").alias("nt"),
                )
                .collect()[0]
            )
            print(
                f"x{k}: wall {best:.2f}s  bits={bits}  n_bench={nb}  "
                f"contaminated {row['nc']}/{row['nt']}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
