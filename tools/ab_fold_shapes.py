#!/usr/bin/env python3
"""A/B the r10 vs r11 shapes of the fold-touched headliners (r12
verdict ask #1).

BENCH_r11's like-for-like driver session showed `decontaminate_test_split`
2.64x, `dedup_minhash_incremental` 2.46x, `interval_overlap_join`
2.22x and `dedup_minhash_lsh` 1.82x over r10 against a ~1.5x uniform
session drift — leaving a residual the SCALE.md pricing (~+10% /
"fixed cost") does not explain. This probe adjudicates: same JVM, same
warm module caches, min-of-3 steady-state per shape, shapes
interleaved per query so drift hits both equally.

  r11 shape: STAGE_MAT=True (lazy localCheckpoints of the bounded
             multi-branch frames) + hot-bin pair-space salting.
  r10 shape: STAGE_MAT=False (every branch re-derives its subtree)
             + skew_safe=False for the overlap join.

Result parity between shapes is asserted per query (count + integer
checksum computed JVM-side), so the A/B cannot quietly compare
different answers. Per-shape stage metrics (inputBytes/shuffleWrite/
max-task) come from the UI REST store — the byte delta IS the fold's
claimed saving, measured rather than asserted.

Run ALONE (single-tenant host) or the walls are garbage:

    python tools/ab_fold_shapes.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

import p4_mapreduce_spark.stagemat as stagemat
from p4_mapreduce_spark.metrics import stage_metrics_since, stage_snapshot
from p4_mapreduce_spark.registry import load_all
from p4_mapreduce_spark.session import get_spark
from p4_mapreduce_spark.sources.tables import load


def _overlap_r10(spark, sf_dir):
    """interval_overlap_join with the r10 kernel shape (no salting;
    STAGE_MAT is flipped by the caller for the checkpoint half)."""
    from p4_mapreduce_spark.functions.timeutil import epoch_micros
    from p4_mapreduce_spark.operators.analytics import (
        _OVERLAP_SPAN_US,
        interval_islands,
        overlap_pairs_rollup,
    )

    raw = load(spark, sf_dir, "events")
    spans = raw.select(
        "user_id",
        epoch_micros(raw).alias("s"),
        (epoch_micros(raw) + F.lit(_OVERLAP_SPAN_US)).alias("e"),
        F.lit(1).cast("bigint").alias("n"),
    )
    sess = interval_islands(spans).select(
        "user_id",
        "island_id",
        F.col("span_start_us").alias("s"),
        F.col("span_end_us").alias("e"),
    )
    return overlap_pairs_rollup(sess, skew_safe=False)


def _checksum(df) -> tuple:
    """(row count, xor-free integer checksum) computed JVM-side —
    order-insensitive parity proof between the two shapes."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.hash(*df.columns)).cast("bigint")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    def _at_least_one(v: str) -> int:
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError(
                "--runs must be >= 1 (the before-snapshot is taken on "
                "the last timed run)"
            )
        return n

    ap.add_argument("--runs", type=_at_least_one, default=3)
    ap.add_argument("--sf-dir", default=None, help="override corpus dir")
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset of the four A/B cases",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    spark = get_spark(
        app_name="ab-fold-shapes",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # calibration scan: the SHARED protocol (metrics.calibration_scan)
    from p4_mapreduce_spark.metrics import calibration_scan

    calib = calibration_scan(spark, sf_dir)

    cases = {
        "dedup_minhash_lsh": {
            "r11": lambda: registry["dedup_minhash_lsh"].fn(spark, sf_dir),
            "r10": lambda: registry["dedup_minhash_lsh"].fn(spark, sf_dir),
        },
        "dedup_minhash_incremental": {
            "r11": lambda: registry["dedup_minhash_incremental"].fn(spark, sf_dir),
            "r10": lambda: registry["dedup_minhash_incremental"].fn(spark, sf_dir),
        },
        "decontaminate_test_split": {
            "r11": lambda: registry["decontaminate_test_split"].fn(spark, sf_dir),
            "r10": lambda: registry["decontaminate_test_split"].fn(spark, sf_dir),
        },
        "interval_overlap_join": {
            "r11": lambda: registry["interval_overlap_join"].fn(spark, sf_dir),
            "r10": lambda: _overlap_r10(spark, sf_dir),
        },
    }

    if args.queries:
        keep = set(args.queries.split(","))
        cases = {n: c for n, c in cases.items() if n in keep}

    # the corpus-size gate (r12) would silently turn the r11 shape into
    # the r10 shape below the threshold — disable it so STAGE_MAT alone
    # controls the shape under test
    stagemat.SIZE_GATE = False

    results: dict[str, dict] = {}
    for name, shapes in cases.items():
        results[name] = {}
        sums: dict[str, tuple] = {}
        for shape in ("r11", "r10"):
            stagemat.STAGE_MAT = shape == "r11"
            build = shapes[shape]
            noop(build())  # codegen + module-cache warm
            sums[shape] = _checksum(build())
            best = float("inf")
            walls = []
            for i in range(args.runs):
                if i == args.runs - 1:
                    before = stage_snapshot(spark)
                t0 = time.perf_counter()
                noop(build())
                walls.append(round(time.perf_counter() - t0, 3))
                best = min(best, walls[-1])
            results[name][shape] = {
                "wall_min": round(best, 3),
                "walls": walls,
                "x_calib": round(best / calib, 2),
                "metrics": stage_metrics_since(spark, before),
            }
        stagemat.STAGE_MAT = True
        assert sums["r11"] == sums["r10"], (
            f"{name}: shapes disagree! r11={sums['r11']} r10={sums['r10']}"
        )
        results[name]["parity"] = {"rows": sums["r11"][0], "checksum_ok": True}
        r11, r10 = results[name]["r11"], results[name]["r10"]
        results[name]["r11_over_r10"] = round(
            r11["wall_min"] / max(r10["wall_min"], 1e-9), 3
        )
        print(
            f"{name}: r11 {r11['wall_min']}s vs r10 {r10['wall_min']}s "
            f"= {results[name]['r11_over_r10']}x  "
            f"(bytes r11={r11['metrics'].get('input_bytes')} "
            f"r10={r10['metrics'].get('input_bytes')})",
            file=sys.stderr,
        )

    print(json.dumps({
        "sf_dir": sf_dir,
        "calibration_sec": round(calib, 4),
        "runs": args.runs,
        "results": results,
    }, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
