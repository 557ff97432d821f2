#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop-format write (full
computation, no driver collect). The session is warmed with a trivial
scan first so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from p4_mapreduce_spark.registry import load_all
from p4_mapreduce_spark.session import get_spark
from p4_mapreduce_spark.sources.tables import load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # UI on for the per-query REST metrics (r12: inputBytes /
    # shuffleWrite / max-task make drift-vs-regression adjudicable —
    # bytes don't move with host state). The status listener that
    # feeds the store runs regardless of this flag; the web server
    # itself is only polled BETWEEN timed runs.
    spark = get_spark(
        app_name="p4-mapreduce-spark-bench",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    headline = {n: s for n, s in sorted(registry.items()) if s.headline}

    # warmup: JVM, codegen, FS metadata
    load(spark, sf_dir, "lineitem").count()

    # Calibration scan (r5 verdict: the filed +23% "regression" was
    # host contention the builder can't see or rebut): the SHARED
    # protocol (p4_mapreduce_spark.metrics.calibration_scan — one
    # implementation for bench, budget updater, gate, recenter, A/B)
    # gives every BENCH file an internal yardstick: the per-query
    # ratios-to-calibration below are comparable across rounds even
    # when absolute wall times drift with host load.
    from p4_mapreduce_spark.metrics import calibration_scan

    calib = round(calibration_scan(spark, sf_dir), 4)

    # Each query runs six times: the first run pays one-time
    # whole-stage codegen compilation (~1s/query in this single JVM);
    # the reported time is the min of five steady-state runs, which
    # drops the contention spikes the shared host shows (measured:
    # unchanged queries drift 15-30% between bench runs an hour apart,
    # with idle-host steal time visible in /proc/stat — min-of-5 is
    # the cheapest robust estimator against that).
    from p4_mapreduce_spark.metrics import stage_metrics_since, stage_snapshot

    timings: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    for name, spec in headline.items():
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(5):
            if i == 4:
                # stage-set snapshot before the LAST timed run: its
                # diff gives this query's own stages; polling happens
                # only after the timer stops, so timings are unbiased
                before = stage_snapshot(spark)
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        metrics[name] = stage_metrics_since(spark, before)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration_sec": calib,
                "calibration_task": "lineitem count+sum(l_extendedprice) "
                "full scan, min-of-5 (normalize query times by this to "
                "cancel host-load drift across rounds)",
                "queries_x_calibration": {
                    n: round(t / calib, 2) for n, t in timings.items()
                },
                "spark_metrics": metrics,
                "spark_metrics_note": "per-query stage metrics from the "
                "final timed run (UI REST, stage-set diff): input_bytes/"
                "shuffle_write_bytes are plan-determined and do not drift "
                "with host load — compare THESE across rounds to separate "
                "contention from regression; max_task_ms vs "
                "med_task_ms_of_max_stage is the straggler/skew signal",
            }
        )
    )


if __name__ == "__main__":
    main()
