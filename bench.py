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

    # r13 (verdict ask #1): the driver records only the LAST 2000
    # chars of stdout and parses the JSON it finds there — eleven
    # rounds of BENCH_r*.json carried `parsed: null` because the one
    # huge line (walls + per-query stage metrics) overflowed the tail.
    # Fix: stdout is ONE COMPACT line (per-query walls + calibration —
    # everything needed to compare rounds), sized to fit the window;
    # the bulky spark_metrics map goes to a sidecar file, path included
    # in the line. Compact separators + 2-decimal walls keep ~50
    # headliners near 1.5 KB; the guard below is a loud canary if the
    # registry outgrows the window rather than a silent regression to
    # parsed:null.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_METRICS_LATEST.json"
    )
    with open(sidecar, "w") as f:
        json.dump(
            {
                "note": "per-query stage metrics from the final timed "
                "run (UI REST, stage-set diff): input_bytes/"
                "shuffle_write_bytes are plan-determined and do not "
                "drift with host load — compare THESE across rounds to "
                "separate contention from regression; max_task_ms vs "
                "med_task_ms_of_max_stage is the straggler/skew signal",
                "calibration_sec": calib,
                "sf": sf,
                "queries_sec": timings,
                "spark_metrics": metrics,
            },
            f,
            indent=1,
        )
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": {n: round(t, 2) for n, t in timings.items()},
            "sf": sf,
            "calibration_sec": calib,
            "metrics_file": "BENCH_METRICS_LATEST.json",
        },
        separators=(",", ":"),
    )
    if len(line) > 1900:  # tail window is 2000 chars — refuse to regress
        print(
            f"bench.py: compact line {len(line)} chars exceeds the "
            "driver tail window; trim query names or shard the line",
            file=sys.stderr,
        )
        sys.exit(3)
    print(line)


if __name__ == "__main__":
    main()
