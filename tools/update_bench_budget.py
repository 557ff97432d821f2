#!/usr/bin/env python3
"""Write BENCH_BUDGET.json: per-headline-query ratio-to-calibration
budgets for the in-tree bench regression gate (r6 verdict ask #5).

Measures every headline query at $SPARK_GRAFT_SF_DIR (default sf0.1)
with the SAME protocol tests/test_bench_budget.py replays (shared
session, one warmup run, min-of-2 steady-state, ratio to the min-of-5
lineitem count+sum calibration scan), so the committed budget and the
gate's measurement are like-for-like. Re-run this after intentional
performance changes or when adding a headline query — the diff to
BENCH_BUDGET.json is the reviewable perf change.

Run ALONE (no concurrent Spark JVMs): probes and benches on this host
are only comparable single-tenant.

Usage: python tools/update_bench_budget.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p4_mapreduce_spark.registry import load_all  # noqa: E402
from p4_mapreduce_spark.session import get_spark  # noqa: E402
from p4_mapreduce_spark.sources.tables import load  # noqa: E402


def measure_ratios(spark, sf_dir: str, runs: int = 2, only=None) -> dict:
    """The shared protocol: calibration min-of-5, queries min-of-N.

    ``only``: optional collection of query names — measure just those
    headliners (the gate's retry pass re-measures only the over-budget
    queries, with a FRESH calibration so a transient spike in the
    original calibration can't poison the retry ratios too)."""
    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    from p4_mapreduce_spark.metrics import (
        calibration_scan,
        stage_metrics_since,
        stage_snapshot,
    )

    calib = calibration_scan(spark, sf_dir)

    registry = load_all()
    ratios: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    for name, spec in sorted(registry.items()):
        if not spec.headline:
            continue
        if only is not None and name not in only:
            continue
        noop(spec.fn(spark, sf_dir))  # codegen warmup
        best = float("inf")
        for i in range(runs):
            if i == runs - 1:
                # r12: stage-set diff around the last run — the bytes
                # are plan-determined, so GATE_LOG entries carry a
                # host-independent signal a post-hoc judge can compare
                # across rounds (polling happens after the timer stops)
                before = stage_snapshot(spark)
            t0 = time.perf_counter()
            noop(spec.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        ratios[name] = round(best / calib, 2)
        metrics[name] = stage_metrics_since(spark, before)
    return {
        "calibration_sec": round(calib, 4),
        "ratios": ratios,
        "metrics": metrics,
    }


def recenter(spark, sf_dir: str, probes: int = 5, gap_s: float = 20.0) -> float:
    """Re-measure ONLY the calibration guard center: ``probes``
    min-of-5 calibration scans spaced ``gap_s`` apart, median taken.

    Why (r12): the guard compares each gate session's calibration to
    ``calibration_sec`` with a 1.65x band, and this host's QUIET
    calibration wanders 0.15-0.33s on the scale of minutes — a budget
    whose two back-to-back passes landed in a fast window (measured:
    0.159s vs the 0.30s center it replaced) re-creates the r10
    fast-baseline trap where perfectly quiet sessions skip. Spacing
    the probes samples the wander instead of one instant of it;
    ratios are untouched (each pass's ratios already use its OWN
    calibration)."""
    import time as _time

    from p4_mapreduce_spark.metrics import calibration_scan

    vals = []
    for i in range(probes):
        if i:
            _time.sleep(gap_s)
        vals.append(round(calibration_scan(spark, sf_dir), 4))
    vals.sort()
    print(f"calibration probes: {vals}")
    return vals[len(vals) // 2]


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--recenter" in sys.argv:
        spark = get_spark(app_name="bench-budget", shuffle_partitions=8,
                          extra_conf={"spark.ui.enabled": "true"})
        spark.sparkContext.setLogLevel("ERROR")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_BUDGET.json")
        with open(path) as f:
            out = json.load(f)
        center = recenter(spark, sf_dir)
        out["calibration_sec"] = center
        out["calibration_center_protocol"] = (
            "guard center = median of 5 min-of-5 calibration probes "
            "spaced 20s apart (tools/update_bench_budget.py --recenter); "
            "per-query ratios keep their own measurement passes' "
            "calibrations"
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"recentered {path}: calibration_sec={center}")
        sys.exit(0)
    # SAME session config as tests/conftest.py (incl. the UI, which
    # serves the REST stage metrics — a review-caught omission left
    # every stage_metrics entry an error dict in the first r12
    # budget): the gate replays the protocol in the pytest session,
    # and ratios-to-calibration cancel host speed but NOT config
    # differences — a budget measured at 32 shuffle partitions reads
    # 2x slow for shuffle-heavy queries when the gate runs at 8
    # (measured: ann_lsh_incremental 6.3 -> 15.9).
    spark = get_spark(app_name="bench-budget", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    if "--add" in sys.argv:
        # Add/refresh ONLY the named headliners (comma-separated) —
        # the policy-correct path when a NEW headline query lands:
        # existing ratios stay untouched (no silent re-baseline of 47
        # queries to admit one), the file diff is exactly the new
        # entries. Run ALONE like the full updater.
        names = set(
            sys.argv[sys.argv.index("--add") + 1].split(",")
        )
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_BUDGET.json")
        with open(path) as f:
            out = json.load(f)
        p1 = measure_ratios(spark, sf_dir, only=names)
        p2 = measure_ratios(spark, sf_dir, only=names)
        missing = names - set(p1["ratios"])
        if missing:
            print(f"not headliners / unknown: {sorted(missing)}")
            sys.exit(1)
        # r13 review fix: budget WRITES must be in budget units. A
        # pass measured in the host's FAST quiet mode records ratios
        # ~2.1x inflated relative to the other entries; the gate's
        # single session-wide center scale can never reconcile a
        # mixed-unit budget (that query's regressions would be masked
        # ~2x forever). Keep only passes whose calibration is
        # comparable (1.65x band) to the budget's own; refuse if none.
        bc = out.get("calibration_sec")
        passes = [
            p
            for p in (p1, p2)
            if not bc
            or max(p["calibration_sec"] / bc, bc / p["calibration_sec"])
            <= 1.65
        ]
        if not passes:
            print(
                f"both passes' calibrations "
                f"({p1['calibration_sec']}, {p2['calibration_sec']}) "
                f"deviate >1.65x from the budget's {bc} — the host is "
                "in a different quiet mode; budget entries must be in "
                "budget units. Re-run when the host matches (or "
                "re-baseline fully)."
            )
            sys.exit(2)
        for n in names:
            out["ratios"][n] = min(p["ratios"][n] for p in passes)
            out.setdefault("stage_metrics", {})[n] = passes[-1][
                "metrics"
            ].get(n, {})
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        print(
            f"added {sorted(names)}: "
            f"{ {n: out['ratios'][n] for n in sorted(names)} } "
            f"(calibrations {p1['calibration_sec']}, "
            f"{p2['calibration_sec']})"
        )
        sys.exit(0)
    if "--metrics-only" in sys.argv:
        # refresh ONLY the plan-determined byte baselines (one pass,
        # one timed-protocol run per headliner, ratios untouched —
        # bytes do not drift with host state so a single run is exact)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_BUDGET.json")
        with open(path) as f:
            out = json.load(f)
        m = measure_ratios(spark, sf_dir, runs=1)
        out["stage_metrics"] = m.get("metrics", {})
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
        errs = [n for n, v in out["stage_metrics"].items() if "error" in v]
        print(f"rewrote stage_metrics for {len(out['stage_metrics'])} "
              f"headliners ({len(errs)} errors: {errs[:3]})")
        sys.exit(0)
    # TWO full passes, per-query MIN (r8): this shared host shows
    # transient contention spikes that inflate shuffle/UDF-heavy
    # queries 5-10x while the scan-bound calibration barely moves
    # (measured: dedup_minhash_lsh 3.3 -> 29.9 between two otherwise
    # identical runs minutes apart). A spike rarely hits the same
    # query in both passes, so the per-query min over two passes is a
    # far more stable budget than any single pass.
    p1 = measure_ratios(spark, sf_dir)
    p2 = measure_ratios(spark, sf_dir)
    out = {
        # MEAN of the two passes, not min: the gate's contention guard
        # compares raw session calibration against this value with a
        # 1.5x band, and this host's quiet-session calibration spans
        # ~0.15-0.29s — recording the fast tail (a min) mis-centers the
        # band and makes perfectly quiet gate sessions skip (measured:
        # budget 0.154s, quiet gate session 0.284s = 1.84x). Ratios
        # still use each pass's own calibration, so this choice only
        # affects the guard's center.
        "calibration_sec": round(
            (p1["calibration_sec"] + p2["calibration_sec"]) / 2, 4
        ),
        "ratios": {
            n: min(p1["ratios"][n], p2["ratios"][n]) for n in p1["ratios"]
        },
        # r12: plan-determined per-query bytes from the warm second
        # pass — informational baselines, NOT gate verdicts (cache
        # warm-state differs between sessions, so bytes are for
        # post-hoc drift-vs-regression adjudication in GATE_LOG, where
        # a wall regression with UNCHANGED bytes reads as host drift
        # and one WITH byte growth reads as a plan regression)
        "stage_metrics": p2.get("metrics", {}),
    }
    # r13 review fix: calibration_centers are NOT carried through a
    # full re-baseline — their ratio_scale values are measured
    # RELATIVE TO the ratios this path just replaced (a fast-mode
    # re-baseline would make the carried fast-center scale divide
    # fast-mode sessions twice: every query reads ~2x under budget and
    # real regressions pass). Centers must be re-derived against the
    # NEW ratios from GATE_LOG, which recenter_gate does by
    # construction (factors vs the CURRENT budget file).
    print(
        "calibration_centers dropped (ratio units changed) — re-run "
        "`python tools/recenter_gate.py` once fresh GATE_LOG entries "
        "exist against this budget"
    )
    out["sf_dir"] = sf_dir
    out["protocol"] = (
        "ratio = min-of-2 steady-state query time / min-of-5 lineitem "
        "count+sum calibration scan; the gate median-rescales measured "
        "ratios by budget and allows max(1.5x, +1.0) per query; "
        "contention-proofing: SKIP when session calibration deviates "
        ">1.65x from calibration_sec here or factor p75/p25 > 2.0, and "
        "on first-pass failure re-measure ONLY the over-budget queries "
        "(fresh calibration, min with original) before the verdict "
        "(see tests/test_bench_budget.py)"
    )
    out["rebaseline_policy"] = (
        "re-run tools/update_bench_budget.py ALONE only after an "
        "intentional perf change to a headliner (the JSON diff is the "
        "reviewable perf change), when adding/removing a headliner, or "
        "when the gate's calibration-drift SKIP fires across >= 3 "
        "sessions sustained (calibration deviating >1.65x from "
        "calibration_sec is a HOST-state shift, not a regression) — "
        "never to paper over a single-session failure, and never from "
        "an unusually fast or co-loaded host window (r10 lesson: a "
        "fast-window baseline made quiet-host sessions skip)"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BUDGET.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {len(out['ratios'])} budgets, "
          f"calibration {out['calibration_sec']}s")
