"""Per-query Spark execution metrics via the UI REST API (r12 verdict
ask #2: make drift-vs-regression adjudicable without A/Bs).

Wall time alone cannot separate host contention from a real plan
regression — but ``inputBytes`` and ``shuffleWriteBytes`` are
determined by the plan and the data, not the host, and max-task-time
exposes stragglers the 32-thread wall hides. The bench (bench.py) and
the budget updater/gate (tools/update_bench_budget.py) snapshot the
completed-stage set before a query's final timed run and diff it
afterwards, so each query's numbers cover exactly its own stages.

The REST endpoints are served by the UI web server, so callers must
run under a session with ``spark.ui.enabled=true`` (bench.py and the
test conftest enable it; the AppStatusListener that FEEDS the store
runs regardless of the UI flag, so enabling the server adds no
listener overhead inside timed regions — HTTP polling happens only
between timings). When the UI is off, every helper degrades to an
``{"error": ...}`` payload instead of failing the bench.
"""

from __future__ import annotations

import json
import time
import urllib.request


def _stage_list(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    if not base:
        raise RuntimeError("spark.ui.enabled=false: REST metrics unavailable")
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as r:
        return json.load(r)


def stage_snapshot(spark):
    """The set of completed (stageId, attemptId) pairs right now.
    Take one BEFORE the run you want to measure. Returns None when the
    listing fails (UI off, transient REST error) — callers pass it to
    stage_metrics_since, which turns None into an error payload
    instead of silently attributing the WHOLE session's stage history
    to the measured query (a review-caught failure mode: one urlopen
    timeout on the before-snapshot would otherwise make the next
    query's bytes sum 40 queries of history and read as a phantom
    regression in GATE_LOG)."""
    try:
        return {(st["stageId"], st["attemptId"]) for st in _stage_list(spark)}
    except Exception:
        return None


def stage_metrics_since(spark, before: set, settle_sec: float = 0.25) -> dict:
    """Aggregate input/shuffle/task metrics over every stage that
    completed since ``before`` (a ``stage_snapshot`` result).

    The app status store updates asynchronously after an action
    returns, so the completed-stage list is polled until it stops
    growing (bounded by 3 polls). Returned bytes are plan-determined
    and host-independent; ``max_task_ms`` is the slowest single task
    across the new stages (straggler evidence), with the median of
    that same stage alongside for the skew ratio.
    """
    if before is None:
        return {"error": "before-snapshot failed: metrics unattributable"}
    try:
        stages = _stage_list(spark)
        for _ in range(2):
            time.sleep(settle_sec)
            nxt = _stage_list(spark)
            if len(nxt) == len(stages):
                stages = nxt
                break
            stages = nxt
    except Exception as e:
        return {"error": str(e)}
    new = [
        st for st in stages if (st["stageId"], st["attemptId"]) not in before
    ]
    out = {
        "n_stages": len(new),
        "input_bytes": sum(int(st.get("inputBytes") or 0) for st in new),
        "shuffle_write_bytes": sum(
            int(st.get("shuffleWriteBytes") or 0) for st in new
        ),
        "max_task_ms": 0,
        "med_task_ms_of_max_stage": 0,
        # r13 (ADVICE): count taskSummary polls that failed, so a
        # zero max_task_ms is distinguishable from an unpolled one —
        # the straggler signal GATE_LOG adjudicates on must not read
        # 0 silently when the REST endpoint flaked.
        "task_summary_errors": 0,
    }
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    for st in new:
        url = (
            f"{base}/api/v1/applications/{app}/stages/"
            f"{st['stageId']}/{st['attemptId']}/taskSummary"
            "?quantiles=0.5,1.0"
        )
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                summ = json.load(r)
        except Exception:
            out["task_summary_errors"] += 1
            continue
        dur = summ.get("duration") or [0, 0]
        if dur[-1] > out["max_task_ms"]:
            out["max_task_ms"] = round(dur[-1], 1)
            out["med_task_ms_of_max_stage"] = round(dur[0], 1)
    return out


def calibration_scan(spark, sf_dir: str, runs: int = 5) -> float:
    """THE calibration protocol, shared by bench.py, the budget
    updater/gate (measure_ratios), the recenter probe, and the A/B
    tool: warm lineitem metadata, one unbilled warm run, then
    min-of-``runs`` wall of a lineitem count+sum noop write. Four
    hand-rolled copies of this loop had already diverged risk-wise
    (the gate's contention guard assumes the protocol is identical
    everywhere) — change it HERE or nowhere.
    """
    import time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load

    def run() -> None:
        load(spark, sf_dir, "lineitem").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("s"),
        ).write.format("noop").mode("overwrite").save()

    load(spark, sf_dir, "lineitem").count()  # warm FS metadata
    run()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best
