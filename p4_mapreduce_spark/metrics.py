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


def stage_snapshot(spark) -> set:
    """The set of completed (stageId, attemptId) pairs right now.
    Take one BEFORE the run you want to measure."""
    try:
        return {(st["stageId"], st["attemptId"]) for st in _stage_list(spark)}
    except Exception:
        return set()


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
            continue
        dur = summ.get("duration") or [0, 0]
        if dur[-1] > out["max_task_ms"]:
            out["max_task_ms"] = round(dur[-1], 1)
            out["med_task_ms_of_max_stage"] = round(dur[0], 1)
    return out
