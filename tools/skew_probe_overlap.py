#!/usr/bin/env python3
"""Planted hot-bin skew probe for interval_overlap_join (r11, the r10
verdict's What's wrong #2).

The regular scale probe's replicated corpus keeps every 15-minute bin
mildly loaded. The co-presence worst case is one GLOBALLY-HOT bin — a
launch or an outage where a large fraction of all users is co-active
in the same 15 minutes. The true answer for that bin is ~k^2/2 pairs
(output-quadratic by SEMANTICS), and the danger is plan-shaped: the
bin equi-join partition's INPUT is only k narrow rows, so AQE's
input-size-based skew split never fires and one task emits the entire
pair stream.

This probe builds that corpus surgically, entirely JVM-side:

  * ``n_users`` users, each with 3 background events in their own
    disjoint time slot (background pair volume: exactly zero), and
  * ONE event at the same aligned hot timestamp for ``plant_pct``% of
    users — one 15-minute bin holding k = n_users * pct sessions.

For each shape (``plain`` = bare bin equi-join; ``skewsafe`` = r11
pair-space salting of hot bins) it reports wall time, the pair-stage
max/median task duration (UI REST taskSummary), and the result row
count (which both shapes must agree on — the salting is
result-identical by construction).

Usage:
    python tools/skew_probe_overlap.py [--n-users 90000] [--plant-pct 20]
        [--shapes plain,skewsafe]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from p4_mapreduce_spark.operators.analytics import (
    _OVERLAP_SPAN_US,
    interval_islands,
    overlap_pairs_rollup,
)
from p4_mapreduce_spark.session import get_spark

# aligned to the 15-min bin grid so the planted event covers ONE bin
HOT_TS_US = 1_717_200_000_000_000  # 2024-06-01 00:00:00 UTC


def hot_bin_sessions(spark, n_users: int, plant_pct: int):
    """Session frame (user_id, island_id, s, e): 3 disjoint background
    islands per user (no cross-user overlap anywhere), plus the ONE
    hot-bin island for every (100/plant_pct)-th user."""
    every = max(1, 100 // plant_pct)
    slot = 4 * _OVERLAP_SPAN_US  # per-user home slot, users disjoint
    base = spark.range(n_users).select(F.col("id").alias("user_id"))
    bg = base.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
    ).select(
        "user_id",
        (
            F.lit(HOT_TS_US + 10 * _OVERLAP_SPAN_US)
            + F.col("user_id") * F.lit(3 * slot)
            + F.col("i") * F.lit(slot)
        ).alias("s"),
    )
    hot = base.where(F.col("user_id") % every == 0).select(
        "user_id", F.lit(HOT_TS_US).alias("s")
    )
    spans = bg.unionByName(hot).select(
        "user_id",
        "s",
        (F.col("s") + F.lit(_OVERLAP_SPAN_US)).alias("e"),
        F.lit(1).cast("bigint").alias("n"),
    )
    return interval_islands(spans).select(
        "user_id",
        "island_id",
        F.col("span_start_us").alias("s"),
        F.col("span_end_us").alias("e"),
    )


def _task_summary(spark, since_ms: float) -> dict:
    """Max/median task duration (ms) across stages submitted after
    ``since_ms`` (the skew_probe_span harness)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = json.load(r)
    except Exception as e:
        return {"error": str(e)}
    out = {
        "max_task_ms": 0.0,
        "med_task_ms": 0.0,
        "max_task_stage": "",
        "stages_top": [],
    }
    per_stage = []
    for st in stages:
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        ts = time.mktime(
            time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")
        ) * 1000
        if ts < since_ms - 1000:
            continue
        url = (
            f"{base}/api/v1/applications/{app}/stages/"
            f"{st['stageId']}/{st['attemptId']}/taskSummary"
            "?quantiles=0.0,0.5,1.0"
        )
        try:
            with urllib.request.urlopen(url) as r:
                summ = json.load(r)
        except Exception:
            continue
        dur = summ.get("duration") or [0, 0, 0]
        per_stage.append(
            (dur[2], dur[1], st.get("numCompleteTasks"),
             f"{st['stageId']}:{st.get('name', '')[:48]}")
        )
        if dur[2] > out["max_task_ms"]:
            out["max_task_ms"] = dur[2]
            out["med_task_ms"] = dur[1]
            out["max_task_stage"] = st.get("name", "")[:60]
    out["stages_top"] = [
        f"max={mx / 1000:.2f}s med={md / 1000:.2f}s n={n} {nm}"
        for mx, md, n, nm in sorted(per_stage, reverse=True)[:5]
    ]
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-users", type=int, default=90_000)
    ap.add_argument("--plant-pct", type=int, default=20)
    ap.add_argument("--shapes", default="plain,skewsafe")
    ap.add_argument(
        "--broadcast-limit", default="-1",
        help="spark.sql.autoBroadcastJoinThreshold for the probe. "
        "Default -1 (broadcast OFF): at 100 TB the session frame "
        "cannot broadcast and the bin join is a SHUFFLED join whose "
        "hot-bin partition is the skew under test; with broadcast on "
        "(probe-scale default planning) pair generation distributes "
        "by the STREAMED side's input splits and the hot bin is "
        "invisible — measured, see SCALE.md r11.",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="overlap-skew-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": args.broadcast_limit,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the session frame ONCE so both shapes time only the
    # pair join + rollup, not the islands windows
    tmp = tempfile.mkdtemp(prefix="overlap_probe_")
    try:
        hot_bin_sessions(
            spark, args.n_users, args.plant_pct
        ).write.parquet(f"{tmp}/sess")
        sess = spark.read.parquet(f"{tmp}/sess")
        k = args.n_users * args.plant_pct // 100
        print(
            f"n_users={args.n_users} hot-bin sessions k={k} "
            f"(true pairs ~{k * (k - 1) // 2:,})",
            file=sys.stderr, flush=True,
        )
        rows = []
        for shape in args.shapes.split(","):
            safe = shape == "skewsafe"
            df = overlap_pairs_rollup(sess, skew_safe=safe)
            df.write.format("noop").mode("overwrite").save()  # warm
            df = overlap_pairs_rollup(sess, skew_safe=safe)
            t0_epoch = time.time() * 1000
            t0 = time.perf_counter()
            n_out = df.count()
            wall = time.perf_counter() - t0
            ts = _task_summary(spark, t0_epoch)
            rows.append(
                {
                    "shape": shape,
                    "wall_s": round(wall, 2),
                    "n_pairs": n_out,
                    "max_task_s": round(ts.get("max_task_ms", 0) / 1000, 2),
                    "med_task_s": round(ts.get("med_task_ms", 0) / 1000, 2),
                    "max_task_stage": ts.get("max_task_stage", ""),
                }
            )
            print(
                f"  {shape}: wall {wall:.2f}s pairs {n_out:,} "
                f"max-task {rows[-1]['max_task_s']}s "
                f"med-task {rows[-1]['med_task_s']}s "
                f"max-stage [{rows[-1]['max_task_stage']}]",
                file=sys.stderr, flush=True,
            )
            for st in ts.get("stages_top", []):
                print(f"    stage {st}", file=sys.stderr, flush=True)
        print("| shape | wall | pairs | max task | med task |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['shape']} | {r['wall_s']}s | {r['n_pairs']:,} | "
                f"{r['max_task_s']}s | {r['med_task_s']}s |"
            )
        if len({r["n_pairs"] for r in rows}) > 1:
            print("RESULT MISMATCH BETWEEN SHAPES", file=sys.stderr)
            sys.exit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
