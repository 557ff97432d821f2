#!/usr/bin/env python3
"""Planted-boilerplate skew probe for the ExactSubstr span family
(r9 verdict ask #1 / What's wrong #2).

The replicated x60 corpus the regular scale probe builds is UNIFORM
skew: every window hash holds ~60 rows. The real ExactSubstr input is
boilerplate-heavy — one 30-token license block in a large fraction of
docs puts every one of its position rows under a SINGLE window hash,
and the keeper step funnels every doc's run under a SINGLE content
hash. This probe builds that corpus directly:

  * ``n_docs`` documents (default 300k ~ x60 of sf0.1), each with a
    corpus-unique token tail (``u<doc_id>x<i>`` — no accidental
    duplication), and
  * ONE fixed 30-token block planted at the front of ``plant_pct``%
    of docs (default 20% = 60k docs).

So exactly one window hash holds 60k position rows, exactly one run
content holds 60k keeper candidates, and everything else is unique —
the surgical worst case for ``Window.partitionBy("wh")`` /
``("ch")``, which AQE cannot split (skew-join splitting covers only
joins).

For each (query x shape) it reports wall time AND the max/median task
duration of the stages the timed run executed (Spark UI REST
taskSummary — the straggler evidence wall time alone hides at local
scale, where one hot task among 32 threads barely moves the wall).

Shapes: ``window``   = the r9 one-shuffle Window.partitionBy shape
        ``skewsafe`` = the r10 default (cutlist: groupBy+count +
                       left-semi join, map-side partial aggregation +
                       AQE-skew-splittable join; surgery/apply: the
                       per-run card materialized once via lazy
                       localCheckpoint + grouped keeper min + join)

Usage:
    python tools/skew_probe_span.py [--n-docs 300000] [--plant-pct 20]
        [--uniform]   # also run the uniform replicated x60 baseline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from p4_mapreduce_spark.operators.dedup import (
    _span_runs,
    _surgery_frame,
)
from p4_mapreduce_spark.session import get_spark
from p4_mapreduce_spark.sources.tables import load

BLOCK = " ".join(f"bp{i}" for i in range(30))


def boilerplate_corpus(spark, n_docs: int, plant_pct: int):
    """n_docs docs with corpus-unique tails; the SAME 30-token block
    planted at the front of plant_pct% of them. Built entirely with
    JVM-side expressions (no driver loop, no Python UDF)."""
    every = max(1, 100 // plant_pct)
    tail = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(55)),
            lambda i: F.concat(
                F.lit("u"), F.col("id").cast("string"), F.lit("x"),
                i.cast("string"),
            ),
        ),
    )
    text = F.when(
        F.col("id") % every == 0, F.concat(F.lit(BLOCK + " "), tail)
    ).otherwise(tail)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def replicated_corpus(spark, k: int):
    """The regular scale probe's uniform x_k documents corpus."""
    base = load(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    out = None
    for i in range(k):
        c = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        )
        out = c if out is None else out.union(c)
    return out


def _task_summary(spark, since_ms: float) -> dict:
    """Max/median task duration (ms) across stages submitted after
    ``since_ms``, via the UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = json.load(r)
    except Exception as e:  # UI off or endpoint moved: degrade loudly
        return {"error": str(e)}
    out = {"max_task_ms": 0.0, "med_task_ms": 0.0, "max_task_stage": ""}
    for st in stages:
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        # ISO8601 '2026-08-15T21:00:00.123GMT' -> epoch ms
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
        if dur[2] > out["max_task_ms"]:
            out["max_task_ms"] = dur[2]
            out["med_task_ms"] = dur[1]
            out["max_task_stage"] = st.get("name", "")[:60]
    return out


def run_probe(spark, docs, label: str, rows: list) -> None:
    docs = docs.cache()
    n = docs.count()
    cases = {
        "cutlist": lambda safe: _span_runs(docs, skew_safe=safe),
        "surgery": lambda safe: _surgery_frame(docs, skew_safe=safe),
    }
    for qname, build in cases.items():
        for shape, safe in (("window", False), ("skewsafe", True)):
            build(safe).write.format("noop").mode("overwrite").save()  # warm
            # REBUILD for the timed pass: the skew-safe shapes
            # materialize a lazy localCheckpoint on first action, and
            # re-running the SAME DataFrame would read it back instead
            # of recomputing (bench.py rebuilds via fn() per run for
            # exactly this reason)
            df = build(safe)
            t0_epoch = time.time() * 1000
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            ts = _task_summary(spark, t0_epoch)
            rows.append(
                {
                    "corpus": label,
                    "n_docs": n,
                    "query": qname,
                    "shape": shape,
                    "wall_s": round(wall, 2),
                    "max_task_s": round(ts.get("max_task_ms", 0) / 1000, 2),
                    "med_task_s": round(ts.get("med_task_ms", 0) / 1000, 2),
                    "max_task_stage": ts.get("max_task_stage", ""),
                }
            )
            print(f"  {label} {qname}/{shape}: wall {wall:.2f}s "
                  f"max-task {rows[-1]['max_task_s']}s "
                  f"med-task {rows[-1]['med_task_s']}s",
                  file=sys.stderr, flush=True)
    docs.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-docs", type=int, default=300_000)
    ap.add_argument("--plant-pct", type=int, default=20)
    ap.add_argument("--uniform", action="store_true",
                    help="also run the uniform replicated x60 baseline")
    args = ap.parse_args()

    spark = get_spark(
        app_name="span-skew-probe",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows: list[dict] = []
    planted = boilerplate_corpus(spark, args.n_docs, args.plant_pct)
    run_probe(
        spark, planted,
        f"planted-{args.plant_pct}pct-{args.n_docs // 1000}k", rows,
    )
    if args.uniform:
        run_probe(spark, replicated_corpus(spark, 60), "uniform-x60", rows)

    print("| corpus | query | shape | wall | max task | med task |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['corpus']} | {r['query']} | {r['shape']} | "
            f"{r['wall_s']}s | {r['max_task_s']}s | {r['med_task_s']}s |"
        )


if __name__ == "__main__":
    main()
