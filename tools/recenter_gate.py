#!/usr/bin/env python3
"""Derive the host's quiet-mode calibration CENTERS from GATE_LOG.jsonl
and write them into BENCH_BUDGET.json (r13, verdict ask #4).

Why: this host's quiet calibration is bimodal — a ~0.10s fast mode and
a ~0.245s slow mode (cache/frequency state; both genuinely idle). A
single-center comparability guard SKIPs every session that lands on
the mode the budget didn't, which cost 2 of the last 6 suite-context
gate runs their verdict. The fix is not to widen the band (that would
re-admit contended sessions) but to teach the gate BOTH centers, each
with the ratio scale its sessions actually measure:

  ratio_scale(center) = median over that center's GATE_LOG entries of
                        median_q(entry.ratios[q] / budget.ratios[q])

In the fast mode the calibration scan (pure columnar scan) speeds up
~2.4x while the shuffle-bound headliners speed up only ~1.1x, so
measured ratios inflate by a near-constant ~2.1x — per-entry factor
dispersion inside a mode stays ~1.2 p75/p25, which is what makes the
scale a property of the MODE rather than noise.

Method (deliberately simple 1-D two-means):
  1. collect session_calibration_sec from every GATE_LOG entry whose
     first-pass ratios cover >= 80% of the current budget's queries;
  2. two-means on log(calibration) (init: min/max), iterate to
     convergence — the two quiet modes separate by >2x so this is
     stable;
  3. per cluster: center = median calibration of members within 1.3x
     of the cluster median (drops contended stragglers like the one
     0.427s entry), ratio_scale = median of the members' per-entry
     median factors vs the CURRENT budget ratios (median over ~47
     queries per entry is robust to the handful of queries whose
     implementation changed between rounds).

Writes budget["calibration_centers"] and exits nonzero if either
cluster has < 2 usable entries (not enough evidence to call it a mode).

This does NOT touch the ratios — it is gate comparability metadata,
not a re-baseline, so the rebaseline_policy does not apply.

Usage:
    python tools/recenter_gate.py [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_LOG = os.path.join(ROOT, "GATE_LOG.jsonl")
BUDGET = os.path.join(ROOT, "BENCH_BUDGET.json")

MIN_COVERAGE = 0.8  # entry must cover this share of budget queries
TRIM_DEV = 1.3      # cluster members beyond this of the median are dropped
MIN_ENTRIES = 2     # evidence floor per mode


def two_means_log(values: list[float]) -> tuple[list[float], list[float]]:
    """1-D two-means on log(values); returns (low_cluster, high_cluster)."""
    logs = sorted(math.log(v) for v in values)
    c0, c1 = logs[0], logs[-1]
    for _ in range(50):
        lo = [x for x in logs if abs(x - c0) <= abs(x - c1)]
        hi = [x for x in logs if abs(x - c0) > abs(x - c1)]
        n0 = sum(lo) / len(lo) if lo else c0
        n1 = sum(hi) / len(hi) if hi else c1
        if n0 == c0 and n1 == c1:
            break
        c0, c1 = n0, n1
    return [math.exp(x) for x in lo], [math.exp(x) for x in hi]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(BUDGET) as f:
        budget = json.load(f)
    bratios = budget["ratios"]

    entries = []
    with open(GATE_LOG) as f:
        for line in f:
            r = json.loads(line)
            c = r.get("session_calibration_sec")
            ratios = r.get("ratios") or {}
            shared = [q for q in ratios if q in bratios and bratios[q] > 0]
            if not c or len(shared) < MIN_COVERAGE * len(bratios):
                continue
            factor = statistics.median(
                ratios[q] / bratios[q] for q in shared
            )
            entries.append({"calib": c, "factor": factor, "ts": r.get("ts")})

    if len(entries) < 2 * MIN_ENTRIES:
        print(f"only {len(entries)} usable GATE_LOG entries", file=sys.stderr)
        return 1

    lo_vals, hi_vals = two_means_log([e["calib"] for e in entries])
    centers = []
    for member_vals in (lo_vals, hi_vals):
        # r13 review fix: a unimodal host (all calibrations tie into
        # one cluster) leaves the other cluster EMPTY — median([])
        # would raise; skip it and emit the single center instead.
        if not member_vals:
            continue
        vals = set(round(v, 6) for v in member_vals)
        members = [e for e in entries if round(e["calib"], 6) in vals]
        med = statistics.median(e["calib"] for e in members)
        kept = [
            e
            for e in members
            if max(e["calib"] / med, med / e["calib"]) <= TRIM_DEV
        ]
        if len(kept) < MIN_ENTRIES:
            print(
                f"cluster at ~{med:.3f}s has only {len(kept)} trimmed "
                f"entries (< {MIN_ENTRIES}) — not enough evidence to "
                "call it a quiet mode; skipping it",
                file=sys.stderr,
            )
            continue
        centers.append(
            {
                "calibration_sec": round(
                    statistics.median(e["calib"] for e in kept), 4
                ),
                "ratio_scale": round(
                    statistics.median(e["factor"] for e in kept), 3
                ),
                "n_entries": len(kept),
                "source": "tools/recenter_gate.py over GATE_LOG.jsonl "
                "(two-means on log calibration, 1.3x trim; scale = "
                "median per-entry median factor vs current budget "
                "ratios)",
            }
        )

    if not centers:
        print("no cluster had enough trimmed entries — not writing",
              file=sys.stderr)
        return 1
    print(json.dumps(centers, indent=1))
    if args.dry_run:
        return 0
    budget["calibration_centers"] = centers
    with open(BUDGET, "w") as f:
        json.dump(budget, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote calibration_centers to {BUDGET}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
