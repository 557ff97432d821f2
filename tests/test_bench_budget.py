"""In-tree bench regression gate (r6 verdict ask #5).

BENCH_BUDGET.json records each headline query's ratio-to-calibration
(min-of-2 steady-state / min-of-5 lineitem-scan calibration) measured
by tools/update_bench_budget.py. This test replays the same protocol
and fails BEFORE the driver files a regressed BENCH_r{N}.json when:

- a headline query's ratio exceeds ``budget * 1.5 + 0.75`` (the 1.5x
  the verdict asked for, plus an absolute floor so sub-calibration
  queries whose ratios are dominated by fixed per-query overhead don't
  flap), or
- a headline query has NO budget at all — adding a headliner requires
  re-running the updater, making every perf-relevant change a
  reviewable BENCH_BUDGET.json diff.

The ratio normalization cancels host-load drift (the r5 verdict's
false-regression lesson); comparing ratios, not seconds, is what makes
a committed budget meaningful across machines and rounds.
"""

from __future__ import annotations

import json
import os

_BUDGET_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_BUDGET.json")
_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def test_headline_ratios_within_budget(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(_BUDGET_PATH), "tools"))
    from update_bench_budget import measure_ratios

    with open(_BUDGET_PATH) as f:
        budget = json.load(f)["ratios"]

    got = measure_ratios(spark, _SF_DIR, runs=2)
    failures = []
    missing = []
    for name, ratio in sorted(got["ratios"].items()):
        b = budget.get(name)
        if b is None:
            missing.append(name)
            continue
        allowed = b * 1.5 + 0.75
        if ratio > allowed:
            failures.append(f"{name}: ratio {ratio} > allowed {allowed:.2f}"
                            f" (budget {b})")
    assert not missing, (
        f"headline queries without a budget: {missing} — run "
        "`python tools/update_bench_budget.py` and commit the diff"
    )
    assert not failures, "bench regression(s):\n" + "\n".join(failures)
