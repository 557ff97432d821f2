"""In-tree bench regression gate (r6 verdict ask #5).

BENCH_BUDGET.json records each headline query's ratio-to-calibration
(min-of-2 steady-state / min-of-5 lineitem-scan calibration) measured
by tools/update_bench_budget.py under the same session config as this
test. The test replays the protocol and fails BEFORE the driver files
a regressed BENCH_r{N}.json.

Comparison is SELF-NORMALIZING: raw ratios-to-calibration cancel host
speed within one session but not between sessions — the calibration
scan is scan-bound while many headliners are shuffle-bound, so host
contention moves them differently (measured: calibration drifting
0.26s..0.85s between otherwise idle runs). So the gate computes each
query's factor f = measured_ratio / budget_ratio and rescales by the
MEDIAN factor across all headliners: a global slowdown moves the
median and cancels out; a genuine regression in one query does not
move the median and trips its own factor. A query fails when its
measured ratio exceeds max(1.5x, +1.0 calibration-unit) of its
median-rescaled budget.

A headline query with NO budget at all also fails — adding a headliner
requires re-running the updater, making every perf-relevant change a
reviewable BENCH_BUDGET.json diff.
"""

from __future__ import annotations

import json
import os
import statistics

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

    missing = [n for n in got["ratios"] if n not in budget]
    assert not missing, (
        f"headline queries without a budget: {sorted(missing)} — run "
        "`python tools/update_bench_budget.py` and commit the diff"
    )

    factors = {
        n: r / budget[n] for n, r in got["ratios"].items() if budget[n] > 0
    }
    # Noise guard (r8): this shared host shows transient contention
    # that inflates shuffle/UDF-heavy queries 5-10x while scan-bound
    # ones barely move — under that, per-query comparison is
    # meaningless in BOTH directions. If the factor distribution is
    # widely dispersed (p75/p25 of 37 queries moving together should
    # be near 1; a single real regression is 1/37th of the mass and
    # cannot widen the IQR), the session is too noisy to judge: skip
    # loudly rather than fail/pass arbitrarily.
    qs = statistics.quantiles(sorted(factors.values()), n=4)
    dispersion = qs[2] / max(qs[0], 1e-9)
    if dispersion > 2.0:
        import pytest

        pytest.skip(
            f"bench factors too dispersed to judge (p75/p25 = "
            f"{dispersion:.2f} > 2.0; session calib "
            f"{got['calibration_sec']}s) — host contention is "
            "distorting relative query times; re-run when quiet"
        )
    scale = statistics.median(factors.values())
    # Median self-normalization would silently absorb a regression that
    # hits half or more of the headliners (session-config or framework
    # wide slowdown): bound the scale factor itself so a fleet-wide
    # slowdown fails loudly instead of rescaling everything green.
    assert scale < 3.0, (
        f"session scale factor {scale:.2f} >= 3.0 — more than half the "
        "headline queries slowed together (framework/session-config "
        "regression?); per-query rescaling would mask it"
    )
    failures = []
    for name, ratio in sorted(got["ratios"].items()):
        b = budget[name] * scale  # median-rescaled expectation
        allowed = max(b * 1.5, b + 1.0)
        if ratio > allowed:
            failures.append(
                f"{name}: ratio {ratio:.2f} > allowed {allowed:.2f} "
                f"(budget {budget[name]}, session scale {scale:.2f}, "
                f"session calib {got['calibration_sec']}s)"
            )
    assert not failures, "bench regression(s):\n" + "\n".join(failures)
