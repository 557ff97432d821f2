"""Physical-plan inspection helpers.

Used by tests to pin the *plan shape*, not just the results: filters
must reach the parquet scan, small dims must broadcast, aggregates must
have a partial (map-side) phase. At 100 TB a correct-but-unpushed plan
is a failed query; these assertions are how the suite notices.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *needles: str) -> str:
    """Assert the scan node advertises pushed filters mentioning each needle."""
    plan = plan_string(df)
    assert "PushedFilters" in plan, f"no pushed filters in plan:\n{plan}"
    for needle in needles:
        assert needle in plan, f"{needle!r} not pushed into scan:\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join:\n{plan}"
    )
    return plan


def assert_partial_aggregate(df: DataFrame) -> str:
    """Hash aggregates should run partial (map-side) before the shuffle."""
    plan = plan_string(df)
    assert "partial_" in plan or "HashAggregate" in plan, (
        f"expected partial aggregation:\n{plan}"
    )
    return plan


def single_partition_funnels(plan: str) -> list[str]:
    """Return the parent node of every ``Exchange SinglePartition`` whose
    parent is a Sort or Window — the global top-k/rank funnel that moves
    an unbounded frame through one task.

    A 1-row final aggregate legitimately plans
    ``HashAggregate <- Exchange SinglePartition <- HashAggregate(partial)``
    (the exchange moves one partial row per map task); those parents are
    aggregates, not Sort/Window, and are not reported. A global
    ``Window``/``Sort`` over a corpus-derived frame funnels EVERY row
    through a single task — the one shape whole-stage codegen can't save
    — and is exactly what this reports, so the plan audit can ban it
    registry-wide (with an allowlist for provably-reduced frames).
    """
    import re

    lines = plan.splitlines()

    def depth(line: str) -> int:
        # Tree-art indentation only (spaces and the ':'/'+'/'-'
        # connectors). Whole-stage-codegen markers '*(N) ' are part of
        # the NODE NAME, not the indentation — counting them as depth
        # makes a starred parent look deeper than its child exchange
        # and the scan walks past it (a confirmed false negative).
        i = 0
        while i < len(line) and line[i] in " :+-":
            i += 1
        return i

    def node_name(line: str) -> str:
        text = line[depth(line):]
        return re.sub(r"^\*\(\d+\)\s*", "", text)

    hits = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = depth(line)
        for j in range(i - 1, -1, -1):
            pj = lines[j]
            if not pj.strip():
                continue
            if depth(pj) < d:
                parent = node_name(pj)
                # Word-boundary match: 'Sort [' / 'Window [' are the
                # funnel shapes; SortAggregate, SortMergeJoin, and
                # WindowGroupLimit are legitimate and must NOT match.
                if re.match(r"(Sort|Window)\b", parent):
                    hits.append(parent.split("[")[0].strip() or parent)
                break
    return hits


def assert_no_cartesian(df: DataFrame) -> str:
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, f"unexpected cartesian product:\n{plan}"
    return plan
