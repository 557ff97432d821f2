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


def assert_no_cartesian(df: DataFrame) -> str:
    plan = plan_string(df)
    assert "CartesianProduct" not in plan, f"unexpected cartesian product:\n{plan}"
    return plan
