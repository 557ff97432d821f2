"""Shared fixtures: one SparkSession per test run, oracle helpers."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from p4_mapreduce_spark.session import get_spark  # noqa: E402

# Small by default so the suite stays fast; set SPARK_GRAFT_TEST_SF_DIR
# to sf0.01 to rehearse the driver's correctness gate exactly.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # UI on so the bench gate can record plan-determined per-query
    # bytes into GATE_LOG (r12): the status listener that feeds the
    # REST store runs regardless of this flag, so test timings are
    # unaffected — only the Jetty server starts, and it is polled only
    # between the gate's timed runs.
    spark = get_spark(
        app_name="p4-mapreduce-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make the transformWithState coverage mode visible in every run
    (the equivalence test silently importorskips otherwise)."""
    from p4_mapreduce_spark.session import transform_with_state_available

    if transform_with_state_available():
        mode = "EXECUTED (google.protobuf present)"
    else:
        mode = (
            "PLAN-ONLY (google.protobuf absent; "
            "`pip install 'protobuf>=4.25'` to unlock execution)"
        )
    terminalreporter.write_line(f"transformWithState coverage: {mode}")
