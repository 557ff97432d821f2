"""SparkSession factory tuned for both local testing and cluster scale.

The reference engine hand-rolls its control plane (TCP job queue, UDP
heartbeats, fault timers — ``mapreduce/manager/__main__.py:64-175`` in
the reference tree). Spark owns all of that; the only knobs we set here
are the ones that matter for plan quality at scale:

- **AQE on** (runtime re-planning: partition coalescing, skew-join
  splitting, dynamic join-strategy switching). At 100 TB this is the
  difference between a fixed 200-partition shuffle and right-sized
  partitions per stage.
- **shuffle partitions** sized for the local test harness (32 cores);
  on a real cluster this is overridden to ~2-3x total cores and AQE
  coalesces down.
- **Arrow** for every pandas UDF / toPandas boundary (vectorized
  columnar transfer instead of pickled rows).
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import SparkSession

APP_NAME = "p4-mapreduce-spark"


def _cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def transform_with_state_available() -> bool:
    """Can ``transformWithStateInPandas`` actually EXECUTE here?

    Plan construction needs nothing special, but at run time the Python
    worker talks to the JVM's stateful-processor state server over
    protobuf (``pyspark/sql/streaming/proto/StateMessage_pb2.py`` —
    generated code PySpark ships; the ``google.protobuf`` *runtime* it
    imports is a separate pip dependency). Environments without it get
    plan-only coverage (``streaming_stateful_user_counts_tws``'s
    equivalence test skips). To unlock execution:

        pip install 'protobuf>=4.25'

    (pure-Python wheel, no native deps). The test suite's terminal
    summary prints which mode ran.
    """
    try:
        # find_spec imports the parent package, so a missing "google"
        # namespace raises rather than returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def get_spark(
    app_name: str = APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count: at our test
    scale factors a partition is well under ``maxPartitionBytes`` so
    more buckets would just add task overhead; AQE coalesces further.
    On a 1000-executor cluster the caller passes a larger value (or
    relies on AQE's ``advisoryPartitionSizeInBytes`` to split).
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        # --- adaptive execution: runtime re-planning -------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing -------------------------------------------
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        # --- join strategy --------------------------------------------
        # SMJ stays the global default. Round 2 set
        # preferSortMergeJoin=false globally for a 10-20% local win, but
        # SHJ's build side must fit one partition's memory — on a skewed
        # 100 TB fact-fact join that is an OOM risk, and the driver runs
        # queries under its OWN session anyway, where this conf never
        # applied. The win is kept where it is safe via per-query
        # SHUFFLE_HASH hints on the known-bounded build sides (see
        # operators/joins.py q3/q5) — hints travel with the plan into
        # ANY session.
        # --- python<->jvm boundary ------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- determinism for oracle checks ----------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type, so read as long and convert in the loader
        # (same micros truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode: one JVM hosts the driver AND all executor
        # threads — the 1g default heap OOMs multi-million-row
        # shuffles across 32 threads. Only read at JVM launch; on a
        # real cluster executors size their own heaps instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # local mode: keep the UI off (faster startup, no port fights)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _quiet_bounded_window_warning(spark)
    return spark


def _quiet_bounded_window_warning(spark: SparkSession) -> None:
    """Demote WindowExec's blanket "No Partition Defined for Window"
    WARN to ERROR-only (r12 verdict hygiene ask).

    Every global (no-partition-key) window in the registry is over a
    provably BOUNDED frame — a post-``limit(k)`` top-N re-rank or a
    group-cardinality aggregate (months, batches, order dates) — where
    funneling <=k rows through one task is the correct plan. The WARN
    fires per plan materialization regardless of frame size, so in
    this engine it is all noise: the REAL guard is structural and
    in-tree — tests/test_plans.py bans single-partition funnels over
    fact-derived frames (``single_partition_funnels`` +
    ``_SINGLE_PARTITION_WINDOW_ALLOWED`` with executed boundedness
    checks) and ratchets every window partition key via
    ``_WINDOW_KEY_PINS``. A future unbounded global window fails the
    audit loudly instead of scrolling past as a log line. (Catalyst
    constant-folds a ``partitionBy(lit(1))`` hint away, so the log4j2
    route is the only way to quiet the specific logger without
    touching query semantics.)"""
    try:
        jvm = spark.sparkContext._jvm
        level = jvm.org.apache.logging.log4j.Level.ERROR
        for cls in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowExecBase",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                cls, level
            )
    except Exception:
        pass  # non-log4j2 deployments: the warning is cosmetic
