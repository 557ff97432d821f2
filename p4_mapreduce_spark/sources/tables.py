"""Parquet table loaders for the driver-generated star schema.

Tables (``TESTDATA.md``): TPC-H-ish ``region nation customer supplier
part orders lineitem``, an ``events`` stream table, and the
LLM-pipeline tables ``documents`` / ``embeddings``.

Scan-path notes for 100 TB:

- We read plain ``spark.read.parquet`` and rely on Catalyst for column
  pruning + predicate pushdown — every registered query is written so
  filters sit directly on scan columns (verify with
  ``plans.explain.assert_pushed_filters``).
- At cluster scale the same tables would be partitioned directories
  (e.g. ``orders/o_orderdate=.../``); ``load`` takes any path, so
  partition pruning comes for free when the layout has it.
- No ``.cache()`` here: the engine is stateless per query, and caching
  60 KB locally would hide scan-pushdown regressions in tests.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot
    represent; with ``spark.sql.legacy.parquet.nanosAsLong`` it scans
    as a long, and we truncate to microseconds here — bit-identical to
    DuckDB's nanos→micros truncation, so oracle hashes line up.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the caller may hand us a session without UTC set (the driver
    # does): timestamp rendering and date_trunc/window bucketing are
    # session-TZ dependent in Spark, while the DuckDB oracle is naive —
    # any other TZ would shift every timestamp result
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div, not float: nanos epochs (~1.7e18) exceed double precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table; returns name -> DataFrame."""
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (for the SQL-flavored queries)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# ~1 MiB of AMPLIFIED intermediate per spread task: below that, task
# scheduling + exchange latency outweigh the parallelism (measured r14
# at sf0.1: the token-md5 family runs no slower — usually faster — at
# 8-10 tasks than at 32, and the 8-core driver bench had been BEATING
# the 32-core one on exactly these queries because its flat spread
# target was 8).
_SPREAD_TASK_WORK = 1 << 20


def spread_small_scan(
    df: DataFrame,
    src_bytes: int | None = None,
    amp: int | None = None,
    probe: bool = True,
) -> DataFrame:
    """Explode-amplification guard (r13): repartition ``df`` when its
    scan yields fewer splits than cores. CPU-amplifying operators
    (token/trigram explodes, in-tree codec decodes, per-row Arrow
    kernels) multiply each input byte 10-300x — invisible to
    input-split sizing, so a corpus that arrives in one small file
    (local SF; a freshly-ingested shard on a cluster) runs the whole
    amplified map in one task. At the 100 TB steady state the scan
    already has >= a round of splits and this is a NO-OP — no shuffle
    is added where splits are plentiful. Call it on the NARROW
    projection the operator actually consumes, so the guard shuffle
    (when it fires) moves minimal bytes.

    r14 (verdict ask #8 — work-proportional target): a flat
    defaultParallelism target over-fans tiny corpora (the r13 scaling
    block showed 8 cores BEATING 32 on the span/CDC family because 32
    near-empty tasks cost more scheduling than they buy). When the
    caller passes ``src_bytes`` (driver-side FS metadata, no job) and
    ``amp`` (the operator's byte-amplification factor), the target
    becomes one task per ~1 MiB of amplified work, capped at
    defaultParallelism and floored at the scan's own split count —
    identical to the old behavior at scale (cap) and on genuinely
    amplifying operators (trigram explode at 300x still saturates the
    cores), but small corpora get a proportionate task count.

    ``probe=False`` (r14) skips the ``df.rdd`` partition-count probe:
    on a frame with exchanges below it (a post-shuffle pipeline stage,
    not a scan), the probe's toRdd conversion finalizes the adaptive
    plan and EXECUTES the whole upstream subtree as extra jobs — the
    megapipeline chunking spread doubled its input bytes that way
    before this flag. The probe-free decision is bytes-only: spread to
    the work-proportional target when the total amplified work is
    under one round of ~1 MiB tasks (where the exchange costs
    pennies), and leave the frame alone otherwise (at scale the
    upstream shuffle already yields a full round of partitions).
    Requires ``src_bytes`` and ``amp``."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if src_bytes and amp:
        target = min(par, max(1, -((-src_bytes * amp) // _SPREAD_TASK_WORK)))
    else:
        target = par
    if probe:
        cur = df.rdd.getNumPartitions()
        if cur >= target:
            return df
    elif target >= par or target <= 1:
        return df
    return df.repartition(int(target))
