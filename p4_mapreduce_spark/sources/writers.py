"""Sinks: partitioned / bucketed / columnar-and-text writers.

The reference's only sink is "rename reducer files into the output
directory" (SURVEY.md §2.1 O6 — covered by plans.job's outputfileNN
writer). This module is the engine's real sink surface, with the two
layout decisions that dominate 100 TB read performance baked in:

- **partitionBy on low-cardinality predicates** → directory-level
  partition pruning (a reader's ``WHERE status='F'`` skips whole
  directories; verify with PartitionFilters in the scan node);
- **bucketBy on join/agg keys** → co-located, pre-hashed data: a join
  of two tables bucketed on the same key by the same count plans with
  NO shuffle on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: one subdir per partition value.

    Keep partition columns low-cardinality (status, date, tenant) —
    each distinct combination is a directory + at least one file; a
    high-cardinality partition key is the classic small-files trap.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table (requires saveAsTable: bucket
    metadata lives in the catalog). Joins/aggs on ``bucket_col``
    between tables with identical bucketing skip their shuffles."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def roundtrip_csv(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """CSV writer/reader with explicit schema on read (no inference)."""
    df.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(df.schema).option("header", "true").csv(path)


def roundtrip_orc(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Write+read ORC — the other columnar format Spark ships natively;
    same pushdown/pruning machinery as parquet (shown in test plans)."""
    df.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


def roundtrip_json(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """JSON-lines writer/reader with explicit schema on read."""
    df.write.mode("overwrite").json(path)
    return spark.read.schema(df.schema).json(path)


def roundtrip_xml(
    spark: SparkSession, df: DataFrame, path: str, row_tag: str = "row"
) -> DataFrame:
    """XML writer/reader (native source since Spark 4, no external
    package) with explicit schema on read — the interchange format
    enterprise feeds still speak. Row-level files shard across
    executors like any text source; don't use it for analytics-side
    storage (no pushdown/pruning — land XML, convert to parquet)."""
    df.write.mode("overwrite").option("rowTag", row_tag).format("xml").save(path)
    return (
        spark.read.schema(df.schema)
        .option("rowTag", row_tag)
        .format("xml")
        .load(path)
    )


def compact_parquet_dir(
    spark: SparkSession, path: str, target_files: int
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files (atomically, via a staging dir + rename).

    The maintenance op every streaming/incremental sink needs: a
    foreachBatch or per-hour append sink leaves thousands of small
    files; scans then pay per-file open/footer costs and lose row-group
    locality. Rewrite with ``coalesce`` (narrow — no shuffle; each
    output task concatenates whole input splits). Returns the number of
    files after compaction.
    """
    import os
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(
        prefix="compact-", dir=os.path.dirname(path.rstrip("/")) or "."
    )
    try:
        spark.read.parquet(path).coalesce(target_files).write.mode(
            "overwrite"
        ).parquet(staging)
        shutil.rmtree(path)
        shutil.move(staging, path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
