"""Text-directory source — the reference engine's only input format.

The reference enumerates ``input_directory``, sorts filenames, and
round-robins the file list across ``num_mappers`` workers (reference
``mapreduce/manager/__main__.py:308-328``); each record is one UTF-8
line (``mapreduce/worker/__main__.py:69-77``).

Spark-first mapping: ``spark.read.text`` already gives one row per
line and one-or-more splits per file. We expose the filename (the
reference's implicit partition identity) as a column so jobs that need
deterministic per-file behavior can get it declaratively, and we leave
split sizing to ``spark.sql.files.maxPartitionBytes`` — at 100 TB you
want byte-based splits, not the reference's whole-file-per-task
round-robin (which stragglers on the largest file).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_text_dir(
    spark: SparkSession,
    input_dir: str,
    num_partitions: int | None = None,
    with_filename: bool = False,
) -> DataFrame:
    """Read a directory of text files as ``DataFrame[value: string]``.

    ``num_partitions`` mirrors the reference's ``num_mappers`` knob: a
    plain round-robin repartition that caps/raises map-stage
    parallelism. Spark's byte-range splits are the right default at
    scale; pass ``num_partitions`` only to mirror a reference job.
    """
    df = spark.read.text(input_dir)
    if with_filename:
        df = df.withColumn("input_file", F.input_file_name())
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    return df
