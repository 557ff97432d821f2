"""Generic MapReduce job API — the reference's submission surface.

Mirrors the job dict the reference client sends (reference
``mapreduce/submit.py:68-76``): input directory, output directory,
mapper, reducer, num_mappers, num_reducers — but lowers immediately to
Spark primitives instead of a hand-rolled control plane:

- **mapper/reducer as Python callables** → ``flatMap`` /
  per-partition grouped apply (the native path);
- **mapper/reducer as executable paths** → ``RDD.pipe`` (bit-compat
  with the reference's subprocess pipe operator, reference
  ``mapreduce/worker/__main__.py:75-77``);
- **num_mappers/num_reducers** → partition counts;
- the group stage (per-worker sort + global merge + key partition,
  reference ``mapreduce/worker/__main__.py:89-124`` and
  ``mapreduce/manager/__main__.py:410-443``) →
  ``repartitionAndSortWithinPartitions`` — one shuffle, hash
  partitioned on key, sorted runs per reducer, which is exactly what
  the reference emulates with tmp files and heapq.merge;
- the sink (rename to ``outputfileNN``, reference
  ``mapreduce/manager/__main__.py:469-494``) → ``saveAsTextFile`` +
  deterministic rename.

Scale notes: the reference assigns whole files to mappers (stragglers
on big files) and buckets *unique keys round-robin* through a single
merged stream on the manager (a driver-side bottleneck). Here map
splits are byte-ranged and the key partition is distributed hashing —
same query results, no single-node funnel. The byte-exact replay of
the reference's rotated round-robin bucketing lives in
``operators.mapreduce_compat`` for parity tests only.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import SparkSession

from p4_mapreduce_spark.sources.textdir import read_text_dir

# mapper: line -> iterable of (key, value); reducer: (key, values) -> iterable of (key, value)
MapFn = Callable[[str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, Iterable[str]], Iterable[tuple[str, str]]]


@dataclass
class Job:
    """The reference's job message (``mapreduce/submit.py:68-76``)."""

    input_directory: str
    output_directory: str
    mapper_executable: str | MapFn
    reducer_executable: str | ReduceFn
    num_mappers: int = 4
    num_reducers: int = 1


def _parse_kv_line(line: str) -> tuple[str, str]:
    """key<TAB>value; lines without a tab become (line, '')."""
    key, sep, value = line.partition("\t")
    return key, value


def _format_kv(kv: tuple[str, str]) -> str:
    return f"{kv[0]}\t{kv[1]}"


def _reduce_partition(reducer: ReduceFn):
    def apply(it):
        for key, group in itertools.groupby(it, key=lambda kv: kv[0]):
            yield from reducer(key, (v for _, v in group))

    return apply


def run_job(spark: SparkSession, job: Job) -> list[str]:
    """Execute a job; returns the list of output file paths.

    Output files are ``output_directory/outputfileNN`` (zero-padded,
    1-indexed — outputfile01 first, one per reducer) to match the
    reference sink contract (reference manager/__main__.py:486).
    """
    lines = read_text_dir(spark, job.input_directory, num_partitions=job.num_mappers)
    rdd = lines.rdd.map(lambda r: r.value)

    # ---- map stage ----
    if callable(job.mapper_executable):
        mapper = job.mapper_executable
        mapped = rdd.flatMap(mapper)
    else:
        mapped = rdd.pipe(job.mapper_executable).map(_parse_kv_line)

    # ---- group stage: one shuffle, hash partition on key, sorted runs
    grouped = mapped.map(lambda kv: (kv[0], kv[1])).repartitionAndSortWithinPartitions(
        numPartitions=job.num_reducers
    )

    # ---- reduce stage ----
    if callable(job.reducer_executable):
        reduced = grouped.mapPartitions(
            _reduce_partition(job.reducer_executable), preservesPartitioning=True
        ).map(_format_kv)
    else:
        reduced = grouped.map(_format_kv).pipe(job.reducer_executable)

    # ---- sink: saveAsTextFile into a staging dir UNDER the output
    # directory, then deterministic outputfileNN renames through the
    # Hadoop FileSystem API. Staging must live on the job's (shared)
    # output filesystem — a driver-local temp dir would silently lose
    # executor-written parts on any non-local master — and the FS API
    # renames are cheap metadata ops on HDFS/local alike.
    out_dir = job.output_directory.rstrip("/")
    staging_out = f"{out_dir}/_staging"
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    staging_path = HPath(staging_out)
    fs = staging_path.getFileSystem(hconf)
    if fs.exists(staging_path):
        fs.delete(staging_path, True)
    reduced.saveAsTextFile(staging_out)
    parts = sorted(
        st.getPath().getName()
        for st in fs.listStatus(staging_path)
        if st.getPath().getName().startswith("part-")
    )
    outputs: list[str] = []
    # 1-indexed to match the reference sink contract: its manager copies
    # reduce01 -> outputfile01 (reference manager/__main__.py:486) and its
    # integration tests wait for outputfile01.
    for i, part in enumerate(parts):
        dest = f"{out_dir}/outputfile{i + 1:02d}"
        dest_path = HPath(dest)
        if fs.exists(dest_path):
            fs.delete(dest_path, False)
        fs.rename(HPath(f"{staging_out}/{part}"), dest_path)
        outputs.append(dest)
    fs.delete(staging_path, True)
    return outputs
