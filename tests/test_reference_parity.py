"""Byte-level parity with the reference's own golden outputs.

Runs our word-count and grep pipelines over the reference's test
fixtures (`/root/reference/tests/testdata/input`, read-only) and
compares against its golden files, the same order-insensitive compare
its integration tests use (reference tests/test_integration_03.py:82-92).
Covers the DataFrame-native path, the generic job API with Python
callables, and the RDD.pipe path running the reference's actual
executables.
"""

from __future__ import annotations

import os
import re

import pytest

from p4_mapreduce_spark.operators.mapreduce_compat import (
    WC_TOKEN_PATTERN,
    grep,
    wordcount,
)
from p4_mapreduce_spark.plans.job import Job, run_job
from p4_mapreduce_spark.sources.textdir import read_text_dir

REF = "/root/reference/tests/testdata"
INPUT_DIR = f"{REF}/input"
WC_GOLDEN = f"{REF}/correct/word_count_correct.txt"
GREP_GOLDEN = f"{REF}/correct/grep_correct.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(INPUT_DIR), reason="reference fixtures not available"
)


def _golden_lines(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return sorted(line.rstrip("\n") for line in f if line != "\n" or True)


def test_wordcount_matches_reference_golden(spark):
    lines = read_text_dir(spark, INPUT_DIR)
    result = wordcount(lines).collect()
    ours = sorted(f"{r['word']}\t{r['count']}" for r in result)
    golden = sorted(
        line.rstrip("\n") for line in open(WC_GOLDEN, encoding="utf-8")
    )
    assert ours == golden


def test_grep_matches_reference_golden(spark):
    lines = read_text_dir(spark, INPUT_DIR)
    result = grep(lines, "product").collect()
    ours = sorted(r["line"] for r in result)
    golden = sorted(
        line.rstrip("\n") for line in open(GREP_GOLDEN, encoding="utf-8")
    )
    assert ours == golden


def test_job_api_wordcount_callables(spark, tmp_path):
    """The generic job API with Python map/reduce callables."""
    pattern = re.compile(WC_TOKEN_PATTERN)

    def mapper(line: str):
        for tok in pattern.split(line.lower()):
            yield tok, "1"

    def reducer(key: str, values):
        yield key, str(sum(1 for _ in values))

    out_dir = str(tmp_path / "out")
    outputs = run_job(
        spark,
        Job(
            input_directory=INPUT_DIR,
            output_directory=out_dir,
            mapper_executable=mapper,
            reducer_executable=reducer,
            num_mappers=4,
            num_reducers=2,
        ),
    )
    assert [os.path.basename(p) for p in outputs] == ["outputfile01", "outputfile02"]
    ours = []
    for p in outputs:
        ours.extend(line.rstrip("\n") for line in open(p, encoding="utf-8"))
    golden = sorted(
        line.rstrip("\n") for line in open(WC_GOLDEN, encoding="utf-8")
    )
    assert sorted(ours) == golden


def test_job_api_pipe_reference_executables(spark, tmp_path):
    """RDD.pipe compatibility: run the reference's actual wc executables."""
    wc_map = f"{REF}/exec/wc_map.sh"
    wc_reduce = f"{REF}/exec/wc_reduce.sh"
    if not (os.access(wc_map, os.X_OK) and os.access(wc_reduce, os.X_OK)):
        pytest.skip("reference executables not runnable")
    out_dir = str(tmp_path / "out")
    outputs = run_job(
        spark,
        Job(
            input_directory=INPUT_DIR,
            output_directory=out_dir,
            mapper_executable=wc_map,
            reducer_executable=wc_reduce,
            num_mappers=2,
            num_reducers=1,
        ),
    )
    ours = []
    for p in outputs:
        ours.extend(line.rstrip("\n") for line in open(p, encoding="utf-8"))
    golden = sorted(
        line.rstrip("\n") for line in open(WC_GOLDEN, encoding="utf-8")
    )
    assert sorted(ours) == golden


def test_job_api_pipe_grep_executables(spark, tmp_path):
    """RDD.pipe with the reference's python grep executables, including
    its shell=True argv quirk: the query argument is never delivered,
    so grep always runs its default 'product' (SURVEY.md §2.1 O7)."""
    grep_map = f"{REF}/exec/grep_map.py"
    grep_reduce = f"{REF}/exec/grep_reduce.py"
    out_dir = str(tmp_path / "out")
    outputs = run_job(
        spark,
        Job(
            input_directory=INPUT_DIR,
            output_directory=out_dir,
            mapper_executable=grep_map,
            reducer_executable=grep_reduce,
            num_mappers=4,
            num_reducers=1,
        ),
    )
    ours = []
    for p in outputs:
        ours.extend(line.rstrip("\n") for line in open(p, encoding="utf-8"))
    golden = sorted(
        line.rstrip("\n") for line in open(GREP_GOLDEN, encoding="utf-8")
    )
    assert sorted(ours) == golden
