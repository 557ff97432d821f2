"""CLI submission surface (the reference's mapreduce-submit)."""

from __future__ import annotations

import os

import pytest

from p4_mapreduce_spark.cli import main

REF = "/root/reference/tests/testdata"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/input"), reason="reference fixtures not available"
)


def test_cli_runs_reference_wc_job(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc = main(
        [
            "--host", "localhost", "--port", "6000",  # accepted, ignored
            "--input", f"{REF}/input",
            "--output", out_dir,
            "--mapper", f"{REF}/exec/wc_map.sh",
            "--reducer", f"{REF}/exec/wc_reduce.sh",
            "--nmappers", "2",
            "--nreducers", "1",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()
    assert printed == [os.path.join(out_dir, "outputfile01")]
    ours = sorted(
        line.rstrip("\n") for line in open(printed[0], encoding="utf-8")
    )
    golden = sorted(
        line.rstrip("\n")
        for line in open(f"{REF}/correct/word_count_correct.txt", encoding="utf-8")
    )
    assert ours == golden
