"""Command-line job submission — the reference's ``mapreduce-submit``
surface, lowered to Spark.

The reference client (``mapreduce/submit.py:23-57``) takes host/port
plus (input dir, output dir, mapper, reducer, num mappers, num
reducers) and ships a JSON job message to a Manager over TCP. Here the
same flags run the job directly on a SparkSession — there is no
manager/worker control plane to address, so ``--host/--port`` are
accepted for drop-in compatibility and ignored with a note.

Usage (mirrors the reference defaults):

    python -m p4_mapreduce_spark.cli \
        --input tests/testdata/input \
        --output output \
        --mapper tests/testdata/exec/wc_map.sh \
        --reducer tests/testdata/exec/wc_reduce.sh \
        --nmappers 4 --nreducers 1
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="p4-mapreduce-spark-submit",
        description="Submit a map/reduce job (reference-compatible surface).",
    )
    p.add_argument("--host", "-h2", default=None, help="ignored (no manager process)")
    p.add_argument("--port", type=int, default=None, help="ignored (no manager process)")
    p.add_argument("--input", "-i", required=True, help="input directory of text files")
    p.add_argument("--output", "-o", required=True, help="output directory")
    p.add_argument("--mapper", "-m", required=True, help="mapper executable path")
    p.add_argument("--reducer", "-r", required=True, help="reducer executable path")
    p.add_argument("--nmappers", type=int, default=4, help="map partitions")
    p.add_argument("--nreducers", type=int, default=1, help="reduce partitions")
    args = p.parse_args(argv)

    if args.host or args.port:
        print(
            "note: --host/--port are accepted for compatibility but ignored "
            "(jobs run on Spark; there is no manager to contact)",
            file=sys.stderr,
        )

    from p4_mapreduce_spark.plans.job import Job, run_job
    from p4_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="p4-mapreduce-spark-submit")
    outputs = run_job(
        spark,
        Job(
            input_directory=args.input,
            output_directory=args.output,
            mapper_executable=args.mapper,
            reducer_executable=args.reducer,
            num_mappers=args.nmappers,
            num_reducers=args.nreducers,
        ),
    )
    for path in outputs:
        print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
