"""Replay the driver's DuckDB-parity protocol for a SUBSET of queries.

Usage: python tools/verify_one.py name1 [name2 ...] [--sf=DIR[,DIR2]]

Same bar as tools/verify_contract.py (row count + columns +
order-insensitive value equality, floats bit-exact) but only for the
named queries, defaulting to BOTH parity corpora (sf0.001 and sf0.01 —
they differ in content, not just size; a new oracle must pass both).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession  # noqa: E402

names = []
sf_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--sf="):
        sf_dirs = a.split("=", 1)[1].split(",")
    elif a == "--sf" and i + 1 < len(argv):  # two-token form
        i += 1
        sf_dirs = argv[i].split(",")
    elif not a.startswith("--"):
        names.append(a)
    i += 1

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("verify-one")
    .getOrCreate()
)

import __spark_entry__ as E  # noqa: E402
from tests.oracle import compare_frames, run_oracle  # noqa: E402

qs, oracles = E.queries(), E.oracle_sql()
unknown = [n for n in names if n not in qs]
assert not unknown, f"unknown queries: {unknown}"
for sf in sf_dirs:
    for name in names:
        t0 = time.time()
        pdf = qs[name](spark, sf).toPandas()
        if name in oracles:
            compare_frames(pdf, run_oracle(oracles[name], sf), name=name)
            print(f"  MATCH {name} @ {sf}: {len(pdf)} rows "
                  f"({time.time()-t0:.1f}s)")
        else:
            print(f"  ROWS-ONLY {name} @ {sf}: {len(pdf)} rows "
                  f"({time.time()-t0:.1f}s)")
print("OK")
