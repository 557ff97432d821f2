"""Simulate the driver contract end-to-end with a VANILLA SparkSession.

Runs entry() as the smoke check, then every queries() entry at sf0.01
compared against its oracle_sql() via DuckDB with the same bar the
driver applies (row count + columns + order-insensitive value equality,
floats bit-exact). Usage: python tools/verify_contract.py [sf_dir]
"""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim").getOrCreate())

# Quiet WindowExec's blanket "No Partition Defined" WARN (r12 verdict
# hygiene): every global window in the registry is a bounded top-N
# re-rank / group-cardinality frame, reviewed and enforced by the
# tests/test_plans.py funnel audit — see session._quiet_bounded_window_warning
from p4_mapreduce_spark.session import _quiet_bounded_window_warning
_quiet_bounded_window_warning(spark)

import __spark_entry__ as E

# 1) smoke: entry()
df = E.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={df.columns}")
assert len(rows) > 0

# 2) correctness at sf0.01 vs duckdb, like the driver's t2
import duckdb
from tests.oracle import compare_frames, run_oracle
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
qs, oracles = E.queries(), E.oracle_sql()
ok = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    pdf = fn(spark, SF).toPandas()
    if name in oracles:
        compare_frames(pdf, run_oracle(oracles[name], SF), name=name)
        ok += 1
        print(f"  MATCH {name}: {len(pdf)} rows ({time.time()-t0:.1f}s)")
    else:
        print(f"  ROWS-ONLY {name}: {len(pdf)} rows ({time.time()-t0:.1f}s)")
print(f"{ok} oracle matches / {len(qs)} queries")
