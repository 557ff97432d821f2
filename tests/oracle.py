"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares each Spark query against its oracle SQL with
row-count + schema + order-insensitive value-hash. We reproduce that
bar here — canonicalize both result sets (columns sorted by name, rows
sorted by stringified values, floats compared *bit-exactly*) so any
cross-engine nondeterminism fails in our suite before it fails in the
driver's.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from p4_mapreduce_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)  # shortest round-trip repr: equal bits <=> equal str
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, str):
        return v
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    # per-column extraction (NOT iterrows, which upcasts mixed-type rows
    # to a common dtype and turns ints into floats)
    col_values = [df[c].tolist() for c in cols]
    rows = [tuple(_canon_value(v) for v in vals) for vals in zip(*col_values)]
    rows.sort()
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "query"):
    s_cols, s_rows = canonicalize(spark_pdf)
    o_cols, o_rows = canonicalize(oracle_pdf)
    assert [c.lower() for c in s_cols] == [c.lower() for c in o_cols], (
        f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} oracle={len(o_rows)}"
    )
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        assert sr == orr, (
            f"{name}: row {i} differs\n spark={sr}\noracle={orr}\ncols={s_cols}"
        )
