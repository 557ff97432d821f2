"""Property tests for the cross-engine determinism helpers.

The whole oracle strategy rests on fix()/fix_sql() producing
bit-identical doubles in Spark and DuckDB; hypothesis hammers that
over adversarial inputs (boundary values, tiny/huge magnitudes).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from p4_mapreduce_spark.functions.deterministic import fix_sql
from p4_mapreduce_spark.functions.vector import dot_sql

# values in the money-ish range the engine normalizes, including exact
# .xx5 rounding boundaries
money = st.one_of(
    st.decimals(
        min_value=-1_000_000, max_value=1_000_000, places=3
    ).map(float),
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
)


@settings(max_examples=300, deadline=None)
@given(money)
def test_fix_sql_matches_python_floor_formula(x: float):
    """DuckDB's evaluation of fix_sql == the same IEEE ops in Python.

    (Spark evaluates the identical expression tree; Python is the
    reference IEEE implementation both must agree with.)
    """
    con = duckdb.connect()
    got = con.execute(f"SELECT {fix_sql('CAST(? AS DOUBLE)')}", [x]).fetchone()[0]
    con.close()
    import math

    want = math.floor(x * 100.0 + 0.5) / 100.0
    assert got == want or (math.isnan(got) and math.isnan(want))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
)
def test_dot_sql_is_left_fold(a, b):
    """The SQL dot product must equal a sequential left fold in Python
    (the order Spark's aggregate() uses)."""
    con = duckdb.connect()
    # decimal -> DOUBLE -> FLOAT (two-step) matches np.float32(float64(x));
    # a direct decimal->FLOAT parse can double-round differently
    lit = lambda v: (
        "[" + ", ".join(f"CAST(CAST({x!r} AS DOUBLE) AS FLOAT)" for x in v) + "]"
    )
    got = con.execute(
        f"SELECT {dot_sql(lit(a), lit(b), dim=4)}"
    ).fetchone()[0]
    con.close()
    import numpy as np

    acc = 0.0
    for x, y in zip(np.array(a, dtype=np.float32), np.array(b, dtype=np.float32)):
        acc = acc + float(x) * float(y)
    assert got == acc


def test_compare_frames_catches_divergence():
    """Meta-test of the correctness gate itself: the comparator must
    reject value / row-count / column mismatches and accept any row or
    column permutation (its order-insensitivity contract)."""
    import pandas as pd
    import pytest

    from tests.oracle import compare_frames

    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    # permuted rows AND permuted column order must pass
    compare_frames(a, pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]}))
    with pytest.raises(AssertionError, match="row 0 differs|row 1 differs"):
        compare_frames(a, pd.DataFrame({"k": [1, 2], "v": [1.5, 2.500001]}))
    with pytest.raises(AssertionError, match="row count"):
        compare_frames(a, pd.DataFrame({"k": [1], "v": [1.5]}))
    with pytest.raises(AssertionError, match="column mismatch"):
        compare_frames(a, pd.DataFrame({"k": [1, 2], "w": [1.5, 2.5]}))
    # int vs float of the same magnitude must NOT silently pass
    with pytest.raises(AssertionError):
        compare_frames(
            pd.DataFrame({"k": [1]}), pd.DataFrame({"k": [1.0]})
        )
