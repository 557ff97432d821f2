"""Round-13 operator tests.

- overlap_pairs_rollup hot-list guard (verdict ask #7): the driver-side
  hot-bin collect is calendar-bounded today, but nothing structurally
  asserted it — the guard must bound the transfer in-plan and fall back
  to the unsalted (result-identical) join LOUDLY above the cap.
"""

from __future__ import annotations

import pytest


def _sess(spark, n_users: int):
    # n_users one-second sessions inside the same 15-min bin -> one bin
    # holds all rows; every user pair overlaps
    rows = [(f"u{i:03d}", 0, 0, 1_000_000) for i in range(n_users)]
    return spark.createDataFrame(
        rows, "user_id string, island_id long, s long, e long"
    )


def test_overlap_hot_list_cap_falls_back_unsalted_loudly(spark):
    import p4_mapreduce_spark.operators.analytics as analytics

    sess = _sess(spark, 10)
    want = sorted(
        map(tuple, analytics.overlap_pairs_rollup(sess, skew_safe=False).collect())
    )
    assert want, "planted frame must produce pairs"

    prev_cap, prev_hot = analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP
    # hot threshold 4 makes the single 10-session bin hot; list cap 0
    # makes ANY hot bin exceed the driver-transfer guard
    analytics._HOT_BIN_CAP, analytics._HOT_LIST_CAP = 4, 0
    try:
        with pytest.warns(RuntimeWarning, match="hot-bin list exceeds"):
            got_df = analytics.overlap_pairs_rollup(sess, skew_safe=True)
        got = sorted(map(tuple, got_df.collect()))
    finally:
        analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP = prev_cap, prev_hot
    # fallback is result-identical: salting only reshapes the pair space
    assert got == want


def test_overlap_hot_list_under_cap_salts_without_warning(spark):
    import warnings

    import p4_mapreduce_spark.operators.analytics as analytics

    sess = _sess(spark, 10)
    want = sorted(
        map(tuple, analytics.overlap_pairs_rollup(sess, skew_safe=False).collect())
    )
    prev_cap, prev_hot = analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP
    analytics._HOT_BIN_CAP, analytics._HOT_LIST_CAP = 4, 100
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            got_df = analytics.overlap_pairs_rollup(sess, skew_safe=True)
        got = sorted(map(tuple, got_df.collect()))
    finally:
        analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP = prev_cap, prev_hot
    assert got == want
