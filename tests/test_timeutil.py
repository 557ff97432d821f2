"""Unit tests for functions/timeutil — the NTZ/LTZ/bigint epoch shims.

These helpers are what broke round 2 (operators assumed LTZ while the
regenerated parquet resolved as TIMESTAMP_NTZ), so each encoding is
pinned explicitly, including under a non-UTC session timezone — the
NTZ path must be pure calendar arithmetic, invariant to the session.
"""

from __future__ import annotations

import datetime

import pytest

from p4_mapreduce_spark.functions.timeutil import epoch_micros, epoch_seconds

_WALL = datetime.datetime(2024, 3, 5, 10, 47, 1, 500001)
_EPOCH_US = 1709635621500001  # 2024-03-05T10:47:01.500001Z


@pytest.fixture()
def tz_spark(spark):
    """The shared session, temporarily pinned to a non-UTC timezone."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def test_ntz_epoch_is_session_tz_independent(tz_spark):
    df = tz_spark.createDataFrame(
        [(_WALL,)], "ts timestamp_ntz"
    )
    row = df.select(
        epoch_micros(df).alias("us"), epoch_seconds(df).alias("s")
    ).first()
    # naive wall time reads as UTC regardless of the Tokyo session tz
    assert row.us == _EPOCH_US
    assert row.s == _EPOCH_US // 1_000_000


def test_ltz_epoch_matches_unix_micros(spark):
    df = spark.createDataFrame([(_WALL,)], "ts timestamp").selectExpr(
        "to_utc_timestamp(ts, 'UTC') AS ts"
    )
    out = df.select(epoch_micros(df).alias("us")).first()
    expected = df.selectExpr("unix_micros(ts) AS us").first()
    assert out.us == expected.us


def test_bigint_nanos_truncates_exactly(spark):
    ns = _EPOCH_US * 1000 + 999  # sub-micro nanos must truncate, not round
    df = spark.createDataFrame([(ns,)], "ts bigint")
    row = df.select(
        epoch_micros(df).alias("us"), epoch_seconds(df).alias("s")
    ).first()
    assert row.us == _EPOCH_US
    assert row.s == _EPOCH_US // 1_000_000


def test_missing_column_raises(spark):
    df = spark.range(1)
    with pytest.raises(KeyError, match="no column 'ts'"):
        epoch_micros(df)


def test_epoch_seconds_is_floor_not_round(spark):
    # .999999s must floor to the same second (date_diff semantics)
    almost = datetime.datetime(2024, 1, 1, 0, 0, 1, 999999)
    df = spark.createDataFrame([(almost,)], "ts timestamp_ntz")
    assert df.select(epoch_seconds(df).alias("s")).first().s == 1704067201
