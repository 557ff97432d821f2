"""Time-series operators: gap-filling and time-based rolling frames.

The hypertable-ish surface beyond :func:`time_rollup_hierarchy`
(reference scope: SURVEY.md §2.4 taxonomy, aggregation/window rows —
the reference itself has no time type at all, every capability here is
Spark-native by design):

- **gap-fill**: a dense per-key time spine (``sequence`` + ``explode``)
  left-joined to the sparse aggregate, zero-filling counts and carrying
  the last observation forward (LOCF) with ``last(ignorenulls)``. The
  spine is generated, never shuffled: at 100 TB the only shuffle is the
  hourly pre-aggregation (events → 720 rows/key/month), after which the
  spine join and LOCF window run on the *reduced* frame — keys × hours,
  not raw events.
- **time-range rolling**: RANGE frames keyed on epoch-microseconds, the
  trailing-window aggregate (``events in the last hour per user``) that
  a tumbling window can't express. One shuffle on user_id; the frame
  scan is a single ordered pass per partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from p4_mapreduce_spark.functions.deterministic import fix, fix_sql, fsum, fsum_sql
from p4_mapreduce_spark.functions.timeutil import epoch_micros
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

_US_PER_HOUR = 3_600_000_000


@register(
    "timeseries_gapfill",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hh, count(*) AS n_events,
               {fsum_sql("value")} AS hour_value
        FROM events GROUP BY 1, 2
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(min(hh), max(hh), INTERVAL 1 HOUR)) AS hh
        FROM hourly GROUP BY event_type
    )
    SELECT s.event_type, s.hh,
           coalesce(h.n_events, 0) AS n_events,
           coalesce(h.hour_value, 0.0) AS hour_value,
           last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hh
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM spine s LEFT JOIN hourly h USING (event_type, hh)
    """,
    doc="Hourly gap-fill per event_type: aggregate to the hour, then "
    "each observed hour emits itself plus the hours missing since its "
    "predecessor (lag + sequence + one explode) — a dense spine "
    "without re-aggregating or self-joining, so events is scanned and "
    "shuffled exactly once regardless of volume. Counts zero-fill; "
    "the last seen hourly value carries forward (LOCF via "
    "last(ignorenulls)) over a window that reuses the lag window's "
    "partitioning, so the whole fill stage adds one tiny exchange of "
    "the keys x hours frame.",
    headline=True,
    tags=("events", "timeseries", "window"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hh")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        fsum("value").alias("hour_value"),
    )
    # Single-pass spine: instead of re-aggregating for min/max and
    # re-joining (which would scan+shuffle events twice), each observed
    # hour emits itself plus the missing hours since its predecessor
    # (lag) as one exploded struct array. hourly is consumed exactly
    # once; the LOCF window below reuses the lag window's event_type
    # partitioning, so no third exchange appears.
    wl = Window.partitionBy("event_type").orderBy("hh")
    gap_structs = F.when(
        F.col("prev").isNotNull()
        & (F.col("hh") > F.col("prev") + F.expr("INTERVAL 1 HOUR")),
        F.transform(
            F.sequence(
                F.col("prev") + F.expr("INTERVAL 1 HOUR"),
                F.col("hh") - F.expr("INTERVAL 1 HOUR"),
                F.expr("INTERVAL 1 HOUR"),
            ),
            lambda h: F.struct(
                h.alias("hh"),
                F.lit(0).cast("long").alias("n_events"),
                F.lit(None).cast("double").alias("hour_value"),
            ),
        ),
    ).otherwise(F.array())
    observed = F.array(
        F.struct(
            F.col("hh").alias("hh"),
            F.col("n_events").alias("n_events"),
            F.col("hour_value").alias("hour_value"),
        )
    )
    expanded = (
        hourly.withColumn("prev", F.lag("hh").over(wl))
        .select(
            "event_type",
            F.explode(F.concat(gap_structs, observed)).alias("r"),
        )
        .select("event_type", "r.hh", "r.n_events", "r.hour_value")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hh")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return expanded.select(
        "event_type",
        "hh",
        "n_events",
        F.coalesce("hour_value", F.lit(0.0)).alias("hour_value"),
        F.last("hour_value", ignorenulls=True).over(w).alias("locf_value"),
    )


@register(
    "window_time_range_rolling",
    oracle=f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_US_PER_HOUR} PRECEDING AND CURRENT ROW
           ) AS n_last_hour,
           {fix_sql(f'''sum(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_US_PER_HOUR} PRECEDING AND CURRENT ROW)''')}
           AS value_last_hour
    FROM events
    """,
    doc="Trailing time-window aggregate: per user, events and summed "
    "value in the preceding hour of *that row's* timestamp — a RANGE "
    "frame over epoch-microseconds (tumbling/hopping windows can't "
    "express a frame anchored at every row). One shuffle on user_id, "
    "then a single ordered pass per partition; the frame bound is "
    "resolved by binary search within the sorted partition, so cost "
    "is O(rows log rows) per user independent of window width.",
    tags=("events", "timeseries", "window"),
)
def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load(spark, sf_dir, "events")
    ev = raw.withColumn("ts_us", epoch_micros(raw))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_US_PER_HOUR, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        fix(F.sum("value").over(w)).alias("value_last_hour"),
    )


_EWMA_ALPHA = 0.2
_EWMA_SPAN = 10
# Weights (1-alpha)^k computed ONCE here and embedded as the same
# double literals in the Spark expression AND the DuckDB oracle — no
# cross-engine pow() to disagree about.
_EWMA_WEIGHTS = [(1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_SPAN)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w, 0.0) * {w!r}"
        for k, w in enumerate(_EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"(CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0.0 ELSE {w!r} END)"
        for k, w in enumerate(_EWMA_WEIGHTS)
    )
    return f"""
    SELECT user_id, event_id, value,
           {fix_sql(f'({num}) / ({den})', 4)} AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register(
    "timeseries_ewma",
    oracle=_ewma_oracle(),
    doc=f"Exponentially weighted moving average per user (span "
    f"{_EWMA_SPAN}, alpha {_EWMA_ALPHA}): the standard smoothing / "
    f"drift-detection signal. Implemented as a FIXED {_EWMA_SPAN}-term "
    "weighted sum of lag() columns — not a recursive update and not a "
    "variable-length fold — so it is one window pass (single shuffle "
    "on user_id), stays entirely in whole-stage codegen, and is "
    "bit-deterministic across engines: the (1-a)^k weights are "
    "computed once in Python and embedded as identical double "
    "literals in both dialects, the partial-history head renormalizes "
    "by the sum of present weights, and the result is "
    "floor-quantized at 1e-4.",
    tags=("events", "timeseries", "window"),
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = None
    den = None
    for k, wt in enumerate(_EWMA_WEIGHTS):
        lagged = F.lag("value", k).over(w)
        term = F.coalesce(lagged, F.lit(0.0)) * F.lit(wt)
        present = F.when(lagged.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = present if den is None else den + present
    return ev.select(
        "user_id", "event_id", "value", fix(num / den, 4).alias("ewma")
    )


# Seasonal anomaly bands: a day is anomalous when its revenue is this
# far (ratio) from its weekday baseline.
_SEASONAL_HI = 1.3
_SEASONAL_LO = 0.7


@register(
    "seasonal_baseline_anomalies",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderdate AS d,
               CAST(datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                             o_orderdate) % 7 AS INTEGER) AS dow,
               {fsum_sql('o_totalprice')} AS rev
        FROM orders GROUP BY 1, 2
    ),
    base AS (
        SELECT dow,
               (CAST(sum(CAST(floor(rev * 100.0 + 0.5) AS BIGINT))
                     AS BIGINT) / count(*)) / 100.0 AS baseline
        FROM daily GROUP BY 1
    ),
    scored AS (
        SELECT d, daily.dow, rev, baseline,
               {fix_sql("rev / baseline", 4)} AS ratio
        FROM daily JOIN base ON daily.dow = base.dow
    )
    SELECT d AS day, dow, rev, ratio
    FROM scored
    WHERE ratio > {_SEASONAL_HI} OR ratio < {_SEASONAL_LO}
    """,
    doc="Seasonal-baseline anomaly detection: daily revenue compared "
    "to its WEEKDAY baseline (mean daily revenue for that day-of-"
    "week), flagging days outside the [0.7x, 1.3x] band — the "
    "seasonality-aware alert that a naive global mean would botch "
    "(every weekend would page). Day-of-week is pure integer "
    "epoch-day arithmetic (engines disagree on dayofweek()'s "
    "0-vs-1-based Sunday; days-since-epoch mod 7 is dialect-proof). "
    "Scale shape: one map-side-combined rollup to the calendar-"
    "bounded daily frame; baselines re-aggregate that frame into 7 "
    "rows and broadcast back. Daily revenues are 2-decimal fsum-"
    "quantized, baselines are bigint-cent sums (exact any order), "
    "the ratio one IEEE division quantized at 1e-4. The band's "
    "selectivity sharpens with volume (relative daily variance ~ "
    "1/sqrt(orders/day)): ~4.6% of days flag at sf0.1 and fewer at "
    "production volume, while tiny test SFs flag many — inherent to "
    "ratio bands, not a defect.",
    tags=("timeseries", "aggregation", "stats"),
)
def seasonal_baseline_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").alias("d"),
        (F.datediff("o_orderdate", F.lit("1970-01-01")) % 7)
        .cast("int")
        .alias("dow"),
    ).agg(fsum("o_totalprice").alias("rev"))
    base = daily.groupBy("dow").agg(
        (
            (
                F.sum(F.floor(F.col("rev") * 100.0 + 0.5).cast("bigint")).cast(
                    "bigint"
                )
                / F.count(F.lit(1))
            )
            / 100.0
        ).alias("baseline")
    )
    ratio = fix(F.col("rev") / F.col("baseline"), 4)
    return (
        daily.join(F.broadcast(base), "dow")
        .select(F.col("d").alias("day"), "dow", "rev", ratio.alias("ratio"))
        .where(
            (F.col("ratio") > _SEASONAL_HI) | (F.col("ratio") < _SEASONAL_LO)
        )
    )
