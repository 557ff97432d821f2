"""Accuracy bounds for the sketch queries.

Since round 3 the sketch queries carry *bounded oracles*: each one
computes an exact arm next to the sketch and emits within-tolerance
verdict booleans that the DuckDB oracle hash-checks. These tests keep
the independent, tighter math: they recompute the raw estimates with
the same sketch parameters and assert the published error bounds
directly — so a sketch drifting toward its tolerance edge shows up
here before it flips a verdict boolean.
"""

from __future__ import annotations

import bisect

import pyspark.sql.functions as F

from p4_mapreduce_spark.registry import load_all
from p4_mapreduce_spark.sources.tables import load


def test_approx_distinct_verdict_and_rsd(spark, sf_dir):
    """The registered query's verdict must be true, and the raw HLL++
    estimate (rsd=0.01, recomputed) must sit within 3 sigma of exact."""
    row = load_all()["approx_distinct_users"].fn(spark, sf_dir).collect()[0]
    assert row["approx_within_2pct"] is True
    ev = load(spark, sf_dir, "events")
    got = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
        F.count_distinct("user_id").alias("exact"),
    ).collect()[0]
    assert row["n_exact_users"] == got["exact"]
    assert abs(got["est"] - got["exact"]) <= max(3 * 0.01 * got["exact"], 1)


def test_approx_percentiles_verdicts_and_rank_error(spark, sf_dir):
    """All verdict booleans true; additionally the raw
    percentile_approx estimates (accuracy=10000, recomputed) must obey
    the published rank-error bound n/accuracy per group."""
    rows = load_all()["approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for col in ("p25_within_5pct", "p50_within_5pct", "p75_within_5pct"):
            assert r[col] is True, (r["o_orderstatus"], col)

    o = load(spark, sf_dir, "orders")
    ests = {
        r["o_orderstatus"]: r["q"]
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.25, 0.5, 0.75], 10000
            ).alias("q")
        )
        .collect()
    }
    for status, qvals in ests.items():
        vals = sorted(
            x[0]
            for x in o.where(F.col("o_orderstatus") == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        tol = max(n / 10000.0, 1.0)
        for q, est in zip((0.25, 0.5, 0.75), qvals):
            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target = q * (n - 1)
            assert lo - tol <= target <= hi + tol, (
                status, q, est, lo, hi, target, n,
            )


def test_hll_mergeable_union_verdict_and_rsd(spark, sf_dir):
    """Verdict true + structural counts; the raw merged estimate
    (lgConfigK=14, rsd ~0.8%, recomputed) within 3 sigma of exact."""
    got = load_all()["hll_mergeable_union"].fn(spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders")
    exact = o.select(F.count_distinct("o_custkey")).collect()[0][0]
    assert got["n_partials"] == 5
    assert got["n_orders"] == o.count()
    assert got["n_exact_customers"] == exact
    assert got["est_within_2pct"] is True

    est = (
        o.groupBy("o_orderpriority")
        .agg(F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]["est"]
    )
    rsd = 1.04 / (2**14) ** 0.5
    assert abs(est - exact) <= max(3 * rsd * exact, 1), (est, exact)
