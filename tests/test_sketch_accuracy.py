"""Accuracy bounds for the two rows-only sketch queries.

These two queries are the only registry entries without a DuckDB value
oracle (their numerics are engine-specific sketch internals), so the
check that makes them trustworthy lives here: each estimate must sit
within the sketch's published error bound of the exact answer computed
on the same data.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from p4_mapreduce_spark.registry import load_all
from p4_mapreduce_spark.sources.tables import load


def test_hll_estimate_within_rsd(spark, sf_dir):
    """approx_count_distinct (HLL++) vs exact countDistinct: the
    default rsd is 0.05; allow 3 sigma."""
    got = load_all()["approx_distinct_users"].fn(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    exact = {
        r[0]: r[1]
        for r in ev.groupBy(F.lit(1))
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    exact_n = list(exact.values())[0]
    est_cols = [c for c in got[0].asDict() if "distinct" in c or "user" in c]
    assert est_cols, f"no estimate column found in {got[0].asDict()}"
    est = got[0][est_cols[0]]
    assert abs(est - exact_n) <= max(3 * 0.05 * exact_n, 1), (est, exact_n)


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """percentile_approx with accuracy=10000 guarantees rank error
    <= n/accuracy: each reported quartile's true rank must be within
    that of the target rank."""
    rows = load_all()["approx_percentiles"].fn(spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    for r in rows:
        status = r["o_orderstatus"]
        vals = sorted(
            x[0]
            for x in o.where(F.col("o_orderstatus") == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        tol = max(n / 10000.0, 1.0)
        for q, col in ((0.25, "price_p25"), (0.5, "price_p50"), (0.75, "price_p75")):
            est = r[col]
            # rank of the estimate in the exact sorted values
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target = q * (n - 1)
            # any rank the estimate occupies must be near the target
            assert lo - tol <= target <= hi + tol, (
                status,
                col,
                est,
                lo,
                hi,
                target,
                n,
            )


def test_hll_mergeable_union_within_rsd(spark, sf_dir):
    """hll_union_agg over per-priority partial sketches (lgConfigK=14,
    rsd ~= 1.04/sqrt(2^14) ~= 0.8%) vs exact global countDistinct;
    allow 3 sigma. Also checks the partial count is the 5 priorities."""
    got = load_all()["hll_mergeable_union"].fn(spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    assert got["n_partials"] == 5
    assert got["n_orders"] == o.count()
    rsd = 1.04 / (2**14) ** 0.5
    assert abs(got["est_distinct_customers"] - exact) <= max(3 * rsd * exact, 1), (
        got["est_distinct_customers"],
        exact,
    )
