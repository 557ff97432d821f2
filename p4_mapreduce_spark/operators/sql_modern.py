"""Modern SQL surface: recursive CTEs, ordered-set aggregates, exact
bitmap distinct, mergeable HLL sketches, error-safe arithmetic, and
native unpivot.

The reference engine has none of these (its whole query surface is
piped executables over sorted text lines — SURVEY.md §2.2,
``mapreduce/worker/__main__.py:75-77``); they are part of the full
Spark-parity surface the north star mandates. Everything here is
declarative SQL/DataFrame so Catalyst keeps pushdown + codegen.

Scale notes:

- ``recursive_cte_ancestors``: Spark 4 executes WITH RECURSIVE as an
  iterated union-loop — each step is a full distributed plan, so a
  depth-``d`` hierarchy costs ``d`` scans of the frontier (NOT of the
  base table: the anchor filters once). Frontier rows shrink
  geometrically for tree walks; at 100 TB you bound depth explicitly
  (our ladder is ≤8) the same way the oracle does.
- ``bitmap_exact_distinct``: the bitmap pair (bucket number + bit
  position) is the *exact* mergeable distinct-sketch — each shuffle row
  carries one 4 KB bitmap per (group, 32k-id bucket) instead of one row
  per distinct id. This is the scale path when HLL's ~2% error is not
  acceptable; partial bitmaps OR-merge associatively, so map-side
  combine does most of the work.
- ``hll_mergeable_union``: partial ``hll_sketch_agg`` per partition-
  friendly subgroup, then ``hll_union_agg`` — the canonical two-level
  rollup that lets one pass serve any group-by slice; sketches are a
  few KB regardless of cardinality.
- ``listagg_nations_per_region`` keeps groups tiny (dimension-sized);
  LISTAGG of a fact-sized group would materialize the group in one
  task — at scale you cap with a window row_number first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fsum, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load, register_views

_ANC_MAX_KEY = 256  # anchor bound: same rows at every sf >= 0.001


@register(
    "recursive_cte_ancestors",
    oracle=f"""
    WITH RECURSIVE anc AS (
        SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth
        FROM part WHERE p_partkey < {_ANC_MAX_KEY}
        UNION ALL
        SELECT node, CAST(floor(cur / 2.0) AS BIGINT) AS cur, depth + 1
        FROM anc WHERE cur > 1
    )
    SELECT node,
           max(depth) AS depth_to_root,
           count(*) AS chain_len,
           min(cur) AS root
    FROM anc GROUP BY node
    """,
    doc="WITH RECURSIVE (Spark 4): walk the implicit binary-tree "
    "hierarchy child->floor(child/2) from each part key to the root — "
    "the BOM/org-chart shape. Executed as an iterated union-loop whose "
    "frontier shrinks every step; depth is data-bounded at "
    "ceil(log2(key)) <= 8 here, mirroring the explicit depth guards "
    "any 100 TB recursive query needs. DuckDB runs the identical "
    "recursion (integer-only arithmetic, no float drift).",
    tags=("sql", "recursive", "hierarchy"),
)
def recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE anc AS (
            SELECT p_partkey AS node, p_partkey AS cur, 0 AS depth
            FROM part WHERE p_partkey < {_ANC_MAX_KEY}
            UNION ALL
            SELECT node, cur DIV 2 AS cur, depth + 1
            FROM anc WHERE cur > 1
        )
        SELECT node,
               max(depth) AS depth_to_root,
               count(*) AS chain_len,
               min(cur) AS root
        FROM anc GROUP BY node
        """
    )


@register(
    "listagg_nations_per_region",
    oracle="""
    SELECT r.r_name,
           count(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="LISTAGG ... WITHIN GROUP (ORDER BY ...) (Spark 4 ordered-set "
    "aggregate) over a dimension join: the deterministic string "
    "concatenation every report/export layer needs. Groups are "
    "dimension-sized (5 x ~5); a fact-sized LISTAGG would need a "
    "row_number cap first — the whole group materializes in one task.",
    tags=("sql", "aggregation", "string"),
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    j = r.join(n, n.n_regionkey == r.r_regionkey)
    return j.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.expr(
            "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
        ).alias("nations"),
    )


@register(
    "mode_order_priority",
    oracle="""
    WITH cnt AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ), ranked AS (
        SELECT o_orderstatus, o_orderpriority, n,
               row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY n DESC, o_orderpriority
               ) AS rn
        FROM cnt
    )
    SELECT o_orderstatus,
           o_orderpriority AS mode_priority,
           n AS mode_count
    FROM ranked WHERE rn = 1
    """,
    doc="mode() with the deterministic flag (Spark 4: ties break to the "
    "lowest value) — per order status, the most common priority. The "
    "oracle spells out the same tie-break as count-desc/value-asc "
    "row_number over the grouped counts; mode_count pins the "
    "frequency so a tie-break divergence cannot hide.",
    tags=("sql", "aggregation", "stats"),
)
def mode_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    # mode over the raw rows + a max over the pre-grouped counts keeps
    # both the builtin (what we're exercising) and its receipt.
    modes = o.groupBy("o_orderstatus").agg(
        F.expr("mode(o_orderpriority, true)").alias("mode_priority")
    )
    # Alias both sides: modes and counted derive from the same parent
    # scan, so joining on the raw Column objects makes Catalyst log a
    # "trivially true equals predicate" WARN (r12 verdict hygiene #2).
    m = modes.alias("m")
    c = counted.alias("c")
    return m.join(
        c,
        (F.col("m.o_orderstatus") == F.col("c.o_orderstatus"))
        & (F.col("m.mode_priority") == F.col("c.o_orderpriority")),
    ).select(
        F.col("m.o_orderstatus").alias("o_orderstatus"),
        "mode_priority",
        F.col("c.n").alias("mode_count"),
    )


@register(
    "regr_discount_quantity",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           (count(*) * ({fsum_sql('l_quantity * l_discount', 4)})
             - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_discount')}))
           / (count(*) * ({fsum_sql('l_quantity * l_quantity')})
             - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_quantity')}))
             AS slope,
           (({fsum_sql('l_discount')})
             - (count(*) * ({fsum_sql('l_quantity * l_discount', 4)})
                 - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_discount')}))
               / (count(*) * ({fsum_sql('l_quantity * l_quantity')})
                 - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_quantity')}))
               * ({fsum_sql('l_quantity')}))
           / count(*) AS intercept,
           (count(*) * ({fsum_sql('l_quantity * l_discount', 4)})
             - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_discount')}))
           * (count(*) * ({fsum_sql('l_quantity * l_discount', 4)})
             - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_discount')}))
           / ((count(*) * ({fsum_sql('l_quantity * l_quantity')})
               - ({fsum_sql('l_quantity')}) * ({fsum_sql('l_quantity')}))
              * (count(*) * ({fsum_sql('l_discount * l_discount', 6)})
                 - ({fsum_sql('l_discount')}) * ({fsum_sql('l_discount')})))
             AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Least-squares regression of discount on quantity per return "
    "flag (regr_slope / regr_intercept / regr_r2 semantics), recomposed "
    "from five normalized partial sums exactly like corr_discount_tax — "
    "the regr_* builtins' reduction order never hash-matches across "
    "engines, while slope/intercept/r2 as pure arithmetic over "
    "already-identical doubles is bit-exact. One fused aggregate pass, "
    "map-side partials; magnitudes (qty<=50, disc<=0.1) keep float "
    "error far under every normalization boundary through 1e9-row "
    "groups.",
    tags=("sql", "aggregation", "stats"),
)
def regr_discount_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = fsum("l_quantity")
    sy = fsum("l_discount")
    sxy = fsum(F.col("l_quantity") * F.col("l_discount"), 4)
    sxx = fsum(F.col("l_quantity") * F.col("l_quantity"))
    syy = fsum(F.col("l_discount") * F.col("l_discount"), 6)
    cov_n = n * sxy - sx * sy
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    slope = cov_n / var_x_n
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (cov_n * cov_n / (var_x_n * var_y_n)).alias("r2"),
    )


@register(
    "try_arithmetic_safe",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 7 = 0 THEN NULL
                ELSE o_totalprice / (o_custkey % 7) END AS price_per_bucket,
           try_cast(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
           try_cast(o_orderpriority AS DOUBLE) AS bad_cast,
           CASE WHEN o_custkey % 7 = 0 THEN 1 ELSE 0 END AS div_was_null
    FROM orders WHERE o_orderkey < 1000
    """,
    doc="Error-safe arithmetic: try_divide / try_cast return NULL "
    "instead of failing the job — the difference between one poison row "
    "killing a 100 TB pass and it landing in a quarantine column. "
    "ANSI mode stays on for everything else; the oracle spells the "
    "same semantics with CASE/try_cast.",
    tags=("sql", "functions", "quality"),
)
def try_arithmetic_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    bucket = F.col("o_custkey") % 7
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), bucket).alias("price_per_bucket"),
        F.expr(
            "try_cast(substr(o_orderpriority, 1, 1) AS INT)"
        ).alias("prio_num"),
        F.expr("try_cast(o_orderpriority AS DOUBLE)").alias("bad_cast"),
        F.when(bucket == 0, F.lit(1)).otherwise(F.lit(0)).alias("div_was_null"),
    )


@register(
    "bitmap_exact_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_distinct_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact distinct via bitmap aggregates (Spark 3.5 bitmap_* "
    "family): ids fold into (bucket, bit-position) pairs, "
    "bitmap_construct_agg ORs 4 KB bitmaps per (group, 32k-id bucket), "
    "and the final count is a sum of popcounts. The shuffle carries one "
    "bitmap per bucket instead of one row per distinct id — the exact "
    "alternative to HLL when ~2% error is unacceptable. Oracle: plain "
    "COUNT(DISTINCT).",
    tags=("sql", "aggregation", "sketch", "distinct"),
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
    ).agg(
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position(o_custkey))"
        ).alias("bm"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("exact_distinct_customers"),
        F.sum("n").alias("n_orders"),
    )


@register(
    "hll_mergeable_union",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_exact_customers,
           count(DISTINCT o_orderpriority) AS n_partials,
           count(*) AS n_orders,
           true AS est_within_2pct
    FROM orders
    """,
    doc="Mergeable HLL sketches (Spark 3.5 hll_sketch_agg / "
    "hll_union_agg): per-priority partial sketches union into one "
    "global estimate — the two-level rollup that lets a single pass "
    "serve any slice at 100 TB; each sketch is KBs regardless of "
    "cardinality. Bounded oracle: the union estimate is scored against "
    "the exact distinct within 2% (lgK=14 → ~0.8% RSE, 2% is ~2.5 "
    "sigma); the exact arm exists only to score the sketch. Tighter "
    "per-seed accuracy asserted in tests/test_sketch_accuracy.py.",
    tags=("sql", "aggregation", "sketch", "distinct"),
)
def hll_mergeable_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    partials = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey, 14)").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    exact = o.agg(
        F.count_distinct("o_custkey").alias("n_exact_customers")
    )
    merged = partials.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        F.count(F.lit(1)).alias("n_partials"),
        F.sum("n").alias("n_orders"),
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_exact_customers",
        "n_partials",
        "n_orders",
        (
            F.abs(F.col("est") - F.col("n_exact_customers"))
            / F.col("n_exact_customers")
            <= 0.02
        ).alias("est_within_2pct"),
    )


@register(
    "unpivot_native_api",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS val FROM lineitem WHERE l_orderkey < 300
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 300
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 300
    )
    """,
    doc="df.unpivot (Spark 3.4 native melt API) — same wide->long "
    "semantics as unpivot_stack but through the typed DataFrame "
    "surface; Catalyst plans the identical Expand node (row expansion "
    "at the scan, no shuffle).",
    tags=("projection", "pivot"),
)
def unpivot_native_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 300)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


_POSEXPLODE_MAX_TOKENS = 64


@register(
    "posexplode_tokens",
    oracle=f"""
    SELECT p_partkey, i AS pos, arr[i + 1] AS token
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS arr FROM part),
         range(0, {_POSEXPLODE_MAX_TOKENS}) r(i)
    WHERE i < len(arr)
    """,
    doc="posexplode: ordinal-preserving array explosion (LATERAL VIEW "
    "shape) — token position survives the flatten, which plain explode "
    "loses. Plan-level Generate node, no shuffle. DuckDB lacks WITH "
    "ORDINALITY, so the oracle cross-joins a constant range and "
    "filters to the array length — same rows, join-free on the Spark "
    "side.",
    tags=("array", "projection"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_name", " ", -1)).alias("pos", "token"),
    )


@register(
    "crosstab_status_priority",
    oracle="""
    SELECT CAST(o_orderstatus AS VARCHAR) AS o_orderstatus_o_orderpriority,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
               AS "4-NOT SPECIFIED",
           count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Contingency table via df.stat.crosstab — one groupBy over the "
    "pair then a driver-side pivot of the (tiny) distinct-pair set; "
    "the profiling primitive behind categorical-drift checks. Column "
    "set is data-driven (the 5 priority values); the oracle pins them "
    "with FILTER aggregates.",
    tags=("stats", "pivot"),
)
def crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    # crosstab returns counts as long in arbitrary column order; fix
    # the order so the projection is stable across runs.
    value_cols = sorted(c for c in ct.columns if c != "o_orderstatus_o_orderpriority")
    return ct.select(
        "o_orderstatus_o_orderpriority",
        *[F.col(f"`{c}`").alias(c) for c in value_cols],
    )


@register(
    "distribute_sort_by",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders WHERE o_totalprice > 100000
    """,
    doc="DISTRIBUTE BY + SORT BY: explicit partition placement (hash on "
    "o_custkey) with intra-partition order but NO global sort — the "
    "write-side clustering primitive (co-locate a key before a "
    "bucketed write or a downstream co-partitioned join) that skips "
    "the range-exchange a global ORDER BY would add. Result set is "
    "order-insensitive, so the oracle is the plain projection.",
    tags=("sql", "partitioning", "sort"),
)
def distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders WHERE o_totalprice > 100000
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        """
    )


_LATERAL_TOPN_SQL = """
    SELECT c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) AS t
"""


@register(
    "lateral_topn_per_customer",
    oracle=_LATERAL_TOPN_SQL,
    doc="LATERAL correlated subquery with per-row ORDER BY ... LIMIT: "
    "each customer's top-2 orders by value, written as the modern-SQL "
    "lateral join (identical text runs in DuckDB — the oracle IS the "
    "query). Catalyst decorrelates the lateral into a set-based plan "
    "(the correlated limit becomes a per-key window/group-limit over "
    "one join, not a per-customer re-scan), which is the difference "
    "between O(|orders|) and O(|customers| x |orders|) at 100 TB — "
    "the plan-shape twin of window_topk_per_group reached from the "
    "SQL dialect side.",
    tags=("sql", "join", "window"),
)
def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN_SQL)


# ---------------------------------------------------------------------------
# SQL scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr)
# ---------------------------------------------------------------------------


@register(
    "sql_scalar_udf",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {fsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)',
                     2)} AS charged
    FROM lineitem
    WHERE l_quantity >= 10
    GROUP BY l_returnflag
    """,
    doc="SQL scalar UDF (Spark 4 `CREATE TEMPORARY FUNCTION ... "
    "RETURNS ... RETURN <expr>`): the charged-amount business rule is "
    "declared ONCE as a catalog function and referenced by name in "
    "the aggregate — the governed-semantic-layer feature that lets a "
    "platform team publish vetted expressions instead of copy-pasted "
    "formulas. Crucially these are NOT black-box UDFs: Catalyst "
    "inlines the function body at analysis time, so the plan is "
    "byte-identical to writing the expression inline — predicate "
    "pushdown, codegen, and partial aggregation all survive (the "
    "oracle IS the inlined form, proving semantic equivalence). "
    "Zero Python, zero serialization boundary — the opposite end of "
    "the UDF spectrum from pandas_udfs.py, completing that surface.",
    tags=("sql", "udf", "aggregation"),
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_amount("
        "price DOUBLE, discount DOUBLE, tax DOUBLE) RETURNS DOUBLE "
        "RETURN price * (1 - discount) * (1 + tax)"
    )
    return spark.sql(f"""
        SELECT l_returnflag,
               count(*) AS n,
               {fsum_sql("charged_amount(l_extendedprice, l_discount, l_tax)",
                         2)} AS charged
        FROM lineitem
        WHERE l_quantity >= 10
        GROUP BY l_returnflag
    """)


# ---------------------------------------------------------------------------
# r10: GROUP BY ALL / ORDER BY ALL (modern-SQL shorthand surface)
# ---------------------------------------------------------------------------

_GROUP_BY_ALL_SQL = f"""
SELECT l_returnflag, l_linestatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       {fsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "group_by_all_sql",
    oracle=_GROUP_BY_ALL_SQL,
    doc="GROUP BY ALL + ORDER BY ALL (the modern-SQL shorthand that "
    "infers grouping keys from the non-aggregate select items): the "
    "IDENTICAL SQL text runs in Spark 4 and DuckDB, so — like "
    "lateral_topn_per_customer — the oracle IS the query and parity "
    "proves both engines resolve the shorthand to the same grouping. "
    "Catalyst expands it to a plain partial+final hash aggregate over "
    "the join (verified by the registry plan audit), so the sugar "
    "costs nothing at any scale.",
    tags=("sql", "aggregation"),
)
def group_by_all_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)
