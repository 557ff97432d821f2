"""Join operators: every join family, Spark-first.

The reference engine has no joins at all — it is a single-input
map/group/reduce pipeline (SURVEY.md §2.4) — so this module is pure
north-star surface: inner/outer/semi/anti/cross, broadcast vs
shuffle strategies, multi-way star joins, a range join, and a
merge-based as-of join.

Scale posture (the part that matters at 100 TB):

- **Broadcast the small side.** region/nation/supplier/part are
  classic broadcast dims; `F.broadcast` pins it where the stats
  wouldn't (Catalyst auto-broadcasts under
  ``spark.sql.autoBroadcastJoinThreshold`` anyway, and AQE converts
  shuffle joins to broadcast at runtime when the built side turns out
  small).
- **Fact-fact joins shuffle on the key** (sort-merge or shuffled
  hash); skew is handled by AQE skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled`` — on in our session).
- **Range joins**: never ship the naive cross product at scale —
  pre-filter to the band's selectivity or bucket both sides on the
  band width so the join becomes equi + residual (documented on
  ``range_join_band`` below).
- **As-of joins**: implemented as union + ordered window scan — one
  shuffle on (key), no nested loop, the same plan Flink/kdb-style
  engines use. This is THE scalable as-of strategy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from p4_mapreduce_spark.functions.deterministic import fix, fix_sql, fsum, fsum_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

# ---------------------------------------------------------------------------
# Multi-way star joins (TPC-H Q3/Q5 shapes) — the headline join paths.
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1999-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: dim-filtered star join -> agg -> top-k by revenue. "
    "The BUILDING customer filter broadcasts into orders BEFORE the "
    "orderkey shuffle (the orders side moves ~1/5 of its rows instead "
    "of all of them); lineitem arrives pre-filtered by shipdate.",
    headline=True,
    tags=("join", "aggregation", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1999-03-15 00:00:00").cast("timestamp")
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    orders_bldg = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        # SHUFFLE_HASH on the pruned orders side: skips both sort passes
        # of SMJ (10-20% here). Safe build side: BUILDING-segment orders
        # within one hash partition fit executor memory at any SF (the
        # hint, unlike a session conf, travels into the driver's
        # session); AQE skew-split still applies to the probe side.
        li.join(
            orders_bldg.hint("shuffle_hash"),
            li.l_orderkey == orders_bldg.o_orderkey,
        )
        # Aggregate on the JOIN key only: the join output is already
        # hash-partitioned on l_orderkey, so the final agg needs no new
        # exchange; o_orderdate/o_orderpriority are functionally
        # dependent on l_orderkey (constant per order) and ride along
        # as max() — one full shuffle removed (measured ~10% here, and
        # at 100 TB it's a whole fact-sized shuffle).
        .groupBy("l_orderkey")
        .agg(
            fsum(fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.max("o_orderdate").alias("o_orderdate"),
            F.max("o_orderpriority").alias("o_orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {fsum_sql(fix_sql('l_extendedprice * (1 - l_discount)'))} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5: 6-way star join. The region filter is pushed through "
    "nation into BOTH fact inputs before the only real shuffle: "
    "lineitem is broadcast-pruned by ASIA suppliers and orders by ASIA "
    "customers, so the orderkey shuffle moves ~1/5 of each side (at "
    "100 TB that pruning is the difference between shuffling the whole "
    "fact table and a fifth of it); the residual c_nationkey = "
    "s_nationkey condition filters after the join.",
    headline=True,
    tags=("join", "aggregation"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nat_asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nat_asia.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(nat_asia.select(F.col("n_nationkey").alias("cn_key"))),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    li_asia = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    orders_asia = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        # SHUFFLE_HASH: build from the date+region-pruned orders side
        # (bounded per partition); see q3 note — per-query hint, not a
        # global preferSortMergeJoin flip.
        li_asia.join(
            orders_asia.hint("shuffle_hash"),
            li_asia.l_orderkey == orders_asia.o_orderkey,
        )
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(fsum(fix(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Join-type coverage
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_inner",
    oracle=f"""
    SELECT p_brand,
           count(*) AS n_items,
           {fsum_sql('l_quantity')} AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact⋈dim inner join with an explicit broadcast hint.",
    tags=("join",),
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), fsum("l_quantity").alias("total_qty"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n LEFT JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
    doc="LEFT OUTER join preserving unmatched nations (NULL supplier).",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    return nation.join(supp, nation.n_nationkey == supp.s_nationkey, "left").select(
        "n_name", "s_name", "s_acctbal"
    )


@register(
    "join_full_outer",
    oracle=f"""
    WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1),
         e AS (SELECT user_id  AS k, count(*) AS n_events FROM events GROUP BY 1)
    SELECT coalesce(o.k, e.k) AS entity_id, o.n_orders, e.n_events
    FROM o FULL OUTER JOIN e ON o.k = e.k
    """,
    doc="FULL OUTER join of two aggregated keyspaces (orders vs events).",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    e = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return o.join(e, "k", "full").select(
        F.coalesce(o["k"], e["k"]).alias("entity_id"), "n_orders", "n_events"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
    doc="LEFT SEMI join (EXISTS): customers with at least at least one 450k+ order. "
    "Ships only the key, dedups the probe side — no row explosion.",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 450000)
    """,
    doc="LEFT ANTI join (NOT EXISTS): complement of join_semi.",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    doc="CROSS join of two tiny relations (5 regions x 3 statuses).",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select("r_name")
    status = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


# ---------------------------------------------------------------------------
# Range join: equi-key + value band. At 100 TB the band term must not
# degenerate into a nested loop: we pre-filter the probe side to the
# band's selectivity here; the general recipe is to bucket both sides
# by floor(value / band_width) (maps the band to <=3 equi-buckets) so
# Spark plans a shuffle join + residual filter instead of BNLJ.
# ---------------------------------------------------------------------------


@register(
    "range_join_band",
    oracle="""
    SELECT o.o_orderkey, e.event_id, o.o_totalprice, e.value
    FROM (SELECT * FROM orders WHERE o_totalprice < 3000) o
    JOIN events e
      ON e.value >= o.o_totalprice * 0.01 - 2.0
     AND e.value <= o.o_totalprice * 0.01 + 2.0
    """,
    doc="Non-equi band join (value within ±2 of scaled price).",
    tags=("join", "range"),
)
def range_join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Broadcast the pre-filtered orders side (the small relation) and
    # stream events past it — broadcasting the fact side would OOM at
    # real event volumes.
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") < 3000)
    e = load(spark, sf_dir, "events")
    lo = o.o_totalprice * 0.01 - 2.0
    hi = o.o_totalprice * 0.01 + 2.0
    return (
        F.broadcast(o)
        .join(e, (e.value >= lo) & (e.value <= hi))
        .select("o_orderkey", "event_id", "o_totalprice", "value")
    )


# ---------------------------------------------------------------------------
# As-of join: for each click, the latest purchase by the same user at
# or before the click. Implemented merge-style: tag + union + ordered
# window carry-forward — one shuffle on user_id, linear work, no
# nested loop; this is the plan that survives 100 TB event streams.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH tagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
    FROM events
    WHERE event_type IN ('click', 'purchase')
),
carried AS (
    SELECT user_id, ts, event_id, value, is_purchase,
           last_value(CASE WHEN is_purchase = 1 THEN event_id END IGNORE NULLS)
               OVER w AS last_purchase_id,
           last_value(CASE WHEN is_purchase = 1 THEN value END IGNORE NULLS)
               OVER w AS last_purchase_value
    FROM tagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_purchase DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS click_id, ts AS click_ts,
       last_purchase_id, last_purchase_value
FROM carried WHERE is_purchase = 0
"""


@register(
    "asof_join_clicks_purchases",
    oracle=_ASOF_ORACLE,
    doc="As-of join via union + window carry-forward (merge-join plan).",
    headline=True,
    tags=("join", "asof", "window"),
)
def asof_join_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    # purchases sort before clicks at equal ts so a same-instant purchase
    # is visible to the click (matches the oracle's ORDER BY).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_purchase").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_id = F.when(F.col("is_purchase") == 1, F.col("event_id"))
    purchase_val = F.when(F.col("is_purchase") == 1, F.col("value"))
    carried = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "is_purchase",
        F.last(purchase_id, ignorenulls=True).over(w).alias("last_purchase_id"),
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )
    return carried.where(F.col("is_purchase") == 0).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "last_purchase_id",
        "last_purchase_value",
    )


@register(
    "join_skew_split_hot_keys",
    oracle=f"""
    SELECT o_orderpriority,
           {fsum_sql('l_extendedprice')} AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Manual skew-split join: the salting recipe from SCALE.md as a "
    "real operator. Hot join keys (here: orderkeys with >5 lines) are "
    "routed through a broadcast join of just their matching build rows "
    "while the cold long tail takes the normal shuffle join; the union "
    "then aggregates. Result is identical to the plain join (the "
    "oracle IS the plain join) — only the physical routing differs. "
    "This is what AQE's skewJoin does adaptively; the explicit form is "
    "for when skew is known ahead of time (power-law keys in logs, "
    "null-heavy foreign keys) and for engines/settings without AQE.",
    tags=("join", "skew", "aggregation"),
)
def join_skew_split_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hot_keys = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 5)
        .select(F.col("l_orderkey").alias("hot_key"))
    )
    li_hot = li.join(
        F.broadcast(hot_keys), li.l_orderkey == F.col("hot_key"), "left_semi"
    )
    li_cold = li.join(
        F.broadcast(hot_keys), li.l_orderkey == F.col("hot_key"), "left_anti"
    )
    orders_hot = orders.join(
        F.broadcast(hot_keys), orders.o_orderkey == F.col("hot_key"), "left_semi"
    )
    joined_hot = li_hot.join(
        F.broadcast(orders_hot), li.l_orderkey == orders.o_orderkey
    )
    joined_cold = li_cold.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        joined_hot.select("o_orderpriority", "l_extendedprice")
        .unionAll(joined_cold.select("o_orderpriority", "l_extendedprice"))
        .groupBy("o_orderpriority")
        .agg(
            fsum("l_extendedprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


_ASOF_FWD_ORACLE = """
WITH tagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
    FROM events
    WHERE event_type IN ('click', 'purchase')
),
carried AS (
    SELECT user_id, ts, event_id, value, is_purchase,
           first_value(CASE WHEN is_purchase = 1 THEN event_id END IGNORE NULLS)
               OVER w AS next_purchase_id,
           first_value(CASE WHEN is_purchase = 1 THEN value END IGNORE NULLS)
               OVER w AS next_purchase_value
    FROM tagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, event_id AS click_id, ts AS click_ts,
       next_purchase_id, next_purchase_value
FROM carried WHERE is_purchase = 0
"""


@register(
    "asof_join_forward",
    oracle=_ASOF_FWD_ORACLE,
    doc="FORWARD as-of join: for each click, the EARLIEST purchase by "
    "the same user at or after the click — the attribution-window "
    "direction (the registered backward twin carries the last-before "
    "semantics). Same merge-style plan: tag + single window pass with "
    "a (current row → unbounded following) frame, one shuffle on "
    "user_id, no range self-join. Clicks sort before same-instant "
    "purchases so the purchase is visible to the click in both "
    "dialects.",
    tags=("join", "asof", "window"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_purchase"), F.col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    purchase_id = F.when(F.col("is_purchase") == 1, F.col("event_id"))
    purchase_val = F.when(F.col("is_purchase") == 1, F.col("value"))
    carried = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "is_purchase",
        F.first(purchase_id, ignorenulls=True).over(w).alias("next_purchase_id"),
        F.first(purchase_val, ignorenulls=True).over(w).alias("next_purchase_value"),
    )
    return carried.where(F.col("is_purchase") == 0).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "next_purchase_id",
        "next_purchase_value",
    )


@register(
    "join_null_safe",
    oracle=f"""
    WITH seg_all AS (
        SELECT nullif(user_id % 7, 3) AS seg, count(*) AS n_events,
               {fsum_sql('value')} AS total_value
        FROM events GROUP BY 1
    ),
    seg_purchase AS (
        SELECT nullif(user_id % 7, 3) AS seg, count(*) AS n_purchases,
               {fsum_sql('value')} AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT a.seg, a.n_events, a.total_value, p.n_purchases, p.purchase_value
    FROM seg_all a JOIN seg_purchase p ON a.seg IS NOT DISTINCT FROM p.seg
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL "
    "segment row on each side matches, where a plain equi-join would "
    "silently drop it — the semantics dimension tables with nullable "
    "surrogate keys need. Spark hash-partitions NULL like any other "
    "key under eqNullSafe (null-safe equality is still an equi-join "
    "to Catalyst, so it stays a hash join, not nested-loop); both "
    "sides here are already-aggregated frames, so the join is "
    "broadcast-sized regardless of event volume.",
    tags=("join", "events"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seg = F.nullif(F.col("user_id") % 7, F.lit(3)).alias("seg")
    a = ev.groupBy(seg).agg(
        F.count(F.lit(1)).alias("n_events"), fsum("value").alias("total_value")
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(seg)
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            fsum("value").alias("purchase_value"),
        )
    )
    return a.join(
        F.broadcast(p.withColumnRenamed("seg", "pseg")),
        F.col("seg").eqNullSafe(F.col("pseg")),
    ).select("seg", "n_events", "total_value", "n_purchases", "purchase_value")
