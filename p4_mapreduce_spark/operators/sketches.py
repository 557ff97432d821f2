"""Frequency sketches: Misra-Gries heavy hitters with exact verify.

The two-phase shape every 100 TB frequent-items job wants:

1. **sketch**: each partition folds its token stream into a bounded
   Misra-Gries summary (K counters) via ``mapInPandas`` — constant
   memory per partition, one pass, no shuffle. Summaries are merged by
   the same add-then-reduce rule (Agarwal et al., "Mergeable
   Summaries", PODS'12): any item with global count > n/(K+1) is
   guaranteed to survive into the merged candidate set.
2. **verify**: the (tiny) candidate set broadcasts back against the
   stream for exact counts, so the final answer is EXACT — the sketch
   only bounds how much of the key space the second pass touches.

Because the verify pass is exact, the whole operator admits a plain
SQL oracle (GROUP BY + HAVING against the same threshold), unlike
sketch-only outputs. The eviction path (vocabulary ≫ K) is covered by
a property test with skewed synthetic data; the corpus query keeps the
guarantee trivially (its vocabulary is smaller than K) but runs the
identical code path.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fix_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

MG_CAPACITY = 63  # counters per partition summary; error <= n/(K+1)


def _mg_reduce(counters: dict[str, int], k: int) -> dict[str, int]:
    """Shrink a counter dict to <= k entries (Misra-Gries step): subtract
    the (k+1)-th largest count from all, drop non-positives."""
    if len(counters) <= k:
        return counters
    cut = sorted(counters.values(), reverse=True)[k]
    return {w: c - cut for w, c in counters.items() if c - cut > 0}


def misra_gries_candidates(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``tokens[col]``.

    Returns DataFrame[item string, mg_count bigint] — the union of the
    partition summaries (candidate superset of every item with global
    frequency > n/(k+1); counts are lower bounds, not exact).
    """

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            # batch-merge: add the batch's exact counts, then reduce —
            # the mergeable-summaries rule, O(K log K) per batch instead
            # of per-row branching
            for w, c in pdf[col].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            counters = _mg_reduce(counters, k)
        yield pd.DataFrame(
            {"item": list(counters), "mg_count": list(counters.values())}
        )

    return tokens.mapInPandas(sketch, schema="item string, mg_count bigint")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("word")
    )


@register(
    "heavy_hitters_words",
    oracle=f"""
    WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS word
        FROM documents
    )
    SELECT word, count(*) AS n FROM w GROUP BY word
    HAVING count(*) >= (SELECT count(*) FROM w) // {MG_CAPACITY + 1} + 1
    """,
    doc=f"Heavy-hitter words (count > n/{MG_CAPACITY + 1}): bounded-"
    "memory Misra-Gries summaries per partition (mapInPandas, one pass, "
    "no shuffle), merged candidates broadcast back for an exact count "
    "— so the result is exact and SQL-oracled even though the first "
    "pass is a sketch. At 100 TB the candidate set is K items per "
    "partition summary at most; only those keys pay for a second pass.",
    headline=True,
    tags=("sketch", "text", "aggregation"),
)
def heavy_hitters_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)
    # Threshold as a lazy 1-row frame crossJoin-broadcast into the final
    # filter (the pmi_collocations pattern) — no eager .count() action in
    # the query builder, and the exact-verify pass is the only second
    # corpus scan (sketch + verify, not count + sketch + verify).
    threshold = toks.agg(
        (F.floor(F.count(F.lit(1)) / F.lit(MG_CAPACITY + 1)) + 1).alias(
            "threshold"
        )
    )
    candidates = (
        misra_gries_candidates(toks, "word", MG_CAPACITY)
        .select(F.col("item").alias("word"))
        .distinct()
    )
    return (
        toks.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(threshold))
        .where(F.col("n") >= F.col("threshold"))
        .select("word", "n")
    )


# Bloom filter geometry: m bits packed 32 per word (staying off the
# bigint sign bit keeps the shift/mask arithmetic identical in both
# engines), k independent md5-derived probe positions per key.
_BLOOM_M = 16384
_BLOOM_K = 4
_BLOOM_WORD = 32


@register(
    "bloom_filter_membership",
    oracle=f"""
    WITH members AS (
        SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0
    ),
    bits AS (
        SELECT CAST(CAST(CONCAT('0x', substr(md5(CAST(key AS VARCHAR)
                    || ':' || CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % {_BLOOM_M} AS BIGINT) AS pos
        FROM members, unnest(range({_BLOOM_K})) AS t(i)
    ),
    filt AS (
        SELECT pos // {_BLOOM_WORD} AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BLOOM_WORD} AS INTEGER))
                   AS mask
        FROM bits GROUP BY 1
    ),
    probes AS (
        SELECT c_custkey AS key, (c_acctbal > 0) AS is_member FROM customer
    ),
    ppos AS (
        SELECT key, is_member,
               CAST(CAST(CONCAT('0x', substr(md5(CAST(key AS VARCHAR)
                    || ':' || CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % {_BLOOM_M} AS BIGINT) AS pos
        FROM probes, unnest(range({_BLOOM_K})) AS t(i)
    ),
    tested AS (
        SELECT key, is_member,
               bool_and((coalesce(mask, 0)
                         & (CAST(1 AS BIGINT)
                            << CAST(pos % {_BLOOM_WORD} AS INTEGER))) <> 0)
                   AS bloom_hit
        FROM ppos LEFT JOIN filt ON pos // {_BLOOM_WORD} = word
        GROUP BY 1, 2
    )
    SELECT count(*) AS n_probes,
           CAST(count(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (WHERE bloom_hit) AS BIGINT) AS n_hits,
           CAST(count(*) FILTER (WHERE is_member AND NOT bloom_hit)
                AS BIGINT) AS n_missed_members,
           CAST(count(*) FILTER (WHERE bloom_hit AND NOT is_member)
                AS BIGINT) AS n_false_pos,
           {fix_sql("count(*) FILTER (WHERE bloom_hit AND NOT is_member)"
                    " / CAST(greatest(count(*) FILTER (WHERE NOT is_member),"
                    " 1) AS DOUBLE)", 6)} AS fpr
    FROM tested
    """,
    doc=f"Bloom-filter membership with a measured false-positive "
    f"audit: a {_BLOOM_M}-bit / {_BLOOM_K}-hash filter built over the "
    "positive-balance customers as a RELATIONAL bitmap — md5-derived "
    "bit positions bit_or-aggregated into 32-bits-per-word rows (the "
    "mergeable representation: partition filters OR together "
    "associatively, which is why Bloom filters are THE runtime "
    "semi-join prune at 100 TB — ship the 2 KiB word table, not the "
    "key set). Every customer then probes the filter: zero false "
    "negatives (structural guarantee, emitted as n_missed_members "
    "for the oracle to pin at 0) and the measured FPR on true "
    "negatives. Scale shape: build = one bounded aggregation "
    f"(<= {_BLOOM_M // _BLOOM_WORD} word rows) broadcast to the "
    "probe scan; probe = per-row hash arithmetic + a bounded "
    "broadcast join; one bounded rollup. All arithmetic is integer "
    "(md5 hex -> positions -> shifts/masks) — deterministic in both "
    "engines by construction.",
    headline=True,
    tags=("sketch", "join", "hash"),
)
def bloom_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.functions.deterministic import fix

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")

    def pos_col() -> "F.Column":
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("key").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint") % _BLOOM_M

    members = cust.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("key")
    )
    bits = members.select(
        "key", F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i")
    ).select(pos_col().alias("pos"))
    filt = bits.groupBy(
        F.expr(f"cast(pos div {_BLOOM_WORD} as bigint)").alias("word")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(cast(1 as bigint),"
            f" cast(pos % {_BLOOM_WORD} as int)))"
        ).alias("mask")
    )
    ppos = (
        cust.select(
            F.col("c_custkey").alias("key"),
            (F.col("c_acctbal") > 0).alias("is_member"),
        )
        .select(
            "key",
            "is_member",
            F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("i"),
        )
        .select("key", "is_member", pos_col().alias("pos"))
    )
    hit = (
        F.expr(
            f"coalesce(mask, cast(0 as bigint))"
            f" & shiftleft(cast(1 as bigint), cast(pos % {_BLOOM_WORD} as int))"
        )
        != 0
    )
    tested = (
        ppos.join(
            F.broadcast(filt),
            F.expr(f"cast(pos div {_BLOOM_WORD} as bigint)") == F.col("word"),
            "left",
        )
        .select("key", "is_member", hit.alias("h"))
        .groupBy("key", "is_member")
        .agg(F.bool_and("h").alias("bloom_hit"))
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return tested.agg(
        F.count(F.lit(1)).alias("n_probes"),
        cnt(F.col("is_member")).alias("n_members"),
        cnt(F.col("bloom_hit")).alias("n_hits"),
        cnt(F.col("is_member") & ~F.col("bloom_hit")).alias("n_missed_members"),
        cnt(F.col("bloom_hit") & ~F.col("is_member")).alias("n_false_pos"),
        fix(
            cnt(F.col("bloom_hit") & ~F.col("is_member"))
            / F.greatest(cnt(~F.col("is_member")), F.lit(1)).cast("double"),
            6,
        ).alias("fpr"),
    )


# Count-Min geometry: d independent rows of w counters. Overestimate
# per row is <= N/w in expectation; the min over d rows makes a large
# error exponentially unlikely.
_CMS_W = 1024
_CMS_D = 4
_CMS_PROBE_K = 10


@register(
    "countmin_sketch_estimates",
    oracle=f"""
    WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS word
        FROM documents
    ),
    counters AS (
        SELECT d,
               CAST(CAST(CONCAT('0x', substr(md5(word || '#'
                        || CAST(d AS VARCHAR)), 1, 8)) AS UBIGINT)
                    % {_CMS_W} AS BIGINT) AS pos,
               count(*) AS c
        FROM w, unnest(range({_CMS_D})) AS t(d)
        GROUP BY 1, 2
    ),
    exact AS (SELECT word, count(*) AS exact_n FROM w GROUP BY 1),
    probes AS (
        SELECT word, exact_n FROM exact
        ORDER BY exact_n DESC, word LIMIT {_CMS_PROBE_K}
    ),
    est AS (
        SELECT p.word, p.exact_n, min(c.c) AS cms_est
        FROM probes p, unnest(range({_CMS_D})) AS t(d)
        JOIN counters c
          ON c.d = t.d
         AND c.pos = CAST(CAST(CONCAT('0x', substr(md5(p.word || '#'
                          || CAST(t.d AS VARCHAR)), 1, 8)) AS UBIGINT)
                          % {_CMS_W} AS BIGINT)
        GROUP BY 1, 2
    )
    SELECT word, exact_n, cms_est,
           CAST(cms_est - exact_n AS BIGINT) AS overestimate,
           (cms_est >= exact_n) AS never_underestimates
    FROM est
    """,
    doc=f"Count-Min sketch with an exact-verify audit: a "
    f"{_CMS_D}x{_CMS_W} counter grid built as a RELATIONAL aggregate "
    "(md5-derived positions, map-side-combined groupBy bounded at "
    f"{_CMS_D * _CMS_W} rows — the mergeable representation: "
    "partition grids ADD elementwise, which is what makes CMS the "
    "streaming/distributed frequency sketch), probed for the exact "
    f"top-{_CMS_PROBE_K} words. Emits estimate vs exact count, the "
    "overestimate, and the structural never-underestimates verdict "
    "(CMS error is one-sided by construction — pinned per row). "
    "Completes the sketch family: Misra-Gries (candidates), HLL "
    "(distinct), Bloom (membership), CMS (point frequency). Scale "
    "shape: the counter aggregation is the only corpus-sized step "
    f"(tokens x {_CMS_D}, map-side combined to the bounded grid); "
    "probes ride TakeOrderedAndProject; estimates join the broadcast "
    "grid. All integer arithmetic.",
    tags=("sketch", "text", "aggregation"),
)
def countmin_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens(spark, sf_dir)

    def pos(word_col: "F.Column", d_col: "F.Column") -> "F.Column":
        return F.conv(
            F.substring(
                F.md5(F.concat(word_col, F.lit("#"), d_col.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint") % _CMS_W

    counters = (
        toks.select(
            "word",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
        )
        .select("d", pos(F.col("word"), F.col("d")).alias("pos"))
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(
        F.col("exact_n").desc(), "word"
    ).limit(_CMS_PROBE_K)
    est = (
        probes.select(
            "word",
            "exact_n",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
        )
        .withColumn("pos", pos(F.col("word"), F.col("d")))
        .join(F.broadcast(counters), ["d", "pos"])
        .groupBy("word", "exact_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "word",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias(
            "overestimate"
        ),
        (F.col("cms_est") >= F.col("exact_n")).alias("never_underestimates"),
    )


# ---------------------------------------------------------------------------
# r10: native Spark 4 approx_top_k audited against the exact arm
# ---------------------------------------------------------------------------

_ATK_K = 8  # exact side: safely inside any count-tie boundary
_ATK_SKETCH_K = 20  # sketch side: super-set so boundary ties can't matter


@register(
    "approx_topk_words_audit",
    oracle=f"""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (
        SELECT word, CAST(count(*) AS BIGINT) AS exact_count
        FROM w WHERE word <> '' GROUP BY word
    ),
    top8 AS (
        SELECT word, exact_count FROM c
        ORDER BY exact_count DESC, word LIMIT {_ATK_K}
    )
    SELECT word, exact_count,
           exact_count AS sketch_count,
           TRUE AS in_sketch,
           TRUE AS counts_match
    FROM top8
    """,
    doc="The native Spark 4 approx_top_k sketch audited against the "
    "exact arm (the Misra-Gries/HLL/CMS audit recipe applied to the "
    f"built-in): the exact top-{_ATK_K} words (deterministic count-"
    "desc, word-asc order — chosen INSIDE any count-tie boundary, "
    f"because the corpus ties exactly at rank 10/11) look themselves "
    f"up in the sketch's top-{_ATK_SKETCH_K} superset and report "
    "membership + count-equality verdicts. The corpus vocabulary is "
    "far below the sketch's maxItemsTracked, so the sketch's counts "
    "are structurally exact and the oracle pins both verdicts TRUE "
    "with sketch_count == exact_count — any future sketch deviation "
    "hash-mismatches. Never trusts the sketch's own boundary "
    "ordering (ties there are engine-internal). Scale shape: the "
    "sketch arm is ONE mergeable aggregation (the 100 TB path); the "
    "exact arm exists only to score it; the lookup join broadcasts "
    f"{_ATK_SKETCH_K} rows.",
    tags=("sketch", "aggregation", "audit"),
)
def approx_topk_words_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("word")
    )
    exact_top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("word"))
        .limit(_ATK_K)
    )
    sk = (
        words.agg(
            F.expr(f"approx_top_k(word, {_ATK_SKETCH_K})").alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("word"),
            F.col("e.count").cast("bigint").alias("sketch_count"),
        )
    )
    return exact_top.join(F.broadcast(sk), "word", "left").select(
        "word",
        "exact_count",
        F.coalesce(F.col("sketch_count"), F.lit(-1).cast("bigint")).alias(
            "sketch_count"
        ),
        F.col("sketch_count").isNotNull().alias("in_sketch"),
        (F.col("sketch_count") == F.col("exact_count")).alias("counts_match"),
    )
