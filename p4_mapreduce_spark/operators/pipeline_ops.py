"""Training-data pipeline operators: chunking, redaction, split assignment.

The ops between "raw corpus" and "training batches" that a 100 TB text
pipeline runs after dedup/quality filtering:

- **chunking**: fixed-size token windows with overlap (context-length
  packing). Pure array arithmetic per row — no shuffle, no Python.
- **redaction**: pattern-based scrubbing (PII-ish classes) via RE2-
  compatible regexes that behave identically in both engines.
- **split assignment**: content-hash buckets → train/val/test. Hash-mod
  (not random): reproducible across runs, retries, and engines, and
  documents never migrate between splits when the corpus grows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.functions.deterministic import fix_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap


@register(
    "text_chunking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(t[s : s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text,
           CAST(least({CHUNK_TOKENS}, len(t) - s + 1) AS INTEGER) AS n_tokens
    FROM toks, unnest(generate_series(1, greatest(len(t), 1), {CHUNK_STRIDE})) AS g(s)
    WHERE len(t) >= s
    """,
    doc=f"Context-window chunking: {CHUNK_TOKENS}-token chunks with "
    f"{CHUNK_TOKENS - CHUNK_STRIDE}-token overlap (stride {CHUNK_STRIDE}) "
    "— per-row array slicing, zero shuffle, the packing step before "
    "tokenizer/batch assembly.",
    tags=("text", "pipeline"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ", -1).alias("t"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = toks.select(
        "doc_id", "t", F.explode(starts).alias("s")
    ).where(F.size("t") >= F.col("s"))
    return exploded.select(
        "doc_id",
        ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.array_join(F.slice("t", F.col("s"), CHUNK_TOKENS), " ").alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("s") + 1)
        .cast("int")
        .alias("n_tokens"),
    )


@register(
    "pii_redaction",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   text || ' contact id ' || CAST(doc_id * 7919 AS VARCHAR)
                        || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com',
                   '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
               '[0-9]+', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(
               text || ' contact id ' || CAST(doc_id * 7919 AS VARCHAR)
                    || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com',
               '[0-9]+')) AS INTEGER) AS n_number_runs
    FROM documents
    """,
    doc="PII-style redaction: email then digit-run scrubbing with "
    "RE2-compatible patterns (the corpus has no PII, so a deterministic "
    "synthetic suffix exercises both classes).",
    tags=("text", "pipeline"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact id "),
        (F.col("doc_id") * 7919).cast("string"),
        F.lit(" mail user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    emails_gone = F.regexp_replace(enriched, r"[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>")
    return docs.select(
        "doc_id",
        F.regexp_replace(emails_gone, r"[0-9]+", "<NUM>").alias("redacted"),
        F.size(F.regexp_extract_all(enriched, F.lit(r"[0-9]+"), 0)).alias(
            "n_number_runs"
        ),
    )


@register(
    "train_val_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id,
               CASE WHEN strpos('0123456789abcdef',
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 13
                    THEN 'train'
                    WHEN strpos('0123456789abcdef',
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 15
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, count(*) AS n_docs,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM assigned GROUP BY split
    """,
    doc="Deterministic train/val/test assignment by content-hash bucket "
    "(~81/13/6): stable across runs and corpus growth, unlike "
    "randomSplit. Output: per-split counts.",
    tags=("pipeline", "sampling"),
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    )
    split = (
        F.when(nibble <= 13, "train").when(nibble <= 15, "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# Weighted sampling (Efraimidis & Spirakis 2006, algorithm A-ES): the
# distributed weighted-reservoir primitive — draw u ~ U(0,1) per row,
# rank by u^(1/w); the top-k IS a weight-proportional sample without
# replacement, and "top-k by key" is embarrassingly parallel +
# mergeable, which is why it is THE cluster-scale weighted sampler.
_AES_K = 25


@register(
    "weighted_sample_aes",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, n_tokens,
               {fix_sql(f'''floor(ln((CAST(CAST(CONCAT('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                        AS UBIGINT) AS DOUBLE) + 0.5) / {float(2**48)})
                    * 1000000.0 + 0.5) / 1000000.0 / n_tokens''', 6)}
                   AS sample_key
        FROM t WHERE n_tokens > 0
    )
    SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, sample_key,
           CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT *, row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rk
        FROM keyed
    ) WHERE rk <= {_AES_K}
    """,
    doc=f"Deterministic weighted sampling without replacement "
    f"(Efraimidis-Spirakis A-ES): top-{_AES_K} documents by "
    "ln(u)/weight with weight = token count and u a hash-uniform "
    "draw from md5(doc_id) — selection probability proportional to "
    "length, yet fully reproducible across runs, retries, and "
    "engines (no rand()). The top-k-by-key formulation is what makes "
    "A-ES the cluster-scale weighted sampler: per-partition heaps "
    "merge associatively, so the plan is a single scan into "
    "TakeOrderedAndProject — no shuffle of the corpus, no global "
    "sort. Determinism: u is an exact dyadic rational (12 hex "
    "nibbles / 2^48, +0.5 to dodge ln(0)), ln is floor-normalized at "
    "1e-6 before the weight division (the engine-divergent-transcendental "
    "rule), and the final key is re-fixed at 1e-6 with doc_id "
    "tie-break.",
    tags=("pipeline", "sampling"),
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from p4_mapreduce_spark.functions.deterministic import fix

    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " ", -1), lambda x: x != ""))
    t = docs.select("doc_id", n_tokens.alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(2**48))
    key = fix(fix(F.log(u), 6) / F.col("n_tokens"), 6)
    keyed = t.select("doc_id", "n_tokens", key.alias("sample_key"))
    order = [F.col("sample_key").desc(), F.col("doc_id")]
    top = keyed.orderBy(*order).limit(_AES_K)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "sample_key",
            F.col("rk").cast("int").alias("rk"),
        )
    )


# Crude balance gate for the split audit: a hash split is declared
# balanced when chi2 <= 2 per degree of freedom (E[chi2] = df under
# independence; 2x leaves headroom without hiding real skew).
_BALANCE_CHI2_PER_DF_MICRO = 2_000_000

_SPLIT_CASE_SQL = """CASE WHEN strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 13
           THEN 'train'
           WHEN strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 15
           THEN 'val'
           ELSE 'test' END"""


@register(
    "split_balance_audit",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang, {_SPLIT_CASE_SQL} AS split FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM assigned),
    ms AS (SELECT split, count(*) AS ns FROM assigned GROUP BY split),
    ml AS (SELECT lang, count(*) AS nl FROM assigned GROUP BY lang),
    nlang AS (SELECT count(*) AS n_langs FROM ml),
    obs AS (
        SELECT split, lang, count(*) AS o FROM assigned GROUP BY split, lang
    ),
    cells AS (
        SELECT ms.split, ms.ns, ml.nl, coalesce(obs.o, 0) AS o
        FROM ms CROSS JOIN ml
        LEFT JOIN obs ON obs.split = ms.split AND obs.lang = ml.lang
    ),
    contrib AS (
        SELECT split, ns,
               CAST(floor((o - ns * nl / n) * (o - ns * nl / n)
                          / (ns * nl / n) * 1000000.0 + 0.5) AS BIGINT)
                   AS cm
        FROM cells CROSS JOIN tot
    )
    SELECT c.split,
           CAST(c.ns AS BIGINT) AS n_docs,
           CAST(nlang.n_langs AS INTEGER) AS n_langs,
           CAST(sum(cm) AS BIGINT) AS chi2_micro,
           sum(cm) <= {_BALANCE_CHI2_PER_DF_MICRO} * (nlang.n_langs - 1)
               AS balanced
    FROM contrib c CROSS JOIN nlang
    GROUP BY c.split, c.ns, nlang.n_langs
    """,
    doc="Split distribution-drift audit: chi-square independence test "
    "of the language distribution across the hash-assigned train/val/"
    "test splits (the check a 100 TB pipeline runs before trusting a "
    "held-out set — a skewed split silently biases every eval). "
    "Observed (split, lang) cells — INCLUDING structurally-zero ones, "
    "built from the marginal cross product — against the independence "
    "expectation ns*nl/n; per-cell contributions are floor-quantized "
    "to bigint micros so the per-split chi2 sum is exact in any "
    "reduction order, and the balanced verdict gates chi2 at 2 per "
    "degree of freedom. Scale shape (r13 fold): ONE corpus scan into "
    "the (split, lang) contingency table — splits x langs rows, "
    "lazily localCheckpoint-ed under the stagemat size gate — and "
    "every marginal (per-split, per-lang, grand total, lang count) "
    "is derived from THAT bounded frame instead of re-scanning the "
    "corpus per marginal (the r10 shape printed 5 documents scans). "
    "The 1-row total and the langs-count frame ride broadcast cross "
    "joins.",
    tags=("pipeline", "quality", "stats"),
)
def split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.stagemat import stage_ck, table_bytes

    docs = load(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    )
    split = (
        F.when(nibble <= 13, "train").when(nibble <= 15, "val").otherwise("test")
    )
    assigned = docs.select(split.alias("split"), "lang")
    # the contingency table is the ONLY corpus-wide aggregation; it is
    # bounded (splits x langs rows), so every marginal derives from it
    obs = stage_ck(
        assigned.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("o")),
        src_bytes=table_bytes(sf_dir),
    )
    tot = obs.agg(F.sum("o").cast("double").alias("n"))
    ms = obs.groupBy("split").agg(F.sum("o").alias("ns"))
    ml = obs.groupBy("lang").agg(F.sum("o").alias("nl"))
    nlang = ml.agg(F.count(F.lit(1)).alias("n_langs"))
    cells = (
        ms.crossJoin(F.broadcast(ml))
        .join(obs, ["split", "lang"], "left")
        .select(
            "split", "ns", "nl", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    exp = F.col("ns") * F.col("nl") / F.col("n")
    cm = F.floor(
        (F.col("o") - exp) * (F.col("o") - exp) / exp * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    contrib = cells.crossJoin(F.broadcast(tot)).select(
        "split", "ns", cm.alias("cm")
    )
    return (
        contrib.crossJoin(F.broadcast(nlang))
        .groupBy("split", "ns", "n_langs")
        .agg(F.sum("cm").alias("chi2_micro"))
        .select(
            "split",
            F.col("ns").cast("bigint").alias("n_docs"),
            F.col("n_langs").cast("int").alias("n_langs"),
            F.col("chi2_micro").cast("bigint").alias("chi2_micro"),
            (
                F.col("chi2_micro")
                <= F.lit(_BALANCE_CHI2_PER_DF_MICRO)
                * (F.col("n_langs") - 1)
            ).alias("balanced"),
        )
    )


# out of 256 hash buckets: upsample src0/src1, downsample the long tail
_MIX_WEIGHTS = {"src0": 256, "src1": 192, "src2": 128, "src3": 64}
_MIX_DEFAULT = 32


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE {arms} ELSE {_MIX_DEFAULT} END"


@register(
    "domain_mixture_sample",
    oracle=f"""
    WITH scored AS (
        SELECT source, doc_id,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket,
               {_mix_case_sql()} AS weight
        FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN bucket < weight THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           min(CASE WHEN bucket < weight THEN doc_id END) AS min_kept_doc_id,
           max(CASE WHEN bucket < weight THEN doc_id END) AS max_kept_doc_id
    FROM scored GROUP BY source ORDER BY source
    """,
    doc="Domain-mixture sampling: per-source target rates applied as "
    "content-hash bucket thresholds (256 md5 buckets) — the LLM-corpus "
    "re-weighting step. Hash-threshold (not random) keeps the sample "
    "reproducible across runs/engines and monotone under corpus growth "
    "(a kept doc stays kept when rates rise). One scan, one shuffle "
    "(the per-source rollup); the sampling itself is a stateless "
    "per-row filter, so at 100 TB it pipelines with the scan.",
    tags=("pipeline", "sampling"),
)
def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hexpos = lambda i: (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), i, 1),
        )
        - 1
    )
    bucket = hexpos(1) * 16 + hexpos(2)
    weight = F.lit(_MIX_DEFAULT)
    for s, w in sorted(_MIX_WEIGHTS.items()):
        weight = F.when(F.col("source") == s, w).otherwise(weight)
    kept = bucket < weight
    return (
        docs.select("source", "doc_id", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.min(F.when(F.col("kept"), F.col("doc_id"))).alias("min_kept_doc_id"),
            F.max(F.when(F.col("kept"), F.col("doc_id"))).alias("max_kept_doc_id"),
        )
        .orderBy("source")
    )


@register(
    "data_quality_audit",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name, count(*) AS n_violations
    FROM lineitem WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem_orphan_partkey', count(*)
    FROM lineitem WHERE NOT EXISTS (
        SELECT 1 FROM part WHERE p_partkey = l_partkey)
    UNION ALL
    SELECT 'orders_orphan_custkey', count(*)
    FROM orders WHERE NOT EXISTS (
        SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'lineitem_bad_values',
           CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                           OR l_extendedprice <= 0.0 OR l_quantity <= 0.0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'documents_empty_text',
           CAST(sum(CASE WHEN text IS NULL OR len(text) = 0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents
    """,
    doc="Pre-training data-quality audit: referential integrity "
    "(anti-join counts: lineitem→orders, lineitem→part, "
    "orders→customer) and value-range / empty-text checks, one row per "
    "check. Value checks fuse into a single conditional-sum pass per "
    "table; dim-side anti joins broadcast, the fact-fact orphan check "
    "shuffles once on the key.",
    tags=("pipeline", "join", "aggregation"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    row = lambda name, df: df.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check_name"), "n_violations"
    )
    orphan_order = row(
        "lineitem_orphan_orderkey",
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
    )
    orphan_part = row(
        "lineitem_orphan_partkey",
        li.join(
            F.broadcast(load(spark, sf_dir, "part")),
            li.l_partkey == F.col("p_partkey"),
            "left_anti",
        ),
    )
    orphan_cust = row(
        "orders_orphan_custkey",
        orders.join(
            F.broadcast(load(spark, sf_dir, "customer")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        ),
    )
    bad_values = li.agg(
        F.sum(
            F.when(
                (F.col("l_discount") < 0.0)
                | (F.col("l_discount") > 1.0)
                | (F.col("l_extendedprice") <= 0.0)
                | (F.col("l_quantity") <= 0.0),
                1,
            ).otherwise(0)
        ).alias("n_violations")
    ).select(F.lit("lineitem_bad_values").alias("check_name"), "n_violations")
    empty_text = (
        load(spark, sf_dir, "documents")
        .agg(
            F.sum(
                F.when(
                    F.col("text").isNull() | (F.length("text") == 0), 1
                ).otherwise(0)
            ).alias("n_violations")
        )
        .select(F.lit("documents_empty_text").alias("check_name"), "n_violations")
    )
    return orphan_order.unionAll(orphan_part).unionAll(orphan_cust).unionAll(
        bad_values
    ).unionAll(empty_text)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key: multi-dimensional data layout
# ---------------------------------------------------------------------------

_MORTON_BITS = 8
_MORTON_PRICE_STEP = 2000.0


def _morton_spark(bx: str, by: str) -> str:
    """Spark-SQL bit interleave of two 8-bit ints (x even bits, y odd)."""
    terms = []
    for i in range(_MORTON_BITS):
        terms.append(f"shiftleft((shiftright({bx}, {i}) & 1), {2 * i})")
        terms.append(f"shiftleft((shiftright({by}, {i}) & 1), {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _morton_duck(bx: str, by: str) -> str:
    """DuckDB twin of :func:`_morton_spark` (operator spellings differ)."""
    terms = []
    for i in range(_MORTON_BITS):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_BX = f"least(CAST(floor(o_totalprice / {_MORTON_PRICE_STEP}) AS INTEGER), 255)"
_BY = "CAST(o_custkey % 256 AS INTEGER)"


@register(
    "zorder_cluster_key",
    oracle=f"""
    WITH coded AS (
        SELECT CAST({_morton_duck(_BX, _BY)} AS BIGINT) AS morton
        FROM orders
    )
    SELECT morton // 1024 AS z_block,
           count(*) AS n_orders,
           min(morton) AS z_min,
           max(morton) AS z_max
    FROM coded GROUP BY z_block
    """,
    doc="Z-order (Morton) clustering key over two order dimensions "
    "(price bucket × customer bucket), interleaved bit-by-bit with "
    "pure shift/mask arithmetic, rolled up per 1024-code block. This "
    "is the layout key behind multi-dimensional data skipping: write "
    "the table sorted by the code (repartitionByRange + "
    "sortWithinPartitions) and min/max file stats prune scans on "
    "EITHER dimension — the Delta/Iceberg OPTIMIZE ZORDER recipe, "
    "computed engine-side with no UDF.",
    tags=("layout", "zorder", "aggregation"),
)
def zorder_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    morton = F.expr(_morton_spark(_BX, _BY)).cast("bigint")
    return (
        o.select(morton.alias("morton"))
        .select(F.expr("morton div 1024").alias("z_block"), "morton")
        .groupBy("z_block")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("morton").alias("z_min"),
            F.max("morton").alias("z_max"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end corpus pipeline: quality filter → exact dedup → split
# ---------------------------------------------------------------------------

_E2E_QUALITY_MIN = 0.5


def _e2e_oracle() -> str:
    from p4_mapreduce_spark.functions.deterministic import fix_sql
    from p4_mapreduce_spark.operators.text_analysis import _QUALITY_SQL

    return f"""
    WITH good AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
        WHERE {fix_sql(_QUALITY_SQL, 6)} >= {_E2E_QUALITY_MIN}
    ),
    deduped AS (
        SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
        FROM (SELECT doc_id, sha256(text) AS content_hash, n_tokens FROM good)
        GROUP BY content_hash
    ),
    assigned AS (
        SELECT CASE WHEN strpos('0123456789abcdef',
                               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 13
                    THEN 'train'
                    WHEN strpos('0123456789abcdef',
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 15
                    THEN 'val'
                    ELSE 'test' END AS split,
               n_tokens
        FROM deduped
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY split
    """


@register(
    "pipeline_end_to_end",
    oracle=_e2e_oracle(),
    doc=f"End-to-end corpus preparation in ONE declarative plan: quality "
    f"filter (score >= {_E2E_QUALITY_MIN}, same normalized heuristic as "
    "text_quality_score) → exact content dedup (keep min doc_id per "
    "sha256) → deterministic hash split (same buckets as "
    "train_val_split) → per-split doc/token counts. Because the whole "
    "pipeline is one Catalyst plan, the quality filter fuses into the "
    "scan, dedup is the only wide shuffle, and the split assignment is "
    "a free projection — the composition costs what its most expensive "
    "stage costs, which is how a 100 TB daily corpus build should be "
    "written (not as N materialized intermediate jobs).",
    tags=("pipeline", "dedup", "composite"),
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.functions.deterministic import fix

    docs = load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[^a-z0-9 ]"), 0)
    )
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    length_score = F.when(n_chars >= 100, F.lit(1.0)).otherwise(
        n_chars / F.lit(100.0)
    )
    quality = fix(length_score * (F.lit(1.0) - punct_ratio), 6)
    good = docs.where(quality >= _E2E_QUALITY_MIN)
    deduped = (
        good.select(
            "doc_id",
            F.sha2("text", 256).alias("content_hash"),
            F.size(F.split("text", " ", -1)).alias("n_tokens"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_tokens").alias("n_tokens"),
        )
    )
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    )
    split = (
        F.when(nibble <= 13, "train").when(nibble <= 15, "val").otherwise("test")
    )
    return (
        deduped.select(split.alias("split"), "n_tokens")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )




@register(
    "doc_length_band_filter",
    oracle="""
    WITH bands AS (
        SELECT floor(quantile_cont(CAST(n_chars AS DOUBLE), 0.05)*10000.0+0.5)/10000.0 AS p05,
               floor(quantile_cont(CAST(n_chars AS DOUBLE), 0.95)*10000.0+0.5)/10000.0 AS p95
        FROM documents
    )
    SELECT doc_id, source, n_chars, p05, p95
    FROM documents, bands
    WHERE n_chars >= p05 AND n_chars <= p95
    """,
    doc="Length-outlier filtering, the standard corpus-cleaning step: "
    "keep documents whose length lies inside the global [p05, p95] "
    "band. The band is a 2-double aggregate broadcast to every "
    "partition (crossJoin(broadcast(...))), so the filter costs one "
    "extra scan of nothing — no shuffle of the corpus itself. "
    "Comparing against the floor-normalized band (not the raw "
    "interpolated double) keeps the boundary decision bit-identical "
    "across engines. At 100 TB swap percentile() for "
    "approx_percentile with a 1e-4 accuracy bound; the filter plan is "
    "unchanged.",
    tags=("documents", "pipeline", "stats"),
)
def doc_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    chars = F.col("n_chars").cast("double")
    bands = docs.agg(
        (F.floor(F.percentile(chars, F.lit(0.05)) * 10000.0 + F.lit(0.5)) / 10000.0
         ).alias("p05"),
        (F.floor(F.percentile(chars, F.lit(0.95)) * 10000.0 + F.lit(0.5)) / 10000.0
         ).alias("p95"),
    )
    return (
        docs.crossJoin(F.broadcast(bands))
        .where((F.col("n_chars") >= F.col("p05")) & (F.col("n_chars") <= F.col("p95")))
        .select("doc_id", "source", "n_chars", "p05", "p95")
    )


# Temperature resampling exponent. alpha = 0.5 on purpose: the weight
# is then sqrt(share), and IEEE-754 sqrt is correctly rounded in every
# engine — bit-identical cross-engine with no ln/pow normalization
# dance. A general alpha would use pow() and need the 1e-6 ln-parity
# recipe instead.
_RESAMPLE_BUCKETS = 256


@register(
    "mixture_temperature_resample",
    oracle=f"""
    WITH hist AS (
        SELECT lang,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                   AS bucket,
               count(*) AS n
        FROM documents GROUP BY lang, bucket
    ),
    src AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_total FROM hist GROUP BY lang),
    tot AS (SELECT sum(n_total) AS n_corpus FROM src),
    w AS (
        SELECT lang, n_total,
               floor(sqrt(n_total / n_corpus) * 1000000.0 + 0.5) / 1000000.0
                   AS wgt,
               floor(n_total / n_corpus * 1000000.0 + 0.5) / 1000000.0
                   AS share_before
        FROM src CROSS JOIN tot
    ),
    m AS (
        SELECT lang, n_total, share_before,
               floor(wgt / ((SELECT floor(sum(wgt) * 1000000.0 + 0.5)
                                / 1000000.0 FROM w) * share_before)
                     * 1000000.0 + 0.5) / 1000000.0 AS mult
        FROM w
    ),
    r AS (
        SELECT lang, n_total, share_before,
               floor(mult / (SELECT max(mult) FROM m) * 1000000.0 + 0.5)
                   / 1000000.0 AS rate
        FROM m
    ),
    kept AS (
        SELECT r.lang, r.n_total, r.share_before, r.rate,
               CAST(floor(r.rate * {_RESAMPLE_BUCKETS} + 0.5) AS INTEGER)
                   AS bucket_threshold,
               CAST(coalesce(sum(CASE WHEN h.bucket <
                       floor(r.rate * {_RESAMPLE_BUCKETS} + 0.5)
                       THEN h.n END), 0) AS BIGINT) AS n_kept
        FROM r JOIN hist h USING (lang)
        GROUP BY r.lang, r.n_total, r.share_before, r.rate
    )
    SELECT lang, n_total, share_before, rate, bucket_threshold, n_kept,
           floor(n_kept * 1000000.0 / (SELECT sum(n_kept) FROM kept) + 0.5)
               / 1000000.0 AS share_after
    FROM kept ORDER BY lang
    """,
    doc="Temperature-based mixture resampling (alpha = 0.5): derive "
    "per-language acceptance rates FROM the corpus itself — target "
    "shares proportional to share^alpha (the multilingual/domain "
    "rebalancing rule), normalized so the most-upweighted source "
    "keeps everything and the rest downsample deterministically via "
    "256 md5 content-hash buckets. Unlike domain_mixture_sample "
    "(fixed hand-set rates), the rates here are data-derived, which "
    "is how production corpus mixers actually run. Scale shape: ONE "
    "scan builds a (lang x bucket) histogram (<= 256 x n_langs "
    "rows); every subsequent step — shares, sqrt weights, "
    "multipliers, rates, kept counts — runs on that tiny frame, so "
    "the 100 TB cost is exactly one map-side-combined aggregation "
    "and the per-doc keep decision replays as a stateless hash "
    "filter at materialization time. alpha = 0.5 makes the weight "
    "sqrt(share), which IEEE-754 rounds correctly in every engine — "
    "no pow/ln normalization needed.",
    tags=("pipeline", "sampling"),
)
def mixture_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from p4_mapreduce_spark.functions.deterministic import fix

    docs = load(spark, sf_dir, "documents")
    hexpos = lambda i: (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), i, 1),
        )
        - 1
    )
    bucket = hexpos(1) * 16 + hexpos(2)
    # r11 scan fold: hist is (lang x 256)-bounded and feeds both the
    # rate-fitting chain (whose w/m/r stages each fan out twice) and
    # the final keep rollup — uncheckpointed, the plan re-printed the
    # corpus scan 9 times; one lazy localCheckpoint makes it single.
    hist = (
        docs.select("lang", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    ).localCheckpoint(eager=False)
    src = hist.groupBy("lang").agg(F.sum("n").alias("n_total"))
    tot = src.agg(F.sum("n_total").alias("n_corpus"))
    w = src.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_total",
        fix(F.sqrt(F.col("n_total") / F.col("n_corpus")), 6).alias("wgt"),
        fix(F.col("n_total") / F.col("n_corpus"), 6).alias("share_before"),
    )
    sumw = w.agg(fix(F.sum("wgt"), 6).alias("sum_wgt"))
    m = w.crossJoin(F.broadcast(sumw)).select(
        "lang",
        "n_total",
        "share_before",
        fix(
            F.col("wgt") / (F.col("sum_wgt") * F.col("share_before")), 6
        ).alias("mult"),
    )
    maxm = m.agg(F.max("mult").alias("max_mult"))
    r = m.crossJoin(F.broadcast(maxm)).select(
        "lang",
        "n_total",
        "share_before",
        fix(F.col("mult") / F.col("max_mult"), 6).alias("rate"),
    )
    thresh = F.floor(F.col("rate") * _RESAMPLE_BUCKETS + F.lit(0.5))
    kept = (
        r.join(hist, "lang")
        .groupBy("lang", "n_total", "share_before", "rate")
        .agg(
            F.max(thresh).cast("int").alias("bucket_threshold"),
            F.coalesce(
                F.sum(F.when(F.col("bucket") < thresh, F.col("n"))), F.lit(0)
            ).alias("n_kept"),
        )
    )
    total_kept = Window.partitionBy()
    return (
        kept.withColumn(
            "share_after",
            F.floor(
                F.col("n_kept")
                * F.lit(1000000.0)
                / F.sum("n_kept").over(total_kept)
                + F.lit(0.5)
            )
            / F.lit(1000000.0),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Corpus card: the per-cell summary every dataset release ships
# ---------------------------------------------------------------------------

_REPORT_SHORT_TOKENS = 10


@register(
    "corpus_report",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, source, text, md5(text) AS gh,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
        FROM documents
    ),
    freq AS (SELECT gh, count(*) AS copies FROM d GROUP BY gh)
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN f.copies >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_dup_docs,
           CAST(sum(CASE WHEN d.n_tokens < {_REPORT_SHORT_TOKENS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
           CAST(count(DISTINCT f.gh) AS BIGINT) AS n_distinct_texts
    FROM d JOIN freq f USING (gh)
    GROUP BY lang, source
    """,
    doc="Corpus card: the per-(lang, source) release summary — doc / "
    "token / char counts, exact-duplicate membership (docs whose "
    "md5(text) appears >= 2 times corpus-WIDE, so a cell's dup count "
    "reflects global duplication, not just intra-cell), short-doc "
    f"count (< {_REPORT_SHORT_TOKENS} tokens), and distinct-text "
    "count per cell. Scale shape: one map-side-combined hash-frequency "
    "aggregation, the aggregated one-row-per-hash frame joins back on "
    "the hash key (a boilerplate text duplicated across millions of "
    "docs costs one counter), and one partial-aggregated rollup to "
    "~|lang| x |source| cells. This is the materialized-view shape "
    "you would refresh per ingest batch at 100 TB.",
    tags=("pipeline", "aggregation", "dedup"),
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " ", -1), lambda x: x != "")
    d = docs.select(
        "lang",
        "source",
        F.md5("text").alias("gh"),
        F.length("text").alias("n_chars"),
        F.size(ws).alias("n_tokens"),
    )
    freq = d.groupBy("gh").agg(F.count(F.lit(1)).alias("copies"))
    return (
        d.join(freq, "gh")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.sum(
                F.when(F.col("copies") >= 2, 1).otherwise(0)
            ).alias("n_exact_dup_docs"),
            F.sum(
                F.when(F.col("n_tokens") < _REPORT_SHORT_TOKENS, 1).otherwise(
                    0
                )
            ).alias("n_short_docs"),
            F.countDistinct("gh").alias("n_distinct_texts"),
        )
    )


# Rendezvous (highest-random-weight) sharding: shard counts before and
# after adding one shard. HRW's contract is minimal disruption — only
# ~1/(S+1) of keys move when a shard joins, vs ~all keys under mod-S.
_HRW_SHARDS = 8


@register(
    "rendezvous_shard_assign",
    oracle=f"""
    WITH a AS (
        SELECT doc_id,
               arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(s AS VARCHAR))) AS shard8
        FROM documents, unnest(range({_HRW_SHARDS})) AS t(s)
        GROUP BY doc_id
    ),
    b AS (
        SELECT doc_id,
               arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(s AS VARCHAR))) AS shard9
        FROM documents, unnest(range({_HRW_SHARDS + 1})) AS t(s)
        GROUP BY doc_id
    )
    SELECT CAST(shard8 AS INTEGER) AS shard,
           count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE shard8 <> shard9) AS BIGINT)
               AS n_moved,
           {fix_sql("count(*) FILTER (WHERE shard8 <> shard9)"
                    " / CAST(count(*) AS DOUBLE)", 6)} AS moved_frac
    FROM a JOIN b USING (doc_id)
    GROUP BY shard8
    """,
    doc=f"Rendezvous (HRW) shard assignment with a stability audit: "
    f"each doc scores every shard id via md5(doc_id || ':' || s) and "
    f"joins the argmax; computed for S={_HRW_SHARDS} and "
    f"S={_HRW_SHARDS + 1} side by side, the per-shard moved_frac "
    f"verifies the HRW contract (only ~1/{_HRW_SHARDS + 1} of keys "
    "move when a shard joins — mod-hashing would move ~8/9). This is "
    "how a 100 TB pipeline assigns work/storage shards that survive "
    "elastic resizing without a global reshuffle. Scale shape: both "
    "assignments are per-row argmax folds over a literal shard list — "
    "map-only, fused into one scan, zero joins (the oracle's "
    "doc_id join is replayed in-row); the only shuffle is the final "
    f"{_HRW_SHARDS}-key rollup. Pure hex-string comparisons, no "
    "floats anywhere until the final quantized ratio.",
    tags=("pipeline", "partitioning", "hash"),
)
def rendezvous_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.functions.deterministic import fix

    def argmax_shard(n: int) -> F.Column:
        return F.expr(
            f"array_max(transform(sequence(0, {n - 1}), s -> "
            "struct(md5(concat(cast(doc_id as string), ':', "
            "cast(s as string))) AS h, s AS s))).s"
        )

    docs = load(spark, sf_dir, "documents").select(
        argmax_shard(_HRW_SHARDS).alias("shard8"),
        argmax_shard(_HRW_SHARDS + 1).alias("shard9"),
    )
    moved = F.sum((F.col("shard8") != F.col("shard9")).cast("bigint"))
    return docs.groupBy("shard8").agg(
        F.count(F.lit(1)).alias("n_docs"),
        moved.alias("n_moved"),
        fix(moved / F.count(F.lit(1)).cast("double"), 6).alias("moved_frac"),
    ).select(
        F.col("shard8").cast("int").alias("shard"),
        "n_docs",
        "n_moved",
        "moved_frac",
    )


# UniMax mixture budgeting (Chung et al. 2023): total token budget as
# a multiple of the corpus, per-source epoch cap. Greedy: visit
# sources by size ascending; each takes min(cap * its tokens, an even
# share of the remaining budget).
_UNIMAX_EPOCH_CAP = 4
_UNIMAX_BUDGET_X = 2  # budget = 2x total corpus tokens


@register(
    "unimax_mixture_budget",
    oracle=f"""
    WITH src AS (
        SELECT source,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        x -> x <> ''))) AS BIGINT) AS n_tok
        FROM documents GROUP BY source
    ),
    ranked AS (
        SELECT source, n_tok,
               CAST(row_number() OVER w AS BIGINT) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n_src,
               CAST(sum(n_tok) OVER () * {_UNIMAX_BUDGET_X} AS BIGINT)
                   AS budget,
               CAST(sum({_UNIMAX_EPOCH_CAP} * n_tok)
                    OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cap
        FROM src
        WINDOW w AS (ORDER BY n_tok, source)
    ),
    flagged AS (
        SELECT *,
               ({_UNIMAX_EPOCH_CAP} * n_tok * (n_src - rk + 1)
                <= budget - (cum_cap - {_UNIMAX_EPOCH_CAP} * n_tok))
                   AS capped
        FROM ranked
    ),
    closed AS (
        SELECT count(*) FILTER (WHERE capped) AS m,
               coalesce(CAST(sum({_UNIMAX_EPOCH_CAP} * n_tok)
                             FILTER (WHERE capped) AS BIGINT), 0)
                   AS cap_spent
        FROM flagged
    )
    SELECT source, n_tok, CAST(rk AS INTEGER) AS rk, capped,
           {fix_sql(f"CASE WHEN capped THEN "
                    f"CAST({_UNIMAX_EPOCH_CAP} * n_tok AS DOUBLE) "
                    "ELSE (budget - cap_spent)"
                    " / CAST(n_src - m AS DOUBLE) END", 6)} AS alloc_tok,
           {fix_sql(f"(CASE WHEN capped THEN "
                    f"CAST({_UNIMAX_EPOCH_CAP} * n_tok AS DOUBLE) "
                    "ELSE (budget - cap_spent)"
                    " / CAST(n_src - m AS DOUBLE) END) / n_tok", 6)}
               AS epochs,
           {fix_sql(f"(CASE WHEN capped THEN "
                    f"CAST({_UNIMAX_EPOCH_CAP} * n_tok AS DOUBLE) "
                    "ELSE (budget - cap_spent)"
                    " / CAST(n_src - m AS DOUBLE) END) / budget", 6)}
               AS weight
    FROM flagged CROSS JOIN closed
    """,
    doc=f"UniMax mixture budgeting (Chung et al. 2023): allocate a "
    f"{_UNIMAX_BUDGET_X}x-corpus token budget across sources with a "
    f"{_UNIMAX_EPOCH_CAP}-epoch repetition cap — visit sources "
    "smallest-first, each takes min(cap * its tokens, an even share "
    "of what remains); small sources hit the epoch cap, the budget "
    "they leave flows to larger ones. The greedy has a closed form "
    "(capped sources are a prefix of the size-ascending order), so "
    "it compiles to ONE windowed pass over the per-source frame — no "
    "driver loop. Scale shape: one map-side-combined corpus "
    "aggregation to per-source token counts (bounded by source "
    "cardinality); the window/closure runs on that tiny frame (the "
    "single-partition window is bounded-frame-safe). The cap "
    "comparison is multiplied through to pure bigint arithmetic — "
    "floats appear only in the final quantized allocation ratios.",
    tags=("pipeline", "mixture", "window"),
)
def unimax_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from p4_mapreduce_spark.functions.deterministic import fix

    E, BX = _UNIMAX_EPOCH_CAP, _UNIMAX_BUDGET_X
    src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.size(F.filter(F.split("text", " ", -1), lambda x: x != ""))
            ).cast("bigint").alias("n_tok")
        )
    )
    w = Window.orderBy("n_tok", "source")
    wall = Window.partitionBy()
    ranked = src.select(
        "source",
        "n_tok",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_src"),
        (F.sum("n_tok").over(wall) * BX).cast("bigint").alias("budget"),
        F.sum(F.lit(E) * F.col("n_tok"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_cap"),
    )
    flagged = ranked.withColumn(
        "capped",
        F.lit(E) * F.col("n_tok") * (F.col("n_src") - F.col("rk") + 1)
        <= F.col("budget") - (F.col("cum_cap") - F.lit(E) * F.col("n_tok")),
    )
    closed = flagged.agg(
        F.count(F.when(F.col("capped"), 1)).alias("m"),
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.lit(E) * F.col("n_tok"))), F.lit(0)
        ).cast("bigint").alias("cap_spent"),
    )
    alloc = F.when(
        F.col("capped"), (F.lit(E) * F.col("n_tok")).cast("double")
    ).otherwise(
        (F.col("budget") - F.col("cap_spent"))
        / (F.col("n_src") - F.col("m")).cast("double")
    )
    return flagged.crossJoin(F.broadcast(closed)).select(
        "source",
        "n_tok",
        F.col("rk").cast("int").alias("rk"),
        "capped",
        fix(alloc, 6).alias("alloc_tok"),
        fix(alloc / F.col("n_tok"), 6).alias("epochs"),
        fix(alloc / F.col("budget"), 6).alias("weight"),
    )


# Discrete-Laplace (two-sided geometric) mechanism: eps=1.0, so
# alpha = e^-eps and each geometric arm is floor(ln(u)/ln(alpha)).
# The uniforms here are HASH-derived (md5 of the group key + salt) so
# the whole query stays reproducible and oracle-checkable; a real
# privacy release swaps them for true randomness — the mechanism,
# sensitivity-1 count shape, and post-processing are what this
# operator pins.
_DP_EPS = 1.0


@register(
    "dp_noisy_lang_counts",
    oracle=f"""
    WITH c AS (SELECT lang, count(*) AS true_n FROM documents GROUP BY 1),
    u AS (
        SELECT lang, true_n,
               (CAST(CAST(CONCAT('0x', substr(md5(lang || ':a'), 1, 12))
                     AS UBIGINT) AS DOUBLE) + 0.5) / {float(2**48)} AS u1,
               (CAST(CAST(CONCAT('0x', substr(md5(lang || ':b'), 1, 12))
                     AS UBIGINT) AS DOUBLE) + 0.5) / {float(2**48)} AS u2
        FROM c
    )
    SELECT lang, true_n,
           CAST(floor(({fix_sql("ln(u1)", 6)}) / -{_DP_EPS}) AS BIGINT)
           - CAST(floor(({fix_sql("ln(u2)", 6)}) / -{_DP_EPS}) AS BIGINT)
               AS noise,
           greatest(true_n
                    + CAST(floor(({fix_sql("ln(u1)", 6)}) / -{_DP_EPS})
                           AS BIGINT)
                    - CAST(floor(({fix_sql("ln(u2)", 6)}) / -{_DP_EPS})
                           AS BIGINT), 0) AS noisy_n
    FROM u
    """,
    doc=f"Differentially-private count release (discrete Laplace / "
    f"two-sided geometric, eps={_DP_EPS}): per-language doc counts "
    "plus G1 - G2 noise where each geometric arm is "
    "floor(ln(u)/-eps) — the sensitivity-1 counting mechanism a "
    "pipeline uses to publish corpus composition without exposing "
    "individual membership, with max(., 0) post-processing (free "
    "under DP). The uniforms are md5-derived dyadic rationals so the "
    "query is reproducible and oracle-checkable; a production "
    "release swaps ONLY the u columns for true randomness — the "
    "mechanism shape is what this operator pins (and the noise "
    "column makes the geometric marginals testable). Scale: one "
    "map-side-combined rollup to the language frame; noise is "
    "per-group scalar math. ln floor-quantized at 1e-6 (the "
    "transcendental rule), everything after is exact integer.",
    tags=("pipeline", "privacy", "aggregation"),
)
def dp_noisy_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.functions.deterministic import fix

    c = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )

    def geo(salt: str) -> F.Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.col("lang"), F.lit(salt))), 1, 12),
            16,
            10,
        ).cast("double")
        u = (h + F.lit(0.5)) / F.lit(float(2**48))
        return F.floor(fix(F.log(u), 6) / F.lit(-_DP_EPS)).cast("bigint")

    noise = geo(":a") - geo(":b")
    return c.select(
        "lang",
        "true_n",
        noise.alias("noise"),
        F.greatest(F.col("true_n") + noise, F.lit(0)).alias("noisy_n"),
    )


# GDPR erasure-scope audit: the hash bucket of customers selected for
# deletion (13/256 ~ 5%, the same md5-bucket idiom as the split
# assignment above).
_ERASE_BUCKET = 13


@register(
    "cascade_delete_audit",
    oracle=f"""
    WITH del_cust AS (
        SELECT c_custkey FROM customer
        WHERE CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2))
                   AS UBIGINT) < {_ERASE_BUCKET}
    ),
    del_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
    )
    SELECT 'customer' AS table_name,
           (SELECT count(*) FROM del_cust) AS n_rows
    UNION ALL
    SELECT 'orders', (SELECT count(*) FROM del_orders)
    UNION ALL
    SELECT 'lineitem', (SELECT count(*) FROM lineitem
                        WHERE l_orderkey IN
                              (SELECT o_orderkey FROM del_orders))
    """,
    doc="GDPR erasure-scope audit: given a deletion cohort (hash-"
    "bucketed ~5% of customers — stand-in for a right-to-be-forgotten "
    "request list), count every row that must cascade: their orders, "
    "and those orders' lineitems. The dry-run a compliant 100 TB "
    "warehouse runs BEFORE a destructive erasure job, and the shape "
    "IS the erasure plan: each hop is a semi-join down the foreign-"
    "key chain (customer -> orders -> lineitem), map-side prunable "
    "and broadcastable when the cohort is small; counts are one "
    "rollup per table, unioned. Pure integer/hash arithmetic "
    "throughout.",
    tags=("pipeline", "join", "governance"),
)
def cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2), 16, 10
    ).cast("bigint")
    del_cust = (
        load(spark, sf_dir, "customer")
        .where(bucket < _ERASE_BUCKET)
        .select("c_custkey")
    )
    del_orders = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(del_cust),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey")
    )
    del_li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(del_orders),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    one = lambda name, df: df.agg(  # noqa: E731
        F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
    )
    return (
        one("customer", del_cust)
        .unionAll(one("orders", del_orders))
        .unionAll(one("lineitem", del_li))
    )


@register(
    "shard_manifest_checksums",
    oracle=f"""
    WITH a AS (
        SELECT doc_id, text, source,
               len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tok,
               arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':'
                              || CAST(s AS VARCHAR))) AS shard
        FROM documents, unnest(range({_HRW_SHARDS})) AS t(s)
        GROUP BY doc_id, text, source
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(CAST(CAST(CONCAT('0x',
                    substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)),
                           1, 8)) AS UBIGINT) AS BIGINT)) AS BIGINT)
               AS content_checksum
    FROM a GROUP BY shard
    """,
    doc="Per-shard dataset manifest: for every rendezvous-assigned "
    "shard, the doc count, token count, source cardinality, and an "
    "ORDER-FREE content checksum — the sum of per-document 32-bit "
    "digests of (doc_id, md5(text)), which is commutative/associative "
    "so any partitioning, retry order, or cluster size produces the "
    "same value. This is the reproducibility contract a training run "
    "publishes with its shards: re-run the pipeline, diff one row per "
    "shard, and know bit-for-bit whether the data changed — without "
    "sorting or collecting anything. 32-bit terms keep the bigint "
    "sum exact past 10^9 docs per shard. Scale shape: map-only HRW "
    "assignment + digests fused into the scan, ONE bounded "
    "groupBy(shard) rollup.",
    tags=("pipeline", "partitioning", "hash", "governance"),
)
def shard_manifest_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    shard = F.expr(
        f"array_max(transform(sequence(0, {_HRW_SHARDS - 1}), s -> "
        "struct(md5(concat(cast(doc_id as string), ':', "
        "cast(s as string))) AS h, s AS s))).s"
    )
    digest = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.md5("text")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    n_tok = F.size(F.filter(F.split("text", " ", -1), lambda x: x != ""))
    return (
        docs.select(
            shard.cast("int").alias("shard"),
            n_tok.alias("n_tok"),
            "source",
            digest.alias("digest"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("digest").cast("bigint").alias("content_checksum"),
        )
    )


# PSI binning for the numeric drift audit: fixed-width length bins
# (clamped ends) so bin membership is pure arithmetic in any dialect.
# Add-1 smoothing guards the ln(p/q) ratio in one-sided bins; bins
# empty on BOTH sides are absent and contribute exactly 0.
_PSI_BIN_W = 250
_PSI_BINS = 12


@register(
    "psi_split_drift",
    oracle=f"""
    WITH a AS (
        SELECT least(greatest(CAST(floor(n_chars / {_PSI_BIN_W}.0)
                                   AS INTEGER), 0), {_PSI_BINS - 1}) AS bin,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 13)
                   AS is_train
        FROM documents
        WHERE strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 15
    ),
    b AS (
        SELECT bin,
               CAST(1 + count(*) FILTER (WHERE is_train) AS BIGINT)
                   AS n_train,
               CAST(1 + count(*) FILTER (WHERE NOT is_train) AS BIGINT)
                   AS n_val
        FROM a GROUP BY bin
    ),
    tot AS (
        SELECT CAST(sum(n_train) AS BIGINT) AS st,
               CAST(sum(n_val) AS BIGINT) AS sv
        FROM b
    )
    SELECT bin, n_train - 1 AS n_train, n_val - 1 AS n_val,
           CAST(floor(((n_train / CAST(st AS DOUBLE))
                       - (n_val / CAST(sv AS DOUBLE)))
                      * ({fix_sql("ln((n_train / CAST(st AS DOUBLE))"
                                  " / (n_val / CAST(sv AS DOUBLE)))", 6)})
                      * 1000000000.0 + 0.5) AS BIGINT) / 1000000000.0
               AS psi_term
    FROM b CROSS JOIN tot
    """,
    doc="Population-stability-index audit between the hash-assigned "
    "train and val splits over the document-length distribution: "
    f"{_PSI_BINS} fixed-width bins, add-1-smoothed shares, per-bin "
    "(p - q) * ln(p / q) terms whose SUM is the PSI — the standard "
    "ML-ops drift number (< 0.1 stable, > 0.25 shifted), emitted as "
    "the additive decomposition so the offending bins are visible. "
    "The numeric-feature complement of split_balance_audit's "
    "categorical chi-square. For a hash split PSI ~ 0 IS the expected "
    "verdict — the audit exists to catch a buggy or non-random "
    "assignment. Scale shape: one map-side-combined rollup to the "
    "bin-bounded frame; totals re-aggregate it; fixed-width binning "
    "fuses into the scan. Shares are exact bigint ratios, ln "
    "quantized at 1e-6, terms at bigint nanos.",
    tags=("pipeline", "stats", "aggregation"),
)
def psi_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.functions.deterministic import fix

    docs = load(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    )
    a = docs.where(nibble <= 15).select(
        F.least(
            F.greatest(
                F.floor(F.col("n_chars") / float(_PSI_BIN_W)).cast("int"),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        (nibble <= 13).alias("is_train"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    b = a.groupBy("bin").agg(
        (F.lit(1) + cnt(F.col("is_train"))).cast("bigint").alias("n_train"),
        (F.lit(1) + cnt(~F.col("is_train"))).cast("bigint").alias("n_val"),
    )
    tot = b.agg(
        F.sum("n_train").cast("bigint").alias("st"),
        F.sum("n_val").cast("bigint").alias("sv"),
    )
    p = F.col("n_train") / F.col("st").cast("double")
    q = F.col("n_val") / F.col("sv").cast("double")
    term = (p - q) * fix(F.log(p / q), 6)
    return b.crossJoin(F.broadcast(tot)).select(
        "bin",
        (F.col("n_train") - 1).alias("n_train"),
        (F.col("n_val") - 1).alias("n_val"),
        (
            F.floor(term * 1000000000.0 + 0.5).cast("bigint") / 1000000000.0
        ).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Data-mixture manifest: deterministic stratified sampling for mixing
# ---------------------------------------------------------------------------

# The mixing step every training run executes between curation and
# sharding: given per-language domain weights (the DoReMi/Pile-style
# mixture config — a fixed literal here, a config table in
# production), compute each (lang, source) cell's deterministic
# hash-sampling rate and the achieved counts. All arithmetic is
# integer (ppm rates, floor division), and membership is decided by a
# 48-bit md5 prefix of the salted doc_id — so the "random" sample is
# exactly reproducible in any engine, the property a training run
# needs to re-materialize the identical mixture months later.
_MIXM_WEIGHTS = {"en": 4, "de": 2, "es": 2, "fr": 1, "zh": 1}
_MIXM_BUDGET_NUM, _MIXM_BUDGET_DEN = 1, 2  # sample half the corpus tokens
_MIXM_SALT = "mix:"


def _mixm_weight_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIXM_WEIGHTS.items())
    )
    return f"CASE {col} {cases} ELSE 1 END"


@register(
    "data_mixture_manifest",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(CONCAT('0x', substr(md5('{_MIXM_SALT}'
                    || CAST(doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
                    % 1000000 AS ticket
        FROM documents
    ),
    lang_tot AS (
        SELECT lang, {_mixm_weight_sql('lang')} AS w,
               sum(n_tokens) AS lang_tokens
        FROM d GROUP BY 1
    ),
    g AS (
        SELECT CAST(sum(lang_tokens) * {_MIXM_BUDGET_NUM}
                    // {_MIXM_BUDGET_DEN} AS BIGINT) AS budget,
               sum(w) AS wsum
        FROM lang_tot
    ),
    rates AS (
        SELECT lt.lang,
               CAST(least(1000000, ((g.budget * lt.w) // g.wsum)
                                   * 1000000 // lang_tokens)
                    AS BIGINT) AS rate_ppm
        FROM lang_tot lt CROSS JOIN g
    )
    SELECT d.lang, d.source, r.rate_ppm,
           count(*) AS n_docs,
           CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN d.ticket < r.rate_ppm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled_docs,
           CAST(sum(CASE WHEN d.ticket < r.rate_ppm
                         THEN d.n_tokens ELSE 0 END) AS BIGINT)
               AS sampled_tokens
    FROM d JOIN rates r USING (lang)
    GROUP BY 1, 2, 3
    """,
    doc="Data-mixture manifest — the domain-reweighting step between "
    "curation and sharding (the DoReMi / Pile-style mixture config "
    "applied to a curated corpus): per-language weights turn a total "
    "token budget (half the corpus here) into per-language token "
    "targets, each language's DETERMINISTIC sampling rate is the "
    "integer ppm ratio target/available capped at 1e6 (no "
    "upsampling in this op), and membership is decided by a salted "
    "48-bit md5 prefix of the doc_id mod 1e6 — a reproducible "
    "hash lottery, so the exact mixture can be re-materialized "
    "months later from the config alone, no RNG state. Output: one "
    "row per (lang, source) cell with available and achieved "
    "doc/token counts plus the cell's rate. Scale shape: one "
    "token-count scan + a language-sized aggregate (broadcast back) "
    "+ one map-side sampling predicate + one (lang, source) "
    "aggregation — no shuffle carries text; all arithmetic integer, "
    "so the oracle is exact.",
    tags=("pipeline", "text", "quality"),
)
def data_mixture_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_manifest_frame(load(spark, sf_dir, "documents"))


def mixture_manifest_frame(
    docs: DataFrame, weights: dict[str, int] | None = None
) -> DataFrame:
    """Weights-parametric core of data_mixture_manifest (production
    passes the mixture config table; the registered query fixes
    _MIXM_WEIGHTS so the oracle stays a literal). The behavioral test
    doubles one language's weight and checks rate_ppm moves exactly as
    the closed form predicts."""
    return manifest_from_units(mixture_units(docs), weights)


def mixture_ticket_col(doc_id_col: str = "doc_id"):
    """The deterministic hash-lottery ticket: salted 48-bit md5 prefix
    of the doc_id, mod 1e6 — shared by the batch manifest and the
    streaming twin so membership can never drift between them."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_MIXM_SALT), F.col(doc_id_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )


def mixture_units(docs: DataFrame) -> DataFrame:
    """Documents -> mixture UNITS: (lang, source, ticket, n_docs,
    n_tokens) rows. The batch path emits one unit per document
    (n_docs = 1); the streaming twin accumulates units pre-aggregated
    per (lang, source, ticket) — bounded by cells x 1e6 tickets
    regardless of corpus size — and both feed the same
    manifest_from_units kernel."""
    return docs.select(
        "lang",
        "source",
        mixture_ticket_col().alias("ticket"),
        F.lit(1).cast("bigint").alias("n_docs"),
        F.size(F.split("text", " ", -1)).cast("bigint").alias("n_tokens"),
    )


def manifest_from_units(
    units: DataFrame, weights: dict[str, int] | None = None
) -> DataFrame:
    """The manifest arithmetic over mixture units — ONE kernel shared
    by the batch query and the streaming state reader (integer ppm
    rates, floor division, 1e6 cap; any drift between the two paths
    would break the streaming==batch pin)."""
    if weights is None:
        weights = _MIXM_WEIGHTS
    w = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(weights.items())
        ],
        F.lit(1),
    )
    lang_tot = units.groupBy("lang").agg(
        F.first(w).alias("w"), F.sum("n_tokens").alias("lang_tokens")
    )
    g = lang_tot.agg(
        F.expr(
            f"CAST((sum(lang_tokens) * {_MIXM_BUDGET_NUM})"
            f" div {_MIXM_BUDGET_DEN} AS BIGINT)"
        ).alias("budget"),
        F.sum("w").alias("wsum"),
    )
    rates = lang_tot.crossJoin(F.broadcast(g)).select(
        "lang",
        F.least(
            F.lit(1000000).cast("bigint"),
            F.expr(
                "CAST(((budget * w) div wsum) * 1000000"
                " div lang_tokens AS BIGINT)"
            ),
        ).alias("rate_ppm"),
    )
    sampled = F.col("ticket") < F.col("rate_ppm")
    zero = F.lit(0).cast("bigint")
    return (
        units.join(F.broadcast(rates), "lang")
        .groupBy("lang", "source", "rate_ppm")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(F.when(sampled, F.col("n_docs")).otherwise(zero))
            .cast("bigint")
            .alias("n_sampled_docs"),
            F.sum(F.when(sampled, F.col("n_tokens")).otherwise(zero))
            .cast("bigint")
            .alias("sampled_tokens"),
        )
        .select(
            "lang",
            "source",
            "rate_ppm",
            "n_docs",
            "n_tokens",
            "n_sampled_docs",
            "sampled_tokens",
        )
    )


# ---------------------------------------------------------------------------
# r10: k-anonymity release audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5
_KANON_BAND = 100  # n_chars bucketing width for the quasi-identifier


@register(
    "k_anonymity_audit",
    oracle=f"""
    SELECT lang, source,
           CAST(n_chars // {_KANON_BAND} AS BIGINT) AS len_band,
           CAST(count(*) AS BIGINT) AS n_docs,
           count(*) >= {_KANON_K} AS meets_k
    FROM documents
    GROUP BY 1, 2, 3
    """,
    doc=f"k-anonymity audit (k={_KANON_K}) over the release "
    "quasi-identifier tuple (lang, source, "
    f"{_KANON_BAND}-char length band): every combination that could "
    "re-identify a contributor is counted, and groups below k are "
    "flagged — the pre-release check a dataset publisher runs next "
    "to DP noising (dp_noisy_lang_counts is the mechanism, this is "
    "the audit that says whether suppression/generalization is "
    "needed at all). One map-side-combined aggregation onto a "
    "(langs x sources x bands)-bounded frame; pure integer, "
    "exact oracle. The true 100 TB posture: quasi-identifier "
    "cardinality, not corpus size, bounds the result.",
    tags=("pipeline", "privacy", "aggregation"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            "lang",
            "source",
            F.expr(f"n_chars div {_KANON_BAND}").alias("len_band"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "lang",
            "source",
            "len_band",
            "n_docs",
            (F.col("n_docs") >= F.lit(_KANON_K)).alias("meets_k"),
        )
    )


# ---------------------------------------------------------------------------
# r11: deterministic stratified split assignment (train/val/test)
# ---------------------------------------------------------------------------

# ppt-of-1000 hash-bucket cuts: bucket < 900 -> train, < 950 -> val.
_SPLIT_CUTS = (("train", 0, 900), ("val", 900, 950), ("test", 950, 1000))
_SPLIT_TOL_PPM = 20_000  # |realized - target| tolerance floor (2%)


@register(
    "stratified_split_assign",
    oracle=f"""
    WITH b AS (
        SELECT lang, source,
               CAST(CAST(CONCAT('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) % 1000 AS BIGINT) AS bucket
        FROM documents
    ),
    assigned AS (
        SELECT lang, source,
               CASE {" ".join(
                   f"WHEN bucket < {hi} THEN '{name}'"
                   for name, lo, hi in _SPLIT_CUTS)}
               END AS split
        FROM b
    ),
    cnt AS (
        SELECT lang, source, split, count(*) AS n_docs
        FROM assigned GROUP BY 1, 2, 3
    ),
    strata AS (
        SELECT lang, source, count(*) AS n_stratum FROM b GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.lang, s.source, s.n_stratum, t.split, t.target_ppm
        FROM strata s
        CROSS JOIN (VALUES {", ".join(
            f"('{name}', {(hi - lo) * 1000})"
            for name, lo, hi in _SPLIT_CUTS)}) AS t(split, target_ppm)
    )
    SELECT g.lang, g.source, g.split,
           CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,
           CAST((coalesce(c.n_docs, 0) * 1000000) // g.n_stratum
                AS BIGINT) AS realized_ppm,
           CAST(g.target_ppm AS BIGINT) AS target_ppm,
           abs((coalesce(c.n_docs, 0) * 1000000) // g.n_stratum
               - g.target_ppm)
               <= greatest({_SPLIT_TOL_PPM}, 3000000 // g.n_stratum)
               AS within_tol
    FROM grid g
    LEFT JOIN cnt c ON g.lang = c.lang AND g.source = c.source
                   AND g.split = c.split
    """,
    doc="Deterministic stratified train/val/test ASSIGNMENT plus its "
    "own audit — the split step a training-data pipeline runs before "
    "anything else (split_balance_audit audits a GIVEN doc_id%10 "
    "split; this one produces the split): every document hashes into "
    "a 1000-bucket lottery (md5 of the doc id — stable under corpus "
    "growth and reshuffling, the property %-of-row-number splits do "
    "not have) cut 900/50/50, and the report grids EVERY "
    "(lang, source) stratum x split — including empty cells, which "
    "are exactly the audit's point (a stratum too small to land a "
    "val doc shows 0 against its 5% target instead of vanishing) — "
    "with exact-integer realized-vs-target ppm and a tolerance "
    "verdict at max(2%, 3 docs). Scale shape: one corpus scan into a "
    "map-side-combined (stratum, split) count plus a stratum count; "
    "the 3-row split spec rides an explode/VALUES literal; everything "
    "after runs on strata-bounded frames. All-integer arithmetic "
    "(truncating ppm division on positive operands — identical in "
    "both engines), no floats anywhere.",
    tags=("pipeline", "quality", "aggregation"),
)
def stratified_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1000
    )
    b = docs.select("lang", "source", bucket.alias("bucket"))
    split = F.when(F.lit(False), F.lit(""))
    for name, _lo, hi in _SPLIT_CUTS:
        split = split.when(F.col("bucket") < hi, name)
    cnt = (
        b.select("lang", "source", split.alias("split"))
        .groupBy("lang", "source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    strata = b.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_stratum")
    )
    spec = F.array(
        *[
            F.struct(
                F.lit(name).alias("split"),
                F.lit((hi - lo) * 1000).cast("bigint").alias("target_ppm"),
            )
            for name, lo, hi in _SPLIT_CUTS
        ]
    )
    grid = strata.select(
        "lang", "source", "n_stratum", F.explode(spec).alias("t")
    ).select("lang", "source", "n_stratum", "t.split", "t.target_ppm")
    joined = grid.join(cnt, ["lang", "source", "split"], "left").select(
        "lang",
        "source",
        "split",
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        "n_stratum",
        "target_ppm",
    )
    realized = F.expr("(n_docs * 1000000) div n_stratum").cast("bigint")
    tol = F.greatest(
        F.lit(_SPLIT_TOL_PPM).cast("bigint"),
        F.expr("3000000 div n_stratum").cast("bigint"),
    )
    return joined.select(
        "lang",
        "source",
        "split",
        "n_docs",
        realized.alias("realized_ppm"),
        F.col("target_ppm").cast("bigint").alias("target_ppm"),
        (F.abs(realized - F.col("target_ppm")) <= tol).alias("within_tol"),
    )
