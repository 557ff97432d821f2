"""Pandas-UDF surface: the sanctioned Python path.

The reference's UDF mechanism is a line-pipe subprocess per task
(SURVEY.md §2.1 O7 — replayed via RDD.pipe in plans.job). The native
engine's Python escape hatch is Arrow-batched pandas UDFs: one FFI
hop per ~10k-row batch instead of per row (~10-100x the throughput of
row-at-a-time Python UDFs; still ~10x slower than staying JVM-side,
which is why only genuinely-Python logic lands here).

All three UDF shapes are exercised with *deterministic integer-space*
math so even the Python results hash-match the DuckDB oracles:
scalar (rolling hash), grouped-agg (weighted mean via integer cents),
grouped-map / applyInPandas (per-user gap medians on integer micros).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

HASH_MOD = 1_000_000_007
HASH_BASE = 31


@register(
    "pudf_rolling_hash",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(text) + 1),
                                  i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
               (acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD}
           ) AS rolling_hash
    FROM documents
    """,
    doc=f"Scalar pandas UDF: Karp-Rabin rolling hash (base {HASH_BASE}, "
    f"mod {HASH_MOD}) over the document text — genuinely iterative "
    "per-row logic, Arrow-batched; exact integer math so the DuckDB "
    "list_reduce oracle replays it bit-for-bit.",
    tags=("udf", "text"),
)
def pudf_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def rolling_hash(texts: pd.Series) -> pd.Series:
        def h(s: str) -> int:
            acc = 0
            for ch in s:
                acc = (acc * HASH_BASE + ord(ch)) % HASH_MOD
            return acc

        return texts.map(h)

    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select("doc_id", rolling_hash("text").alias("rolling_hash"))


@register(
    "pudf_grouped_weighted_mean",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) * (user_id + 1)) AS BIGINT)
               AS weighted_cents,
           CAST(sum(user_id + 1) AS BIGINT) AS total_weight
    FROM events GROUP BY event_type
    """,
    doc="Grouped-agg pandas UDF: weighted sums computed in integer cents "
    "(exact, order-independent) — the recipe for Python aggregation "
    "that still hash-matches a SQL engine.",
    tags=("udf", "aggregation"),
)
def pudf_grouped_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def weighted_cents(value: pd.Series, weight: pd.Series) -> int:
        import numpy as np

        # floor(x*100 + 0.5), NOT .round(): pandas rounds half-even
        # while the oracle (and the rest of the engine) rounds half-up
        cents = np.floor(value * 100 + 0.5).astype("int64")
        return int((cents * weight).sum())

    @pandas_udf("long")
    def total_weight(weight: pd.Series) -> int:
        return int(weight.sum())

    ev = load(spark, sf_dir, "events").withColumn(
        "weight", F.col("user_id") + F.lit(1)
    )
    return ev.groupBy("event_type").agg(
        weighted_cents("value", "weight").alias("weighted_cents"),
        total_weight("weight").alias("total_weight"),
    )


@register(
    "pudf_user_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           count(*) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(sum(gap_us) AS BIGINT) AS total_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="applyInPandas (grouped map): per-user inter-event gap stats on "
    "integer microseconds — arbitrary per-group Python (sort + diff) "
    "with exact-integer outputs.",
    tags=("udf", "window"),
)
def pudf_user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # Arrow hands timestamps to pandas as datetime64[ns]
        us = pdf["ts"].astype("int64") // 1000  # nanos -> micros
        gaps = us.diff().dropna().astype("int64")
        if gaps.empty:
            return pd.DataFrame(
                columns=["user_id", "n_gaps", "min_gap_us", "max_gap_us", "total_gap_us"]
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(gaps)],
                "min_gap_us": [int(gaps.min())],
                "max_gap_us": [int(gaps.max())],
                "total_gap_us": [int(gaps.sum())],
            }
        )

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return ev.groupBy("user_id").applyInPandas(
        gap_stats,
        schema="user_id bigint, n_gaps bigint, min_gap_us bigint, "
        "max_gap_us bigint, total_gap_us bigint",
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 table function API): 1 row -> N rows with LATERAL
# ---------------------------------------------------------------------------


@register(
    "udtf_trigram_shingles",
    oracle="""
    WITH d AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    )
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
           ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS trigram
    FROM d, unnest(generate_series(1, len(ws) - 2)) AS g(i)
    """,
    doc="Python UDTF (Spark 4 @udtf API) emitting the sliding trigram "
    "windows of each document via a LATERAL correlated call — the "
    "user-defined-table-function surface for 1-row→N-rows logic that "
    "array lambdas can't express (stateful generators, external "
    "tokenizers). Arrow-optimized (ArrowEvalPythonUDTF: batched "
    "transfer, not row pickling). API-parity demo: the engine's "
    "hot-path shingling (operators/dedup.py) stays in JVM array "
    "lambdas. Reference parity: the closest shape "
    "is the reference's executable mapper emitting multiple records "
    "per input line (reference mapreduce/worker/__main__.py map exec).",
    tags=("udtf", "text", "python"),
)
def udtf_trigram_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, trigram string", useArrow=True)
    class TrigramUDTF:
        def eval(self, text: str):
            toks = [t for t in text.split(" ") if t]
            for i in range(len(toks) - 2):
                yield i, " ".join(toks[i : i + 3])

    spark.udtf.register("trigram_shingles", TrigramUDTF)
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_docs_view"
    )
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.trigram "
        "FROM _udtf_docs_view d, LATERAL trigram_shingles(d.text) t"
    )


_NORM_DIMS = 64
_NORM_SCALE = 1_000_000.0


@register(
    "arrow_vector_norms",
    oracle="""
    SELECT vec_id,
           floor(({terms}) * 1000000.0 + 0.5) / 1000000.0 AS sumsq,
           sqrt(floor(({terms}) * 1000000.0 + 0.5) / 1000000.0) AS l2_norm
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    """.format(
        terms=" + ".join(f"v[{i}]*v[{i}]" for i in range(1, _NORM_DIMS + 1))
    ),
    doc="Per-vector squared-sum and L2 norm via mapInArrow — the "
    "zero-copy Arrow batch path (no pandas materialization): the "
    "embedding column's value buffer reshapes straight into a numpy "
    "(n, 64) view, one vectorized reduction per batch, one FFI hop. "
    "The float path stays deterministic by quantizing the squared sum "
    "at 1e-6 (absorbing numpy's pairwise- vs left-assoc summation "
    "difference, ~1e-13) and then taking sqrt of the already-identical "
    "double (IEEE sqrt is correctly rounded — bit-identical in "
    "numpy, the JVM, and DuckDB).",
    tags=("embeddings", "python", "arrow"),
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def batches(it):
        for batch in it:
            ids = batch.column(0)
            lists = batch.column(1)
            flat = lists.flatten().to_numpy(zero_copy_only=False)
            arr = flat.astype(np.float64).reshape(-1, _NORM_DIMS)
            ssq = (arr * arr).sum(axis=1)
            q = np.floor(ssq * _NORM_SCALE + 0.5) / _NORM_SCALE
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(q), pa.array(np.sqrt(q))],
                names=["vec_id", "sumsq", "l2_norm"],
            )

    return emb.mapInArrow(batches, "vec_id long, sumsq double, l2_norm double")
