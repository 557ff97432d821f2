"""Hybrid retrieval: lexical (BM25) + semantic (ANN) fused with RRF.

The retrieval shape every RAG / training-data-curation stack runs:
two independent ranked lists — keyword search and embedding search —
fused by Reciprocal Rank Fusion (Cormack et al., SIGIR'09):

    score(d) = Σ_arms 1 / (k + rank_arm(d)),   k = 60

RRF needs no score calibration between arms (it uses only ranks),
which also makes it the rare fusion op that is *bit-exact* across
engines: each term is one integer add + one double divide and the
two-arm sum is a fixed-shape expression, not a reduction — so the
query carries a full DuckDB oracle with no float normalization at all.

Scale shape: each arm is its own bounded-output pipeline (top-k lists,
a few dozen rows); the fusion is a full-outer join + window over rows
measured in k, not corpus size. At 100 TB the cost lives in the arms
(see bm25_search_topk / ann_bruteforce_topk scale notes); fusion is
free. The doc_id == vec_id identification treats embeddings.vec_id as
the embedding of documents.doc_id where the id spaces overlap — the
usual "embedding sidecar table" layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

# Importing the arm modules (not just the registry) guarantees their
# @register calls ran even if load_all's order changes.
from p4_mapreduce_spark.operators import similarity, text_analysis
from p4_mapreduce_spark.registry import REGISTRY, register

_RRF_K = 60
_SEM_QUERY_ID = 0

_LEX_ORACLE = REGISTRY["bm25_search_topk"].oracle
_SEM_ORACLE = REGISTRY["ann_bruteforce_topk"].oracle


@register(
    "hybrid_search_rrf",
    oracle=f"""
    WITH lex AS ({_LEX_ORACLE}),
    sem AS (
        SELECT neighbor_id AS doc_id, rk FROM ({_SEM_ORACLE})
        WHERE query_id = {_SEM_QUERY_ID}
    )
    SELECT doc_id, lex_rk, sem_rk, rrf_score,
           CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                AS INTEGER) AS fused_rank
    FROM (
        SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
               l.rk AS lex_rk, s.rk AS sem_rk,
               coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + l.rk), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + s.rk), 0.0)
                   AS rrf_score
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    """,
    doc="Hybrid search: BM25 top-20 (lexical arm) + cosine top-10 for "
    f"query vector {_SEM_QUERY_ID} (semantic arm), fused with "
    f"Reciprocal Rank Fusion (k={_RRF_K}) — the standard RAG retrieval "
    "topology. Rank-only fusion needs no score calibration and is "
    "bit-exact cross-engine (fixed two-term expression, no float "
    "reduction), so the full pipeline carries a DuckDB oracle. Fusion "
    "joins two top-k lists (rows ~ k, not corpus) — free at any scale; "
    "the arms own the heavy lifting.",
    headline=True,
    tags=("text", "search", "similarity", "vector"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = text_analysis.bm25_search_topk(spark, sf_dir).select(
        "doc_id", F.col("rk").alias("lex_rk")
    )
    sem = (
        similarity.ann_bruteforce_topk(spark, sf_dir)
        .where(F.col("query_id") == _SEM_QUERY_ID)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rk").alias("sem_rk"))
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rk",
        "sem_rk",
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rk")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    )
