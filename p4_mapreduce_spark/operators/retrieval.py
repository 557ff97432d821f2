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


# ---------------------------------------------------------------------------
# Sparse-vector document KNN: TF-IDF cosine via posting-list join
# ---------------------------------------------------------------------------

_KNN_QUERY_DOCS = (0, 1, 2, 3, 4)
_KNN_TOP_K = 10


@register(
    "tfidf_doc_knn",
    oracle=f"""
    WITH w2 AS (
        SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ) WHERE word <> ''
    ),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
    nd AS (SELECT count(*) AS n FROM documents),
    dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
    wt AS (
        SELECT tf.doc_id, tf.word,
               tf.tf * CAST(floor(ln(n / CAST(df AS DOUBLE)) * 10000.0
                                  + 0.5) AS BIGINT) AS w_u
        FROM tf JOIN dfq USING (word) CROSS JOIN nd
    ),
    nrm AS (
        SELECT doc_id, CAST(sum(w_u * w_u) AS BIGINT) AS norm_u
        FROM wt GROUP BY 1
    ),
    qw AS (
        SELECT doc_id AS query_id, word, w_u AS qw_u FROM wt
        WHERE doc_id IN ({", ".join(str(i) for i in _KNN_QUERY_DOCS)})
    ),
    dots AS (
        SELECT q.query_id, w.doc_id AS neighbor_id,
               CAST(sum(qw_u * w_u) AS BIGINT) AS dot_u
        FROM qw q JOIN wt w USING (word)
        WHERE w.doc_id <> q.query_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT d.query_id, d.neighbor_id,
               d.dot_u / sqrt(CAST(nq.norm_u AS DOUBLE)
                              * CAST(nn.norm_u AS DOUBLE)) AS cosine_sim
        FROM dots d
        JOIN nrm nq ON nq.doc_id = d.query_id
        JOIN nrm nn ON nn.doc_id = d.neighbor_id
        WHERE nq.norm_u > 0 AND nn.norm_u > 0
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC,
                                              neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= {_KNN_TOP_K}
    """,
    doc=f"Sparse-vector document KNN: top-{_KNN_TOP_K} most similar "
    f"documents for {len(_KNN_QUERY_DOCS)} query documents by TF-IDF "
    "cosine, computed the way sparse similarity actually scales — a "
    "POSTING-LIST equi-join on the shared term (only term-sharing "
    "doc pairs ever materialize; orthogonal pairs cost nothing), "
    "never a dense all-pairs scan. The text-side sibling of "
    "ann_bruteforce_topk (dense) and the pairwise engine behind "
    "near-duplicate triage when embeddings don't exist yet. Scale "
    "shape: the query-side postings are a bounded broadcast "
    "(|queries| x terms-per-doc rows); the corpus posting table is "
    "ONE map-side-combined (doc, word) aggregation reused for "
    "weights and norms; the dot products are one groupBy over the "
    "join; top-k is a per-query window heap. Determinism: IDF lns "
    "are floor-quantized at 1e-4 into bigint unit weights, so dots "
    "and norms are EXACT integer sums in any reduction order (the "
    "1e-4 quantum keeps worst-case dot magnitudes inside int64 and "
    "the bigint->double conversion is IEEE-deterministic); the final "
    "cosine is single IEEE ops on identical doubles.",
    tags=("text", "retrieval", "similarity", "aggregation"),
)
def tfidf_doc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    w2 = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("word"),
    )
    tf = w2.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    dfq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    w_u = F.col("tf") * F.floor(
        F.log(F.col("n") / F.col("df").cast("double")) * 10000.0 + 0.5
    ).cast("bigint")
    # r11 scan fold: the weighted posting table feeds FOUR branches
    # (query side, corpus join side, and both norm lookups via nrm) —
    # uncheckpointed, each branch re-printed (and cache-cold re-ran)
    # the tf + df + count subtree: 12 printed corpus scans. One lazy
    # localCheckpoint of the narrow (doc, word, w_u) table and one of
    # the doc-sized norm table make it a single physical pass
    # (pin 12 -> default 2 in tests/test_plans.py, same commit).
    wt = (
        tf.join(dfq, "word")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "word", w_u.alias("w_u"))
        .localCheckpoint(eager=False)
    )
    nrm = wt.groupBy("doc_id").agg(
        F.sum(F.col("w_u") * F.col("w_u")).cast("bigint").alias("norm_u")
    ).localCheckpoint(eager=False)
    qw = wt.where(F.col("doc_id").isin(*_KNN_QUERY_DOCS)).select(
        F.col("doc_id").alias("query_id"), "word", F.col("w_u").alias("qw_u")
    )
    dots = (
        F.broadcast(qw)
        .join(wt, "word")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(
            F.sum(F.col("qw_u") * F.col("w_u")).cast("bigint").alias("dot_u")
        )
    )
    nq = nrm.select(
        F.col("doc_id").alias("query_id"), F.col("norm_u").alias("nq_u")
    )
    nn = nrm.select(
        F.col("doc_id").alias("neighbor_id"), F.col("norm_u").alias("nn_u")
    )
    scored = (
        dots.join(F.broadcast(nq), "query_id")
        .join(nn, "neighbor_id")
        .where((F.col("nq_u") > 0) & (F.col("nn_u") > 0))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("dot_u")
                / F.sqrt(
                    F.col("nq_u").cast("double") * F.col("nn_u").cast("double")
                )
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _KNN_TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )
