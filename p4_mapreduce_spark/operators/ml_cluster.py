"""Iterative ML over embeddings: Lloyd's k-means with a full oracle.

The third iterative operator next to connected components and PageRank
(reference scope: none — the reference engine has no numerics at all;
this is north-star "training-data pipeline" surface: cluster the
corpus embeddings to stratify, balance, or IVF-index them).

Execution shape (MLlib's, re-derived):

- **assignment is shuffle-free**: each round's k centroids are small
  (k × 64 doubles), so they are folded into the plan as *literal*
  column expressions — distance to every centroid is one generated
  left-associative 64-term arithmetic chain, whole-stage-codegen'd,
  no join, no shuffle, no Python. At 100 TB this is a map-only pass.
- **update is one partial-aggregated groupBy per round**: k × 64
  sums + counts collected to the driver (k·d doubles, not data), the
  canonical MLlib topology. Empty clusters keep their centroid.
- **determinism across engines** (the PageRank recipe, extended):
  per-round centroids are floor-quantized at 1e-6 in both engines;
  per-pair distances are floor-quantized at 1e-6 *before* the argmin,
  and the argmin tie-breaks on centroid id. Both engines evaluate the
  *same* generated expression tree (left-assoc sum of (x-c)*(x-c)
  over cast-to-double floats), so quantized distances are
  bit-identical and every assignment decision is reproducible — which
  is what upgrades this float fixpoint from rows-only to a full
  DuckDB oracle (unrolled CTE rounds).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

_K = 4
_ITERS = 3
_DIMS = 64
_SCALE = 1_000_000.0  # 1e-6 quantization, like PageRank's fix(rank, 6)


def _fq_sql(expr: str) -> str:
    return f"floor(({expr}) * {_SCALE} + 0.5) / {_SCALE}"


def _fq_py(x: float) -> float:
    # Same IEEE op sequence as _fq_sql / the Spark twin: mul, add, floor, div.
    return math.floor(x * _SCALE + 0.5) / _SCALE


def _dist_sql(vec: str, cen: str) -> str:
    """Left-associative 64-term squared-L2 chain (1-indexed arrays)."""
    return " + ".join(
        f"({vec}[{i}]-{cen}[{i}])*({vec}[{i}]-{cen}[{i}])"
        for i in range(1, _DIMS + 1)
    )


def _kmeans_oracle() -> str:
    mean_cols = ", ".join(
        _fq_sql(f"sum(e.v[{i}]) / count(*)") for i in range(1, _DIMS + 1)
    )
    parts = [
        f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        FROM (SELECT * FROM e ORDER BY vec_id LIMIT {_K})
    )"""
    ]
    for t in range(_ITERS):
        qd = _fq_sql(_dist_sql("e.v", "c.v"))
        parts.append(f""",
    a{t} AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {qd}, c.cid) AS rn
            FROM e, c{t} c
        ) WHERE rn = 1
    ),
    c{t + 1} AS (
        SELECT c.cid, CASE WHEN m.cid IS NULL THEN c.v ELSE m.v END AS v
        FROM c{t} c LEFT JOIN (
            SELECT a.cid, list_value({mean_cols}) AS v
            FROM a{t} a JOIN e USING (vec_id)
            GROUP BY a.cid
        ) m ON c.cid = m.cid
    )""")
    qd_final = _fq_sql(_dist_sql("e.v", "c.v"))
    parts.append(f"""
    SELECT vec_id, cid AS cluster, qd AS qdist FROM (
        SELECT e.vec_id, c.cid, {qd_final} AS qd,
               row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY {qd_final}, c.cid) AS rn
        FROM e, c{_ITERS} c
    ) WHERE rn = 1
    """)
    return "".join(parts)


def _dist_col(centroid: list[float]):
    """Spark twin of :func:`_dist_sql` over the same literal centroid."""
    def term(i: int):
        d = F.col("embedding")[i].cast("double") - F.lit(centroid[i])
        return d * d

    expr = term(0)
    for i in range(1, _DIMS):
        expr = expr + term(i)
    return expr


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(),
    doc=f"Lloyd's k-means over the 64-dim embeddings (k={_K}, "
    f"{_ITERS} rounds, init = the {_K} lowest vec_ids). Assignment is "
    "a map-only codegen pass (centroids baked in as literals — no "
    "join, no shuffle); the update is one groupBy with 64 partial "
    "sums, collecting only k x 64 doubles to the driver per round, "
    "MLlib's exact topology. Per-round centroids AND per-pair "
    "distances are floor-quantized at 1e-6 in both engines over an "
    "identical generated expression tree, with argmin tie-break on "
    "centroid id — so the iterative float fixpoint carries a full "
    "unrolled-CTE DuckDB oracle like PageRank, not a rows-only check.",
    tags=("ml", "iterative", "embeddings"),
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = emb.orderBy("vec_id").limit(_K).collect()
    centroids = [[float(x) for x in r.embedding] for r in init]

    for _ in range(_ITERS):
        qds = [
            F.floor(_dist_col(c) * _SCALE + F.lit(0.5)) / _SCALE
            for c in centroids
        ]
        cluster = (
            F.array_position(F.array(*qds), F.array_min(F.array(*qds))) - 1
        ).cast("int")
        assigned = emb.withColumn("cluster", cluster)
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col("embedding")[i].cast("double")).alias(f"s{i}")
                    for i in range(_DIMS)
                ],
            )
            .collect()
        )
        by_cid = {r.cluster: r for r in sums}
        centroids = [
            [_fq_py(by_cid[j][f"s{i}"] / by_cid[j]["n"]) for i in range(_DIMS)]
            if j in by_cid
            else centroids[j]
            for j in range(_K)
        ]

    qds = [
        F.floor(_dist_col(c) * _SCALE + F.lit(0.5)) / _SCALE for c in centroids
    ]
    qarr = F.array(*qds)
    return emb.select(
        "vec_id",
        (F.array_position(qarr, F.array_min(qarr)) - 1).cast("int").alias("cluster"),
        F.array_min(qarr).alias("qdist"),
    )
