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


def _kmeans_cte_body() -> str:
    """The unrolled-CTE fit chain (``e``, ``c0``, ``a0``..``c{_ITERS}``)
    WITHOUT the leading WITH — shared by the standalone kmeans oracle
    and composed pipelines (similarity.semdedup_pipeline)."""
    mean_cols = ", ".join(
        _fq_sql(f"sum(e.v[{i}]) / count(*)") for i in range(1, _DIMS + 1)
    )
    parts = [
        f"""e AS (
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
    return "".join(parts)


def kmeans_assign_ctes() -> str:
    """``_kmeans_cte_body()`` plus a ``kassign(vec_id, cluster)`` CTE
    holding the final fitted-centroid assignment — embed as
    ``WITH {kmeans_assign_ctes()}, ...`` in composed oracles."""
    qd = _fq_sql(_dist_sql("e.v", "c.v"))
    # MATERIALIZED: a composed oracle references kassign (and frames
    # built on it) several times; without materialization DuckDB
    # re-inlines the whole unrolled fit chain per reference and the
    # planner's expression tree blows up (observed OOM on 500 rows).
    return f"""{_kmeans_cte_body()},
    kassign AS MATERIALIZED (
        SELECT vec_id, cid AS cluster FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {qd}, c.cid) AS rn
            FROM e, c{_ITERS} c
        ) WHERE rn = 1
    )"""


def _kmeans_oracle() -> str:
    qd_final = _fq_sql(_dist_sql("e.v", "c.v"))
    return f"""
    WITH {_kmeans_cte_body()}
    SELECT vec_id, cid AS cluster, qd AS qdist FROM (
        SELECT e.vec_id, c.cid, {qd_final} AS qd,
               row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY {qd_final}, c.cid) AS rn
        FROM e, c{_ITERS} c
    ) WHERE rn = 1
    """


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
    centroids = fit_kmeans_centroids(emb)
    qarr = _kmeans_qdist_arr(centroids)
    return emb.select(
        "vec_id",
        kmeans_assign_col(centroids).alias("cluster"),
        F.array_min(qarr).alias("qdist"),
    )


def fit_kmeans_centroids(emb: DataFrame) -> list[list[float]]:
    """Run the Lloyd's fit loop and return the fitted k x 64 centroid
    literals — the "literal topology" every composed pipeline bakes
    into its assignment expression (shared with semdedup_pipeline)."""
    init = emb.orderBy("vec_id").limit(_K).collect()
    centroids = [[float(x) for x in r.embedding] for r in init]

    for _ in range(_ITERS):
        assigned = emb.withColumn("cluster", kmeans_assign_col(centroids))
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
    return centroids


def _kmeans_qdist_arr(centroids: list[list[float]]) -> F.Column:
    """Array of 1e-6-quantized squared distances to every centroid —
    the single source of the assignment expression (fit loop, final
    emit, and composed pipelines all build on it)."""
    return F.array(
        *[
            F.floor(_dist_col(c) * _SCALE + F.lit(0.5)) / _SCALE
            for c in centroids
        ]
    )


def kmeans_assign_col(centroids: list[list[float]]) -> F.Column:
    """Fitted-centroid cluster assignment as a pure column expression
    (quantized-distance argmin, tie-break on centroid id) — the Spark
    twin of the ``kassign`` CTE from :func:`kmeans_assign_ctes`."""
    qarr = _kmeans_qdist_arr(centroids)
    return (F.array_position(qarr, F.array_min(qarr)) - 1).cast("int")


# ---------------------------------------------------------------------------
# Logistic regression: the trained quality-classifier filter
# ---------------------------------------------------------------------------

_LR_ROUNDS = 5
_LR_ETA = 8.0  # exact power of two: the update multiply is IEEE-exact

# feature builders (dual Spark/SQL, quantized at 1e-6 so both engines
# score identical doubles): f1 = English-marker token fraction,
# f2 = centered chars-per-token ((cpt - 5.5) / 2),
# f3 = centered scaled length ((chars - 300) / 250)
_LR_MARKERS = ("the", "a", "of", "and")


def _lr_feats_sql() -> str:
    mk = ", ".join(f"'{m}'" for m in _LR_MARKERS)
    return f"""
        SELECT doc_id,
               CASE WHEN length(text) >= 300 THEN 1.0 ELSE 0.0 END AS y,
               {_fq_sql(f"len(list_filter(ws, x -> x IN ({mk})))"
                        " / greatest(len(ws), 1)")} AS f1,
               {_fq_sql("(length(text) / greatest(len(ws), 1) - 5.5)"
                        " / 2.0")} AS f2,
               {_fq_sql("(length(text) - 300.0) / 250.0")} AS f3
        FROM (
            SELECT doc_id, lang, text,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws
            FROM documents
        )
    """


def _lr_sig_sql(b: str, w1: str, w2: str, w3: str) -> str:
    z = f"({b} + {w1} * f1 + {w2} * f2 + {w3} * f3)"
    return _fq_sql(f"1.0 / (1.0 + exp(-{z}))")


def _lr_grad_sql(
    tag: str, b: str, w1: str, w2: str, w3: str, extra_from: str
) -> str:
    s = _lr_sig_sql(b, w1, w2, w3)
    return f"""
    g{tag} AS (
        SELECT count(*) AS n,
               sum(CAST(floor(({s} - y) * 1000000.0 + 0.5) AS BIGINT)) AS s0,
               sum(CAST(floor(({s} - y) * f1 * 1000000.0 + 0.5) AS BIGINT))
                   AS s1,
               sum(CAST(floor(({s} - y) * f2 * 1000000.0 + 0.5) AS BIGINT))
                   AS s2,
               sum(CAST(floor(({s} - y) * f3 * 1000000.0 + 0.5) AS BIGINT))
                   AS s3
        FROM feats{extra_from}
    )"""


def _lr_step_sql(j: str) -> str:
    return _fq_sql(
        f"wb - {_LR_ETA} * ((CAST(s{j} AS DOUBLE) / 1000000.0) / n)"
    ).replace("wb", f"w{j}")


def _logreg_oracle() -> str:
    parts = [f"WITH feats AS ({_lr_feats_sql()})"]
    parts.append("," + _lr_grad_sql("0", "0.0", "0.0", "0.0", "0.0", ""))
    parts.append(f""",
    w1 AS (
        SELECT {_lr_step_sql('0')} AS b,
               {_lr_step_sql('1')} AS c1,
               {_lr_step_sql('2')} AS c2,
               {_lr_step_sql('3')} AS c3
        FROM (SELECT n, s0, s1, s2, s3,
                     0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3 FROM g0)
    )""")
    for r in range(1, _LR_ROUNDS):
        parts.append(
            "," + _lr_grad_sql(str(r), "w.b", "w.c1", "w.c2", "w.c3",
                               f" CROSS JOIN w{r} w")
        )
        parts.append(f""",
    w{r + 1} AS (
        SELECT {_lr_step_sql('0')} AS b,
               {_lr_step_sql('1')} AS c1,
               {_lr_step_sql('2')} AS c2,
               {_lr_step_sql('3')} AS c3
        FROM (SELECT g.n, g.s0, g.s1, g.s2, g.s3,
                     w.b AS w0, w.c1 AS w1, w.c2 AS w2, w.c3 AS w3
              FROM g{r} g CROSS JOIN w{r} w)
    )""")
    sig = _lr_sig_sql("w.b", "w.c1", "w.c2", "w.c3")
    parts.append(f"""
    SELECT f.doc_id, f.y AS label, {sig} AS score,
           {sig} >= 0.5 AS predicted_long
    FROM feats f CROSS JOIN w{_LR_ROUNDS} w
    """)
    return "".join(parts)


def _lr_feats_df(docs):
    mk = F.array(*[F.lit(m) for m in _LR_MARKERS])
    ws = F.filter(F.split("text", " ", -1), lambda x: x != "")
    bound = docs.select("doc_id", "lang", "text", ws.alias("ws"))
    nt = F.greatest(F.size("ws"), F.lit(1))
    return bound.select(
        "doc_id",
        F.when(F.length("text") >= 300, 1.0).otherwise(0.0).alias("y"),
        _fq_col(
            F.size(F.filter(F.col("ws"), lambda x: F.array_contains(mk, x)))
            / nt
        ).alias("f1"),
        _fq_col((F.length("text") / nt - F.lit(5.5)) / F.lit(2.0)).alias(
            "f2"
        ),
        _fq_col((F.length("text") - F.lit(300.0)) / F.lit(250.0)).alias(
            "f3"
        ),
    )


def _fq_col(c):
    return F.floor(c * _SCALE + F.lit(0.5)) / _SCALE


def _lr_sig_col(b: float, w1: float, w2: float, w3: float):
    z = (
        F.lit(b)
        + F.lit(w1) * F.col("f1")
        + F.lit(w2) * F.col("f2")
        + F.lit(w3) * F.col("f3")
    )
    return _fq_col(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


@register(
    "logreg_quality_classifier",
    oracle=_logreg_oracle(),
    doc=f"Logistic-regression quality classifier trained IN-ENGINE "
    f"({_LR_ROUNDS} full-batch gradient-descent rounds, eta="
    f"{_LR_ETA:g}): the fastText-style learned document filter "
    "(the fitted concept here is a known-separable length class, y = "
    "n_chars >= 300, because this synthetic corpus's lang column is "
    "independent of the text by construction — real quality labels "
    "plug into the same y expression; features: English-marker-token "
    "fraction, centered chars-per-token, centered scaled length), trained and applied "
    "without leaving the engine. Execution topology is "
    "k-means': each GD round is ONE map-side-combined aggregation "
    "whose shuffle carries 3 integer gradient cells + a count (the "
    "corpus never moves), the 3 learned weights re-enter the next "
    "round as literal expressions, and the final scoring pass is "
    "map-only codegen. Cross-engine determinism: features are "
    "1e-6-quantized exact-IEEE ratios, per-row sigmoid is "
    "floor-normalized at 1e-6 (the ln/exp recipe), gradient addends "
    "are scaled to INTEGER micros so the gradient sums are exact "
    "bigints in any reduction order — the strongest form of the fsum "
    "precondition — and the weight update arithmetic repeats the "
    "identical IEEE op sequence in the Spark driver and the unrolled "
    "oracle CTEs. At 100 TB: swap full-batch rounds for mini-batch "
    "sampling (hash-bucket, like domain_mixture_sample) — topology "
    "unchanged.",
    tags=("ml", "iterative", "text", "pipeline"),
)
def logreg_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = _lr_feats_df(docs)
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_LR_ROUNDS):
        sig = _lr_sig_col(*w)
        err = sig - F.col("y")
        micros = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast(
            "long"
        )
        row = feats.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(micros(err)).alias("s0"),
            F.sum(micros(err * F.col("f1"))).alias("s1"),
            F.sum(micros(err * F.col("f2"))).alias("s2"),
            F.sum(micros(err * F.col("f3"))).alias("s3"),
        ).collect()[0]
        n = row["n"]
        w = [
            _fq_py(w[j] - _LR_ETA * ((row[f"s{j}"] / 1000000.0) / n))
            for j in range(4)
        ]
    sig = _lr_sig_col(*w)
    return feats.select(
        "doc_id",
        F.col("y").alias("label"),
        sig.alias("score"),
        (sig >= F.lit(0.5)).alias("predicted_long"),
    )
