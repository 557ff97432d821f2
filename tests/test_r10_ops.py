"""Round-10 behavioral fixtures.

- dedup_span_apply: on the same planted corpus the r9 cutlist fixture
  pins, the REWRITTEN corpus is exactly right: the lower-doc_id copy
  of a shared quote survives verbatim, the other copy is excised with
  its surrounding context spliced back together, a within-doc repeat
  keeps only its first occurrence, and an exact-duplicate doc is
  emptied while its keeper stays byte-identical.
- the skew-safe span shapes (r10: localCheckpoint + grouped membership
  / keeper) agree with the r9 window shapes row-for-row on the planted
  corpus — the A/B the skew probe relies on.
"""

from __future__ import annotations

from tests.oracle import compare_frames, run_oracle
from tests.test_r9_ops import _doc, _planted_sf_dir


def test_span_apply_planted_exact_strings(spark, sf_dir, tmp_path):
    from p4_mapreduce_spark.registry import load_all

    quote = [f"q{i}" for i in range(60)]
    rows = [
        _doc(1, [f"a{i}" for i in range(40)] + quote
             + [f"b{i}" for i in range(20)]),
        _doc(2, [f"c{i}" for i in range(10)] + quote
             + [f"d{i}" for i in range(35)]),
        _doc(3, [f"r{i}" for i in range(35)]
             + [f"e{i}" for i in range(24)]
             + [f"r{i}" for i in range(35)]
             + [f"f{i}" for i in range(6)]),
        _doc(4, [f"u{i}" for i in range(80)]),
        _doc(5, [f"x{i}" for i in range(45)]),
        _doc(6, [f"x{i}" for i in range(45)]),
    ]
    planted = _planted_sf_dir(sf_dir, tmp_path, rows)
    registry = load_all()
    spec = registry["dedup_span_apply"]

    got = spec.fn(spark, planted).toPandas()
    compare_frames(got, run_oracle(spec.oracle, planted),
                   name="dedup_span_apply[planted]")

    clean = {
        int(r.doc_id): (r.clean_text, int(r.n_tokens_kept))
        for r in got.itertuples()
    }
    join = " ".join
    # doc 1 is the corpus-canonical keeper of the quote: untouched
    assert clean[1] == (rows[0]["text"], 120)
    # doc 2 loses the quote; its context splices back together
    assert clean[2] == (
        join([f"c{i}" for i in range(10)] + [f"d{i}" for i in range(35)]),
        45,
    )
    # doc 3 keeps the FIRST occurrence of its repeated block only
    assert clean[3] == (
        join([f"r{i}" for i in range(35)] + [f"e{i}" for i in range(24)]
             + [f"f{i}" for i in range(6)]),
        65,
    )
    # all-unique control untouched
    assert clean[4] == (rows[3]["text"], 80)
    # exact duplicates: keeper byte-identical, the other doc emptied
    assert clean[5] == (rows[4]["text"], 45)
    assert clean[6] == ("", 0)


def test_span_skew_shapes_agree(spark, sf_dir):
    """The r10 skew-safe shapes and the r9 window shapes are the same
    operator: row-for-row equal on a real corpus (the probe's A/B
    precondition, and the guard that keeps skew_safe=False honest as
    a comparison arm)."""
    from p4_mapreduce_spark.operators.dedup import (
        _apply_frame,
        _span_runs,
        _surgery_frame,
    )
    from p4_mapreduce_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    for fn in (_span_runs, _surgery_frame, _apply_frame):
        safe = sorted(map(tuple, fn(docs, skew_safe=True).collect()))
        window = sorted(map(tuple, fn(docs, skew_safe=False).collect()))
        assert safe == window, fn.__name__
        assert safe, fn.__name__  # non-vacuous: the corpus has rows


# ---------------------------------------------------------------------
# r10 new-coverage behavioral fixtures: LPA, PCA, interval overlap
# ---------------------------------------------------------------------


def _planted_table_dir(sf_dir, tmp_path, name, table) -> str:
    """An sf dir whose ``name`` table is exactly ``table`` (a pyarrow
    Table); every other table symlinks the original so run_oracle can
    register all views."""
    import os

    import pyarrow.parquet as pq

    from p4_mapreduce_spark.sources.tables import TABLES

    out = tmp_path / f"sf_planted_{name}"
    out.mkdir()
    pq.write_table(table, out / f"{name}.parquet")
    for other in TABLES:
        if other != name:
            os.symlink(
                os.path.join(sf_dir, f"{other}.parquet"),
                out / f"{other}.parquet",
            )
    return str(out)


def _py_lpa(edges, rounds):
    """Pure-python replica of synchronous LPA with the same rules:
    adopt the most frequent in-neighbor label, ties to the smallest."""
    from collections import Counter, defaultdict

    nodes = sorted({n for e in edges for n in e})
    label = {n: n for n in nodes}
    inn = defaultdict(list)
    for s, d in edges:
        inn[d].append(s)
    for _ in range(rounds):
        label = {
            n: min((-c, lb) for lb, c in Counter(
                label[s] for s in inn[n]
            ).items())[1]
            for n in nodes
        }
    return label


def test_lpa_planted_cliques_vs_python(spark):
    """Two dense 4-cliques joined by one bridge edge: LPA must (a)
    agree node-for-node with a pure-python replica of the same
    synchronous rules, and (b) assign the cliques two DIFFERENT
    communities — the density behavior that distinguishes LPA from
    connected components (which would merge everything reachable)."""
    from p4_mapreduce_spark.operators.graph import label_propagation

    a, b = [1, 2, 3, 4], [10, 11, 12, 13]
    und = [(x, y) for cl in (a, b) for x in cl for y in cl if x < y]
    und.append((4, 10))  # bridge
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, 4).collect()
    }
    assert got == _py_lpa(edges, 4)
    comm_a = {got[n] for n in a}
    comm_b = {got[n] for n in b}
    assert len(comm_a) == 1 and len(comm_b) == 1
    assert comm_a != comm_b  # communities, not components


def test_pca_planted_direction_and_label_separation(spark, sf_dir, tmp_path):
    """PCA motivation fixture: embeddings whose variance is planted
    along one axis, labels split by the sign of the planted coordinate.
    The integer-exact fit must (a) recover numpy's dominant eigenvector
    (|cos| > 0.99 — the recurrence approximates real PCA, not just
    itself), and (b) separate the labels' mean PC1 projections by far
    more than the within-label spread, oracle parity included."""
    import numpy as np
    import pyarrow as pa

    from p4_mapreduce_spark.operators.ml_cluster import (
        fit_pca_top_component,
    )
    from p4_mapreduce_spark.registry import load_all

    D = 64
    rows = []
    for k in range(40):
        # bimodal planted coordinate: labels sit in tight clusters at
        # -+0.42..0.52, so between-label separation >> within-label spread
        t = (1 if k % 2 else -1) * (0.42 + (k % 20) * 0.005)
        v = [0.01 * ((i * 7 + k) % 3 - 1) for i in range(D)]
        v[5] += t
        rows.append((k, [float(x) for x in v], 0 if t < 0 else 1))

    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    _n, _mu, v = fit_pca_top_component(emb)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    xc = x - x.mean(0)
    _w, eigvecs = np.linalg.eigh(xc.T @ xc)
    vv = np.array(v, dtype=np.float64)
    vv /= np.linalg.norm(vv)
    assert abs(float(vv @ eigvecs[:, -1])) > 0.99

    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    planted = _planted_table_dir(sf_dir, tmp_path, "embeddings", table)
    spec = load_all()["embedding_pca_power_iteration"]
    got = spec.fn(spark, planted).toPandas()
    compare_frames(got, run_oracle(spec.oracle, planted),
                   name="embedding_pca_power_iteration[planted]")
    stats = {
        int(r.label): (int(r.pc1_mean_q), int(r.pc1_max_q - r.pc1_min_q))
        for r in got.itertuples()
    }
    gap = abs(stats[1][0] - stats[0][0])
    assert gap > 2 * max(stats[0][1], stats[1][1])


def test_interval_overlap_planted_pairs(spark, sf_dir, tmp_path):
    """Planted co-presence: two users whose 15-min-padded sessions
    overlap twice by exactly 5 minutes each, a third user far away.
    Exact pair rows, plus oracle parity on the planted corpus."""
    import pandas as pd
    import pyarrow as pa

    from p4_mapreduce_spark.registry import load_all

    base = pd.Timestamp("2024-03-01 12:00:00")
    mins = pd.Timedelta(minutes=1)
    ev = [
        # episode 1: u1 at t0, u2 at t0+10 -> sessions [0,15) & [10,25)
        (1, base, 1),
        (2, base + 10 * mins, 2),
        # episode 2: same shape at t0+200min
        (3, base + 200 * mins, 1),
        (4, base + 210 * mins, 2),
        # u3 disjoint
        (5, base + 500 * mins, 3),
    ]
    table = pa.table(
        {
            "event_id": pa.array([e[0] for e in ev], pa.int64()),
            "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in ev], pa.int64()),
            "event_type": pa.array(["view"] * len(ev)),
            "value": pa.array([0.0] * len(ev), pa.float64()),
            "props": pa.array(["{}"] * len(ev)),
        }
    )
    planted = _planted_table_dir(sf_dir, tmp_path, "events", table)
    spec = load_all()["interval_overlap_join"]
    got = spec.fn(spark, planted).toPandas()
    compare_frames(got, run_oracle(spec.oracle, planted),
                   name="interval_overlap_join[planted]")
    assert len(got) == 1
    row = got.iloc[0]
    five_min_us = 5 * 60 * 1_000_000
    assert (
        int(row.user_a), int(row.user_b), int(row.n_overlaps),
        int(row.total_overlap_us), int(row.max_overlap_us),
    ) == (1, 2, 2, 2 * five_min_us, five_min_us)


def _py_kcore(edges, k, rounds):
    """Pure-python replica of the fixed-round k-core peel."""
    from collections import defaultdict

    nodes = {n for e in edges for n in e}
    alive = set(nodes)
    for _ in range(rounds):
        deg = defaultdict(int)
        for s, d in edges:
            if s in alive and d in alive:
                deg[s] += 1
        alive = {n for n in alive if deg[n] >= k}
    deg = defaultdict(int)
    for s, d in edges:
        if s in alive and d in alive:
            deg[s] += 1
    return {n: (n in alive, deg[n]) for n in sorted(nodes)}


def test_kcore_recursive_demotion_vs_python(spark):
    """k-core motivation fixture: a 4-clique (every node degree 3 —
    survives the 3-core) plus a pendant chain where node 20 has THREE
    neighbors (21, 22, 23) who are themselves weak — a plain degree
    filter keeps 20, but peeling drops 21/22/23 in round 1 which
    demotes 20 recursively. Pinned against a pure-python replica."""
    from p4_mapreduce_spark.operators.graph import kcore_peel

    clique = [1, 2, 3, 4]
    und = [(x, y) for x in clique for y in clique if x < y]
    und += [(1, 20), (20, 21), (20, 22), (20, 23)]
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["in_core"], r["core_degree"])
        for r in kcore_peel(df, k=3, n_rounds=4).collect()
    }
    want = _py_kcore(edges, 3, 4)
    assert got == want
    assert all(got[n] == (True, 3) for n in clique)
    # degree-3 node 20 demoted RECURSIVELY (a one-shot degree filter
    # would keep it), pendant nodes peeled in round 1
    assert got[20] == (False, 0)
    assert all(got[n] == (False, 0) for n in (21, 22, 23))


def test_kcore_rounds_converged_on_corpus(spark, sf_dir):
    """The registered 6-round peel is a FIXPOINT on the real corpus:
    one more round changes nothing (the fixed round count is a
    convergence fact, not a truncation)."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.operators.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
        kcore_peel,
    )
    from p4_mapreduce_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    def as_map(df):
        return {r["node"]: (r["in_core"], r["core_degree"]) for r in df.collect()}

    a = as_map(kcore_peel(edges, _KCORE_K, _KCORE_ROUNDS))
    b = as_map(kcore_peel(edges, _KCORE_K, _KCORE_ROUNDS + 1))
    assert a == b
    assert any(v[0] for v in a.values())  # non-vacuous: core is non-empty
