"""Connected components cross-checked against a Python union-find."""

from __future__ import annotations

import pyspark.sql.functions as F

from p4_mapreduce_spark.operators.dedup import dedup_minhash_lsh
from p4_mapreduce_spark.operators.graph import connected_components


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def test_connected_components_matches_union_find(spark, sf_dir):
    pairs = [
        (r["doc_id_a"], r["doc_id_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    assert pairs, "expected planted near-dups in the corpus"

    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    want = {n: uf.find(n) for n in uf.parent}

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == want


def test_synthetic_chain_and_triangle(spark):
    # chain 1-2-3-4 + triangle 10-11-12 + isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    """The reliable (setCheckpointDir + checkpoint) path must produce
    labels identical to the default localCheckpoint path — the r8
    verdict's durability ask: localCheckpoint blocks live in executor
    storage, so a 100 TB run needs the filesystem-backed mode."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    default = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    prior_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "cc_ckpt"))
    try:
        durable = {
            r["node"]: r["component"]
            for r in connected_components(edges, reliable=True).collect()
        }
    finally:
        if prior_dir is not None:
            spark.sparkContext.setCheckpointDir(prior_dir)
    assert durable == default
    # the reliable path really wrote filesystem checkpoints
    import os

    assert any(os.scandir(tmp_path / "cc_ckpt"))


def _pagerank_py(edge_list, damping=0.85, n_iter=10):
    """Pure-Python reference for the same fixed-iteration formulation."""
    from collections import defaultdict

    out_deg = defaultdict(int)
    nodes = set()
    for s, d in edge_list:
        out_deg[s] += 1
        nodes.update((s, d))
    ranks = {n: 1.0 for n in nodes}
    for _ in range(n_iter):
        mass = defaultdict(float)
        for s, d in edge_list:
            mass[d] += ranks[s] / out_deg[s]
        ranks = {n: (1 - damping) + damping * mass[n] for n in nodes}
    return ranks


def test_pagerank_matches_python_reference(spark):
    from p4_mapreduce_spark.operators.graph import pagerank

    # star (hub 1) + chain + a sink, directed
    edge_list = [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 5), (5, 6)]
    edges = spark.createDataFrame(edge_list, "src: long, dst: long")
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    want = _pagerank_py(edge_list)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


def test_pagerank_purchase_graph_shape(spark, sf_dir):
    from p4_mapreduce_spark.registry import load_all

    pr = load_all()["graph_pagerank_purchases"].fn(spark, sf_dir).collect()
    assert len(pr) > 0
    ranks = [r["rank"] for r in pr]
    # every node has positive rank; symmetric graph conserves total
    # mass at n*(1-d) + d*n = n (no sinks), within float slack
    assert min(ranks) > 0
    # tolerance covers the 1e-6 per-round rank quantization the
    # registered query applies for oracle determinism
    assert abs(sum(ranks) - len(pr)) < 1e-5 * len(pr)


def test_lpa_bipartite_semisync_equals_generic(spark):
    """r14: the bipartite-split semisync twin (per-side label frames
    over a single-direction edge checkpoint, sentinel keep-prior) must
    produce EXACTLY the generic lpa_semisync labels on a proper
    2-coloring — including keep-prior ties and a side-B node with a
    single in-neighbor. K_{2,3} plus a pendant edge exercises argmax
    ties, convergence early-stop, and the round-1 identity fusion."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.operators.graph import (
        _lpa_bipartite_semisync,
        lpa_semisync,
    )

    fwd_list = [(1, 100), (1, 101), (2, 100), (2, 101), (2, 102), (3, 103)]
    fwd = spark.createDataFrame(fwd_list, "src long, dst long")
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    for rounds in (1, 3, 6):
        generic = {
            (r["node"], r["community"])
            for r in lpa_semisync(
                edges, F.col("node") < 100, rounds
            ).collect()
        }
        bip = {
            (r["node"], r["community"])
            for r in _lpa_bipartite_semisync(fwd, rounds).collect()
        }
        assert bip == generic, (rounds, sorted(bip), sorted(generic))
