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
