"""Iterative graph operators: connected components over near-dup pairs.

The missing last step of every dedup pipeline: LSH emits *pairs*, but
keep/drop decisions need *clusters* (connected components of the pair
graph). This is genuinely iterative — not SQL-expressible without
recursion — so it registers as a rows-only query; correctness is
pinned by a union-find cross-check in tests.

Algorithm: min-label propagation. Every node starts labeled with
itself; each round joins labels across edges and takes the min over
the neighborhood; converges in O(diameter) rounds (near-dup clusters
are tiny and dense, so typically 2-4). Non-convergence within
``max_iter`` raises rather than returning silently-wrong labels.

Scale notes: each round is one shuffle on node id. The loop runs on
the driver but touches only DataFrame lineage; ``localCheckpoint``
truncates the growing plan each round (without it, round k replays
rounds 1..k-1 — the classic iterative-Spark trap). Convergence is
checked with a cheap count of changed labels.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components of an undirected edge list.

    ``edges``: DataFrame[src: long, dst: long]. Returns
    DataFrame[node: long, component: long] where component is the
    minimum node id in the node's component. Raises ``RuntimeError``
    if labels haven't converged after ``max_iter`` rounds (components
    with diameter > max_iter would otherwise come back split).
    """
    sym = edges.selectExpr("src", "dst").union(
        edges.selectExpr("dst AS src", "src AS dst")
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node"))
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # candidate labels: own label + each neighbor's label
        neighbor_labels = (
            sym.join(labels, sym.dst == labels.node)
            .select(sym.src.alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter too large); raise max_iter"
    )


@register(
    "dedup_cluster_components",
    oracle=None,  # iterative fixpoint — not SQL-expressible; rows-only check
    doc="Connected components over the MinHash-LSH near-dup pair graph: "
    "clusters of mutually-near-duplicate documents with a deterministic "
    "keeper (min doc_id = component id). Label-propagation rounds, one "
    "shuffle each, lineage truncated via localCheckpoint.",
    tags=("dedup", "graph", "iterative"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from p4_mapreduce_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .select(
            F.col("component").alias("keeper_doc_id"),
            "cluster_size",
            "members",
        )
    )
