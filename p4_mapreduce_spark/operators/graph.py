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
    "shuffle each, lineage truncated via localCheckpoint. Members are "
    "emitted as a comma-joined string (numerically sorted) so result "
    "canonicalizers that sort/hash rows can handle the column.",
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
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .select(
            F.col("component").alias("keeper_doc_id"),
            "cluster_size",
            "members",
        )
    )


def pagerank(
    edges: DataFrame, damping: float = 0.85, n_iter: int = 10
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    ``edges``: DataFrame[src: long, dst: long]. Returns
    DataFrame[node: long, rank: double] (the un-normalized Spark-example
    formulation: rank = (1-d) + d * sum(incoming rank/out_degree); sink
    nodes keep received mass). Deterministic in structure but float
    reduction order varies per engine, so callers register rows-only.

    Scale notes: each round is one shuffle (join ranks to edges on src,
    aggregate contributions on dst). The edge list is checkpointed once;
    each round's rank frame is localCheckpoint-ed to truncate lineage —
    the same iterative-Spark discipline as connected_components above.
    """
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    edges_deg = edges.join(out_deg, "src").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contribs = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


@register(
    "graph_pagerank_purchases",
    oracle=None,  # iterative float fixpoint — reduction order varies per engine
    doc="PageRank over the customer↔supplier purchase graph (edges = "
    "distinct (c_custkey, l_suppkey) pairs via orders, symmetrized so "
    "rank flows both ways; supplier node ids offset by 10^9 to keep "
    "the id spaces disjoint). 10 fixed rounds, damping 0.85 — the "
    "second iterative operator next to connected components; one "
    "shuffle per round, lineage truncated per round. Rows-only: "
    "correctness pinned against a pure-Python power iteration in "
    "tests.",
    tags=("graph", "iterative"),
)
def graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges).select("node", "rank")
