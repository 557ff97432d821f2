"""Round-11 operator tests: semi-synchronous converged LPA, the
keep-prior LPA fix, and the k-core in_core membership fix."""

from __future__ import annotations

import pyspark.sql.functions as F

from p4_mapreduce_spark.operators.graph import (
    _LPA_SEMI_MAX_ROUNDS,
    kcore_peel,
    label_propagation,
    lpa_semisync,
)


def _py_lpa_keep_prior(edges, rounds):
    """Pure-python synchronous LPA with keep-prior-when-no-in-neighbor
    semantics (the r11 ADVICE fix) over a DIRECTED edge list."""
    from collections import defaultdict

    nodes = sorted({n for e in edges for n in e})
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        counts: dict[int, dict[int, int]] = defaultdict(lambda: defaultdict(int))
        for s, d in edges:
            counts[d][labels[s]] += 1
        labels = {
            n: (
                min(
                    counts[n],
                    key=lambda lb: (-counts[n][lb], lb),
                )
                if n in counts
                else labels[n]
            )
            for n in nodes
        }
    return dict(labels)


def test_lpa_directed_no_in_neighbor_keeps_label(spark):
    """A source-only node (no in-neighbors) must keep its own label
    through every round instead of vanishing from the output — the
    r11 ADVICE fix. Directed chain 1->2->3 plus a 4<->5 pair: node 1
    never receives a label and must survive all rounds labeled 1."""
    edges = [(1, 2), (2, 3), (4, 5), (5, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 3):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(df, rounds).collect()
        }
        assert got == _py_lpa_keep_prior(edges, rounds)
        assert got[1] == 1  # kept, not dropped


def _py_lpa_semisync(edges, split, rounds):
    """Pure-python replica of the semi-synchronous (2-colored) LPA."""
    from collections import defaultdict

    nodes = sorted({n for e in edges for n in e})
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        before = dict(labels)
        for cls in (lambda n: n < split, lambda n: n >= split):
            counts: dict[int, dict[int, int]] = defaultdict(
                lambda: defaultdict(int)
            )
            for s, d in edges:
                counts[d][labels[s]] += 1
            labels = {
                n: (
                    min(counts[n], key=lambda lb: (-counts[n][lb], lb))
                    if cls(n) and n in counts
                    else labels[n]
                )
                for n in nodes
            }
        if labels == before:
            break
    return dict(labels)


def test_lpa_semisync_kills_bipartite_oscillation(spark):
    """On a complete bipartite K_{2,3} the synchronous LPA oscillates
    (round-4 and round-5 labelings differ — the documented reason the
    registered sync query is fixed-round), while the semi-synchronous
    twin converges and matches the python replica."""
    left, right = [1, 2], [100, 101, 102]
    und = [(x, y) for x in left for y in right]
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src long, dst long")

    sync4 = {
        r["node"]: r["community"] for r in label_propagation(df, 4).collect()
    }
    sync5 = {
        r["node"]: r["community"] for r in label_propagation(df, 5).collect()
    }
    assert sync4 != sync5  # the oscillation the semisync twin fixes

    got = {
        r["node"]: r["community"]
        for r in lpa_semisync(df, F.col("node") < 100, 6).collect()
    }
    assert got == _py_lpa_semisync(edges, 100, 6)
    # one community: the half-step order makes the right side's min
    # label (100) the winner — the left side adopts it in the first
    # half-step, then feeds it back
    assert set(got.values()) == {100}


def test_lpa_semisync_converged_within_bound_on_corpus(spark, sf_dir):
    """The registered bound is a true fixpoint horizon on the real
    corpus: running 2 extra super-rounds changes nothing, which is
    exactly the property that makes the unrolled-to-the-bound oracle
    equal the early-stopped Spark result."""
    from p4_mapreduce_spark.operators.graph import graph_lpa_semisync
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
    at_bound = {
        (r["node"], r["community"])
        for r in graph_lpa_semisync(spark, sf_dir).collect()
    }
    beyond = {
        (r["node"], r["community"])
        for r in lpa_semisync(
            edges, F.col("node") < F.lit(1_000_000_000), _LPA_SEMI_MAX_ROUNDS + 2
        ).collect()
    }
    assert at_bound == beyond


def test_kcore_in_core_is_membership_not_degree(spark):
    """r11 ADVICE fix: at a non-converged horizon a survivor whose
    in-core neighbors were all peeled in the final round must still
    report in_core=true (survivor-set membership, the oracle's
    `node IN n_last`), with core_degree 0. Star X-{A,B}, pendants on
    A and B, k=2, rounds=2: round 1 peels the pendants, round 2 peels
    A and B (degree 1 within {X,A,B}), leaving alive={X} where X has
    zero within-core edges."""
    from tests.test_r10_ops import _py_kcore

    und = [(0, 1), (0, 2), (1, 10), (2, 11)]
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["in_core"], r["core_degree"])
        for r in kcore_peel(df, k=2, n_rounds=2).collect()
    }
    want = _py_kcore(edges, 2, 2)
    assert got == want
    assert got[0] == (True, 0)  # the exact divergence the fix closes


def test_overlap_salting_result_identical(spark, monkeypatch):
    """r11 hot-bin salting: with the cap forced low enough that the
    planted hot bin trips it, the salted rollup must equal the plain
    shape AND the combinatorial ground truth — every pair meets
    exactly once at (h(a), h(b)), so salting is result-identical by
    construction."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.operators import analytics as A

    n_hot = 40
    bin_us = A._OVERLAP_BIN_US
    hot_s = 100 * bin_us  # aligned: covers exactly one bin
    rows = [(u, 1, hot_s, hot_s + bin_us) for u in range(n_hot)]
    # plus background sessions in their own bins (no cross overlap)
    rows += [
        (u, 2, (200 + 3 * u) * bin_us, (200 + 3 * u) * bin_us + bin_us)
        for u in range(n_hot)
    ]
    sess = spark.createDataFrame(
        rows, "user_id long, island_id long, s long, e long"
    )
    monkeypatch.setattr(A, "_HOT_BIN_CAP", 16)

    def key(df):
        return sorted(map(tuple, df.collect()))

    plain = key(A.overlap_pairs_rollup(sess, skew_safe=False))
    salted = key(A.overlap_pairs_rollup(sess, skew_safe=True))
    assert salted == plain
    assert len(salted) == n_hot * (n_hot - 1) // 2
    # full-bin co-presence: every pair overlaps for the whole bin
    assert all(
        (n_ov, tot, mx) == (1, bin_us, bin_us)
        for (_, _, n_ov, tot, mx) in salted
    )
