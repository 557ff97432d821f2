"""Behavioral tests for the r6 operators: incremental ANN index
maintenance, decontamination, SCD2 build, snapshot diff, classifier
calibration, winnowing guarantee, Heaps growth, Simpson diversity,
triangle census, TF-IDF KNN. Oracle parity runs in test_oracle_parity;
these pin operator SEMANTICS on planted inputs and cross-query
invariants."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from p4_mapreduce_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# Winnowing guarantee (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def _winnow_fingerprints(ws: list[str], w: int = 4) -> set[str]:
    """Reference replica of the operator's per-doc kernel (same md5
    3-gram hashes, same window-min selection) for the guarantee
    property below; the planted Spark test pins that the registered
    query computes the same thing."""
    if len(ws) >= 3:
        h = [
            hashlib.md5(f"{ws[i]}_{ws[i + 1]}_{ws[i + 2]}".encode()).hexdigest()
            for i in range(len(ws) - 2)
        ]
    else:
        h = []
    if len(h) >= w:
        return {min(h[j : j + w]) for j in range(len(h) - w + 1)}
    return {min(h)} if h else set()


@settings(max_examples=100, deadline=None)
@given(
    left=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8),
    shared=st.lists(st.sampled_from("stuvwxyz"), min_size=6, max_size=10),
    right=st.lists(st.sampled_from("ijklmnop"), min_size=0, max_size=8),
)
def test_winnow_shared_run_guarantee(left, shared, right):
    """Any two docs sharing a run of >= W + k - 1 = 6 tokens MUST
    share at least one fingerprint — the MOSS guarantee the operator's
    docstring claims."""
    a = _winnow_fingerprints(left + shared)
    b = _winnow_fingerprints(shared + right)
    assert a & b, (left, shared, right)


def test_winnow_operator_matches_kernel(spark, tmp_path):
    """The registered query's fingerprint census equals the reference
    kernel's on planted docs (wiring check for the mapInPandas pass),
    and two docs sharing a 6-token run are mutually flagged."""
    d1 = "p q r s t u v extra tokens here"
    d2 = "different start p q r s t u v"
    d3 = "nothing in common with the others at all"
    rows = [
        (1, d1, "en", "s", len(d1)),
        (2, d2, "en", "s", len(d2)),
        (3, d3, "en", "s", len(d3)),
    ]
    base = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    out = {
        r.doc_id: r
        for r in REGISTRY["dedup_winnow_fingerprint"]
        .fn(spark, base)
        .collect()
    }
    for doc_id, text in [(1, d1), (2, d2), (3, d3)]:
        want = _winnow_fingerprints(text.split(" "))
        assert out[doc_id].n_fingerprints == len(want), doc_id
    assert out[1].n_dup_fingerprints > 0
    assert out[2].n_dup_fingerprints > 0
    assert out[3].n_dup_fingerprints == 0


# ---------------------------------------------------------------------------
# Incremental ANN / decontamination
# ---------------------------------------------------------------------------


def test_ann_incremental_orientation_and_self_pairs(spark, sf_dir):
    """Every emitted pair crosses the batch boundary (new % 3 == 0,
    existing % 3 != 0) and cosines clear the threshold."""
    rows = REGISTRY["ann_lsh_incremental"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.vec_id_new % 3 == 0 and r.vec_id_existing % 3 != 0
        assert r.cosine_sim >= 0.3


def test_decontaminate_flags_planted_leak(spark, tmp_path):
    """A test-split doc identical to a train doc is contaminated at
    jaccard 1.0 with the right match count; a unique test doc is
    clean; every test doc gets exactly one verdict row."""
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean = "totally unrelated words that appear nowhere else in corpus"
    rows = [
        (1, leak, "en", "s", len(leak)),  # train
        (2, leak, "en", "s", len(leak)),  # train (second copy)
        (8, leak, "en", "s", len(leak)),  # test: leaked
        (18, clean, "en", "s", len(clean)),  # test: clean
        (3, "some other train document body", "en", "s", 30),  # train
    ]
    base = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    out = {
        r.doc_id: r
        for r in REGISTRY["decontaminate_test_split"].fn(spark, base).collect()
    }
    assert set(out) == {8, 18}
    assert out[8].is_contaminated and out[8].n_train_matches == 2
    assert out[8].max_jaccard == 1.0
    assert not out[18].is_contaminated and out[18].n_train_matches == 0


# ---------------------------------------------------------------------------
# SCD2 / snapshot diff
# ---------------------------------------------------------------------------


def test_scd2_intervals_partition_time(spark, sf_dir):
    """Per user: versions are 1..n in effective_from order, intervals
    chain exactly (effective_to == next effective_from), exactly one
    open current version, and consecutive versions change status."""
    rows = REGISTRY["scd2_dimension_build"].fn(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, vs in list(by_user.items())[:200]:
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        assert sum(1 for v in vs if v.is_current) == 1
        assert vs[-1].is_current and vs[-1].effective_to_us is None
        for a, b in zip(vs, vs[1:]):
            assert a.effective_to_us == b.effective_from_us, user
            assert a.status != b.status, user


def test_snapshot_diff_set_algebra(spark, sf_dir):
    """added/removed/changed classification matches the defining set
    algebra recomputed from the base table."""
    from p4_mapreduce_spark.sources.tables import load

    out = {r.o_orderkey: r for r in
           REGISTRY["snapshot_diff"].fn(spark, sf_dir).collect()}
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    for r in base:
        k = r.o_orderkey
        in_old, in_new = k % 11 != 0, k % 13 != 0
        changed = in_old and in_new and k % 5 == 0
        if in_new and not in_old:
            assert out[k].change_type == "added", k
        elif in_old and not in_new:
            assert out[k].change_type == "removed", k
        elif changed:
            assert out[k].change_type == "changed", k
            assert out[k].new_totalprice == pytest.approx(
                r.o_totalprice * 1.1
            )
        else:
            assert k not in out or out[k].change_type not in (
                "added",
                "removed",
            ), k


# ---------------------------------------------------------------------------
# Calibration / Heaps / Simpson / triangles / KNN
# ---------------------------------------------------------------------------


def test_calibration_bins_are_coherent(spark, sf_dir):
    rows = REGISTRY["quality_classifier_calibration"].fn(
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert r.bucket / 10 - 1e-9 <= r.mean_score <= (r.bucket + 1) / 10 + 1e-9
        assert 0.0 <= r.positive_rate <= 1.0
        assert r.abs_gap == pytest.approx(
            abs(r.mean_score - r.positive_rate)
        )


def test_heaps_totals_close(spark, sf_dir):
    """Sum of per-batch new words == corpus distinct vocabulary; the
    cumulative columns run monotonically."""
    from p4_mapreduce_spark.sources.tables import load

    rows = sorted(
        REGISTRY["heaps_law_vocab_growth"].fn(spark, sf_dir).collect(),
        key=lambda r: r.batch,
    )
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " ", -1), lambda x: x != "")
            ).alias("w")
        )
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    assert rows[-1].cum_vocab == vocab
    assert sum(r.n_new_words for r in rows) == vocab
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens == a.cum_tokens + b.n_tokens
        assert b.cum_vocab == a.cum_vocab + b.n_new_words


def test_simpson_bounds(spark, sf_dir):
    rows = REGISTRY["simpson_diversity_by_source"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.simpson_index <= 1.0
        assert 1.0 <= r.effective_vocab <= r.n_tokens
        # Cauchy-Schwarz: sum c^2 >= N^2/V, so effective vocab is at
        # most V(N-1)/(N-V) — uniform usage is the diversity ceiling
        if r.n_tokens > r.vocab_size:
            ceiling = (
                r.vocab_size
                * (r.n_tokens - 1)
                / (r.n_tokens - r.vocab_size)
            )
            assert r.effective_vocab <= ceiling + 1e-9


def test_triangle_census_vs_bruteforce(spark, sf_dir):
    """Triangle and wedge counts equal a python recount over the same
    edge list."""
    edges = {
        (r.doc_id_a, r.doc_id_b)
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for (a, b) in edges
        for c in adj[a] & adj[b]
        if b < c
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    out = REGISTRY["neardup_triangle_census"].fn(spark, sf_dir).collect()[0]
    assert out.n_edges == len(edges)
    assert out.n_triangles == tri
    assert out.n_wedges == wedges
    assert out.n_nodes == len(adj)


def test_tfidf_knn_ranks_contiguous(spark, sf_dir):
    rows = REGISTRY["tfidf_doc_knn"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r.rk)
        assert [r.rk for r in lst] == list(range(1, len(lst) + 1))
        sims = [r.cosine_sim for r in lst]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in lst)
