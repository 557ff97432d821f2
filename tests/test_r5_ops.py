"""Behavioral tests for the r5 operators: incremental MinHash dedup,
PQ ADC search, ANN recall verdict, and the composed k-means→SemDeDup
pipeline. Oracle parity runs in test_oracle_parity; these pin the
operator SEMANTICS on planted inputs and cross-query invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from p4_mapreduce_spark.registry import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def incr_docs_dir(spark, tmp_path_factory):
    """Near-dup structure across the doc_id % 3 batch boundary:

    - 1, 2 (existing) and 3 (incoming) identical -> exact cross pairs
    - 4, 5 (existing) near-dup of the group (one token of 12 changed,
      jaccard 9/11 >= 0.8) -> near cross pairs for incoming doc 3
    - 6 (incoming) unrelated -> no pairs
    - 7 (existing) empty, 8 (existing) single token -> no shingles
    """
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    rows = [
        (1, base, "en", "src0", len(base)),
        (2, base, "en", "src0", len(base)),
        (3, base, "en", "src0", len(base)),
        (4, near, "en", "src0", len(near)),
        (5, near, "es", "src2", len(near)),
        (6, "completely different words here that share nothing at all",
         "en", "src0", 57),
        (7, "", "fr", "src3", 0),
        (8, "solo", "en", "src0", 4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path_factory.mktemp("incrdocs"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_minhash_incremental_cross_batch_only(spark, incr_docs_dir):
    """Every emitted pair crosses the batch boundary (new % 3 == 0,
    existing % 3 != 0), exact cross-copies land at jaccard 1.0, near
    dups at the rep-level jaccard, unrelated docs at nothing."""
    out = {
        (r.doc_id_new, r.doc_id_existing): r.jaccard
        for r in REGISTRY["dedup_minhash_incremental"]
        .fn(spark, incr_docs_dir)
        .collect()
    }
    for (dn, de) in out:
        assert dn % 3 == 0 and de % 3 != 0, (dn, de)
    # doc 3 == docs 1, 2 exactly; near-dups 4, 5 at 9/11
    assert out[(3, 1)] == 1.0 and out[(3, 2)] == 1.0
    assert abs(out[(3, 4)] - 9.0 / 11.0) < 1e-12
    assert abs(out[(3, 5)] - 9.0 / 11.0) < 1e-12
    # incoming doc 6 shares nothing; 7/8 have no shingles
    assert set(out) == {(3, 1), (3, 2), (3, 4), (3, 5)}, out


def test_minhash_incremental_subset_of_full(spark, sf_dir):
    """The incremental result is exactly the cross-batch slice of the
    full self-join dedup — running the daily operator loses nothing
    the bootstrap pass would have found across the boundary. Compared
    as unordered pairs (the full dedup orients by id, the incremental
    by batch side)."""
    full_cross = {
        frozenset((r.doc_id_a, r.doc_id_b))
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
        if (r.doc_id_a % 3 == 0) != (r.doc_id_b % 3 == 0)
    }
    incr = {
        frozenset((r.doc_id_new, r.doc_id_existing))
        for r in REGISTRY["dedup_minhash_incremental"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert incr == full_cross


def test_pq_adc_matches_reconstructed_bruteforce(spark, sf_dir):
    """ADC distances are the true distances between each vector's PQ
    RECONSTRUCTION and the query (up to 1e-6 micro-quantization per
    subspace): recompute them from pq_codes + the codebook in Python
    and pin the emitted top-k ordering."""
    import math

    from p4_mapreduce_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUBDIM,
        QUERY_IDS,
        TOP_K,
    )
    from p4_mapreduce_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = {
        int(r.vec_id): [float(v) for v in r.embedding]
        for r in emb.where(F.col("vec_id") < _PQ_K).collect()
    }
    qvecs = {
        int(r.vec_id): [float(v) for v in r.embedding]
        for r in emb.where(F.col("vec_id").isin(*QUERY_IDS)).collect()
    }
    codes = {
        r.vec_id: r.pq_code
        for r in REGISTRY["pq_codes"].fn(spark, sf_dir).collect()
    }

    def adc(qid: int, code: int) -> int:
        total = 0
        for q in range(_PQ_M):
            c = (code // (16**q)) % 16
            d = 0.0
            off = q * _PQ_SUBDIM
            for j in range(_PQ_SUBDIM):
                t = qvecs[qid][off + j] - cents[c][off + j]
                d = d + t * t
            total += int(math.floor(d * 1e6 + 0.5))
        return total

    rows = REGISTRY["pq_adc_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == len(QUERY_IDS) * TOP_K
    for r in rows:
        assert r.adc_dist_micro == adc(r.query_id, codes[r.neighbor_id]), r
    # per-query ranks are 1..k and distances non-decreasing in rank
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, TOP_K + 1))
        dists = [r.adc_dist_micro for r in rs]
        assert dists == sorted(dists)
        assert all(r.neighbor_id != q for r in rs)


def test_ann_recall_counts_consistent(spark, sf_dir):
    """The recall table's n_hits must equal the actual overlap between
    each approximate arm's top-k and the exact top-k, and recall is
    n_hits / k."""
    from p4_mapreduce_spark.operators.similarity import QUERY_IDS, TOP_K

    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_bruteforce_topk"].fn(spark, sf_dir).collect()
    }
    arms = {
        "lsh": REGISTRY["ann_lsh_bucketed"],
        "ivf": REGISTRY["ann_ivf_probe"],
    }
    want = {}
    for m, spec in arms.items():
        for r in spec.fn(spark, sf_dir).collect():
            if (r.query_id, r.neighbor_id) in exact:
                want[(m, r.query_id)] = want.get((m, r.query_id), 0) + 1
    rows = REGISTRY["ann_lsh_recall"].fn(spark, sf_dir).collect()
    assert len(rows) == 2 * len(QUERY_IDS)
    for r in rows:
        assert r.n_hits == want.get((r.method, r.query_id), 0), r
        assert abs(r.recall_at_10 - r.n_hits / TOP_K) < 1e-15
        assert 0 <= r.n_hits <= TOP_K
        assert r.n_candidates >= r.n_hits


def test_repetition_screen_planted_loops(spark, tmp_path):
    """A looping page (one bigram dominating) must fail the screen; a
    normal page passes; degenerate short docs pass vacuously with
    zeroed metrics."""
    rows = [
        (1, "buy now " * 20 + "buy", "en", "s", 0),  # top bigram ~1/2
        (2, "the quick brown fox jumps over the lazy dog today", "en", "s", 0),
        (3, "", "en", "s", 0),
        (4, "solo", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "repdocs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    res = {
        r.doc_id: r
        for r in REGISTRY["quality_repetition_screen"].fn(spark, out).collect()
    }
    # doc 1: 41 tokens alternating buy/now -> 40 bigrams split evenly
    # between 'buy_now' (20) and 'now_buy' (20); trigrams all repeats
    # after the first two
    assert res[1].top_bigram_n == 20 and res[1].n_bigrams == 40
    assert res[1].top_bigram_share == 0.5
    assert not res[1].r_top_bigram and not res[1].r_dup_trigram
    assert not res[1].keep
    assert res[2].top_bigram_n == 1 and res[2].dup_trigram_frac == 0.0
    assert res[2].keep
    for d in (3, 4):  # no bigrams/trigrams at all
        assert res[d].n_bigrams == 0 and res[d].n_trigrams == 0
        assert res[d].top_bigram_share == 0.0 and res[d].keep


def test_ivfadc_consistent_with_flat_adc(spark, sf_dir):
    """IVFADC == flat ADC restricted to the query's coarse cluster:
    every emitted neighbor shares the query's label, its distance
    equals the flat ADC distance for the same pair, and the result is
    exactly the top-k of the flat ranking filtered to the cluster."""
    from p4_mapreduce_spark.operators.similarity import QUERY_IDS, TOP_K
    from p4_mapreduce_spark.sources.tables import load

    labels = {
        r.vec_id: r.label
        for r in load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    flat = {
        (r.query_id, r.neighbor_id): r.adc_dist_micro
        for r in REGISTRY["pq_adc_topk"].fn(spark, sf_dir).collect()
    }
    rows = REGISTRY["ivfadc_search"].fn(spark, sf_dir).collect()
    assert len(rows) == len(QUERY_IDS) * TOP_K
    for r in rows:
        assert labels[r.neighbor_id] == labels[r.query_id], r
        # flat ADC only kept its own global top-k; where the pair
        # appears in both, the micro distances must be identical
        if (r.query_id, r.neighbor_id) in flat:
            assert r.adc_dist_micro == flat[(r.query_id, r.neighbor_id)], r
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, TOP_K + 1))
        dists = [r.adc_dist_micro for r in rs]
        assert dists == sorted(dists)


def test_winnow_guarantee_and_sparsity(spark, tmp_path):
    """The winnowing guarantee: two docs sharing a token run of
    >= w + k - 1 = 6 tokens MUST share a fingerprint; unrelated docs
    share none; and the fingerprint set is sparser than the k-gram
    set (that is winnowing's point)."""
    shared = "one two three four five six seven"  # 7-token shared run
    rows = [
        (1, shared + " aardvark bobcat caiman dingo egret", "en", "s", 0),
        (2, "zebu yak wolf vole urchin " + shared, "en", "s", 0),
        (3, "totally unrelated words in this document here now", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "winnowdocs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    res = {
        r.doc_id: r
        for r in REGISTRY["dedup_winnow_fingerprint"].fn(spark, out).collect()
    }
    assert res[1].n_dup_fingerprints > 0
    assert res[2].n_dup_fingerprints > 0
    assert res[3].n_dup_fingerprints == 0
    for d in (1, 2, 3):
        # sparsity: selected fingerprints number at most the window
        # count and strictly fewer than the k-grams for docs longer
        # than one window
        assert res[d].n_fingerprints <= res[d].n_kgrams
        assert res[d].n_fingerprints <= res[d].n_kgrams - 4 + 1


def test_audio_features_invariants(spark, sf_dir):
    """Frame accounting and energy bounds against an independent
    Python decode of the same payload convention."""
    import math

    from p4_mapreduce_spark.sources.tables import load

    nbytes = {
        r.doc_id: len(r.text.encode("utf-8"))
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if len(r.text) > 0
    }
    rows = REGISTRY["multimodal_audio_features"].fn(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(nbytes)
    for r in rows:
        assert r.n_samples == math.ceil(nbytes[r.doc_id] / 2)
        assert r.n_frames == math.ceil(r.n_samples / 160)
        assert 0 <= r.max_frame_energy <= r.sumsq
        assert r.peak_abs**2 <= r.max_frame_energy


def test_split_balance_audit_shape(spark, sf_dir):
    """One row per split, n_docs partitions the corpus, chi2 micros are
    non-negative, and df comes from the actual language count."""
    from p4_mapreduce_spark.sources.tables import load

    rows = REGISTRY["split_balance_audit"].fn(spark, sf_dir).collect()
    assert {r.split for r in rows} == {"train", "val", "test"}
    n_corpus = load(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_corpus
    n_langs = (
        load(spark, sf_dir, "documents").select("lang").distinct().count()
    )
    for r in rows:
        assert r.chi2_micro >= 0
        assert r.n_langs == n_langs
        assert r.balanced == (r.chi2_micro <= 2_000_000 * (n_langs - 1))


def test_semdedup_pipeline_uses_fitted_clusters(spark, sf_dir):
    """The composed pipeline's block key IS the k-means fit (blk //
    256 matches kmeans_embedding_clusters row-for-row at this corpus
    size, where k equals the demo's k=4, the sampled fit is shared,
    and the sub-block bits are 0 — see test_r7_ops for the bits>0
    path), and within every block the minimum vec_id is always kept."""
    km = {
        r.vec_id: r.cluster
        for r in REGISTRY["kmeans_embedding_clusters"].fn(spark, sf_dir).collect()
    }
    rows = REGISTRY["semdedup_pipeline"].fn(spark, sf_dir).collect()
    assert {r.vec_id: r.blk // 256 for r in rows} == km
    min_per_block = {}
    for r in rows:
        if r.blk not in min_per_block or r.vec_id < min_per_block[r.blk]:
            min_per_block[r.blk] = r.vec_id
    by_id = {r.vec_id: r for r in rows}
    for c, v in min_per_block.items():
        assert by_id[v].kept, (c, v)
        assert by_id[v].n_dup_lower == 0


def _write_docs(spark, out, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def test_rendezvous_minimal_disruption(spark, sf_dir):
    """HRW contract: adding shard 9 moves ~1/9 of keys (mod-hashing
    would move ~8/9); shard ids stay in range and counts cover the
    corpus."""
    rows = REGISTRY["rendezvous_shard_assign"].fn(spark, sf_dir).collect()
    n_docs = sum(r.n_docs for r in rows)
    n_moved = sum(r.n_moved for r in rows)
    assert {r.shard for r in rows} <= set(range(8))
    frac = n_moved / n_docs
    assert 0.04 < frac < 0.25, frac  # expected 1/9 ~ 0.111
    for r in rows:
        assert 0 <= r.n_moved <= r.n_docs


def test_unimax_budget_conservation(spark, sf_dir):
    """The greedy spends the whole budget (uncapped sources must exist
    when budget_x < epoch_cap), capped sources sit exactly at the
    epoch cap, uncapped sources share one equal allocation >= every
    capped one."""
    rows = REGISTRY["unimax_mixture_budget"].fn(spark, sf_dir).collect()
    total = sum(r.n_tok for r in rows)
    budget = 2 * total
    spent = sum(r.alloc_tok for r in rows)
    assert abs(spent - budget) < 1e-3 * budget, (spent, budget)
    uncapped = sorted(r.alloc_tok for r in rows if not r.capped)
    assert uncapped, "budget_x < epoch_cap forces an uncapped source"
    assert uncapped[-1] - uncapped[0] < 1e-6  # equal share
    for r in rows:
        if r.capped:
            assert abs(r.epochs - 4.0) < 1e-6
            assert r.alloc_tok <= uncapped[0] + 1e-6
        else:
            assert r.epochs <= 4.0 + 1e-6


def test_unimax_planted_two_sources(spark, tmp_path):
    """10-token source capped at 4 epochs; the big source takes the
    remainder of the 2x budget."""
    out = str(tmp_path / "unimax")
    rows = [(1, " ".join(["a"] * 10), "en", "tiny", 20)]
    rows += [
        (2 + i, " ".join(["b"] * 100), "en", "big", 200) for i in range(10)
    ]
    _write_docs(spark, out, rows)
    res = {r.source: r for r in
           REGISTRY["unimax_mixture_budget"].fn(spark, out).collect()}
    assert res["tiny"].capped and res["tiny"].alloc_tok == 40.0
    assert not res["big"].capped
    assert abs(res["big"].alloc_tok - (2 * 1010 - 40)) < 1e-6
    assert abs(res["big"].epochs - 1980 / 1000) < 1e-6


def test_naive_bayes_separable_vocab(spark, tmp_path):
    """Disjoint vocabularies => NB classifies every doc correctly:
    the confusion matrix is diagonal."""
    out = str(tmp_path / "nb")
    rows = [
        (i, "aa bb cc aa", "en", "s", 11) for i in range(6)
    ] + [
        (10 + i, "xx yy zz xx", "fr", "s", 11) for i in range(6)
    ]
    _write_docs(spark, out, rows)
    res = REGISTRY["naive_bayes_langid"].fn(spark, out).collect()
    assert {(r.lang, r.pred_lang, r.n) for r in res} == {
        ("en", "en", 6), ("fr", "fr", 6)
    }


def test_frequent_itemsets_planted_baskets(spark, tmp_path):
    """Orders 1-20 hold brands {A, B}, 21-40 hold {C, D}: only those
    two pairs survive, each with support 20, lift 2 (perfect
    co-occurrence across half the baskets), confidence 1."""
    out = str(tmp_path / "basket")
    part = spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B"), (3, "Brand#C"), (4, "Brand#D")],
        "p_partkey long, p_brand string",
    )
    li = spark.createDataFrame(
        [(ok, pk) for ok in range(1, 21) for pk in (1, 2)]
        + [(ok, pk) for ok in range(21, 41) for pk in (3, 4)],
        "l_orderkey long, l_partkey long",
    )
    part.coalesce(1).write.mode("overwrite").parquet(f"{out}/part.parquet")
    li.coalesce(1).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    res = REGISTRY["frequent_itemsets_pairs"].fn(spark, out).collect()
    got = {(r.brand_a, r.brand_b): r for r in res}
    assert set(got) == {("Brand#A", "Brand#B"), ("Brand#C", "Brand#D")}
    for r in got.values():
        assert r.support == 20
        assert r.support_frac == 0.5
        assert r.lift == 2.0
        assert r.conf_a_b == 1.0 and r.conf_b_a == 1.0


def test_mutual_information_extremes(spark, tmp_path):
    """Perfect lang<->source dependence gives MI = ln 2 (2 symmetric
    cells); full independence gives MI = 0 and every lift = 1."""
    import math

    out1 = str(tmp_path / "dep")
    rows = [(i, "t", "en", "s_en", 1) for i in range(10)]
    rows += [(100 + i, "t", "fr", "s_fr", 1) for i in range(10)]
    _write_docs(spark, out1, rows)
    res = REGISTRY["mutual_information_lang_source"].fn(spark, out1).collect()
    assert abs(sum(r.mi_term for r in res) - math.log(2)) < 1e-5
    for r in res:
        assert abs(r.lift - 2.0) < 1e-6

    out2 = str(tmp_path / "ind")
    rows = []
    i = 0
    for lang in ("en", "fr"):
        for src in ("s0", "s1"):
            for _ in range(5):
                rows.append((i, "t", lang, src, 1))
                i += 1
    _write_docs(spark, out2, rows)
    res = REGISTRY["mutual_information_lang_source"].fn(spark, out2).collect()
    assert abs(sum(r.mi_term for r in res)) < 1e-5
    for r in res:
        assert r.lift == 1.0 and r.pmi == 0.0


def test_ccnet_buckets_ordered(spark, sf_dir):
    """Per language: tercile buckets are ~n/3 each and mean perplexity
    is monotone head <= middle <= tail (CCNet's defining invariant)."""
    rows = REGISTRY["ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, (lang, set(b))
        n = sum(r.n_docs for r in b.values())
        for r in b.values():
            assert abs(r.n_docs - n / 3) <= n / 6 + 2, (lang, r)
        assert b["head"].avg_ppl <= b["middle"].avg_ppl <= b["tail"].avg_ppl


def test_kl_drift_nonnegative_and_orders_skew(spark, sf_dir, tmp_path):
    """KL(source || corpus) is >= 0 (both sides are proper
    distributions over the kept support); a source collapsed onto one
    token scores far above a corpus-typical source."""
    for r in REGISTRY["kl_source_drift"].fn(spark, sf_dir).collect():
        assert r.kl_nats >= -1e-9, r

    out = str(tmp_path / "kl")
    rows = [(i, "aa bb cc dd", "en", "balanced", 11) for i in range(80)]
    rows += [(100 + i, "aa aa aa aa", "en", "collapsed", 11) for i in range(8)]
    _write_docs(spark, out, rows)
    res = {r.source: r.kl_nats for r in
           REGISTRY["kl_source_drift"].fn(spark, out).collect()}
    assert res["collapsed"] > res["balanced"] + 0.2, res


def test_zipf_planted_power_law(spark, tmp_path):
    """A corpus built with count(rank r) = floor(100/r) must fit
    slope ~ -1 with near-perfect r2."""
    out = str(tmp_path / "zipf")
    toks = []
    for r in range(1, 11):
        toks += [f"w{r:02d}"] * (100 // r)
    _write_docs(spark, out, [(1, " ".join(toks), "en", "s", len(toks))])
    row = REGISTRY["zipf_fit_top_terms"].fn(spark, out).collect()[0]
    assert row.n_terms == 10
    assert -1.1 < row.slope < -0.9, row
    assert row.r2 > 0.98, row


def test_skyline_exact_vs_bruteforce(spark, sf_dir):
    """Every emitted order is non-dominated and every omitted order is
    weakly dominated — checked against the O(n^2) definition."""
    import pandas as pd

    from p4_mapreduce_spark.sources.tables import load

    orders = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    sky = {
        r.o_orderkey
        for r in REGISTRY["skyline_pareto_orders"].fn(spark, sf_dir).collect()
    }
    d = orders["o_orderdate"].to_numpy()
    p = orders["o_totalprice"].to_numpy()
    dominated = set()
    for i in range(len(orders)):
        mask = (
            (d >= d[i]) & (p >= p[i]) & ((d > d[i]) | (p > p[i]))
        )
        if mask.any():
            dominated.add(int(orders["o_orderkey"].iloc[i]))
    expected = set(orders["o_orderkey"].astype(int)) - dominated
    assert sky == expected, (len(sky), len(expected))


def test_bloom_no_false_negatives_and_fpr(spark, sf_dir):
    """Structural: zero false negatives; statistical: measured FPR in
    the ballpark of (1 - e^{-kn/m})^k for the geometry."""
    row = REGISTRY["bloom_filter_membership"].fn(spark, sf_dir).collect()[0]
    assert row.n_missed_members == 0
    assert row.n_hits == row.n_members + row.n_false_pos
    assert 0.0 <= row.fpr < 0.05, row


def test_markov_probabilities_normalize(spark, sf_dir):
    """Outgoing probabilities per from_type sum to ~1 and counts are
    consistent with the conditional definition."""
    rows = REGISTRY["markov_event_transitions"].fn(spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for f_, rs in by_from.items():
        total = sum(r.n for r in rs)
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-4, f_
        for r in rs:
            assert abs(r.p - r.n / total) < 1e-6


def test_medoid_is_argmin_member(spark, sf_dir):
    """The emitted medoid must be the member of its label with the
    smallest quantized distance to the label centroid — recomputed in
    numpy."""
    import numpy as np

    from p4_mapreduce_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings").toPandas()
    res = {r.label: r for r in
           REGISTRY["label_centroid_medoid"].fn(spark, sf_dir).collect()}
    for label, grp in emb.groupby("label"):
        X = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        xu = np.floor(X * 1e6 + 0.5).astype(np.int64)
        cent = (xu.sum(axis=0) / len(xu)) / 1e6
        d = np.floor((X - cent) ** 2 * 1e9 + 0.5).astype(np.int64).sum(axis=1)
        order = sorted(zip(d, grp["vec_id"].to_numpy()))
        r = res[label]
        assert r.n_members == len(grp)
        assert (order[0][0], order[0][1]) == (
            int(r.centroid_dist_sq * 1e9 + 0.5), r.medoid_vec_id
        ), (label, order[0], r)


def test_seasonal_anomalies_outside_band(spark, sf_dir):
    rows = REGISTRY["seasonal_baseline_anomalies"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ratio > 1.3 or r.ratio < 0.7, r
        assert 0 <= r.dow <= 6
        assert r.rev > 0


def test_dp_counts_postprocessing(spark, sf_dir):
    from p4_mapreduce_spark.sources.tables import load

    rows = REGISTRY["dp_noisy_lang_counts"].fn(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.true_n for r in rows) == n_docs
    for r in rows:
        assert r.noisy_n == max(r.true_n + r.noise, 0)
        assert abs(r.noise) < 40  # eps=1 two-sided geometric tail


def test_cascade_delete_consistency(spark, sf_dir):
    import pyspark.sql.functions as SF

    from p4_mapreduce_spark.sources.tables import load

    rows = {r.table_name: r.n_rows for r in
            REGISTRY["cascade_delete_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    n_cust = load(spark, sf_dir, "customer").count()
    # ~5% bucket, loose binomial bounds
    assert 0.01 * n_cust < rows["customer"] < 0.12 * n_cust
    assert rows["lineitem"] >= rows["orders"] >= rows["customer"] >= 1


def test_cms_collisions_overestimate_only(spark, tmp_path):
    """With vocabulary >> width the grid must collide: estimates may
    exceed exact counts but never undercut them, and the overestimate
    stays within a generous multiple of N/w."""
    out = str(tmp_path / "cms")
    toks = []
    # 3000 distinct filler words (one occurrence each) + 10 heavy words
    toks += [f"f{i:04d}" for i in range(3000)]
    for r in range(10):
        toks += [f"heavy{r}"] * (200 - r)
    docs = [
        (i, " ".join(toks[i * 100:(i + 1) * 100]), "en", "s", 100)
        for i in range((len(toks) + 99) // 100)
    ]
    _write_docs(spark, out, docs)
    rows = REGISTRY["countmin_sketch_estimates"].fn(spark, out).collect()
    assert len(rows) == 10
    n_total = len(toks)
    for r in rows:
        assert r.never_underestimates and r.overestimate >= 0
        assert r.exact_n == 200 - int(r.word[-1])
        assert r.overestimate <= 8 * n_total / 1024, r


def test_attribution_shares_and_planted_direct(spark, sf_dir, tmp_path):
    rows = REGISTRY["attribution_last_touch"].fn(spark, sf_dir).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert all(r.channel != "purchase" for r in rows)


def test_rolling_wau_bounds(spark, sf_dir):
    """WAU >= DAU always, and WAU <= sum of the 7 trailing DAUs."""
    rows = {r.day: r for r in
            REGISTRY["rolling_active_users"].fn(spark, sf_dir).collect()}
    for day, r in rows.items():
        assert r.wau >= r.dau, r
        window_sum = sum(
            rows[d].dau for d in range(day - 6, day + 1) if d in rows
        )
        assert r.wau <= window_sum, r


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    toks=st.lists(st.integers(min_value=1, max_value=500),
                  min_size=2, max_size=8)
)
@pytest.mark.slow  # r14 driver-window split (see pytest.ini)
def test_unimax_matches_reference_greedy(spark, tmp_path_factory, toks):
    """The windowed closed form must equal the sequential greedy
    (visit sources smallest-first; each takes min(4 * its tokens, an
    even share of the remaining budget)) on random size profiles."""
    out = str(tmp_path_factory.mktemp("unimax_fuzz"))
    rows = [
        (i, " ".join(["w"] * n), "en", f"s{i:02d}", n)
        for i, n in enumerate(toks)
    ]
    _write_docs(spark, out, rows)
    res = {r.source: r for r in
           REGISTRY["unimax_mixture_budget"].fn(spark, out).collect()}

    budget = 2 * sum(toks)
    order = sorted(range(len(toks)), key=lambda i: (toks[i], f"s{i:02d}"))
    remaining, alloc = float(budget), {}
    for pos, i in enumerate(order):
        quota = remaining / (len(toks) - pos)
        take = min(4.0 * toks[i], quota)
        alloc[f"s{i:02d}"] = take
        remaining -= take
    assert len(res) == len(toks)
    for src, want in alloc.items():
        assert abs(res[src].alloc_tok - want) < 1e-6 + 1e-9 * want, (
            src, res[src].alloc_tok, want
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6),
                  st.integers(min_value=1, max_value=20)),
        min_size=1, max_size=40,
    )
)
@pytest.mark.slow  # r14 driver-window split (see pytest.ini)
def test_skyline_fuzz_vs_bruteforce(spark, tmp_path_factory, pts):
    """Random (date, price) clouds with heavy ties: the calendar-
    reduced skyline must equal the O(n^2) weak-dominance definition."""
    import datetime

    out = str(tmp_path_factory.mktemp("sky_fuzz"))
    rows = [
        (i, datetime.datetime(2024, 1, 1 + d), float(p))
        for i, (d, p) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp_ntz, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    sky = {
        r.o_orderkey
        for r in REGISTRY["skyline_pareto_orders"].fn(spark, out).collect()
    }
    expected = set()
    for i, (d, p) in enumerate(pts):
        dominated = any(
            (d2 >= d and p2 >= p and (d2 > d or p2 > p))
            for j, (d2, p2) in enumerate(pts) if j != i
        )
        if not dominated:
            expected.add(i)
    assert sky == expected, (sky, expected, pts)


def test_char_entropy_planted_extremes(spark, tmp_path):
    """A single-character doc has zero entropy (flagged); a uniform
    4-char doc has exactly ln(4); natural-ish prose clears the floor."""
    import math

    out = str(tmp_path / "ent")
    rows = [
        (1, "aaaaaaaaaaaaaaaa", "en", "s", 16),
        (2, "abcd" * 8, "en", "s", 32),
        (3, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
        (4, "", "en", "s", 0),
    ]
    _write_docs(spark, out, rows)
    res = {r.doc_id: r for r in
           REGISTRY["char_entropy_screen"].fn(spark, out).collect()}
    assert set(res) == {1, 2, 3}  # empty doc excluded
    assert res[1].entropy_nats == 0.0 and res[1].is_low_entropy
    assert abs(res[2].entropy_nats - math.log(4)) < 1e-5
    assert res[2].is_low_entropy  # ln(4) ~ 1.386 < 2.5
    assert res[3].entropy_nats > 2.5 and not res[3].is_low_entropy


def test_quality_funnel_planted(spark, tmp_path):
    """A curated English-like doc passes all three screens; a looping
    doc fails repetition; a key-mash fails entropy; the funnel counts
    reflect the per-screen verdicts exactly."""
    out = str(tmp_path / "funnel")
    stops = ["the", "of", "and", "that", "have", "with"]
    good = " ".join(
        f"{stops[i % 6]} w{i:03d}" for i in range(60)
    )  # mean word len (3 + 4) / 2 = 3.5, inside the [3.0, 4.5] gate
    rows = [
        (1, good.strip(), "en", "s", len(good)),
        (2, "buy now " * 60 + "buy", "en", "s", 0),
        (3, "a" * 400, "en", "s", 400),
        (4, "", "en", "s", 0),
    ]
    _write_docs(spark, out, rows)
    row = REGISTRY["quality_screen_funnel"].fn(spark, out).collect()[0]
    gop = {r.doc_id: r.keep for r in
           REGISTRY["quality_gopher_rules"].fn(spark, out).collect()}
    rep = {r.doc_id: r.keep for r in
           REGISTRY["quality_repetition_screen"].fn(spark, out).collect()}
    ent = {r.doc_id: not r.is_low_entropy for r in
           REGISTRY["char_entropy_screen"].fn(spark, out).collect()}
    assert row.n_docs == 4
    assert row.pass_gopher == sum(gop.values())
    assert row.pass_repetition == sum(rep.values())
    assert row.pass_entropy == sum(ent.values())  # doc 4 absent -> fail
    assert row.pass_all == sum(
        gop[d] and rep[d] and ent.get(d, False) for d in gop
    )
    assert gop[1] and rep[1] and ent[1]  # the curated doc survives all
    assert not rep[2]
    assert not ent[3]
    assert row.pass_all >= 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
@pytest.mark.slow  # r14 driver-window split (see pytest.ini)
def test_naive_bayes_fuzz_vs_reference(spark, tmp_path_factory, data):
    """Replicate the NB scoring (bigint-micro quantized lns, factored
    normalizer, score-desc/class-desc argmax) in pure Python on random
    corpora and pin the confusion matrix."""
    import math
    from collections import Counter, defaultdict

    langs = data.draw(st.sampled_from([("en", "fr"), ("en", "fr", "zh")]))
    vocab = [f"v{i}" for i in range(data.draw(st.integers(4, 10)))]
    docs = []
    n_docs = data.draw(st.integers(3, 10))
    for i in range(n_docs):
        lang = langs[i % len(langs)]
        words = data.draw(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=12)
        )
        docs.append((i, " ".join(words), lang, "s", 0))
    out = str(tmp_path_factory.mktemp("nb_fuzz"))
    _write_docs(spark, out, docs)

    uln = lambda x: math.floor(math.log(x) * 1e6 + 0.5)  # noqa: E731
    cwc, nc, dprior = Counter(), Counter(), Counter()
    toks = {}
    for i, text, lang, _, _ in docs:
        ws = [w for w in text.split(" ") if w]
        toks[i] = (ws, lang)
        dprior[lang] += 1
        for w in ws:
            cwc[(w, lang)] += 1
            nc[lang] += 1
    V = len({w for w, _ in cwc})
    nd = len(docs)
    conf = defaultdict(int)
    for i, (ws, lang) in toks.items():
        best = None
        for lm in sorted(dprior, reverse=True):
            s = sum(uln(cwc[(w, lm)] + 1) for w in ws if (w, lm) in cwc)
            score = (
                s + uln(dprior[lm] / nd) - len(ws) * uln(nc[lm] + V)
            )
            if best is None or score > best[0]:
                best = (score, lm)
        conf[(lang, best[1])] += 1

    got = {
        (r.lang, r.pred_lang): r.n
        for r in REGISTRY["naive_bayes_langid"].fn(spark, out).collect()
    }
    assert got == dict(conf), (got, dict(conf))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
@pytest.mark.slow  # r14 driver-window split (see pytest.ini)
def test_frequent_itemsets_fuzz_vs_itertools(spark, tmp_path_factory, data):
    """Random baskets: supports/lift/confidence must match the direct
    itertools computation over the same threshold."""
    from itertools import combinations

    brands = [f"Brand#{c}" for c in "ABCDE"]
    n_orders = data.draw(st.integers(4, 12))
    baskets = {
        ok: sorted(
            set(data.draw(st.lists(st.sampled_from(brands),
                                   min_size=1, max_size=4)))
        )
        for ok in range(1, n_orders + 1)
    }
    part = [(i + 1, b) for i, b in enumerate(brands)]
    pk = {b: i + 1 for i, b in enumerate(brands)}
    li = [(ok, pk[b]) for ok, bs in baskets.items() for b in bs]
    out = str(tmp_path_factory.mktemp("fi_fuzz"))
    spark.createDataFrame(part, "p_partkey long, p_brand string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{out}/part.parquet")
    spark.createDataFrame(li, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    supp, isupp = {}, {}
    for bs in baskets.values():
        for b in bs:
            isupp[b] = isupp.get(b, 0) + 1
        for a, b in combinations(bs, 2):
            supp[(a, b)] = supp.get((a, b), 0) + 1
    n = len(baskets)
    want = {
        p: s for p, s in supp.items() if s >= 0.025 * n
    }
    got = {
        (r.brand_a, r.brand_b): r
        for r in REGISTRY["frequent_itemsets_pairs"].fn(spark, out).collect()
    }
    assert set(got) == set(want), (set(got), set(want))
    for (a, b), r in got.items():
        s = want[(a, b)]
        assert r.support == s
        assert abs(r.lift - (s * n) / (isupp[a] * isupp[b])) < 2e-6
        assert abs(r.conf_a_b - s / isupp[a]) < 2e-6
        assert abs(r.conf_b_a - s / isupp[b]) < 2e-6


def test_shard_checksum_partition_invariance(spark, sf_dir):
    """The content checksum must not depend on partitioning or row
    order: recompute on a repartitioned/shuffled copy and match, and
    agreement with the HRW shard counts from rendezvous_shard_assign."""
    base = {r.shard: r for r in
            REGISTRY["shard_manifest_checksums"].fn(spark, sf_dir).collect()}
    hrw = {r.shard: r.n_docs for r in
           REGISTRY["rendezvous_shard_assign"].fn(spark, sf_dir).collect()}
    assert {s: r.n_docs for s, r in base.items()} == hrw

    import tempfile

    from p4_mapreduce_spark.sources.tables import load

    out = tempfile.mkdtemp()
    (load(spark, sf_dir, "documents").repartition(13)
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    re = {r.shard: r for r in
          REGISTRY["shard_manifest_checksums"].fn(spark, out).collect()}
    assert {s: (r.n_docs, r.content_checksum) for s, r in re.items()} == {
        s: (r.n_docs, r.content_checksum) for s, r in base.items()
    }


def test_mrl_recall_consistent_with_arms(spark, sf_dir):
    """n_hits equals the real overlap between the truncated top-k and
    the exact top-k, recomputed in numpy with the same quantization."""
    import numpy as np

    from p4_mapreduce_spark.operators.similarity import QUERY_IDS, TOP_K
    from p4_mapreduce_spark.sources.tables import load

    emb = load(spark, sf_dir, "embeddings").toPandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()

    def topk(mat):
        out = {}
        q6 = lambda v: np.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        for qid in QUERY_IDS:
            qv = mat[ids == qid][0]
            cos = q6(mat @ qv) / np.sqrt(q6((mat * mat).sum(1)) * q6(qv @ qv))
            order = sorted(
                ((-c, i) for c, i in zip(cos, ids) if i != qid)
            )[:TOP_K]
            out[qid] = {i for _, i in order}
        return out

    full, trunc = topk(X), topk(np.ascontiguousarray(X[:, :16]))
    rows = {r.query_id: r for r in
            REGISTRY["mrl_truncation_recall"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(QUERY_IDS)
    for qid in QUERY_IDS:
        assert rows[qid].n_hits == len(full[qid] & trunc[qid]), qid
        assert rows[qid].kept_dims == 16


def test_phash_dedup_prefix_sensitivity(spark, tmp_path):
    """Identical payloads bucket together; payloads identical in the
    first 72 bytes ALSO bucket together (dHash sees only the 8x9
    grid — the perceptual-collision behavior byte-hashing lacks); a
    doc differing inside the grid does not."""
    out = str(tmp_path / "phash")
    head = "x" * 72
    rows = [
        (1, head + " tail one", "en", "s", 0),
        (2, head + " different tail entirely", "en", "s", 0),
        (3, "completely other content that differs early", "en", "s", 0),
        (4, head + " tail one", "en", "s", 0),  # exact copy of 1
    ]
    _write_docs(spark, out, rows)
    res = REGISTRY["multimodal_phash_dedup"].fn(spark, out).collect()
    assert len(res) == 1
    r = res[0]
    assert r.n_docs == 3 and r.min_doc_id == 1 and r.max_doc_id == 4


def test_psi_hash_split_stable_and_planted_shift(spark, sf_dir, tmp_path):
    """Hash splits must be PSI-stable (< 0.1); a deliberately skewed
    assignment (long docs pushed to val by construction) must not be —
    simulated by planting doc_ids whose hash nibble correlates with
    length."""
    rows = REGISTRY["psi_split_drift"].fn(spark, sf_dir).collect()
    assert sum(r.psi_term for r in rows) < 0.1

    # plant: choose doc_ids whose md5 first nibble is <= 13 (train)
    # for SHORT docs and > 13 (val) for LONG docs => massive drift
    import hashlib

    def nib(i):
        return "0123456789abcdef".index(
            hashlib.md5(str(i).encode()).hexdigest()[0]
        ) + 1

    train_ids = [i for i in range(4000) if nib(i) <= 13][:40]
    val_ids = [i for i in range(4000) if 13 < nib(i) <= 15][:40]
    docs = [(i, "x", "en", "s", 100) for i in train_ids]
    docs += [(i, "x", "en", "s", 2900) for i in val_ids]
    out = str(tmp_path / "psi")
    _write_docs(spark, out, docs)
    skew = REGISTRY["psi_split_drift"].fn(spark, out).collect()
    assert sum(r.psi_term for r in skew) > 0.25, skew


def test_rfm_segments_consistent(spark, sf_dir):
    """Scores live in 1..3 per dimension, segment sizes sum to the
    customer-with-orders count, and each dimension's tercile masses
    are roughly balanced."""
    from p4_mapreduce_spark.sources.tables import load

    rows = REGISTRY["rfm_customer_segments"].fn(spark, sf_dir).collect()
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for dim in ("r_score", "f_score", "m_score"):
        mass = {}
        for r in rows:
            mass[r[dim]] = mass.get(r[dim], 0) + r.n_customers
        assert set(mass) <= {1, 2, 3}
        for s, n in mass.items():
            assert n > 0.1 * n_cust, (dim, s, n)
    for r in rows:
        assert r.avg_monetary > 0


def test_interarrival_invariants(spark, sf_dir):
    rows = REGISTRY["event_interarrival_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.min_gap_us <= r.max_gap_us
        assert r.min_gap_us / 1e6 <= r.mean_gap_s <= r.max_gap_us / 1e6
        assert abs(r.rate_per_hour * r.mean_gap_s - 3600.0) < 1.0


def test_source_vocab_jaccard_planted(spark, tmp_path):
    """Two sources sharing half their head vocabulary score jaccard
    1/3 (2 common of 6 union); a vocabulary-disjoint source produces
    NO pair rows (zero-intersection pairs are absent by design)."""
    out = str(tmp_path / "svj")
    rows = []
    i = 0
    # srcA: words {w1 w2 w3 w4}; srcB: {w3 w4 w5 w6}; srcC: {z1 z2}
    for words, src in (
        ("w1 w2 w3 w4", "srcA"),
        ("w3 w4 w5 w6", "srcB"),
        ("z1 z2 z1 z2", "srcC"),
    ):
        for _ in range(10):
            rows.append((i, words, "en", src, len(words)))
            i += 1
    _write_docs(spark, out, rows)
    res = {(r.source_a, r.source_b): r for r in
           REGISTRY["source_vocab_jaccard"].fn(spark, out).collect()}
    assert ("srcA", "srcB") in res
    r = res[("srcA", "srcB")]
    assert r.n_common == 2 and r.n_union == 6
    assert abs(r.jaccard - 2 / 6) < 1e-6
    assert not any("srcC" in k for k in res), res
