"""Edge-case and property tests for the round-4 operators.

Oracle parity (test_oracle_parity.py) proves result equivalence on the
driver corpus; these tests pin behavior the corpus may not exercise —
exact-copy groups for the jaccard collapse-verify-expand path, anchor
degenerate documents for CDC chunking, and a learning floor for the
in-engine logistic regression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from p4_mapreduce_spark.registry import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def synth_docs_dir(spark, tmp_path_factory):
    """A documents table with planted exact-copy groups and CDC edge
    cases. Near-dup structure:

    - doc_ids 1,2,3: identical text (one exact-copy group)
    - doc_ids 4,5: identical text (second group), near-dup of group 1
      (one token changed out of 12 -> high but non-1.0 jaccard)
    - doc_id 6: unrelated text
    - doc_id 7: empty text (no tokens)
    - doc_id 8: single token (no shingles, no bigrams)
    """
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    rows = [
        (1, base, "en", "src0", len(base)),
        (2, base, "en", "src0", len(base)),
        (3, base, "de", "src1", len(base)),
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
    out = str(tmp_path_factory.mktemp("synthdocs"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_jaccard_collapse_expand_exact_groups(spark, synth_docs_dir):
    """The collapse-verify-expand rewrite must emit every exact-copy
    pair at jaccard 1.0 and every cross-group member pair at the
    rep-level jaccard — and nothing for shingle-less docs."""
    out = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard"]
        .fn(spark, synth_docs_dir)
        .collect()
    }
    # intra-group: C(3,2) pairs for group {1,2,3}, one pair for {4,5}
    for pair in [(1, 2), (1, 3), (2, 3), (4, 5)]:
        assert out.get(pair) == 1.0, (pair, out)
    # cross-group: base vs near share 9 of 10+10 distinct shingles
    # (10 shingles each, 9 common -> 9/11); all 3x2 member pairs
    # carry the identical rep-level value
    cross = [(1, 4), (1, 5), (2, 4), (2, 5), (3, 4), (3, 5)]
    vals = {out.get(p) for p in cross}
    assert len(vals) == 1 and vals != {None}, (vals, out)
    (v,) = vals
    assert abs(v - 9.0 / 11.0) < 1e-12
    # nothing else: doc 6 shares no shingles; docs 7/8 have none
    assert set(out) == set([(1, 2), (1, 3), (2, 3), (4, 5)] + cross), out


def test_cdc_chunking_edges(spark, synth_docs_dir):
    """CDC chunking: every token lands in exactly one chunk; docs with
    no tokens emit no rows; single-token docs emit one 1-token chunk;
    exact copies have all tokens in duplicated chunks."""
    rows = {
        r.doc_id: r
        for r in REGISTRY["cdc_chunk_dedup"].fn(spark, synth_docs_dir).collect()
    }
    assert 7 not in rows  # empty text -> no chunks
    assert rows[8].n_chunks == 1 and rows[8].n_tokens == 1
    for d in (1, 2, 3):  # 3 exact copies: every token duplicated
        assert rows[d].n_tokens == 12
        assert rows[d].dup_tokens == 12
    assert rows[6].dup_tokens == 0
    # token conservation: chunks partition the token stream
    for d, r in rows.items():
        assert r.n_tokens >= r.dup_tokens >= 0


def test_cdc_edit_robustness(spark, tmp_path):
    """The content-defined property proper: two documents that differ
    by ONE trailing token — and are exact copies of NOTHING else, so
    whole-doc dedup finds no pair — still dedup the chunk upstream of
    the edit (CDC boundaries re-synchronize at the content anchor),
    while the chunk containing the edit stays unique."""
    import hashlib

    def is_anchor(w):
        return hashlib.md5(w.encode()).hexdigest().startswith("0")

    anchor = next(w for w in (f"w{i:03d}" for i in range(4096)) if is_anchor(w))
    plain = [
        w for w in (f"p{i:03d}" for i in range(4096)) if not is_anchor(w)
    ][:13]
    prefix = " ".join(plain[:8])  # chunk 1: shared, ends at the anchor
    tail = " ".join(plain[8:11])  # chunk 2 body: anchor + tail + last token
    rows = [
        (1, f"{prefix} {anchor} {tail} {plain[11]}", "en", "s", 0),
        (2, f"{prefix} {anchor} {tail} {plain[12]}", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "editdocs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    res = {
        r.doc_id: r for r in REGISTRY["cdc_chunk_dedup"].fn(spark, out).collect()
    }
    for d in (1, 2):
        assert res[d].n_chunks == 2, res[d]
        assert res[d].n_tokens == 13, res[d]
        # the 8-token prefix chunk dedups across the pair...
        assert res[d].dup_tokens == 8, res[d]
        # ...while the edited chunk stays unique (dup < total): the
        # property a tumbling-span chunker cannot deliver for an edit
        # that changes the span contents
        assert 0 < res[d].dup_tokens < res[d].n_tokens


def test_logreg_learns_separable_concept(spark, sf_dir):
    """The in-engine GD must actually fit: >= 90% accuracy on the
    length concept at the test scale factor."""
    df = REGISTRY["logreg_quality_classifier"].fn(spark, sf_dir)
    agg = df.agg(
        F.avg(
            F.when(
                F.col("predicted_long") == (F.col("label") == 1.0), 1.0
            ).otherwise(0.0)
        ).alias("acc"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("predicted_long"), 1).otherwise(0)).alias("npos"),
    ).collect()[0]
    assert agg["acc"] >= 0.90, agg
    # degenerate all-one-class predictions don't count as learning
    assert 0 < agg["npos"] < agg["n"], agg


def test_dsir_selects_nothing_degenerate(spark, sf_dir):
    """DSIR weights: every doc with >= 2 tokens is scored, the log
    weights are finite, and both selected classes are non-empty is NOT
    required (data-dependent) — but the weight of a doc whose features
    are corpus-typical must be near zero, so the mean |log_weight|
    per feature stays bounded."""
    df = REGISTRY["dsir_importance_weights"].fn(spark, sf_dir)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(F.col("log_weight") / F.col("n_feats"))).alias("m"),
    ).collect()[0]
    assert row["n"] > 0
    # per-feature log ratio is bounded by ln(n_all + B) in magnitude;
    # in practice target/raw unigram models differ mildly
    assert row["m"] < 5.0, row


def test_semdedup_min_of_group_kept(spark, sf_dir):
    """Keep-lowest-id rule: the minimum vec_id of every label block is
    always kept (it has no lower-id neighbor at all)."""
    df = REGISTRY["semdedup_prune"].fn(spark, sf_dir)
    mins = (
        df.groupBy("label")
        .agg(F.min("vec_id").alias("vmin"))
        .join(df, (F.col("vmin") == df.vec_id))
        .select("kept")
        .collect()
    )
    assert all(r.kept for r in mins)


def test_prefix_filter_equals_collapse_plan(spark, synth_docs_dir):
    """Two independent physical strategies, one semantics: the
    PPJoin-style prefix-filtered plan must emit exactly the same pair
    set as the collapse-verify-expand plan on the planted corpus."""
    collapse = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard"]
        .fn(spark, synth_docs_dir)
        .collect()
    }
    prefix = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in REGISTRY["dedup_jaccard_prefix"]
        .fn(spark, synth_docs_dir)
        .collect()
    }
    assert collapse == prefix
