"""Round-13 operator tests.

- overlap_pairs_rollup hot-list guard (verdict ask #7): the driver-side
  hot-bin collect is calendar-bounded today, but nothing structurally
  asserted it — the guard must bound the transfer in-plan and fall back
  to the unsalted (result-identical) join LOUDLY above the cap.
"""

from __future__ import annotations

import pytest


def _sess(spark, n_users: int):
    # n_users one-second sessions inside the same 15-min bin -> one bin
    # holds all rows; every user pair overlaps
    rows = [(f"u{i:03d}", 0, 0, 1_000_000) for i in range(n_users)]
    return spark.createDataFrame(
        rows, "user_id string, island_id long, s long, e long"
    )


def test_overlap_hot_list_cap_falls_back_unsalted_loudly(spark):
    import p4_mapreduce_spark.operators.analytics as analytics

    sess = _sess(spark, 10)
    want = sorted(
        map(tuple, analytics.overlap_pairs_rollup(sess, skew_safe=False).collect())
    )
    assert want, "planted frame must produce pairs"

    prev_cap, prev_hot = analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP
    # hot threshold 4 makes the single 10-session bin hot; list cap 0
    # makes ANY hot bin exceed the driver-transfer guard
    analytics._HOT_BIN_CAP, analytics._HOT_LIST_CAP = 4, 0
    try:
        with pytest.warns(RuntimeWarning, match="hot-bin list exceeds"):
            got_df = analytics.overlap_pairs_rollup(sess, skew_safe=True)
        got = sorted(map(tuple, got_df.collect()))
    finally:
        analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP = prev_cap, prev_hot
    # fallback is result-identical: salting only reshapes the pair space
    assert got == want


def test_overlap_hot_list_under_cap_salts_without_warning(spark):
    import warnings

    import p4_mapreduce_spark.operators.analytics as analytics

    sess = _sess(spark, 10)
    want = sorted(
        map(tuple, analytics.overlap_pairs_rollup(sess, skew_safe=False).collect())
    )
    prev_cap, prev_hot = analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP
    analytics._HOT_BIN_CAP, analytics._HOT_LIST_CAP = 4, 100
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            got_df = analytics.overlap_pairs_rollup(sess, skew_safe=True)
        got = sorted(map(tuple, got_df.collect()))
    finally:
        analytics._HOT_LIST_CAP, analytics._HOT_BIN_CAP = prev_cap, prev_hot
    assert got == want


def test_decontaminate_semantic_planted_paraphrase(spark, tmp_path):
    """Planted paraphrase: bench vec 8 is train vec 0 scaled 2x with a
    tiny wiggle (cosine ~1 — the embedding-space fingerprint of a
    paraphrase, which the n-gram decon family cannot see); train vec 1
    points at a different axis (cosine ~0 vs every bench vec). The
    per-source rollup must flag exactly srcA."""
    from p4_mapreduce_spark.functions.vector import EMBEDDING_DIM
    from p4_mapreduce_spark.operators.similarity import (
        _DECON_SEM_TAU_MICRO,
        decontaminate_semantic,
    )
    from tests.test_r11_ops import _mini_sf

    def vec(axis: float, scale: float = 1.0, wiggle: float = 0.0):
        v = [0.0] * EMBEDDING_DIM
        v[0] = axis * scale
        v[1] = wiggle
        v[2] = 0.1 * scale  # keep a second nonzero dim so bands differ
        return v

    ortho = [0.0] * EMBEDDING_DIM
    ortho[5] = 1.0
    ortho[7] = -0.3
    embeddings = [
        (0, vec(1.0), 0),                     # train: the original
        (1, ortho, 0),                        # train: unrelated
        (8, vec(1.0, scale=2.0, wiggle=0.01), 1),  # bench: paraphrase of 0
        (9, [0.01 * (i % 7 - 3) for i in range(EMBEDDING_DIM)], 1),
    ]
    docs = [
        (0, "the quick brown fox", "en", "srcA"),
        (1, "completely unrelated text", "en", "srcB"),
        (8, "a quick brown fox paraphrase", "en", "srcE"),
        (9, "another benchmark item", "en", "srcE"),
    ]
    sf = _mini_sf(tmp_path, docs=docs, embeddings=embeddings)
    got = {
        r["source"]: r
        for r in decontaminate_semantic(spark, sf).collect()
    }
    assert set(got) == {"srcA", "srcB"}, got  # bench sources excluded
    a, b = got["srcA"], got["srcB"]
    assert (a["n_train"], a["n_contaminated"], a["contamination_ppm"]) == (
        1,
        1,
        1_000_000,
    )
    assert a["worst_cos_micro"] >= _DECON_SEM_TAU_MICRO
    assert (b["n_train"], b["n_contaminated"], b["contamination_ppm"]) == (
        1,
        0,
        0,
    )
    assert (
        b["worst_cos_micro"] is None
        or b["worst_cos_micro"] < _DECON_SEM_TAU_MICRO
    )


def test_pii_redact_spans_planted(spark, tmp_path):
    """Planted PII shapes, pinning the overlap semantics: a phone
    glued into an email local-part ('-' and digits are legal there)
    is ONE email span — counted zero times as a phone, redacted once
    as [EMAIL] — and clean docs pass through byte-identical with an
    all-zero card."""
    from p4_mapreduce_spark.operators.text_analysis import pii_redact_spans
    from tests.test_r11_ops import _mini_sf

    overlap = "contact 555-867-5309john@example.com now"
    multi = "call 555-867-5309 or ssn 123-45-6789 at 10.0.0.1"
    clean = "no personal data here, just 42 plain words."
    docs = [
        (0, overlap, "en", "srcA"),
        (1, multi, "en", "srcA"),
        (2, clean, "en", "srcB"),
    ]
    sf = _mini_sf(tmp_path, docs=docs)
    got = {r["doc_id"]: r for r in pii_redact_spans(spark, sf).collect()}

    a = got[0]
    assert a["redacted_text"] == "contact [EMAIL] now"
    assert (a["n_emails"], a["n_phones"], a["n_ssns"], a["n_ipv4s"]) == (
        1, 0, 0, 0,
    )
    assert a["n_redactions"] == 1
    assert a["chars_redacted"] == len("555-867-5309john@example.com")

    m = got[1]
    assert m["redacted_text"] == "call [PHONE] or ssn [SSN] at [IPV4]"
    assert (m["n_emails"], m["n_phones"], m["n_ssns"], m["n_ipv4s"]) == (
        0, 1, 1, 1,
    )
    assert m["n_redactions"] == 3
    assert m["chars_redacted"] == len("555-867-5309") + len(
        "123-45-6789"
    ) + len("10.0.0.1")

    c = got[2]
    assert c["redacted_text"] == clean  # byte-identical pass-through
    assert c["n_redactions"] == 0 and c["chars_redacted"] == 0


def test_streaming_semantic_decon_twin_and_replay(spark, sf_dir, tmp_path):
    """Streaming semantic decon == the batch rollup: streaming the
    train embeddings through micro-batches verified against the
    frozen benchmark band index must reproduce decontaminate_semantic
    row-for-row, and the derived rollup must be idempotent under a
    replayed batch (frozen index -> byte-identical verdict rows, the
    per-t_id max-merge collapses them)."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        semantic_decon_from_state,
        streaming_semantic_decon,
    )

    base = str(tmp_path / "train_emb")
    load(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 10 < 8
    ).repartition(4).write.mode("overwrite").parquet(base)

    state = str(tmp_path / "state")
    q = streaming_semantic_decon(
        spark, base, sf_dir, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    verdicts = spark.read.parquet(f"{state}/verdicts")
    batch_ids = {
        r.batch_id for r in verdicts.select("batch_id").distinct().collect()
    }
    assert len(batch_ids) >= 2, "need >= 2 micro-batches"

    def canon(df):
        return sorted(
            (
                r["source"],
                int(r["n_train"]),
                int(r["n_contaminated"]),
                int(r["contamination_ppm"]),
                None
                if r["worst_cos_micro"] is None
                else int(r["worst_cos_micro"]),
            )
            for r in df.collect()
        )

    got = canon(semantic_decon_from_state(spark, state, sf_dir))
    want = canon(load_all()["decontaminate_semantic"].fn(spark, sf_dir))
    assert got == want

    # replay idempotency: re-append one batch's verdict rows verbatim
    verdicts.where(F.col("batch_id") == min(batch_ids)).write.mode(
        "append"
    ).parquet(f"{state}/verdicts")
    assert canon(semantic_decon_from_state(spark, state, sf_dir)) == want
