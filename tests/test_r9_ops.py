"""Round-9 behavioral fixtures (r8 verdict asks #2 and #3): planted
corpora proving each operator's MOTIVATION, not just its formula.

- dedup_span_cutlist: an embedded 60-token quote shared by two docs
  yields EXACTLY one maximal run per doc with exact offsets; a
  within-doc repeated block yields one run per occurrence.
- decontaminate_ngram_exact: a benchmark quote embedded in a LONG
  train document is flagged, while document-level Jaccard
  (decontaminate_test_split) dilutes below threshold and misses it —
  the docstring's motivating claim.
- data_mixture_manifest: doubling one language's weight moves its
  rate_ppm exactly as the closed form predicts and the achieved
  counts track the deterministic hash lottery (pure-python recount).
- spread_for_cpu: the byte-sized parquet split arrives as ONE
  partition and the codec stage actually fans out to
  defaultParallelism.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from p4_mapreduce_spark.sources.tables import TABLES
from tests.oracle import compare_frames, run_oracle


def _planted_sf_dir(sf_dir, tmp_path, rows: list[dict]) -> str:
    """An sf dir whose documents table is exactly ``rows``; every other
    table symlinks the original so run_oracle can register all views."""
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    out = tmp_path / "sf_planted"
    out.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pdf[["doc_id", "text", "lang", "source", "n_chars"]],
            preserve_index=False,
        ),
        out / "documents.parquet",
    )
    for other in TABLES:
        if other != "documents":
            os.symlink(
                os.path.join(sf_dir, f"{other}.parquet"),
                out / f"{other}.parquet",
            )
    return str(out)


def _doc(doc_id, tokens, lang="en", source="src0"):
    return {
        "doc_id": doc_id,
        "text": " ".join(tokens),
        "lang": lang,
        "source": source,
    }


# ---------------------------------------------------------------------
# dedup_span_cutlist
# ---------------------------------------------------------------------


def test_span_cutlist_planted_quote(spark, sf_dir, tmp_path):
    from p4_mapreduce_spark.registry import load_all

    quote = [f"q{i}" for i in range(60)]  # the embedded 60-token quote
    rows = [
        # doc 1: 40 unique tokens, the quote at [41, 100], 20 unique
        _doc(1, [f"a{i}" for i in range(40)] + quote
             + [f"b{i}" for i in range(20)]),
        # doc 2: the same quote at [11, 70] inside different context
        _doc(2, [f"c{i}" for i in range(10)] + quote
             + [f"d{i}" for i in range(35)]),
        # doc 3: a WITHIN-doc repeated 35-token block at [1,35] and
        # [60,94] (gap 24 unique tokens) -> one run per occurrence
        _doc(3, [f"r{i}" for i in range(35)]
             + [f"e{i}" for i in range(24)]
             + [f"r{i}" for i in range(35)]
             + [f"f{i}" for i in range(6)]),
        # doc 4: all-unique control, must emit nothing
        _doc(4, [f"u{i}" for i in range(80)]),
        # docs 5/6: EXACT duplicates — the whole doc is one maximal
        # run; surgery keeps doc 5 intact and empties doc 6
        _doc(5, [f"x{i}" for i in range(45)]),
        _doc(6, [f"x{i}" for i in range(45)]),
    ]
    planted = _planted_sf_dir(sf_dir, tmp_path, rows)
    registry = load_all()
    spec = registry["dedup_span_cutlist"]

    got = spec.fn(spark, planted).toPandas()
    # oracle parity on the planted corpus too
    compare_frames(got, run_oracle(spec.oracle, planted),
                   name="dedup_span_cutlist[planted]")

    runs = {
        doc: sorted(
            (int(r.run_start), int(r.run_end), int(r.run_len),
             int(r.n_windows))
            for r in g.itertuples()
        )
        for doc, g in got.groupby("doc_id")
    }
    # exactly ONE maximal run per quote-carrying doc, exact offsets:
    # windows fully inside the 60-token quote = 60 - 30 + 1 = 31
    assert runs[1] == [(41, 100, 60, 31)]
    assert runs[2] == [(11, 70, 60, 31)]
    # within-doc repeat: one maximal run per occurrence (35 - 30 + 1
    # = 6 windows each), never merged across the 24-token gap
    assert runs[3] == [(1, 35, 35, 6), (60, 94, 35, 6)]
    assert 4 not in runs
    # exact duplicates: the run IS the whole document
    assert runs[5] == [(1, 45, 45, 16)]
    assert runs[6] == [(1, 45, 45, 16)]

    # the surgery consumer on the same planted corpus: the canonical
    # keeper is the minimal (doc_id, run_start) occurrence of each run
    # CONTENT, so doc 1 keeps the quote, doc 2 loses it, and doc 3's
    # within-doc repeat keeps its first occurrence only
    surg = registry["dedup_span_surgery"]
    sgot = surg.fn(spark, planted).toPandas()
    compare_frames(sgot, run_oracle(surg.oracle, planted),
                   name="dedup_span_surgery[planted]")
    srows = {
        int(r.doc_id): (int(r.n_tokens), int(r.n_runs), int(r.n_runs_cut),
                        int(r.tokens_removed), int(r.tokens_kept))
        for r in sgot.itertuples()
    }
    assert srows[1] == (120, 1, 0, 0, 120)   # keeper: nothing removed
    assert srows[2] == (105, 1, 1, 60, 45)   # quote cut
    assert srows[3] == (100, 2, 1, 35, 65)   # second occurrence cut
    assert srows[4] == (80, 0, 0, 0, 80)     # untouched control
    assert srows[5] == (45, 1, 0, 0, 45)     # exact-dup keeper intact
    assert srows[6] == (45, 1, 1, 45, 0)     # exact-dup loser emptied


# ---------------------------------------------------------------------
# decontaminate_ngram_exact vs document-level Jaccard
# ---------------------------------------------------------------------


def test_ngram_decon_catches_quote_jaccard_misses(spark, sf_dir, tmp_path):
    """The docstring's motivating claim: a 13-token benchmark quote
    embedded in a 400-token train document is an exact n-gram hit, but
    document-level Jaccard is ~13/400 — far below any workable
    near-dup threshold, so the MinHash path must NOT flag the pair."""
    from p4_mapreduce_spark.registry import load_all

    quote = [f"bench{i}" for i in range(13)]
    rows = [
        # train doc (doc_id%10<8): long, with the quote embedded
        _doc(2, [f"t{i}" for i in range(200)] + quote
             + [f"s{i}" for i in range(200)]),
        # clean train doc
        _doc(3, [f"k{i}" for i in range(100)]),
        # benchmark doc (doc_id%10>=8): the quote plus a little halo
        _doc(8, quote + [f"h{i}" for i in range(7)]),
    ]
    planted = _planted_sf_dir(sf_dir, tmp_path, rows)
    registry = load_all()

    ng = registry["decontaminate_ngram_exact"]
    got = ng.fn(spark, planted).toPandas().set_index("doc_id")
    compare_frames(
        ng.fn(spark, planted).toPandas(),
        run_oracle(ng.oracle, planted),
        name="decontaminate_ngram_exact[planted]",
    )
    assert bool(got.loc[2, "is_contaminated"]) is True
    assert int(got.loc[2, "n_hit_ngrams"]) == 1  # exactly the quote
    assert bool(got.loc[3, "is_contaminated"]) is False

    # document-level Jaccard path: the planted test doc must come back
    # NOT contaminated (no MinHash band collision at ~3% Jaccard)
    js = registry["decontaminate_test_split"]
    jgot = js.fn(spark, planted).toPandas().set_index("doc_id")
    assert 8 in jgot.index
    assert bool(jgot.loc[8, "is_contaminated"]) is False


# ---------------------------------------------------------------------
# data_mixture_manifest: weight change moves rates per the closed form
# ---------------------------------------------------------------------


def _ticket(doc_id: int) -> int:
    h = hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:12]
    return int(h, 16) % 1_000_000


def _expected_rates(docs: pd.DataFrame, weights: dict) -> dict:
    """The closed form: rate_ppm(lang) = min(1e6,
    ((budget * w) // wsum) * 1e6 // lang_tokens), budget = total // 2."""
    toks = docs["text"].str.split(" ").str.len().astype("int64")
    lang_tokens = toks.groupby(docs["lang"]).sum()
    budget = int(lang_tokens.sum()) // 2
    wsum = sum(weights.get(lang, 1) for lang in lang_tokens.index)
    return {
        lang: min(
            1_000_000,
            ((budget * weights.get(lang, 1)) // wsum)
            * 1_000_000
            // int(lt),
        )
        for lang, lt in lang_tokens.items()
    }


def test_mixture_manifest_weight_change(spark, sf_dir):
    from p4_mapreduce_spark.operators.pipeline_ops import (
        _MIXM_WEIGHTS,
        mixture_manifest_frame,
    )
    from p4_mapreduce_spark.sources.tables import load

    docs_pd = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    doubled = dict(_MIXM_WEIGHTS)
    doubled["de"] = _MIXM_WEIGHTS["de"] * 2

    for weights in (_MIXM_WEIGHTS, doubled):
        got = (
            mixture_manifest_frame(load(spark, sf_dir, "documents"), weights)
            .toPandas()
        )
        want_rates = _expected_rates(docs_pd, weights)
        got_rates = dict(
            got.groupby("lang")["rate_ppm"].first().astype(int)
        )
        assert got_rates == want_rates, f"weights={weights}"
        # achieved counts track the deterministic hash lottery: a
        # pure-python recount over md5 tickets must agree exactly
        tickets = docs_pd["doc_id"].map(_ticket)
        ntok = docs_pd["text"].str.split(" ").str.len().astype("int64")
        for (lang, source), cell in got.groupby(["lang", "source"]):
            m = (docs_pd["lang"] == lang) & (docs_pd["source"] == source)
            sampled = m & (tickets < want_rates[lang])
            assert int(cell["n_sampled_docs"].iloc[0]) == int(sampled.sum())
            assert int(cell["sampled_tokens"].iloc[0]) == int(
                ntok[sampled].sum()
            )

    # doubling de's weight must strictly raise its rate (it is not at
    # the 1e6 cap on this corpus) and leave the lottery membership of
    # other languages' docs governed by their own (reduced) rates
    base = _expected_rates(docs_pd, _MIXM_WEIGHTS)
    moved = _expected_rates(docs_pd, doubled)
    assert moved["de"] > base["de"]
    assert all(moved[k] <= base[k] for k in base if k != "de")


# ---------------------------------------------------------------------
# spread_for_cpu: codec stages fan out
# ---------------------------------------------------------------------


def test_spread_for_cpu_fans_out_codec_stage(spark, sf_dir):
    from p4_mapreduce_spark.operators.multimodal import (
        assets_from_documents,
        spread_for_cpu,
    )

    assets = assets_from_documents(spark, sf_dir)
    before = assets.rdd.getNumPartitions()
    parallelism = spark.sparkContext.defaultParallelism
    # the motivating pathology: the byte-sized split planner parks the
    # whole (small, dense) table on far fewer cores than available
    assert before < parallelism
    after = spread_for_cpu(assets).rdd.getNumPartitions()
    assert after == parallelism
