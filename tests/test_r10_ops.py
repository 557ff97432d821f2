"""Round-10 behavioral fixtures.

- dedup_span_apply: on the same planted corpus the r9 cutlist fixture
  pins, the REWRITTEN corpus is exactly right: the lower-doc_id copy
  of a shared quote survives verbatim, the other copy is excised with
  its surrounding context spliced back together, a within-doc repeat
  keeps only its first occurrence, and an exact-duplicate doc is
  emptied while its keeper stays byte-identical.
- the skew-safe span shapes (r10: localCheckpoint + grouped membership
  / keeper) agree with the r9 window shapes row-for-row on the planted
  corpus — the A/B the skew probe relies on.
"""

from __future__ import annotations

from tests.oracle import compare_frames, run_oracle
from tests.test_r9_ops import _doc, _planted_sf_dir


def test_span_apply_planted_exact_strings(spark, sf_dir, tmp_path):
    from p4_mapreduce_spark.registry import load_all

    quote = [f"q{i}" for i in range(60)]
    rows = [
        _doc(1, [f"a{i}" for i in range(40)] + quote
             + [f"b{i}" for i in range(20)]),
        _doc(2, [f"c{i}" for i in range(10)] + quote
             + [f"d{i}" for i in range(35)]),
        _doc(3, [f"r{i}" for i in range(35)]
             + [f"e{i}" for i in range(24)]
             + [f"r{i}" for i in range(35)]
             + [f"f{i}" for i in range(6)]),
        _doc(4, [f"u{i}" for i in range(80)]),
        _doc(5, [f"x{i}" for i in range(45)]),
        _doc(6, [f"x{i}" for i in range(45)]),
    ]
    planted = _planted_sf_dir(sf_dir, tmp_path, rows)
    registry = load_all()
    spec = registry["dedup_span_apply"]

    got = spec.fn(spark, planted).toPandas()
    compare_frames(got, run_oracle(spec.oracle, planted),
                   name="dedup_span_apply[planted]")

    clean = {
        int(r.doc_id): (r.clean_text, int(r.n_tokens_kept))
        for r in got.itertuples()
    }
    join = " ".join
    # doc 1 is the corpus-canonical keeper of the quote: untouched
    assert clean[1] == (rows[0]["text"], 120)
    # doc 2 loses the quote; its context splices back together
    assert clean[2] == (
        join([f"c{i}" for i in range(10)] + [f"d{i}" for i in range(35)]),
        45,
    )
    # doc 3 keeps the FIRST occurrence of its repeated block only
    assert clean[3] == (
        join([f"r{i}" for i in range(35)] + [f"e{i}" for i in range(24)]
             + [f"f{i}" for i in range(6)]),
        65,
    )
    # all-unique control untouched
    assert clean[4] == (rows[3]["text"], 80)
    # exact duplicates: keeper byte-identical, the other doc emptied
    assert clean[5] == (rows[4]["text"], 45)
    assert clean[6] == ("", 0)


def test_span_skew_shapes_agree(spark, sf_dir):
    """The r10 skew-safe shapes and the r9 window shapes are the same
    operator: row-for-row equal on a real corpus (the probe's A/B
    precondition, and the guard that keeps skew_safe=False honest as
    a comparison arm)."""
    from p4_mapreduce_spark.operators.dedup import (
        _apply_frame,
        _span_runs,
        _surgery_frame,
    )
    from p4_mapreduce_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    for fn in (_span_runs, _surgery_frame, _apply_frame):
        safe = sorted(map(tuple, fn(docs, skew_safe=True).collect()))
        window = sorted(map(tuple, fn(docs, skew_safe=False).collect()))
        assert safe == window, fn.__name__
        assert safe, fn.__name__  # non-vacuous: the corpus has rows
