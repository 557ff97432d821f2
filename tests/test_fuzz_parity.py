"""Predicate fuzzing: random filter trees, Spark vs DuckDB (mini-SQLancer).

Hypothesis builds random predicate ASTs over lineitem; each AST is
rendered to BOTH a PySpark Column and a SQL string, then the filtered
aggregate (count + normalized sums) must hash-match. This catches
whole classes of divergence (literal typing, NULL logic, operator
precedence, tri-valued boolean edges) that hand-written queries miss.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from p4_mapreduce_spark.functions.deterministic import fsum, fsum_sql
from p4_mapreduce_spark.sources.tables import load
from tests.conftest import TEST_SF_DIR
from tests.oracle import compare_frames

# --- predicate AST ----------------------------------------------------------

# r14: hypothesis fuzz vs DuckDB/python models (~2 min); slow-marked per the driver-window split (see pytest.ini)
pytestmark = pytest.mark.slow

NUM_COLS = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900.0, 100000.0),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1, 7),
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(["num_cmp", "str_eq", "between", "isin"]))
    if kind == "num_cmp":
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        lo, hi = NUM_COLS[col]
        val = round(draw(st.floats(min_value=lo, max_value=hi, allow_nan=False)), 2)
        op = draw(st.sampled_from(CMP_OPS))
        return ("num_cmp", col, op, val)
    if kind == "str_eq":
        col = draw(st.sampled_from(sorted(STR_COLS)))
        val = draw(st.sampled_from(STR_COLS[col]))
        op = draw(st.sampled_from(["=", "<>"]))
        return ("str_eq", col, op, val)
    if kind == "between":
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        lo, hi = NUM_COLS[col]
        a = round(draw(st.floats(min_value=lo, max_value=hi, allow_nan=False)), 2)
        b = round(draw(st.floats(min_value=lo, max_value=hi, allow_nan=False)), 2)
        return ("between", col, min(a, b), max(a, b))
    col = draw(st.sampled_from(sorted(STR_COLS)))
    vals = draw(st.lists(st.sampled_from(STR_COLS[col]), min_size=1, max_size=2))
    return ("isin", col, tuple(sorted(set(vals))))


predicate = st.recursive(
    leaf(),
    lambda children: st.one_of(
        st.tuples(st.just("and"), children, children),
        st.tuples(st.just("or"), children, children),
        st.tuples(st.just("not"), children),
    ),
    max_leaves=6,
)


def to_spark(node) -> F.Column:
    tag = node[0]
    if tag == "num_cmp":
        _, col, op, val = node
        c = F.col(col)
        return {
            "<": c < val, "<=": c <= val, ">": c > val,
            ">=": c >= val, "=": c == val, "<>": c != val,
        }[op]
    if tag == "str_eq":
        _, col, op, val = node
        return (F.col(col) == val) if op == "=" else (F.col(col) != val)
    if tag == "between":
        _, col, a, b = node
        return F.col(col).between(a, b)
    if tag == "isin":
        _, col, vals = node
        return F.col(col).isin(*vals)
    if tag == "and":
        return to_spark(node[1]) & to_spark(node[2])
    if tag == "or":
        return to_spark(node[1]) | to_spark(node[2])
    return ~to_spark(node[1])


def to_sql(node) -> str:
    tag = node[0]
    if tag == "num_cmp":
        _, col, op, val = node
        return f"({col} {op} {val!r})"
    if tag == "str_eq":
        _, col, op, val = node
        return f"({col} {op} '{val}')"
    if tag == "between":
        _, col, a, b = node
        return f"({col} BETWEEN {a!r} AND {b!r})"
    if tag == "isin":
        _, col, vals = node
        inlist = ", ".join(f"'{v}'" for v in vals)
        return f"({col} IN ({inlist}))"
    if tag == "and":
        return f"({to_sql(node[1])} AND {to_sql(node[2])})"
    if tag == "or":
        return f"({to_sql(node[1])} OR {to_sql(node[2])})"
    return f"(NOT {to_sql(node[1])})"


class _Oracle:
    """DuckDB oracle that survives DuckDB-internal assertion failures.

    A duckdb.InternalException (a bug in DuckDB itself, occasionally
    tripped by degenerate fuzzer predicates like duplicated OR
    branches) invalidates the whole in-memory database, so on that
    path we drop the connection, rebuild it lazily, and reject the
    example — the oracle crashing tells us nothing about our engine.
    """

    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self._con = None

    def _connect(self):
        if self._con is None:
            self._con = duckdb.connect()
            for t in ("lineitem", "orders"):
                self._con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{self.sf_dir}/{t}.parquet'"
                )
        return self._con

    def fetch_df(self, sql: str):
        try:
            return self._connect().execute(sql).fetch_df()
        except (duckdb.InternalException, duckdb.FatalException):
            try:
                self._con.close()
            except Exception:
                pass
            self._con = None
            assume(False)  # oracle-side crash, not an engine discrepancy

    def close(self):
        if self._con is not None:
            self._con.close()


@pytest.fixture(scope="module")
def fuzz_ctx(spark):
    li = load(spark, TEST_SF_DIR, "lineitem")
    con = _Oracle(TEST_SF_DIR)
    yield li, con
    con.close()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicate)
def test_random_predicates_agree(fuzz_ctx, node):
    li, con = fuzz_ctx
    spark_pdf = (
        li.where(to_spark(node))
        .agg(
            F.count(F.lit(1)).alias("n"),
            fsum("l_quantity").alias("sum_qty"),
            fsum("l_extendedprice").alias("sum_price"),
        )
        .toPandas()
    )
    oracle_pdf = con.fetch_df(
        f"""SELECT count(*) AS n,
                   {fsum_sql('l_quantity')} AS sum_qty,
                   {fsum_sql('l_extendedprice')} AS sum_price
            FROM lineitem WHERE {to_sql(node)}"""
    )
    compare_frames(spark_pdf, oracle_pdf, name=f"fuzz:{to_sql(node)}")


GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicate, st.lists(st.sampled_from(GROUP_COLS), min_size=1, max_size=2, unique=True))
def test_random_groupby_agree(fuzz_ctx, node, group_cols):
    li, con = fuzz_ctx
    spark_pdf = (
        li.where(to_spark(node))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            fsum("l_quantity").alias("sum_qty"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
        .toPandas()
    )
    cols = ", ".join(group_cols)
    oracle_pdf = con.fetch_df(
        f"""SELECT {cols}, count(*) AS n,
                   {fsum_sql('l_quantity')} AS sum_qty,
                   min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
            FROM lineitem WHERE {to_sql(node)}
            GROUP BY {cols}"""
    )
    compare_frames(spark_pdf, oracle_pdf, name=f"fuzz_groupby:{to_sql(node)}")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(predicate, st.sampled_from(["inner", "left", "left_semi", "left_anti"]))
def test_random_join_agree(fuzz_ctx, node, how):
    li, con = fuzz_ctx
    import __spark_entry__  # ensure registry side effects don't matter here
    from p4_mapreduce_spark.sources.tables import load as _load

    orders = _load(li.sparkSession, TEST_SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    filtered = li.where(to_spark(node)).select("l_orderkey", "l_quantity")
    joined = filtered.join(orders, filtered.l_orderkey == orders.o_orderkey, how)
    if how in ("left_semi", "left_anti"):
        spark_pdf = joined.agg(
            F.count(F.lit(1)).alias("n"), fsum("l_quantity").alias("sum_qty")
        ).toPandas()
        sql_op = "EXISTS" if how == "left_semi" else "NOT EXISTS"
        oracle_pdf = con.fetch_df(
            f"""SELECT count(*) AS n, {fsum_sql('l_quantity')} AS sum_qty
                FROM lineitem
                WHERE {to_sql(node)} AND {sql_op} (
                    SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)"""
        )
    else:
        spark_pdf = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_orderkey").alias("n_matched"),
        ).toPandas()
        jk = "JOIN" if how == "inner" else "LEFT JOIN"
        oracle_pdf = con.fetch_df(
            f"""SELECT count(*) AS n, count(o_orderkey) AS n_matched
                FROM (SELECT * FROM lineitem WHERE {to_sql(node)}) l
                {jk} orders ON o_orderkey = l_orderkey"""
        )
    compare_frames(spark_pdf, oracle_pdf, name=f"fuzz_join:{how}:{to_sql(node)}")


# --- ExactSubstr cut-list fuzz (r9) ----------------------------------------
#
# Random corpora with planted shared motifs, Spark's _span_runs vs a
# pure-python maximal-duplicated-run reference. Filler tokens are
# globally unique per example, so ALL duplication comes from the
# planted motifs — but the reference computes exact semantics over
# whatever the generator emits (motifs shorter than L, adjacent
# motifs that merge into one island, within-doc repeats, empty docs),
# so every generated corner is checked, not just the intended ones.

_CUT_L = 30


def _ref_cutlist(docs: dict[int, list[str]], L: int = _CUT_L) -> set:
    from collections import Counter

    cnt: Counter = Counter()
    for toks in docs.values():
        for i in range(len(toks) - L + 1):
            cnt[tuple(toks[i : i + L])] += 1
    runs = set()
    for d, toks in docs.items():
        hit = [
            i + 1
            for i in range(len(toks) - L + 1)
            if cnt[tuple(toks[i : i + L])] >= 2
        ]
        start = prev = None
        n = 0
        for p in hit:
            if prev is not None and p - prev > L:
                runs.add((d, start, prev + L - 1, prev + L - start, n))
                start, n = p, 0
            if prev is None:
                start = p
            n += 1
            prev = p
        if prev is not None:
            runs.add((d, start, prev + L - 1, prev + L - start, n))
    return runs


@st.composite
def _motif_corpus(draw):
    n_motifs = draw(st.integers(min_value=1, max_value=2))
    motifs = [
        [f"m{m}_{j}" for j in range(draw(st.integers(20, 60)))]
        for m in range(n_motifs)
    ]
    uniq = iter(range(10**9))
    docs = {}
    for d in range(draw(st.integers(min_value=2, max_value=5))):
        segs = draw(
            st.lists(
                st.one_of(
                    st.tuples(st.just("fill"), st.integers(0, 40)),
                    st.tuples(
                        st.just("motif"), st.integers(0, n_motifs - 1)
                    ),
                ),
                min_size=1,
                max_size=4,
            )
        )
        toks: list[str] = []
        for kind, v in segs:
            if kind == "fill":
                toks.extend(f"f{next(uniq)}" for _ in range(v))
            else:
                toks.extend(motifs[v])
        docs[d] = toks
    return docs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_motif_corpus())
def test_fuzz_span_cutlist_matches_reference(spark, corpus):
    from p4_mapreduce_spark.operators.dedup import _span_runs

    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.run_start, r.run_end, r.run_len, r.n_windows)
        for r in _span_runs(docs).collect()
    }
    assert got == _ref_cutlist(corpus)


def _ref_surgery(docs: dict[int, list[str]], L: int = _CUT_L) -> set:
    """Pure-python keeper semantics over _ref_cutlist's runs: group
    exact-equal run contents, keep the minimal (doc_id, run_start)
    occurrence, aggregate per doc (runless docs included)."""
    runs = sorted(_ref_cutlist(docs, L))
    groups: dict[tuple, list] = {}
    for d, s, e, ln, _n in runs:
        groups.setdefault(tuple(docs[d][s - 1 : e]), []).append((d, s, ln))
    cut = set()
    for occ in groups.values():
        for d, s, ln in sorted(occ)[1:]:
            cut.add((d, s))
    out = set()
    for d, toks in docs.items():
        mine = [(s, ln) for (dd, s, _e, ln, _n) in runs if dd == d]
        removed = sum(ln for s, ln in mine if (d, s) in cut)
        out.add(
            (
                d,
                len(toks),
                len(mine),
                sum(1 for s, _ in mine if (d, s) in cut),
                removed,
                len(toks) - removed,
            )
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_motif_corpus())
def test_fuzz_span_surgery_matches_reference(spark, corpus):
    from p4_mapreduce_spark.operators.dedup import _surgery_frame

    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.n_tokens, r.n_runs, r.n_runs_cut, r.tokens_removed,
         r.tokens_kept)
        for r in _surgery_frame(docs).collect()
    }
    # split(" ") of the joined text is how the engine tokenizes; an
    # empty doc becomes [''] (one token), so mirror that here
    ref_docs = {d: " ".join(t).split(" ") for d, t in corpus.items()}
    assert got == _ref_surgery(ref_docs)


def _ref_apply(docs: dict[int, list[str]], L: int = _CUT_L) -> set:
    """Pure-python rewritten corpus: excise every non-keeper run's
    token span (runs are disjoint), splice the remainder."""
    runs = sorted(_ref_cutlist(docs, L))
    groups: dict[tuple, list] = {}
    for d, s, e, ln, _n in runs:
        groups.setdefault(tuple(docs[d][s - 1 : e]), []).append((d, s, ln))
    cut = set()
    for occ in groups.values():
        for d, s, ln in sorted(occ)[1:]:
            cut.add((d, s, ln))
    out = set()
    for d, toks in docs.items():
        drop = set()
        for dd, s, ln in cut:
            if dd == d:
                drop.update(range(s, s + ln))  # 1-based token positions
        kept = [t for i, t in enumerate(toks, start=1) if i not in drop]
        out.add((d, " ".join(kept), len(kept)))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_motif_corpus())
def test_fuzz_span_apply_matches_reference(spark, corpus):
    """r10: the rewritten corpus (dedup_span_apply) against a
    pure-python excise-and-splice reference over the same generated
    corners (merging motifs, within-doc repeats, fully-cut docs,
    empty docs)."""
    from p4_mapreduce_spark.operators.dedup import _apply_frame

    docs = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.clean_text, r.n_tokens_kept)
        for r in _apply_frame(docs).collect()
    }
    ref_docs = {d: " ".join(t).split(" ") for d, t in corpus.items()}
    assert got == _ref_apply(ref_docs)


# --- r10: interval_islands kernel vs a pure-python interval union ----------


def _py_interval_union(spans):
    """Reference merge: per user, sort by (s, e, n), running-max island
    split (touching merges), islands numbered 1-based in start order."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, s, e, n in spans:
        by_user[u].append((s, e, n))
    out = {}
    for u, sp in by_user.items():
        sp.sort()
        islands = []
        cur_s, cur_e, cur_n = sp[0]
        for s, e, n in sp[1:]:
            if s <= cur_e:  # overlap or touch: merge
                cur_e = max(cur_e, e)
                cur_n += n
            else:
                islands.append((cur_s, cur_e, cur_n))
                cur_s, cur_e, cur_n = s, e, n
        islands.append((cur_s, cur_e, cur_n))
        for idx, (s, e, n) in enumerate(islands, start=1):
            out[(u, idx)] = (s, e, n)
    return out


@st.composite
def span_corpus(draw):
    n_users = draw(st.integers(min_value=1, max_value=3))
    spans = []
    for u in range(n_users):
        k = draw(st.integers(min_value=1, max_value=8))
        for _ in range(k):
            s = draw(st.integers(min_value=0, max_value=40))
            length = draw(st.integers(min_value=1, max_value=12))
            n = draw(st.integers(min_value=1, max_value=3))
            spans.append((u, s, s + length, n))
    return spans


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(span_corpus())
def test_fuzz_interval_islands_vs_python(spark, spans):
    """The shared interval-union kernel (backs merge_event_intervals,
    interval_overlap_join, and the streaming twin's per-batch merge)
    against a pure-python reference: island boundaries, 1-based ids,
    and weighted event counts must agree on arbitrary overlapping /
    nested / touching / duplicated spans."""
    from p4_mapreduce_spark.operators.analytics import interval_islands

    df = spark.createDataFrame(
        spans, "user_id long, s long, e long, n long"
    )
    got = {
        (r["user_id"], r["island_id"]): (
            r["span_start_us"],
            r["span_end_us"],
            r["n_events"],
        )
        for r in interval_islands(df).collect()
    }
    assert got == _py_interval_union(spans)


@st.composite
def random_graph(draw):
    n_nodes = draw(st.integers(min_value=2, max_value=6))
    n_edges = draw(st.integers(min_value=1, max_value=10))
    und = set()
    for _ in range(n_edges):
        a = draw(st.integers(min_value=0, max_value=n_nodes - 1))
        b = draw(st.integers(min_value=0, max_value=n_nodes - 1))
        if a != b:
            und.add((min(a, b), max(a, b)))
    assume(und)
    edges = sorted(und) + [(y, x) for x, y in sorted(und)]
    rounds = draw(st.integers(min_value=1, max_value=4))
    return edges, rounds


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(random_graph())
def test_fuzz_label_propagation_vs_python(spark, case):
    """Synchronous LPA on arbitrary small symmetrized graphs must agree
    node-for-node with the pure-python replica for any round count —
    the most-frequent-neighbor-label argmax and min-label tie-break
    have no float or ordering slack to hide in."""
    from p4_mapreduce_spark.operators.graph import label_propagation

    edges, rounds = case
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds).collect()
    }
    from tests.test_r10_ops import _py_lpa

    assert got == _py_lpa(edges, rounds)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(random_graph())
def test_fuzz_lpa_semisync_vs_python(spark, case):
    """r11: the semi-synchronous (2-colored) converged LPA on
    arbitrary small symmetrized graphs must agree node-for-node with a
    pure-python replica of the same half-step schedule — including the
    early stop at stability (the replica breaks on the same
    full-super-round fixpoint test)."""
    from p4_mapreduce_spark.operators.graph import lpa_semisync
    from tests.test_r11_ops import _py_lpa_semisync

    edges, rounds = case
    split = max(n for e in edges for n in e) // 2 + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["community"]
        for r in lpa_semisync(df, F.col("node") < split, rounds).collect()
    }
    assert got == _py_lpa_semisync(edges, split, rounds)


def _py_overlap_rollup(sess):
    """All-pairs reference for overlap_pairs_rollup: true interval
    overlap between every pair of sessions of DIFFERENT users."""
    agg = {}
    for i, (ua, _ia, sa, ea) in enumerate(sess):
        for ub, _ib, sb, eb in sess[i + 1:]:
            if ua == ub:
                continue
            a, b = ((ua, sa, ea), (ub, sb, eb))
            if a[0] > b[0]:
                a, b = b, a
            ov = min(a[2], b[2]) - max(a[1], b[1])
            if ov <= 0:
                continue
            key = (a[0], b[0])
            n, tot, mx = agg.get(key, (0, 0, 0))
            agg[key] = (n + 1, tot + ov, max(mx, ov))
    return agg


@st.composite
def session_corpus(draw):
    n_users = draw(st.integers(min_value=2, max_value=5))
    sess = []
    for u in range(n_users):
        per_user_starts = set()
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            s = draw(st.integers(min_value=0, max_value=40)) * 450_000_000
            # per-user sessions must be disjoint (they come from the
            # islands kernel, which merges overlaps)
            if any(abs(s - o) < 2 * 450_000_000 for o in per_user_starts):
                continue
            per_user_starts.add(s)
            length = draw(st.integers(min_value=1, max_value=4)) * 450_000_000
            sess.append((u, len(per_user_starts), s, s + length))
    assume(sess)
    return sess


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(session_corpus())
def test_fuzz_overlap_rollup_vs_python(spark, sess):
    """r11: the hot-bin-salted co-presence kernel vs a brute-force
    all-pairs python reference, run BOTH with the cap forced to 1 (so
    every non-empty bin takes the salted path) and with the plain
    shape — bins, first-shared-bin uniqueness, and salting must all be
    invisible in the result."""
    from p4_mapreduce_spark.operators import analytics as A

    df = spark.createDataFrame(
        sess, "user_id long, island_id long, s long, e long"
    )
    want = _py_overlap_rollup(sess)
    old_cap = A._HOT_BIN_CAP
    try:
        A._HOT_BIN_CAP = 1
        for safe in (True, False):
            got = {
                (r["user_a"], r["user_b"]): (
                    r["n_overlaps"],
                    r["total_overlap_us"],
                    r["max_overlap_us"],
                )
                for r in A.overlap_pairs_rollup(df, skew_safe=safe).collect()
            }
            assert got == want, f"skew_safe={safe}"
    finally:
        A._HOT_BIN_CAP = old_cap
