"""Structured Streaming semantics: streaming result == batch result.

Runs the streaming builders with an availableNow trigger into a memory
sink and compares against the registered batch-equivalent queries —
Structured Streaming's core contract.
"""

from __future__ import annotations

import pytest

from p4_mapreduce_spark.streaming.windows import (
    stream_tumbling_counts,
    streaming_dedup_within_watermark,
    streaming_tumbling_counts,
)


# r14: end-to-end streaming twins (~5 min of micro-batch walls); slow-marked per the driver-window split (see pytest.ini)
pytestmark = pytest.mark.slow

def _run_available_now(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "tumbling" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream_df = streaming_tumbling_counts(spark, sf_dir)
    q = _run_available_now(stream_df, "tumbling")
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM tumbling").collect()
        }
        want = {
            (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
            for r in stream_tumbling_counts(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_streaming_dedup_runs(spark, sf_dir):
    stream_df = streaming_dedup_within_watermark(spark, sf_dir)
    q = _run_available_now(stream_df, "dedup_stream")
    try:
        n = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0]["n"]
        from p4_mapreduce_spark.sources.tables import load

        batch_n = load(spark, sf_dir, "events").select("event_id").distinct().count()
        assert n == batch_n
    finally:
        q.stop()


def test_streaming_stateful_counts(spark, sf_dir):
    from p4_mapreduce_spark.streaming.windows import streaming_stateful_user_counts

    stream_df = streaming_stateful_user_counts(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stateful_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        # last update per user == batch totals
        got = {
            r["user_id"]: (r["n_events"], r["value_cents"])
            for r in spark.sql(
                """SELECT user_id, n_events, value_cents FROM (
                       SELECT *, row_number() OVER (PARTITION BY user_id
                                                    ORDER BY n_events DESC) rn
                       FROM stateful_counts) WHERE rn = 1"""
            ).collect()
        }
        import pyspark.sql.functions as F

        from p4_mapreduce_spark.sources.tables import load

        batch = {
            r["user_id"]: (r["n"], r["cents"])
            for r in load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                    "cents"
                ),
            )
            .collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from p4_mapreduce_spark.streaming.windows import streaming_stream_stream_join

    q = (
        streaming_stream_stream_join(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = spark.sql("SELECT count(*) AS n FROM ss_join").collect()[0]["n"]
        import pyspark.sql.functions as F

        from p4_mapreduce_spark.sources.tables import load

        ev = load(spark, sf_dir, "events")
        clicks = ev.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
        )
        want = clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        ).count()
        assert got == want
    finally:
        q.stop()


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Restarting a checkpointed stream must not reprocess data:
    run an availableNow stream to a file sink twice with the same
    checkpoint; the second run finds no new input and output stays
    exactly-once."""
    from p4_mapreduce_spark.streaming.windows import read_events_stream

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            read_events_stream(spark, sf_dir)
            .select("event_id", "user_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    first = spark.read.parquet(out).count()
    run_once()  # same checkpoint: no new files -> no new rows
    second = spark.read.parquet(out).count()

    from p4_mapreduce_spark.sources.tables import load

    expected = load(spark, sf_dir, "events").count()
    assert first == expected
    assert second == expected


def test_streaming_foreach_batch_totals(spark, sf_dir, tmp_path):
    """foreachBatch parquet sink: cross-batch totals equal the batch
    query exactly (integer cents are exact under any batch split)."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        streaming_foreach_batch_totals,
    )

    out = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_foreach_batch_totals(spark, sf_dir, out, ckpt)
    q.awaitTermination(120)

    got = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"), F.sum("value_cents").alias("value_cents")
        )
        .collect()
    }
    ev = load(spark, sf_dir, "events")
    want = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")
            ).alias("value_cents"),
        )
        .collect()
    }
    assert got == want


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """Native session_window (streaming) == batch lag/cumsum
    sessionization on (user, session_start, n_events, value) — for
    every session the stream can FINALIZE. Append mode emits a session
    only once the watermark passes its close (last event + gap), so
    sessions still open at end-of-data stay in state: the test models
    that boundary exactly rather than papering over it."""
    import datetime

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load as load_table
    from p4_mapreduce_spark.streaming.windows import (
        SESSION_GAP_SECONDS,
        streaming_session_windows,
    )

    q = _run_available_now(
        streaming_session_windows(spark, sf_dir), "session_native"
    )
    try:
        got = {
            (r["user_id"], r["session_start"]): (
                r["n_events"],
                r["session_value"],
            )
            for r in spark.sql("SELECT * FROM session_native").collect()
        }
        batch = load_all()["stream_session_windows"].fn(spark, sf_dir).collect()
        import pyspark.sql.functions as F

        max_ts = (
            load_table(spark, sf_dir, "events")
            .agg(F.max("ts"))
            .collect()[0][0]
        )
        watermark = max_ts - datetime.timedelta(hours=1)
        gap = datetime.timedelta(seconds=SESSION_GAP_SECONDS)
        want = {
            (r["user_id"], r["session_start"]): (
                r["n_events"],
                r["session_value"],
            )
            for r in batch
            if r["session_end"] + gap <= watermark  # finalized sessions
        }
        still_open = sum(1 for r in batch if r["session_end"] + gap > watermark)
        assert want.items() <= got.items(), "finalized session mismatch"
        assert len(got) + still_open >= len(batch)
        # everything emitted must match the batch result exactly
        all_batch = {
            (r["user_id"], r["session_start"]): (
                r["n_events"],
                r["session_value"],
            )
            for r in batch
        }
        for k, v in got.items():
            assert all_batch.get(k) == v, (k, v, all_batch.get(k))
    finally:
        q.stop()


def test_streaming_stateful_counts_tws(spark, sf_dir):
    """transformWithStateInPandas twin reaches the same final per-user
    totals as the batch aggregation (and hence as the older
    applyInPandasWithState twin)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's driver worker speaks protobuf to the "
        "JVM state server; the lib is absent in this container, so only "
        "the plan construction is exercised here",
    )
    from p4_mapreduce_spark.streaming.windows import (
        streaming_stateful_user_counts_tws,
    )

    stream_df = streaming_stateful_user_counts_tws(spark, sf_dir)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stateful_counts_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        got = {
            r["user_id"]: (r["n_events"], r["value_cents"])
            for r in spark.sql(
                """SELECT user_id, n_events, value_cents FROM (
                       SELECT *, row_number() OVER (PARTITION BY user_id
                                                    ORDER BY n_events DESC) rn
                       FROM stateful_counts_tws) WHERE rn = 1"""
            ).collect()
        }
        import pyspark.sql.functions as F

        from p4_mapreduce_spark.sources.tables import load

        batch = {
            r["user_id"]: (r["n"], r["cents"])
            for r in load(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("cents"),
            )
            .collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_streaming_stateful_tws_plan_builds(spark, sf_dir):
    """Without protobuf the query can't execute, but the
    transformWithStateInPandas plan (grouping, processor wiring, output
    schema) must still construct — this is what gates API drift."""
    from p4_mapreduce_spark.streaming.windows import (
        streaming_stateful_user_counts_tws,
    )

    df = streaming_stateful_user_counts_tws(spark, sf_dir)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "value_cents",
    ]


def test_streaming_multi_batch_state_merges(spark, sf_dir, tmp_path):
    """Cross-micro-batch state: the events table split into 4 files,
    streamed with maxFilesPerTrigger=1, must produce the SAME tumbling
    aggregate as one-shot batch execution — the windowed state has to
    accumulate and merge across 4 separate micro-batches (availableNow
    drains everything but honors the per-trigger file cap)."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.functions.deterministic import fsum
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import stream_tumbling_counts

    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "events_split")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    raw = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ts = F.col("ts")
    if dict(raw.dtypes)["ts"] == "timestamp_ntz":
        ts = ts.cast("timestamp")
    stream = (
        raw.withColumn("ts", ts)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), fsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("multi_batch_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"

    got = sorted(
        map(tuple, spark.table("multi_batch_tumbling").collect())
    )
    want = sorted(map(tuple, stream_tumbling_counts(spark, sf_dir).collect()))
    assert got == want


def test_streaming_watermark_bounds_state(spark, sf_dir, tmp_path):
    """What the watermark actually guarantees for a replayable file
    source: STATE stays bounded, correctness doesn't suffer. File A
    (the most recent 2h of events) processes first and advances the
    watermark to max(ts) - 1h; file B (everything older than
    max(ts) - 3h, ~99% of the data) arrives in a later micro-batch
    entirely behind the watermark. Its windows are already expired, so
    they flow straight to the append sink WITHOUT entering state — the
    aggregation state after the late batch stays at the handful of
    still-open recent windows even though ~1000 late rows passed
    through. Emitted content must equal the batch aggregate restricted
    to finalized windows (end <= final watermark)."""
    import datetime
    import time as _time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load

    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
    file_a = ev.where(F.col("ts") > mx - datetime.timedelta(hours=2))
    file_b = ev.where(F.col("ts") <= mx - datetime.timedelta(hours=3))
    n_a, n_b = file_a.count(), file_b.count()
    assert n_a > 0 and n_b > n_a  # late batch dominates

    src = str(tmp_path / "late_src")
    file_a.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)  # FileStreamSource orders batches by mtime
    file_b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(file_a.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
                "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_bounds_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    progress = list(q.recentProgress)
    q.stop()

    # the late batch really was separate, and state stayed bounded:
    # after ingesting n_b late rows the store holds only the open
    # recent windows (< 10), not one row per late window
    late_batches = [
        p for p in progress if p["numInputRows"] == n_b
    ]
    assert late_batches, [p["numInputRows"] for p in progress]
    state_rows = late_batches[0]["stateOperators"][0]["numRowsTotal"]
    assert state_rows < 10, state_rows

    watermark = mx - datetime.timedelta(hours=1)
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.table("wm_bounds_state").collect()
    }
    want = {
        (r["ws"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"),
                "event_type", "n")
        .collect()
        if r["we"] <= watermark
    }
    assert got == want


def test_stream_static_enrichment_join_equals_batch(spark, sf_dir):
    """Stream-static join — the most common streaming enrichment
    topology (fact stream x dimension table): the static side needs no
    watermark and no state (it is re-planned per micro-batch, broadcast
    when small); result must equal the batch join."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import read_events_stream

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = (
        read_events_stream(spark, sf_dir)
        .select("event_id", "user_id", "value")
        .join(F.broadcast(cust), "user_id")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_static")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = sorted(
        map(tuple, spark.table("stream_static").collect())
    )
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    want = sorted(map(tuple, ev.join(cust, "user_id").collect()))
    assert len(want) > 0
    assert got == want


def test_streaming_corpus_report_incremental(spark, sf_dir, tmp_path):
    """Incremental materialized-view maintenance: streaming the corpus
    in 4 micro-batches and deriving the report from the compact state
    equals the batch corpus_report exactly — including the
    corpus-WIDE duplicate counts, recovered from per-hash cell sums
    without ever re-reading the raw documents."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        corpus_report_from_state,
        streaming_corpus_report_incremental,
    )

    docs_dir = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_corpus_report_incremental(spark, docs_dir, state, ckpt)
    q.awaitTermination(120)

    # at least 2 micro-batches actually ran (maxFilesPerTrigger=1)
    batch_ids = {
        r["batch_id"]
        for r in spark.read.parquet(state).select("batch_id").distinct().collect()
    }
    assert len(batch_ids) >= 2, batch_ids

    key = lambda r: (r["lang"], r["source"])
    val = lambda r: (
        r["n_docs"],
        r["n_tokens"],
        r["n_chars"],
        r["n_exact_dup_docs"],
        r["n_short_docs"],
        r["n_distinct_texts"],
    )
    got = {key(r): val(r) for r in corpus_report_from_state(spark, state).collect()}
    want = {
        key(r): val(r)
        for r in load_all()["corpus_report"].fn(spark, sf_dir).collect()
    }
    assert got == want

    # Crash-replay idempotency: foreachBatch re-runs an interrupted
    # batch under the SAME batch_id if the crash lands between the
    # parquet append and the checkpoint commit. Simulate it by
    # appending one batch's rows a second time — the derived report
    # must not double-count.
    replay_id = min(batch_ids)
    st = spark.read.parquet(state)
    st.where(F.col("batch_id") == replay_id).write.mode("append").parquet(
        state
    )
    replayed = {
        key(r): val(r) for r in corpus_report_from_state(spark, state).collect()
    }
    assert replayed == want


def test_streaming_minhash_incremental(spark, sf_dir, tmp_path):
    """Streaming steady-state near-dedup == the batch answer: running
    the corpus through micro-batches (each band-joined against the
    accumulated signature state only) must emit exactly the cross-
    batch slice of dedup_minhash_lsh's full self-join pairs, oriented
    later-batch -> earlier-batch, with identical jaccard values — and
    the derived pair set must be idempotent under batch replay."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        minhash_pairs_from_state,
        streaming_minhash_incremental,
    )

    base = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(f"{base}/documents.parquet")

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_minhash_incremental(
        spark, f"{base}/documents.parquet", state, ckpt
    )
    q.awaitTermination(180)

    members = (
        spark.read.parquet(f"{state}/members")
        .groupBy("doc_id")
        .agg(F.min("batch_id").alias("batch_id"))
        .collect()
    )
    batch_of = {r.doc_id: r.batch_id for r in members}
    assert len(set(batch_of.values())) >= 2, "need >= 2 micro-batches"

    full = load_all()["dedup_minhash_lsh"].fn(spark, base).collect()
    want = {}
    for r in full:
        ba, bb = batch_of[r.doc_id_a], batch_of[r.doc_id_b]
        if ba == bb:
            continue  # intra-batch: bootstrap territory, not emitted
        new, old = (
            (r.doc_id_a, r.doc_id_b) if ba > bb else (r.doc_id_b, r.doc_id_a)
        )
        want[(new, old)] = r.jaccard

    got = {
        (r.doc_id_new, r.doc_id_existing): r.jaccard
        for r in minhash_pairs_from_state(spark, state).collect()
    }
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's pair rows under
    # the same batch_id; the derived pair set must not change
    pairs = spark.read.parquet(f"{state}/pairs")
    some_batch = pairs.agg(F.min("batch_id")).collect()[0][0]
    pairs.where(F.col("batch_id") == some_batch).write.mode(
        "append"
    ).parquet(f"{state}/pairs")
    replayed = {
        (r.doc_id_new, r.doc_id_existing): r.jaccard
        for r in minhash_pairs_from_state(spark, state).collect()
    }
    assert replayed == want


def test_streaming_ann_incremental(spark, sf_dir, tmp_path):
    """Streaming ANN index maintenance == the batch answer: running
    the embeddings through micro-batches (each band-joined against the
    accumulated bucket index only) must emit exactly the cross-batch
    slice of the full banded-LSH near-dup pair set, oriented
    later-batch -> earlier-batch, with identical cosines — and the
    derived pair set must be idempotent under batch replay."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.functions.vector import cosine
    from p4_mapreduce_spark.operators.similarity import (
        ANN_INCR_TAU,
        ann_band_col,
    )
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        ann_pairs_from_state,
        streaming_ann_incremental,
    )

    base = str(tmp_path / "emb")
    load(spark, sf_dir, "embeddings").repartition(4).write.mode(
        "overwrite"
    ).parquet(base)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_ann_incremental(spark, base, state, ckpt)
    q.awaitTermination(180)

    idx = (
        spark.read.parquet(f"{state}/index")
        .groupBy("vec_id")
        .agg(F.min("batch_id").alias("batch_id"))
        .collect()
    )
    batch_of = {r.vec_id: r.batch_id for r in idx}
    assert len(set(batch_of.values())) >= 2, "need >= 2 micro-batches"

    # full banded self-join pair set, computed batch-agnostically
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bnd = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                ann_band_col(F.col("embedding"), 0),
                ann_band_col(F.col("embedding"), 1),
            )
        ).alias("band_id", "sig"),
    )
    cand = (
        bnd.select(F.col("vec_id").alias("va"), "band_id", "sig")
        .join(
            bnd.select(F.col("vec_id").alias("vb"), "band_id", "sig"),
            ["band_id", "sig"],
        )
        .where(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )
    x = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    y = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    full = (
        cand.join(x, "va")
        .join(y, "vb")
        .select("va", "vb", cosine(F.col("ea"), F.col("eb")).alias("sim"))
        .where(F.col("sim") >= ANN_INCR_TAU)
        .collect()
    )
    want = {}
    for r in full:
        ba, bb = batch_of[r.va], batch_of[r.vb]
        if ba == bb:
            continue  # intra-batch: bootstrap territory, not emitted
        new, old = (r.va, r.vb) if ba > bb else (r.vb, r.va)
        want[(new, old)] = r.sim

    got = {
        (r.vec_id_new, r.vec_id_existing): r.cosine_sim
        for r in ann_pairs_from_state(spark, state).collect()
    }
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's pair rows under
    # the same batch_id; the derived pair set must not change
    pairs = spark.read.parquet(f"{state}/pairs")
    some_batch = pairs.agg(F.min("batch_id")).collect()[0][0]
    pairs.where(F.col("batch_id") == some_batch).write.mode(
        "append"
    ).parquet(f"{state}/pairs")
    replayed = {
        (r.vec_id_new, r.vec_id_existing): r.cosine_sim
        for r in ann_pairs_from_state(spark, state).collect()
    }
    assert replayed == want


def test_streaming_vocab_novelty(spark, sf_dir, tmp_path):
    """Streaming vocabulary-novelty == the batch answer: per-batch
    never-seen word counts must equal the first-seen-batch census
    recomputed from the recorded batch membership, and the derived
    curve must be idempotent under batch replay."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        streaming_vocab_novelty,
        vocab_novelty_from_state,
    )

    base = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(f"{base}/documents.parquet")

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_vocab_novelty(
        spark, f"{base}/documents.parquet", state, ckpt
    )
    q.awaitTermination(180)

    got = {
        r.batch_id: (r.n_tokens, r.n_new_words, r.cum_vocab)
        for r in vocab_novelty_from_state(spark, state).collect()
    }
    assert len(got) >= 2, "need >= 2 micro-batches"

    members = spark.read.parquet(f"{state}/members")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.join(members, "doc_id").select(
        "batch_id",
        F.explode(
            F.filter(F.split("text", " ", -1), lambda x: x != "")
        ).alias("word"),
    )
    bt = {
        r.batch_id: r.n
        for r in toks.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fw = (
        toks.groupBy("word")
        .agg(F.min("batch_id").alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
        .collect()
    )
    new_of = {r.batch_id: r.n_new for r in fw}
    cum = 0
    for b in sorted(got):
        cum += new_of.get(b, 0)
        assert got[b] == (bt.get(b, 0), new_of.get(b, 0), cum), (
            b,
            got[b],
        )

    # replay idempotency: re-append one batch's stats + vocab rows
    some = min(got)
    for part in ("stats", "vocab"):
        df = spark.read.parquet(f"{state}/{part}")
        df.where(F.col("batch_id") == some).write.mode("append").parquet(
            f"{state}/{part}"
        )
    replayed = {
        r.batch_id: (r.n_tokens, r.n_new_words, r.cum_vocab)
        for r in vocab_novelty_from_state(spark, state).collect()
    }
    assert replayed == got


def test_streaming_quality_funnel_incremental(spark, sf_dir, tmp_path):
    """The curation funnel maintained per micro-batch equals the batch
    quality_screen_funnel exactly (screens are per-doc, so batch
    funnels sum), and a crash-replayed batch does not double-count."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        quality_funnel_from_state,
        streaming_quality_funnel_incremental,
    )

    docs_dir = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_quality_funnel_incremental(spark, docs_dir, state, ckpt)
    q.awaitTermination(120)

    batch_ids = {
        r["batch_id"]
        for r in spark.read.parquet(state).select("batch_id").distinct().collect()
    }
    assert len(batch_ids) >= 2, batch_ids

    cols = (
        "n_docs", "pass_gopher", "pass_repetition", "pass_entropy", "pass_all"
    )
    got = quality_funnel_from_state(spark, state).collect()[0]
    want = load_all()["quality_screen_funnel"].fn(spark, sf_dir).collect()[0]
    assert tuple(got[c] for c in cols) == tuple(want[c] for c in cols)

    replay_id = min(batch_ids)
    st = spark.read.parquet(state)
    st.where(F.col("batch_id") == replay_id).write.mode("append").parquet(
        state
    )
    replayed = quality_funnel_from_state(spark, state).collect()[0]
    assert tuple(replayed[c] for c in cols) == tuple(want[c] for c in cols)


def test_streaming_decontaminate(spark, sf_dir, tmp_path):
    """Streaming decontamination == the batch verdict: streaming the
    test split through micro-batches verified against the frozen
    train index must reproduce decontaminate_test_split row-for-row,
    and the derived verdict set must be idempotent under replay."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        decontaminate_from_state,
        streaming_decontaminate,
    )

    base = str(tmp_path / "testdocs")
    load(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 >= 8
    ).repartition(4).write.mode("overwrite").parquet(base)

    state = str(tmp_path / "state")
    q = streaming_decontaminate(
        spark, base, sf_dir, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    batch_ids = {
        r.batch_id
        for r in spark.read.parquet(f"{state}/verdicts")
        .select("batch_id")
        .distinct()
        .collect()
    }
    assert len(batch_ids) >= 2, "need >= 2 micro-batches"

    def canon(pdf):
        return [
            (
                int(r.doc_id),
                bool(r.is_contaminated),
                int(r.n_train_matches),
                None if r.max_jaccard is None or r.max_jaccard != r.max_jaccard
                else round(float(r.max_jaccard), 12),
            )
            for r in pdf.sort_values("doc_id").itertuples()
        ]

    got = canon(decontaminate_from_state(spark, state).toPandas())
    want = canon(
        load_all()["decontaminate_test_split"].fn(spark, sf_dir).toPandas()
    )
    assert got == want

    # replay idempotency: re-append one batch's verdict rows
    v = spark.read.parquet(f"{state}/verdicts")
    v.where(F.col("batch_id") == min(batch_ids)).write.mode(
        "append"
    ).parquet(f"{state}/verdicts")
    replayed = canon(decontaminate_from_state(spark, state).toPandas())
    assert replayed == want


def _force_replay_of_last_batch(ckpt: str) -> int:
    """Simulate the crash-replay window: remove the newest commit file
    from a completed availableNow checkpoint, so a restart re-runs
    that batch under the SAME batch_id with state already containing
    its appends (the job 'died' after the parquet append, before the
    checkpoint commit)."""
    import os

    commits = os.path.join(ckpt, "commits")
    ids = [int(f) for f in os.listdir(commits) if f.isdigit()]
    last = max(ids)
    os.remove(os.path.join(commits, str(last)))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return last


def test_streaming_ann_incremental_crash_replay(spark, sf_dir, tmp_path):
    """r6 advice: a batch replayed after its index append must not
    band-join its own rows (self-pairs / intra-batch pairs) — the
    derived pair set must be exactly the clean run's."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        ann_pairs_from_state,
        streaming_ann_incremental,
    )

    base = str(tmp_path / "emb")
    load(spark, sf_dir, "embeddings").repartition(4).write.mode(
        "overwrite"
    ).parquet(base)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    streaming_ann_incremental(spark, base, state, ckpt).awaitTermination(180)
    clean = {
        (r.vec_id_new, r.vec_id_existing, r.cosine_sim)
        for r in ann_pairs_from_state(spark, state).collect()
    }
    last = _force_replay_of_last_batch(ckpt)
    streaming_ann_incremental(spark, base, state, ckpt).awaitTermination(180)
    idx = spark.read.parquet(f"{state}/index")
    # the replay re-appended the last batch's index rows...
    n_dup = idx.groupBy("vec_id").count().where(F.col("count") > 1).count()
    assert n_dup > 0, "replay did not re-append (test setup broken)"
    assert (
        idx.where(F.col("batch_id") == last).count()
        == 2 * idx.where(F.col("batch_id") == last).select("vec_id").distinct().count()
    )
    # ...but emitted no self-pairs and no new pair content
    replayed = {
        (r.vec_id_new, r.vec_id_existing, r.cosine_sim)
        for r in ann_pairs_from_state(spark, state).collect()
    }
    assert all(a != b for a, b, _ in replayed)
    assert replayed == clean


def test_streaming_vocab_novelty_crash_replay(spark, sf_dir, tmp_path):
    """r6 advice: a batch replayed after its vocab append must not see
    its own words as prior vocabulary (reporting n_new_words=0) — the
    derived curve must be exactly the clean run's."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        streaming_vocab_novelty,
        vocab_novelty_from_state,
    )

    base = str(tmp_path / "docs")
    docs_path = f"{base}/documents.parquet"
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_path)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    streaming_vocab_novelty(spark, docs_path, state, ckpt).awaitTermination(
        180
    )
    # a late tranche that definitely ADDS vocabulary, so the replayed
    # batch is one where the n_new_words=0 bug would be visible
    novel = load(spark, sf_dir, "documents").limit(5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("zzznovelalpha zzznovelbeta "), F.col("text")).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    novel.coalesce(1).write.mode("append").parquet(docs_path)
    streaming_vocab_novelty(spark, docs_path, state, ckpt).awaitTermination(
        180
    )
    clean = {
        r.batch_id: (r.n_tokens, r.n_new_words, r.cum_vocab)
        for r in vocab_novelty_from_state(spark, state).collect()
    }
    last = _force_replay_of_last_batch(ckpt)
    assert clean[last][1] > 0, "pick a batch that adds vocabulary"
    streaming_vocab_novelty(
        spark, f"{base}/documents.parquet", state, ckpt
    ).awaitTermination(180)
    stats = spark.read.parquet(f"{state}/stats")
    assert stats.where(F.col("batch_id") == last).count() == 2
    replayed = {
        r.batch_id: (r.n_tokens, r.n_new_words, r.cum_vocab)
        for r in vocab_novelty_from_state(spark, state).collect()
    }
    assert replayed == clean


def test_streaming_training_shards(spark, sf_dir, tmp_path):
    """The incrementally maintained shard manifest == the batch
    training_shards_pipeline under doc_id-ordered arrival (first-seen
    keeper == global min-doc_id keeper), and the derived manifest is
    idempotent under batch replay."""
    import time as _time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        shards_manifest_from_state,
        streaming_training_shards,
    )

    train = load(spark, sf_dir, "documents").where(
        F.col("doc_id") % 10 < 8
    )
    ids = sorted(r.doc_id for r in train.select("doc_id").collect())
    base = str(tmp_path / "traindocs")
    # 4 tranches in ascending doc_id order, written sequentially so the
    # file source ingests them in arrival (== doc_id) order
    step = (len(ids) + 3) // 4
    for i in range(4):
        lo = ids[i * step]
        hi = ids[min((i + 1) * step, len(ids)) - 1]
        train.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
        ).coalesce(1).write.mode("append").parquet(base)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    state = str(tmp_path / "state")
    q = streaming_training_shards(
        spark, base, sf_dir, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    manifest = spark.read.parquet(f"{state}/manifest")
    batch_ids = {r.batch_id for r in manifest.select("batch_id").distinct().collect()}
    assert len(batch_ids) >= 2, "need >= 2 micro-batches"

    def canon(pdf):
        return sorted(
            (int(r.shard), int(r.n_docs), int(r.n_chunks),
             int(r.total_tokens), int(r.checksum))
            for r in pdf.itertuples()
        )

    got = canon(shards_manifest_from_state(spark, state).toPandas())
    want = canon(
        load_all()["training_shards_pipeline"].fn(spark, sf_dir).toPandas()
    )
    assert got == want

    # replay idempotency: re-append one batch's manifest partials
    manifest.where(F.col("batch_id") == min(batch_ids)).write.mode(
        "append"
    ).parquet(f"{state}/manifest")
    assert canon(shards_manifest_from_state(spark, state).toPandas()) == want


def test_streaming_phash_neardup(spark, sf_dir, tmp_path):
    """Streaming perceptual near-dup maintenance == the batch answer:
    ingesting the image assets in micro-batches (each batch's fresh
    hashes band-joined against the accumulated hash index only) must
    emit exactly the cross-batch slice of multimodal_phash_neardup's
    hash-level pair set, oriented later-first-seen -> earlier, with
    identical Hamming distances — and the derived pair set must be
    idempotent under batch replay."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.operators.multimodal import (
        multimodal_phash_neardup,
    )
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        phash_pairs_from_state,
        streaming_phash_neardup,
    )

    base = str(tmp_path / "docs")
    docs = load(spark, sf_dir, "documents")
    # deterministic batch split (the corpus' one planted near pair at
    # this sf is docs 33/436 — parity puts them in different batches)
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(base)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(base)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_phash_neardup(spark, base, state, ckpt)
    q.awaitTermination(300)

    idx = (
        spark.read.parquet(f"{state}/phash_index")
        .groupBy("phash")
        .agg(F.min("batch_id").alias("batch_id"))
        .collect()
    )
    batch_of = {r.phash: r.batch_id for r in idx}
    assert len(set(batch_of.values())) >= 2, "need >= 2 micro-batches"

    want = {}
    for r in multimodal_phash_neardup(spark, sf_dir).collect():
        ba, bb = batch_of[r.phash_a], batch_of[r.phash_b]
        if ba == bb:
            continue  # intra-batch: bootstrap territory, not emitted
        new, old = (r.phash_a, r.phash_b) if ba > bb else (
            r.phash_b, r.phash_a)
        want[(new, old)] = r.hamming

    got = {
        (r.phash_new, r.phash_existing): r.hamming
        for r in phash_pairs_from_state(spark, state).collect()
    }
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's pair rows under
    # the same batch_id; the derived pair set must not change
    pairs = spark.read.parquet(f"{state}/phash_pairs")
    some_batch = pairs.agg(F.min("batch_id")).collect()[0][0]
    pairs.where(F.col("batch_id") == some_batch).write.mode(
        "append"
    ).parquet(f"{state}/phash_pairs")
    replayed = {
        (r.phash_new, r.phash_existing): r.hamming
        for r in phash_pairs_from_state(spark, state).collect()
    }
    assert replayed == want


def test_streaming_sequence_packing(spark, sf_dir, tmp_path):
    """Incrementally carried next-fit packing == the batch answer
    under in-order arrival: each micro-batch continues every shard's
    open bin from carried state, and the final per-shard stats must
    equal sequence_packing_stats' one-shot packing exactly — plus
    replay idempotency of the derived stats."""
    import time as _time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        packing_from_state,
        streaming_sequence_packing,
    )

    docs = load(spark, sf_dir, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    base = str(tmp_path / "docs")
    step = (len(ids) + 3) // 4
    for i in range(4):
        lo = ids[i * step]
        hi = ids[min((i + 1) * step, len(ids)) - 1]
        docs.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
        ).coalesce(1).write.mode("append").parquet(base)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    state = str(tmp_path / "state")
    q = streaming_sequence_packing(
        spark, base, state, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    st = spark.read.parquet(f"{state}/pack_state")
    assert st.select("batch_id").distinct().count() >= 2, "need >= 2 batches"

    def as_map(df):
        return {
            r.shard: (
                r.n_chunks,
                r.n_bins,
                r.total_tokens,
                r.padding_tokens,
                r.fill_rate,
            )
            for r in df.collect()
        }

    want = as_map(load_all()["sequence_packing_stats"].fn(spark, sf_dir))
    got = as_map(packing_from_state(spark, state))
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's state rows under
    # the same batch_id; the derived stats must not change
    some_batch = st.agg(F.min("batch_id")).collect()[0][0]
    st.where(F.col("batch_id") == some_batch).write.mode("append").parquet(
        f"{state}/pack_state"
    )
    assert as_map(packing_from_state(spark, state)) == want


def test_streaming_mixture_manifest_matches_batch(spark, sf_dir, tmp_path):
    """r9 twin: streaming the corpus in 4 micro-batches and deriving
    the mixture manifest from the additive (lang, source, ticket) unit
    state equals the batch data_mixture_manifest exactly — rates,
    achieved counts, everything (the rate arithmetic is the shared
    manifest_from_units kernel, so drift is structurally impossible;
    this test pins the state plumbing). State never stores text and is
    bounded by cells x 1e6 tickets regardless of corpus size."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        mixture_manifest_from_state,
        streaming_mixture_manifest,
    )

    docs_dir = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_mixture_manifest(spark, docs_dir, state, ckpt)
    q.awaitTermination(120)

    st = spark.read.parquet(state)
    batch_ids = {r.batch_id for r in st.select("batch_id").distinct().collect()}
    assert len(batch_ids) >= 2, batch_ids

    def as_map(df):
        return {
            (r.lang, r.source): (
                r.rate_ppm,
                r.n_docs,
                r.n_tokens,
                r.n_sampled_docs,
                r.sampled_tokens,
            )
            for r in df.collect()
        }

    want = as_map(load_all()["data_mixture_manifest"].fn(spark, sf_dir))
    got = as_map(mixture_manifest_from_state(spark, state))
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's state rows under
    # the same batch_id; the derived manifest must not change
    some_batch = min(batch_ids)
    st.where(F.col("batch_id") == some_batch).write.mode("append").parquet(
        state
    )
    assert as_map(mixture_manifest_from_state(spark, state)) == want


def test_streaming_span_cutlist_matches_batch(spark, sf_dir, tmp_path):
    """r9 twin: streaming the corpus in 4 micro-batches, keeping only
    the per-batch window hashes as state, and deriving the cut list
    from the accumulated index equals the batch dedup_span_cutlist
    exactly. The reader recomputes duplicated-membership corpus-wide,
    so cross-batch duplicates (a quote arriving batches apart) are
    found — per-batch emission could not do that (non-monotone
    semantics, see the twin's docstring)."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        span_cutlist_from_state,
        streaming_span_cutlist,
    )

    docs_dir = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_span_cutlist(spark, docs_dir, state, ckpt)
    q.awaitTermination(120)

    st = spark.read.parquet(state)
    batch_ids = {r.batch_id for r in st.select("batch_id").distinct().collect()}
    assert len(batch_ids) >= 2, batch_ids

    def as_set(df):
        return {
            (r.doc_id, r.run_start, r.run_end, r.run_len, r.n_windows)
            for r in df.collect()
        }

    want = as_set(load_all()["dedup_span_cutlist"].fn(spark, sf_dir))
    got = as_set(span_cutlist_from_state(spark, state))
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's window rows under
    # the same batch_id; the derived cut list must not change
    some_batch = min(batch_ids)
    st.where(F.col("batch_id") == some_batch).write.mode("append").parquet(
        state
    )
    assert as_set(span_cutlist_from_state(spark, state)) == want


def test_streaming_span_surgery_and_apply_match_batch(spark, sf_dir, tmp_path):
    """r10 twin (r9 verdict ask #6): streaming the corpus in 4
    micro-batches with the two-table state (window index + per-doc
    card), the derived surgery card equals batch dedup_span_surgery
    and the derived rewritten corpus equals batch dedup_span_apply —
    both through the SAME shared kernels. Replay idempotency: re-append
    one batch's rows in BOTH state tables; neither derivation moves."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        span_apply_from_state,
        span_surgery_from_state,
        streaming_span_surgery,
    )

    docs_dir = str(tmp_path / "docs")
    load(spark, sf_dir, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(docs_dir)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_span_surgery(spark, docs_dir, state, ckpt)
    q.awaitTermination(120)

    def rows(df):
        return {tuple(r) for r in df.collect()}

    registry = load_all()
    want_card = rows(registry["dedup_span_surgery"].fn(spark, sf_dir))
    want_clean = rows(registry["dedup_span_apply"].fn(spark, sf_dir))
    assert rows(span_surgery_from_state(spark, state)) == want_card
    assert rows(span_apply_from_state(spark, state)) == want_clean
    assert want_card and want_clean

    # crash-replay: duplicate one batch in both tables
    for part in ("windows", "docs"):
        st = spark.read.parquet(f"{state}/{part}")
        some_batch = st.agg(F.min("batch_id")).collect()[0][0]
        st.where(F.col("batch_id") == some_batch).write.mode(
            "append"
        ).parquet(f"{state}/{part}")
    assert rows(span_surgery_from_state(spark, state)) == want_card
    assert rows(span_apply_from_state(spark, state)) == want_clean


def test_streaming_interval_union_matches_batch(spark, sf_dir, tmp_path):
    """r10 twin: the per-user interval union maintained incrementally
    across 4 time-ordered event tranches equals merge_event_intervals'
    one-shot batch answer exactly — island ids, extents, event counts,
    covered time (the merge itself is the shared interval_islands
    kernel, so drift is structurally impossible; this pins the
    open-island carry and finalization). Plus crash-replay idempotency
    of the derived table after re-appending one batch's state rows."""
    import time as _time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        interval_union_from_state,
        streaming_interval_union,
    )

    from p4_mapreduce_spark.functions.timeutil import epoch_micros

    ev = load(spark, sf_dir, "events")
    us = epoch_micros(ev)
    ts_us = sorted(r[0] for r in ev.select(us.alias("u")).collect())
    src = str(tmp_path / "events_tranches")
    step = (len(ts_us) + 3) // 4
    bounds = [ts_us[min(i * step, len(ts_us) - 1)] for i in range(1, 4)]
    bounds = [None] + bounds + [None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(us >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(us < bounds[i + 1])
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    state = str(tmp_path / "state")
    q = streaming_interval_union(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    st = spark.read.parquet(f"{state}/open")
    assert st.select("batch_id").distinct().count() >= 2, "need >= 2 batches"

    def rows(df):
        return sorted(map(tuple, df.collect()))

    want = rows(load_all()["merge_event_intervals"].fn(spark, sf_dir))
    got = rows(interval_union_from_state(spark, state))
    assert got == want
    assert len(got) > 0

    # crash-replay idempotency: re-append one batch's rows in both
    # state tables; the derived union must not change
    for part in ("final", "open"):
        stp = spark.read.parquet(f"{state}/{part}")
        some_batch = stp.agg(F.min("batch_id")).collect()[0][0]
        stp.where(F.col("batch_id") == some_batch).write.mode(
            "append"
        ).parquet(f"{state}/{part}")
    assert rows(interval_union_from_state(spark, state)) == want


def test_streaming_interval_union_planted_finalization(spark, tmp_path):
    """Planted finalization semantics: user 1 appears in tranches 1 and
    3 (carry must survive the untouched middle batch), the tranche-3
    event is far from their open island (it must CLOSE and a new one
    open), while user 2's tranche-2 event touches their open island
    (it must MERGE, never close). Exact expected islands, plus the
    state split: exactly one closed island (user 1's first), latest
    open rows for both users."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.operators.analytics import _SPAN_US
    from p4_mapreduce_spark.streaming.windows import (
        interval_union_from_state,
        streaming_interval_union,
    )

    base = pd.Timestamp("2024-06-01 00:00:00")
    mins = pd.Timedelta(minutes=1)
    tranches = [
        [(1, base, 1), (2, base + 5 * mins, 2)],
        [(3, base + 20 * mins, 2)],  # touches user 2's open island
        [(4, base + 300 * mins, 1)],  # far from user 1's open island
    ]
    src = str(tmp_path / "events_tranches")
    for ev in tranches:
        table = pa.table(
            {
                "event_id": pa.array([e[0] for e in ev], pa.int64()),
                "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
                "user_id": pa.array([e[2] for e in ev], pa.int64()),
                "event_type": pa.array(["view"] * len(ev)),
                "value": pa.array([0.0] * len(ev), pa.float64()),
                "props": pa.array(["{}"] * len(ev)),
            }
        )
        import os

        os.makedirs(src, exist_ok=True)
        pq.write_table(table, f"{src}/t{len(os.listdir(src))}.parquet")
        _time.sleep(1.1)

    state = str(tmp_path / "state")
    q = streaming_interval_union(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    us = lambda td: int(td.value // 1000)  # noqa: E731
    t0 = us(base - pd.Timestamp(0))
    got = {
        (r.user_id, r.island_id): (
            r.span_start_us, r.span_end_us, r.n_events, r.covered_us
        )
        for r in interval_union_from_state(spark, state).collect()
    }
    m = 60 * 1_000_000
    assert got == {
        # user 1: island 1 = the tranche-1 event alone (closed when the
        # far tranche-3 event arrived); island 2 = the new open one
        (1, 1): (t0, t0 + _SPAN_US, 1, _SPAN_US),
        (1, 2): (t0 + 300 * m, t0 + 300 * m + _SPAN_US, 1, _SPAN_US),
        # user 2: both events merged into one island (15-min gap < span)
        (2, 1): (t0 + 5 * m, t0 + 20 * m + _SPAN_US, 2, 15 * m + _SPAN_US),
    }
    closed = spark.read.parquet(f"{state}/final").select(
        "user_id", "s", "e", "n"
    ).distinct().collect()
    assert [(r.user_id, r.s, r.e, r.n) for r in closed] == [
        (1, t0, t0 + _SPAN_US, 1)
    ]
    latest_open = {
        r.user_id
        for r in spark.read.parquet(f"{state}/open").collect()
    }
    assert latest_open == {1, 2}


def _write_event_tranches(tmp_path, tranches):
    """Write (user_id, ts[, event_type]) tranches as one parquet file
    each, with distinct mtimes so the stream's file order is
    deterministic."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "events_tranches")
    os.makedirs(src, exist_ok=True)
    eid = 0
    for ev in tranches:
        eid += len(ev)
        table = pa.table(
            {
                "event_id": pa.array(range(eid, eid + len(ev)), pa.int64()),
                "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
                "user_id": pa.array([e[0] for e in ev], pa.int64()),
                "event_type": pa.array(
                    [e[2] if len(e) > 2 else "view" for e in ev]
                ),
                "value": pa.array([0.0] * len(ev), pa.float64()),
                "props": pa.array(["{}"] * len(ev)),
            }
        )
        pq.write_table(table, f"{src}/t{len(os.listdir(src))}.parquet")
        _time.sleep(1.1)
    return src


def test_streaming_interval_union_open_state_compaction(spark, tmp_path):
    """r11 ADVICE fix: the open-state table compacts to
    latest-row-per-user every _OPEN_COMPACT_EVERY batches instead of
    growing one row per touched user per batch forever. Six tranches
    all touching user 1 (each far from the last, so every batch
    re-opens an island): without compaction the open directory holds 6
    rows; with the batch-4 compaction it holds the compacted carry
    plus the post-compaction appends. The derived union and the
    crash-recovery fallback (state parked at <open>.old) must both
    stay exact."""
    import os

    import pandas as pd

    from p4_mapreduce_spark.operators.analytics import _SPAN_US
    from p4_mapreduce_spark.streaming.windows import (
        _OPEN_COMPACT_EVERY,
        interval_union_from_state,
        streaming_interval_union,
    )

    assert _OPEN_COMPACT_EVERY <= 4, "test feeds 6 tranches"
    base = pd.Timestamp("2024-06-01 00:00:00")
    hrs = pd.Timedelta(hours=6)
    tranches = [[(1, base + i * hrs)] for i in range(6)]
    src = _write_event_tranches(tmp_path, tranches)
    state = str(tmp_path / "state")
    q = streaming_interval_union(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    open_rows = spark.read.parquet(f"{state}/open").collect()
    assert len(open_rows) <= 1 + (5 - _OPEN_COMPACT_EVERY) + 1, (
        "open state not compacted: one carry row + post-compaction "
        f"appends expected, got {len(open_rows)}"
    )

    t0 = int((base - pd.Timestamp(0)).value // 1000)
    h = 6 * 3600 * 1_000_000
    want = {
        (1, i + 1): (t0 + i * h, t0 + i * h + _SPAN_US, 1, _SPAN_US)
        for i in range(6)
    }
    got = {
        (r.user_id, r.island_id): (
            r.span_start_us, r.span_end_us, r.n_events, r.covered_us
        )
        for r in interval_union_from_state(spark, state).collect()
    }
    assert got == want

    # crash-recovery fallback: a crash between the two compaction
    # renames leaves the state at <open>.old — the reader restores it
    os.rename(f"{state}/open", f"{state}/open.old")
    got2 = {
        (r.user_id, r.island_id): (
            r.span_start_us, r.span_end_us, r.n_events, r.covered_us
        )
        for r in interval_union_from_state(spark, state).collect()
    }
    assert got2 == want
    assert os.path.exists(f"{state}/open")


def test_streaming_interval_union_out_of_order_raises(spark, tmp_path):
    """r11 ADVICE fix: the in-order-arrival precondition is guarded,
    not assumed — a tranche-2 event EARLIER than user 1's carried open
    island start must fail the query loudly (it could belong to an
    already-closed island, which can never re-merge), instead of
    silently producing a wrong union."""
    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from p4_mapreduce_spark.streaming.windows import (
        streaming_interval_union,
    )

    base = pd.Timestamp("2024-06-01 12:00:00")
    hrs = pd.Timedelta(hours=1)
    tranches = [
        [(1, base)],
        [(1, base - 3 * hrs)],  # out of order: before the open island
    ]
    src = _write_event_tranches(tmp_path, tranches)
    q = streaming_interval_union(
        spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    with pytest.raises(StreamingQueryException, match="time-order violated"):
        q.awaitTermination(180)


def test_streaming_interval_overlap_matches_batch_kernel(spark, sf_dir, tmp_path):
    """r11 twin: the co-presence pair rollup derived from the interval
    union's state store equals the SAME overlap_pairs_rollup kernel
    run over the batch merge_event_intervals islands — the warm
    session store feeds the overlap join with no second pass over raw
    events, and the hot-bin-salted kernel is shared so drift is
    structurally impossible."""
    import time as _time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.functions.timeutil import epoch_micros
    from p4_mapreduce_spark.operators.analytics import overlap_pairs_rollup
    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        interval_overlap_from_state,
        streaming_interval_union,
    )

    ev = load(spark, sf_dir, "events")
    us = epoch_micros(ev)
    ts_us = sorted(r[0] for r in ev.select(us.alias("u")).collect())
    src = str(tmp_path / "events_tranches")
    step = (len(ts_us) + 2) // 3
    bounds = [None] + [ts_us[min(i * step, len(ts_us) - 1)] for i in (1, 2)] + [None]
    for i in range(3):
        part = ev
        if bounds[i] is not None:
            part = part.where(us >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(us < bounds[i + 1])
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    state = str(tmp_path / "state")
    q = streaming_interval_union(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    batch_sess = load_all()["merge_event_intervals"].fn(spark, sf_dir).select(
        "user_id",
        "island_id",
        F.col("span_start_us").alias("s"),
        F.col("span_end_us").alias("e"),
    )
    want = rows(overlap_pairs_rollup(batch_sess))
    got = rows(interval_overlap_from_state(spark, state))
    assert got == want
    assert len(got) > 0


def test_streaming_markov_matches_batch(spark, sf_dir, tmp_path):
    """r11 twin: transition counts maintained incrementally across 3
    time-ordered tranches equal event_markov_transitions' one-shot
    batch answer exactly — the carried per-user last event makes every
    cross-batch adjacency count exactly once. Plus crash-replay
    idempotency of the derived matrix after re-appending one batch's
    state rows."""
    import time as _time

    import pyspark.sql.functions as F

    from p4_mapreduce_spark.functions.timeutil import epoch_micros
    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        markov_from_state,
        streaming_markov_transitions,
    )

    ev = load(spark, sf_dir, "events")
    us = epoch_micros(ev)
    ts_us = sorted(r[0] for r in ev.select(us.alias("u")).collect())
    src = str(tmp_path / "events_tranches")
    step = (len(ts_us) + 2) // 3
    bounds = [None] + [ts_us[min(i * step, len(ts_us) - 1)] for i in (1, 2)] + [None]
    for i in range(3):
        part = ev
        if bounds[i] is not None:
            part = part.where(us >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(us < bounds[i + 1])
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    state = str(tmp_path / "state")
    q = streaming_markov_transitions(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    want = rows(load_all()["event_markov_transitions"].fn(spark, sf_dir))
    got = rows(markov_from_state(spark, state))
    assert got == want
    assert len(got) > 0

    for part in ("trans", "last"):
        stp = spark.read.parquet(f"{state}/{part}")
        some_batch = stp.agg(F.min("batch_id")).collect()[0][0]
        stp.where(F.col("batch_id") == some_batch).write.mode(
            "append"
        ).parquet(f"{state}/{part}")
    assert rows(markov_from_state(spark, state)) == want


def test_streaming_interval_union_replay_after_compaction(spark, tmp_path):
    """r12 ADVICE fix (high, replay idempotency): compaction keeps the
    in-flight batch's rows VERBATIM and collapses only the strict past,
    so a crash AFTER compaction but BEFORE the streaming checkpoint
    commits the batch replays against exactly the carry the original
    attempt saw. Plant: batch 4 (the compaction batch) MERGES with
    batch 3's open island; the crash is simulated by deleting
    <ckpt>/commits/4 and restarting. Under a collapse-to-global-max
    compactor (the r11 shape) the sole surviving row for the touched
    user has batch_id == 4, the replayed carry filter batch_id < 4
    finds nothing, and the merge is silently lost (island start moves
    from 18h to 18h10m, n_events drops 2 -> 1)."""
    import os

    import pandas as pd

    from p4_mapreduce_spark.operators.analytics import _SPAN_US
    from p4_mapreduce_spark.streaming.windows import (
        _OPEN_COMPACT_EVERY,
        interval_union_from_state,
        streaming_interval_union,
    )

    assert _OPEN_COMPACT_EVERY == 4, "plant targets the batch-4 compaction"
    base = pd.Timestamp("2024-06-01 00:00:00")
    hrs = pd.Timedelta(hours=6)
    tranches = [[(1, base + i * hrs)] for i in range(4)]
    # batch 4: 10 minutes after batch 3's event — inside the 30-minute
    # span, so it must MERGE with the carried open island
    tranches.append([(1, base + 3 * hrs + pd.Timedelta(minutes=10))])
    src = _write_event_tranches(tmp_path, tranches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_interval_union(spark, src, state, ckpt)
    q.awaitTermination(180)

    t0 = int((base - pd.Timestamp(0)).value // 1000)
    h = 6 * 3600 * 1_000_000
    m10 = 10 * 60 * 1_000_000
    want = {
        (1, i + 1): (t0 + i * h, t0 + i * h + _SPAN_US, 1, _SPAN_US)
        for i in range(3)
    }
    want[(1, 4)] = (
        t0 + 3 * h,
        t0 + 3 * h + m10 + _SPAN_US,
        2,
        m10 + _SPAN_US,
    )

    def derive():
        return {
            (r.user_id, r.island_id): (
                r.span_start_us,
                r.span_end_us,
                r.n_events,
                r.covered_us,
            )
            for r in interval_union_from_state(spark, state).collect()
        }

    assert derive() == want

    # crash after batch 4's sink (which ran compaction) but before the
    # checkpoint committed batch 4: drop the commit marker and restart
    # — availableNow re-executes batch 4 from the recorded offsets
    os.remove(os.path.join(ckpt, "commits", "4"))
    # the local checkpoint FS keeps a checksum sidecar; drop it too or
    # the replay's commit rename fails on the stale crc
    crc = os.path.join(ckpt, "commits", ".4.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = streaming_interval_union(spark, src, state, ckpt)
    q2.awaitTermination(180)
    assert derive() == want, (
        "replayed batch 4 diverged from its original attempt — the "
        "compactor deleted pre-batch history the replay's carry needed"
    )


def test_streaming_markov_state_compaction_and_replay(spark, tmp_path):
    """r12 ADVICE fix: the markov twin's `last` and `trans` stores are
    compacted with the same replay-safe discipline as the interval
    union's open store (strict-past collapse, current batch verbatim,
    write-aside + rename + recovery). Five tranches, two users, batch 4
    is both a cross-boundary transition for each user AND the
    compaction batch; then the crash-replay of batch 4 (commit marker
    deleted) must leave the derived transition matrix byte-identical —
    the carried last events must survive compaction, and the replayed
    batch's duplicate trans appends must collapse via
    first-per-(batch_id, pair)."""
    import os

    import pandas as pd

    from p4_mapreduce_spark.streaming.windows import (
        _OPEN_COMPACT_EVERY,
        markov_from_state,
        streaming_markov_transitions,
    )

    assert _OPEN_COMPACT_EVERY == 4, "plant targets the batch-4 compaction"
    base = pd.Timestamp("2024-06-01 00:00:00")
    hrs = pd.Timedelta(hours=1)
    tranches = [
        [(1, base, "A"), (2, base, "C")],
        [(1, base + 1 * hrs, "B")],
        [(1, base + 2 * hrs, "A"), (2, base + 2 * hrs, "B")],
        [(1, base + 3 * hrs, "A")],
        [(1, base + 4 * hrs, "B"), (2, base + 4 * hrs, "C")],
    ]
    src = _write_event_tranches(tmp_path, tranches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_markov_transitions(spark, src, state, ckpt)
    q.awaitTermination(180)

    # u1: A,B,A,A,B -> A->B x2, B->A x1, A->A x1; u2: C,B,C -> C->B, B->C
    want = sorted(
        [
            ("A", "A", 1, 0.333333),
            ("A", "B", 2, 0.666667),
            ("B", "A", 1, 0.5),
            ("B", "C", 1, 0.5),
            ("C", "B", 1, 1.0),
        ]
    )

    def derive():
        return sorted(map(tuple, markov_from_state(spark, state).collect()))

    assert derive() == want

    # growth bound: without compaction `last` holds one row per touched
    # user per batch (8 here); with the batch-4 compaction it holds the
    # two per-user collapsed carries + batch-4 verbatim rows only
    last_rows = spark.read.parquet(f"{state}/last").collect()
    assert len(last_rows) == 4, (
        f"last store not compacted: expected 2 collapsed + 2 verbatim "
        f"batch-4 rows, got {len(last_rows)}"
    )
    trans = spark.read.parquet(f"{state}/trans").collect()
    assert any(r.batch_id == -1 for r in trans), (
        "trans store not compacted: no sentinel summary rows"
    )

    # crash-replay of the compaction batch: drop the commit marker
    os.remove(os.path.join(ckpt, "commits", "4"))
    crc = os.path.join(ckpt, "commits", ".4.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = streaming_markov_transitions(spark, src, state, ckpt)
    q2.awaitTermination(180)
    assert derive() == want, (
        "replayed batch 4 diverged — either the compactor deleted the "
        "carried last events or the duplicate trans appends double-count"
    )

    # crash-recovery fallback of the rename dance for both stores
    os.rename(f"{state}/trans", f"{state}/trans.old")
    assert derive() == want
    assert os.path.exists(f"{state}/trans")


def _write_doc_tranches(tmp_path, tranches):
    """Write document tranches (lists of (doc_id, text)) as one parquet
    file each with distinct mtimes."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "doc_tranches")
    os.makedirs(src, exist_ok=True)
    for docs in tranches:
        table = pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
            }
        )
        pq.write_table(table, f"{src}/t{len(os.listdir(src))}.parquet")
        _time.sleep(1.1)
    return src


def test_streaming_trigram_novelty_matches_batch(spark, sf_dir, tmp_path):
    """r12 twin: trigram first-occurrence ownership maintained over
    document tranches equals text_ngram_novelty's one-shot batch
    answer — including OUT-OF-ORDER arrival (a later tranche carrying
    a LOWER doc_id steals ownership, because the state reader is a
    min-merge, which is also why replay needs no carry protocol)."""
    import pyspark.sql.functions as F

    from p4_mapreduce_spark.registry import load_all
    from p4_mapreduce_spark.sources.tables import load
    from p4_mapreduce_spark.streaming.windows import (
        streaming_trigram_novelty,
        trigram_novelty_from_state,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    rows_all = [(r.doc_id, r.text) for r in docs.collect()]
    rows_all.sort()
    third = (len(rows_all) + 2) // 3
    # middle third FIRST: ownership of shared trigrams must transfer
    # to the lower doc_ids when tranche 2 arrives
    tranches = [
        rows_all[third: 2 * third],
        rows_all[:third],
        rows_all[2 * third:],
    ]
    src = _write_doc_tranches(tmp_path, tranches)
    state = str(tmp_path / "state")
    q = streaming_trigram_novelty(spark, src, state, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    want = rows(load_all()["text_ngram_novelty"].fn(spark, sf_dir))
    got = rows(trigram_novelty_from_state(spark, state))
    assert got == want
    assert len(got) > 0


def test_streaming_trigram_novelty_compaction_and_replay(spark, tmp_path):
    """Planted 5-tranche run over one repeated trigram: batch 4 is the
    compaction batch; after it the tri store holds one min-owner row
    per trigram (plus the current batch's verbatim rows), and a
    crash-replay of batch 4 (commit marker deleted) leaves the derived
    novelty byte-identical — min-merge idempotency, executed."""
    import os

    from p4_mapreduce_spark.streaming.windows import (
        _OPEN_COMPACT_EVERY,
        streaming_trigram_novelty,
        trigram_novelty_from_state,
    )

    assert _OPEN_COMPACT_EVERY == 4
    # every tranche shares trigram 'a b c'; owners descend so each
    # batch IMPROVES the stored owner (worst case for store growth)
    tranches = [
        [(50, "a b c d")],
        [(40, "a b c e")],
        [(30, "a b c f")],
        [(20, "a b c g")],
        [(10, "a b c h")],
    ]
    src = _write_doc_tranches(tmp_path, tranches)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_trigram_novelty(spark, src, state, ckpt)
    q.awaitTermination(180)

    # doc 10 owns 'a b c' + its own tail trigrams; every other doc
    # owns only its tail ('b c X' and 'a b c' lost to doc 10)
    want = {
        10: (2, 2, 1000000),
        20: (2, 1, 500000),
        30: (2, 1, 500000),
        40: (2, 1, 500000),
        50: (2, 1, 500000),
    }

    def derive():
        return {
            r.doc_id: (r.n_trigrams, r.n_novel, r.novelty_ppm)
            for r in trigram_novelty_from_state(spark, state).collect()
        }

    assert derive() == want
    tri_rows = spark.read.parquet(f"{state}/tri").collect()
    # post-compaction: strict past collapsed to min-owner per trigram
    # ('a b c' once + 4 tails) + batch 4's verbatim improvements
    assert len(tri_rows) <= 5 + 2, len(tri_rows)

    os.remove(os.path.join(ckpt, "commits", "4"))
    crc = os.path.join(ckpt, "commits", ".4.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = streaming_trigram_novelty(spark, src, state, ckpt)
    q2.awaitTermination(180)
    assert derive() == want

    # rename-dance recovery
    os.rename(f"{state}/tri", f"{state}/tri.old")
    assert derive() == want
    assert os.path.exists(f"{state}/tri")
