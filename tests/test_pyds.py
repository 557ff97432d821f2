"""Python Data Source (synthdocs): contract + determinism + composition."""

from __future__ import annotations

import pyspark.sql.functions as F

from p4_mapreduce_spark.sources.pyds import register_synthdocs


def _read(spark, rows=600, parts=8, seed=7):
    register_synthdocs(spark)
    return (
        spark.read.format("synthdocs")
        .option("rows", rows)
        .option("partitions", parts)
        .option("seed", seed)
        .load()
    )


def test_synthdocs_schema_and_coverage(spark):
    df = _read(spark)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,source:string,n_words:int,text:string>"
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 600
    # every doc_id exactly once (remainder partition included)
    assert df.select("doc_id").distinct().count() == 600
    assert df.agg(F.min("doc_id"), F.max("doc_id")).collect()[0][0:2] == (0, 599)


def test_synthdocs_deterministic_and_partition_independent(spark):
    a = sorted(map(tuple, _read(spark, rows=300, parts=4).collect()))
    b = sorted(map(tuple, _read(spark, rows=300, parts=4).collect()))
    c = sorted(map(tuple, _read(spark, rows=300, parts=3).collect()))
    assert a == b  # same options → bit-identical
    assert a == c  # partitioning must not change content
    d = sorted(map(tuple, _read(spark, rows=300, parts=4, seed=8).collect()))
    assert a != d  # seed changes content


def test_synthdocs_composes_with_engine_ops(spark):
    """The source feeds normal DataFrame ops (wordcount over it)."""
    df = _read(spark, rows=200, parts=4)
    wc = (
        df.select(F.explode(F.split("text", " ", -1)).alias("word"))
        .groupBy("word")
        .count()
    )
    got = {r["word"]: r["count"] for r in wc.collect()}
    assert sum(got.values()) == df.agg(F.sum("n_words")).collect()[0][0]


def test_synthdocs_stream_drains_to_batch_equality(spark, tmp_path):
    """The streaming reader must drain maxRows across multiple
    micro-batches (batchRows offsets) and produce rows bit-identical
    to the batch reader with the same seed."""
    import time

    register_synthdocs(spark)
    stream = (
        spark.readStream.format("synthdocs")
        .option("batchRows", "100")
        .option("maxRows", "400")
        .option("seed", "7")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synthdocs_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("synthdocs_stream").count() >= 400:
                break
            time.sleep(1)
    finally:
        q.stop()

    got = sorted(map(tuple, spark.table("synthdocs_stream").collect()))
    want = sorted(
        map(
            tuple,
            spark.read.format("synthdocs")
            .option("rows", "400")
            .option("seed", "7")
            .load()
            .collect(),
        )
    )
    assert len(got) == 400
    assert got == want
    # and it really was incremental: >= 4 micro-batches of 100
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 4
