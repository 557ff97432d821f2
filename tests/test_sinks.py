"""Sink/layout tests: partition pruning and bucketed shuffle-free joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from p4_mapreduce_spark.plans.explain import plan_string
from p4_mapreduce_spark.sources.tables import load
from p4_mapreduce_spark.sources.writers import (
    roundtrip_csv,
    roundtrip_json,
    roundtrip_orc,
    write_bucketed_table,
    write_partitioned_parquet,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_parted")
    write_partitioned_parquet(orders, path, ["o_orderstatus"])

    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = plan_string(back)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0], plan
    want = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == want


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    got_csv = roundtrip_csv(spark, nation, str(tmp_path / "nation_csv"))
    got_json = roundtrip_json(spark, nation, str(tmp_path / "nation_json"))
    want = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, got_csv.collect())) == want
    assert sorted(map(tuple, got_json.collect())) == want
    assert got_csv.schema == nation.schema
    assert got_json.schema == nation.schema


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Native XML source (Spark 4): values and schema survive the
    roundtrip with an explicit read schema."""
    from p4_mapreduce_spark.sources.writers import roundtrip_xml

    nation = load(spark, sf_dir, "nation")
    got = roundtrip_xml(
        spark, nation, str(tmp_path / "nation_xml"), row_tag="nation"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, nation.collect())
    )
    assert got.schema == nation.schema


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC roundtrip preserves values/schema, and filters push into the
    ORC scan just like parquet."""
    orders = load(spark, sf_dir, "orders")
    back = roundtrip_orc(spark, orders, str(tmp_path / "orders_orc"))
    assert back.schema == orders.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))
    plan = plan_string(back.where(F.col("o_orderstatus") == "F"))
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1].split("]")[0], plan


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key by the same bucket count:
    the join must plan without a shuffle exchange on either side."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "orders_b",
        "o_orderkey",
        4,
        sort_col="o_orderkey",
    )
    write_bucketed_table(
        li.select("l_orderkey", "l_quantity"),
        "lineitem_b",
        "l_orderkey",
        4,
        sort_col="l_orderkey",
    )
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join should not shuffle:\n" + plan
        )
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_compact_parquet_dir(spark, sf_dir, tmp_path):
    """Many small appended files -> few compacted files, same rows."""
    from p4_mapreduce_spark.sources.writers import compact_parquet_dir

    nation = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_many")
    # simulate an incremental sink: one file per append
    for i in range(6):
        nation.coalesce(1).write.mode("append").parquet(path)
    import os

    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 6
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    n_after = compact_parquet_dir(spark, path, 2)
    assert n_after <= 2
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == want


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Evolving parquet batches read back with mergeSchema: old rows
    get NULL for later-added columns — the append-only contract a
    long-lived corpus store relies on."""
    path = str(tmp_path / "evolving")
    v1 = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    v2 = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", F.upper("n_name").alias("n_name_upper")
    )
    v1.write.mode("append").parquet(path)
    v2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(back.columns) == {"n_nationkey", "n_name", "n_name_upper"}
    assert back.count() == v1.count() * 2
    assert back.where(F.col("n_name_upper").isNull()).count() == v1.count()
