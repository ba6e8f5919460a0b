"""S9 topic admin: create/delete/describe with partition counts and
compaction configs (``BuildSystem.java:67-131``), Spark-native."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_streams_repartition_spark.sources.admin import TopicAdmin, TopicSpec


@pytest.fixture()
def admin(spark, tmp_path):
    return TopicAdmin(spark, str(tmp_path / "topics"))


def test_create_describe_list_delete_roundtrip(admin):
    spec = TopicSpec("orders-purchase-v1", partitions=8)
    admin.create_topic(spec)
    assert admin.topic_exists("orders-purchase-v1")
    assert admin.list_topics() == ["orders-purchase-v1"]
    got = admin.describe_topic("orders-purchase-v1")
    assert got.partitions == 8 and not got.compacted

    # create-existing fails loudly unless exist_ok (NewTopic semantics)
    with pytest.raises(FileExistsError):
        admin.create_topic(spec)
    admin.create_topic(spec, exist_ok=True)

    admin.delete_topic("orders-purchase-v1")
    assert not admin.topic_exists("orders-purchase-v1")
    with pytest.raises(FileNotFoundError):
        admin.delete_topic("orders-purchase-v1")
    admin.delete_topic("orders-purchase-v1", missing_ok=True)


def test_invalid_specs_and_names(admin):
    with pytest.raises(ValueError):
        TopicSpec("t", partitions=0)
    with pytest.raises(ValueError):
        TopicSpec("t", compacted=True)  # compaction needs key/order cols
    with pytest.raises(ValueError):
        admin.delete_topic("../escape")


def test_write_honors_partition_count(admin, spark):
    admin.create_topic(TopicSpec("evts", partitions=3))
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    admin.write("evts", df)
    data_dir = os.path.join(admin._topic_dir("evts"), "data")
    files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(files) == 3
    assert admin.read("evts").count() == 100


def test_compacted_read_is_latest_per_key_with_tombstones(admin, spark):
    admin.create_topic(
        TopicSpec(
            "users",
            partitions=2,
            compacted=True,
            key_cols=["k"],
            order_cols=["offset"],
            tombstone_col="v",
        )
    )
    rows = [
        ("a", "a1", 1),
        ("b", "b1", 2),
        ("a", "a2", 3),  # supersedes a1
        ("c", "c1", 4),
        ("b", None, 5),  # tombstone deletes b
    ]
    df = spark.createDataFrame(rows, "k string, v string, offset long")
    admin.write("users", df)
    got = {r["k"]: r["v"] for r in admin.read("users").collect()}
    assert got == {"a": "a2", "c": "c1"}

    # a later write can resurrect a tombstoned key (compaction is
    # an ordering contract, not a permanent delete)
    admin.write(
        "users", spark.createDataFrame([("b", "b2", 6)], "k string, v string, offset long")
    )
    got = {r["k"]: r["v"] for r in admin.read("users").collect()}
    assert got == {"a": "a2", "b": "b2", "c": "c1"}
