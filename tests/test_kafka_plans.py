"""Broker-less construction tests for the Kafka source/sink wiring.

The kafka data source has a fixed record schema, so ``load()`` builds a
resolvable plan without contacting a broker (offsets resolve at
execution).  These tests catch option/typo regressions in
``sources/kafka.py`` — the furthest the sandbox (no broker) can
exercise S1/S6 (reference: ``streams/.../Streams.java:133-169``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kafka_streams_repartition_spark.sources.kafka import (
    read_batch,
    read_stream,
    write_stream_writer,
)

SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("qty", T.IntegerType()),
    ]
)

KAFKA_RECORD_COLS = {"key", "order_id", "qty", "topic", "partition", "offset", "kafka_ts"}


@pytest.fixture(scope="module")
def has_kafka_source(spark):
    """The kafka connector jar may not ship with a bare pyspark install."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def test_read_stream_plan_shape(spark, has_kafka_source):
    if not has_kafka_source:
        pytest.skip("kafka data source jar not on classpath in this container")
    df = read_stream(spark, "broker:9092", "orders", SCHEMA)
    assert df.isStreaming
    assert set(df.columns) == KAFKA_RECORD_COLS | {"_corrupt"}
    assert dict(df.dtypes)["qty"] == "int"


def test_read_batch_plan_shape(spark, has_kafka_source):
    if not has_kafka_source:
        pytest.skip("kafka data source jar not on classpath in this container")
    df = read_batch(spark, "broker:9092", "orders", SCHEMA)
    assert not df.isStreaming
    assert set(df.columns) == KAFKA_RECORD_COLS | {"_corrupt"}


def test_write_stream_writer_builds(spark, tmp_path, has_kafka_source):
    if not has_kafka_source:
        pytest.skip("kafka data source jar not on classpath in this container")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("CAST(value AS STRING) AS order_id", "1 AS qty")
    )
    writer = write_stream_writer(
        stream, "broker:9092", "out", "order_id", str(tmp_path / "ckpt")
    )
    # options wired, nothing started; _df on the writer carries the
    # encoded (key, value) frame the kafka sink requires
    assert writer is not None
