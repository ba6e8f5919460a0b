"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pickup-order query at sf0.001 (smoke).
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
north-star extensions); each takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents keyed the same.
Column names/aliases match between both sides (driver hashes values with
columns sorted by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_repartition_spark.sources.tables import load_tables
from kafka_streams_repartition_spark.operators import pickup_order as po


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    return po.pickup_order_summary(t)


def _q(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pickup_order_summary": _q(po.pickup_order_summary),
        "pickup_order_nested": _q(po.pickup_order_nested),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pickup_order_summary": po.PICKUP_ORDER_SUMMARY_ORACLE,
        "pickup_order_nested": po.PICKUP_ORDER_NESTED_ORACLE,
    }
