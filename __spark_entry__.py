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
from kafka_streams_repartition_spark.operators import product_stats as ps
from kafka_streams_repartition_spark.operators import restore as rst
from kafka_streams_repartition_spark.operators import windows as win


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
        "product_stats_v1": _q(ps.product_stats_v1),
        "product_stats_v2": _q(ps.product_stats_v2),
        "restore_merge": _q(rst.restore_merge),
        "ktable_latest_event": _q(win.ktable_latest_event),
        "tumbling_events": _q(win.tumbling_events),
        "hopping_events": _q(win.hopping_events),
        "session_events": _q(win.session_events),
        "sliding_events": _q(win.sliding_events),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pickup_order_summary": po.PICKUP_ORDER_SUMMARY_ORACLE,
        "pickup_order_nested": po.PICKUP_ORDER_NESTED_ORACLE,
        "product_stats_v1": ps.PRODUCT_STATS_V1_ORACLE,
        "product_stats_v2": ps.PRODUCT_STATS_V2_ORACLE,
        "restore_merge": rst.RESTORE_MERGE_ORACLE,
        "ktable_latest_event": win.KTABLE_LATEST_EVENT_ORACLE,
        "tumbling_events": win.TUMBLING_EVENTS_ORACLE,
        "hopping_events": win.HOPPING_EVENTS_ORACLE,
        "session_events": win.SESSION_EVENTS_ORACLE,
        "sliding_events": win.SLIDING_EVENTS_ORACLE,
    }
