"""Observability parity with the reference's debug operators.

- ``peek`` (R1, ``Streams.java:135``): the reference logs every record
  key as a side effect. Record-at-a-time logging is an anti-pattern on
  a vectorized engine; the Spark-first equivalent is ``df.observe`` —
  named aggregate metrics collected per action/micro-batch with zero
  plan impact, surfaced via ``QueryExecution.observedMetrics`` or a
  ``StreamingQueryListener``.
- ``with_task_info`` (R7, ``Streams.java:187-202``): the reference's
  pass-through transformer prints thread/task/partition to show task
  distribution; ``spark_partition_id()`` is the declarative equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def peek(df: DataFrame, name: str, *metrics) -> DataFrame:
    """Attach named observed metrics (default: row count) — the
    log-and-continue-friendly replacement for per-record peek logging."""
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(name, *metrics)


def with_task_info(df: DataFrame) -> DataFrame:
    """Tag each row with its physical partition id (task placement)."""
    return df.withColumn("_partition_id", F.spark_partition_id())
