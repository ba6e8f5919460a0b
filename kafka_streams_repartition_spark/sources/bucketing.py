"""Bucketed-table plumbing: pre-shuffled storage for repeated joins.

The reference co-partitions by making every topic carry the same
partition count and re-keying through repartition topics
(``BaseOptions.java:35-36`` surfaces the repartition-topic names); the
warehouse-native equivalent is bucketing: write both join sides
``bucketBy(n, key)`` once, and every subsequent equi-join on that key
is exchange-free — the scan itself is the shuffle, paid once at write
time instead of per query. At 100 TB this is the difference between
re-shuffling the fact table for every consumer and never shuffling it
again.

Bucket counts are the analog of the reference's 4-vs-8 partition
mismatch: joining tables bucketed 4 and 8 falls back to a shuffle
(Spark coalesces or re-shuffles), which is exactly the v1/v2 migration
story — except here it degrades gracefully instead of corrupting state.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, key: str, sort: bool = True
) -> None:
    """Persist a frame bucketed (and bucket-sorted) by the join key.

    Drops any previous incarnation first: with the in-memory catalog a
    stale warehouse directory from an earlier session would otherwise
    fail LOCATION_ALREADY_EXISTS even in overwrite mode.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket key — plans with
    zero key exchanges when bucket counts match (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key, "inner")
