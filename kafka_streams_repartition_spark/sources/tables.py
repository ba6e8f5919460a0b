"""Parquet star-schema loaders for the driver testdata (TESTDATA.md).

At 100 TB these reads are the dominant cost: every operator in this repo
selects only the columns it needs so Catalyst prunes the parquet scan
(check ``ReadSchema`` in explain output), and filters are plain column
predicates so they reach ``PushedFilters``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (spark id, sf_dir, name) → DataFrame. DataFrames are lazy plans, but
# creating one re-reads parquet footers for schema inference; a bench
# run touches 10 tables × ~28 queries, so memoize per session.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long nanos (see session.py); truncate
        # to micros with integer division (doubles would lose precision
        # above 2^53 ns) and restore TimestampType.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Hash-repartition iff the scan yielded fewer partitions than cores.

    A single small parquet file (one row group) scans as ONE partition,
    serializing per-row-heavy work (hashing, shingling, vector math).
    At cluster scale inputs arrive in many splits and this is a no-op;
    locally it costs one small shuffle before the expensive map work.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
