"""Parquet star-schema loaders for the driver testdata (TESTDATA.md).

At 100 TB these reads are the dominant cost: every operator in this repo
selects only the columns it needs so Catalyst prunes the parquet scan
(check ``ReadSchema`` in explain output), and filters are plain column
predicates so they reach ``PushedFilters``.

The loader is **session-portable**: it must work on a SparkSession it did
not build (the external driver constructs a vanilla one).  Anything the
read depends on — the nanos-timestamp legacy conf — is set here at load
time, not assumed from ``session.get_spark``.
"""

from __future__ import annotations

import os
import weakref
from collections.abc import Iterator, Mapping

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


# session → {(sf_dir, name): DataFrame}.  DataFrames are lazy plans, but
# creating one re-reads parquet footers for schema inference; a bench run
# touches 10 tables × ~30 queries, so memoize per session.  Weak keys so a
# stopped, garbage-collected session cannot alias a new one (id() reuse).
_TABLE_CACHE: weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]] = (
    weakref.WeakKeyDictionary()
)


def _ensure_read_confs(spark: SparkSession) -> None:
    """Make any session — including a vanilla one we didn't build — able
    to read the driver testdata.

    ``events.parquet`` stores ``ts`` as INT64 TIMESTAMP(NANOS), which the
    vectorized parquet reader refuses unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on (runtime-settable); the
    bigint is converted back to a timestamp in :func:`load_table`.
    """
    try:
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        # Conf removed/renamed in some future Spark: let the read proceed
        # and surface its own error instead of masking it here.
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    _ensure_read_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long nanos (nanosAsLong above); truncate
        # to micros with integer division (doubles would lose precision
        # above 2^53 ns) and restore TimestampType.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    per_session[key] = df
    return df


class LazyTables(Mapping):
    """Mapping of table name → DataFrame that loads on first access.

    Queries index only the tables they touch, so one unreadable file
    degrades one query instead of erroring the whole suite (round-1
    failure mode: eager loading let a bad ``events.parquet`` kill all 32
    queries).
    """

    __slots__ = ("_spark", "_sf_dir")

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        self._spark = spark
        self._sf_dir = sf_dir

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(name)
        return load_table(self._spark, self._sf_dir, name)

    def __iter__(self) -> Iterator[str]:
        return iter(TABLE_NAMES)

    def __len__(self) -> int:
        return len(TABLE_NAMES)


def load_tables(spark: SparkSession, sf_dir: str) -> Mapping[str, DataFrame]:
    """Lazy per-table accessor (see :class:`LazyTables`)."""
    return LazyTables(spark, sf_dir)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Hash-repartition iff the scan yielded fewer partitions than cores.

    A single small parquet file (one row group) scans as ONE partition,
    serializing per-row-heavy work (hashing, shingling, vector math).
    At cluster scale inputs arrive in many splits and this is a no-op;
    locally it costs one small shuffle before the expensive map work.

    The probe must look at the ACTUAL scan partitioning
    (``df.rdd.getNumPartitions()`` — a plan→RDD conversion, not a job).
    A conf check on ``spark.sql.files.minPartitionNum`` is not enough:
    parquet assigns all rows of a row group to the split holding its
    midpoint, so a single-row-group file still scans as one non-empty
    partition no matter how many byte-range splits the conf requests
    (measured: skipping the probe serialized shingling/hashing and cost
    3-9x on every per-row-heavy query at sf0.1).
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
