"""JSON-lines file source/sink with log-and-continue decode.

The reference's wire format is JSON with a deserializer that logs and
skips malformed records instead of failing the topology
(``common/.../serde/JsonDeserializer.java`` catches decode errors and
returns null).  This module is the file-based analog: PERMISSIVE
decode routes malformed lines into a quarantine frame instead of
killing the job — the only acceptable behavior at 100 TB, where a
handful of corrupt lines per billion is a certainty, not an edge case.

Scale notes: JSON-lines splits by newline, so a directory of ``.jsonl``
files parallelizes like any text source; schema is REQUIRED (schema
inference is a full extra pass over the data — never acceptable at
scale); readers should project only needed fields (Jackson parsing
prunes unreached tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as JSON-lines (one object per line)."""
    df.write.mode(mode).json(path)


def _read_jsonl_parts(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared impl: returns ``(cached_parent, good, quarantine)``."""
    full_schema = schema.add(T.StructField(CORRUPT_COL, T.StringType(), True))
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark forbids queries that reference ONLY the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) because the parser would have
    # nothing real to parse; the documented workaround is caching the
    # parsed frame so both splits read the same materialization.
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return df, good, quarantine


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with PERMISSIVE decode.

    Returns ``(good, quarantine)``: rows that parsed cleanly, and the
    raw text of rows that did not (for replay/alerting — the reference
    logs and continues; we keep the evidence).  Both are lazy plans
    over ONE source; Spark evaluates the corrupt-column split without
    a second file pass.

    The shared parse is ``.cache()``d and stays cached for the session —
    only the caller knows when both splits are consumed.  Long-lived
    sessions doing repeated reads should use :class:`jsonl_split`,
    which unpersists on exit (or call ``spark.catalog.clearCache()``).
    """
    _parent, good, quarantine = _read_jsonl_parts(spark, path, schema)
    return good, quarantine


class jsonl_split:
    """Context-manager form of :func:`read_jsonl` that unpersists the
    shared cached parse on exit, so long-lived sessions with repeated
    reads do not accumulate storage memory.

    >>> with jsonl_split(spark, path, schema) as (good, quarantine):
    ...     good.count(); quarantine.count()
    """

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType):
        self._parent, self._good, self._quarantine = _read_jsonl_parts(
            spark, path, schema
        )

    def __enter__(self) -> tuple[DataFrame, DataFrame]:
        return self._good, self._quarantine

    def __exit__(self, *exc) -> None:
        try:
            self._parent.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to reclaim
