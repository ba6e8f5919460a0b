"""Latest-per-key ("KTable") materialization.

The reference materializes compacted Kafka topics as KTables
(``streams/.../Streams.java:107-115``): only the last value per key is
live, and a null value (tombstone) deletes the key. Its restore tool
rebuilds a store the same way with a latest-wins reduce
(``restore/.../Streams.java:125-132``).

Spark-first: a windowed dedup-to-latest. This shuffles once on the key —
exactly the repartition the reference pays via its repartition topics —
and at 100 TB it is the minimal possible plan (one exchange + one local
sort per partition; no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    tombstone_col: str | None = None,
) -> DataFrame:
    """Reduce a changelog-like DataFrame to the latest row per key.

    ``order_cols`` must be a total order within a key (e.g. ``[ts,
    offset]``) or results are nondeterministic. If ``tombstone_col`` is
    given, keys whose *latest* row has a null in that column are deleted —
    compacted-topic tombstone semantics (``BuildSystem.java:47-50``).
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if tombstone_col is not None:
        out = out.filter(F.col(tombstone_col).isNotNull())
    return out
