"""Skew-mitigation helpers.

AQE's skew-join splitting handles most runtime skew; ``salted_agg`` is
the explicit two-stage pattern for *aggregation* skew (one hot key
overwhelming a reducer), which AQE does not re-plan: aggregate on
(key, salt) first — map-side combinable, hot key spread over N
reducers — then finish on key alone. The second shuffle carries at most
``n_salts`` rows per key.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Callable[[], list[Column]],
    final_aggs: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a random salt on the first shuffle.

    ``partial_aggs()`` aggregates raw rows per (keys, salt);
    ``final_aggs()`` combines the partials per keys. Aliases must line
    up (partial output columns are the final stage's inputs).
    """
    salted = df.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs())
    return partial.groupBy(*keys).agg(*final_aggs())
