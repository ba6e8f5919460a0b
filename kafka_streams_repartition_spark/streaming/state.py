"""Stateful migration processor — the reference's P1
(``streams/.../Streams.java:224-258``): for every replayed
``ProductStatsV1`` record, read the keyed V2 state, create-or-merge
(``ProductStatsV2.merge``, ``ProductStatsV2.java:48-59``), write back,
emit the merged value.

Spark-first: ``applyInPandasWithState`` — keyed value state holding the
V2 aggregate, Arrow-batched. The per-store map is carried as exploded
(store_id, qty) JSON in state (maps don't round-trip through the state
schema cleanly); orders/quantity/order_ids merge additively.

This is the one operator in the repo that genuinely needs imperative
keyed state — everything else is declarative. At 100 TB the state is
partitioned by sku across executors by the implicit shuffle of
``groupBy``; RocksDB (session.py) handles state > memory.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Input: exploded V1 snapshot records (one row per sku+store entry,
# topline repeated) — the shape a changelog replay naturally has.
V1_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("orders", T.LongType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("store_entries_json", T.StringType()),  # {"store": qty}
        T.StructField("order_ids_json", T.StringType()),  # ["id", ...]
    ]
)

MERGED_SCHEMA = V1_RECORD_SCHEMA  # state and output share the shape

STATE_SCHEMA = T.StructType(
    [
        T.StructField("orders", T.LongType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("store_entries_json", T.StringType()),
        T.StructField("order_ids_json", T.StringType()),
    ]
)


def _merge_one(
    state: tuple[int, float, str, str] | None,
    orders: int,
    quantity: float,
    store_entries: dict[str, float],
    order_ids: list[str],
) -> tuple[int, float, str, str]:
    """ProductStatsV2.merge semantics on plain Python values."""
    if state is None:
        base_orders, base_qty, base_stores, base_ids = 0, 0.0, {}, []
    else:
        base_orders, base_qty = state[0], state[1]
        base_stores = json.loads(state[2])
        base_ids = json.loads(state[3])
    for store, qty in store_entries.items():
        base_stores[store] = base_stores.get(store, 0) + qty
    merged_ids = sorted(set(base_ids) | set(order_ids))
    return (
        base_orders + orders,
        base_qty + quantity,
        json.dumps(dict(sorted(base_stores.items()))),
        json.dumps(merged_ids),
    )


def migrate_v1_stream(replayed_v1: DataFrame) -> DataFrame:
    """Fold a (streaming) DataFrame of V1 stats records into keyed V2
    state; emits the merged aggregate per key per micro-batch."""

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        current = state.get if state.exists else None
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                current = _merge_one(
                    current,
                    int(row.orders),
                    float(row.quantity),
                    json.loads(row.store_entries_json),
                    json.loads(row.order_ids_json),
                )
        if current is not None:
            state.update(current)
            yield pd.DataFrame(
                {
                    "sku": [key[0]],
                    "orders": [current[0]],
                    "quantity": [current[1]],
                    "store_entries_json": [current[2]],
                    "order_ids_json": [current[3]],
                }
            )

    return replayed_v1.groupBy("sku").applyInPandasWithState(
        fold,
        outputStructType=MERGED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def migrate_v1_stream_tws(replayed_v1: DataFrame) -> DataFrame:
    """The same P1 fold on Spark 4's ``transformWithStateInPandas`` —
    the successor API (typed per-key ValueState on the RocksDB
    provider, which session.py already configures). Kept alongside the
    ``applyInPandasWithState`` form so both stateful surfaces are
    covered; the runtime requires ``protobuf`` (the state-server wire
    format), so the equivalence test skips where that isn't installed.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MergeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("v2state", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            current = tuple(self._state.get()) if self._state.exists() else None
            for pdf in rows:
                for row in pdf.itertuples(index=False):
                    current = _merge_one(
                        current,
                        int(row.orders),
                        float(row.quantity),
                        json.loads(row.store_entries_json),
                        json.loads(row.order_ids_json),
                    )
            if current is not None:
                self._state.update(current)
                yield pd.DataFrame(
                    {
                        "sku": [key[0]],
                        "orders": [current[0]],
                        "quantity": [current[1]],
                        "store_entries_json": [current[2]],
                        "order_ids_json": [current[3]],
                    }
                )

        def close(self) -> None:
            pass

    return replayed_v1.groupBy("sku").transformWithStateInPandas(
        MergeProcessor(),
        outputStructType=MERGED_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def v1_typed_to_records(v1_typed: DataFrame) -> DataFrame:
    """Adapter: typed V1 stats (array<struct> per-store) → the flat
    JSON-carrying record shape the migration stream consumes."""
    from pyspark.sql import functions as F

    return v1_typed.select(
        F.col("sku").cast("string").alias("sku"),
        F.col("orders").cast("long").alias("orders"),
        F.col("quantity").cast("double").alias("quantity"),
        F.to_json(
            F.map_from_entries(
                F.transform(
                    "quantity_by_store",
                    lambda s: F.struct(
                        s["store_id"].cast("string").alias("key"),
                        s["quantity"].cast("double").alias("value"),
                    ),
                )
            )
        ).alias("store_entries_json"),
        F.to_json(
            F.transform("order_ids", lambda x: x.cast("string"))
        ).alias("order_ids_json"),
    )
