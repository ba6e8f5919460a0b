"""Deterministic reference-shaped fixture generator (FIXTURES.md §A).

Mirrors the reference's builder/publisher generators
(``BuildSystem.java:133-192``, ``Producer.java:84-104``) at reduced
cardinality, seeded, including the edge cases FIXTURES.md §A.4 requires:
unresolvable skus, duplicate skus within an order, a zero-quantity line
item, and out-of-order timestamps.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from ..schemas import (
    PRODUCT_SCHEMA,
    PURCHASE_ORDER_SCHEMA,
    STORE_SCHEMA,
    USER_SCHEMA,
)

ADJECTIVES = ["quick", "calm", "bright", "bold", "lazy", "merry", "proud", "shy"]
NOUNS = ["falcon", "otter", "maple", "ridge", "harbor", "meadow", "stone", "cedar"]
CITIES = [("Minneapolis", "MN", "55401"), ("St Paul", "MN", "55101"),
          ("Duluth", "MN", "55802"), ("Rochester", "MN", "55901")]

N_STORES = 50
N_USERS = 200
N_PRODUCTS = 300
UNKNOWN_SKU = "0099999999"  # outside product range → J3 miss → R4 drop


def _name(rng: random.Random) -> str:
    return f"{rng.choice(ADJECTIVES).capitalize()} {rng.choice(NOUNS).capitalize()}"


def _sku(i: int) -> str:
    return str(i).rjust(10, "0")  # BuildSystem.java:216 zero-padding


def generate_reference_tables(
    spark: SparkSession, n_orders: int = 400, seed: int = 42
) -> dict[str, DataFrame]:
    rng = random.Random(seed)

    stores = [
        (str(i), _name(rng), *rng.choice(CITIES)) for i in range(N_STORES)
    ]
    users = [
        (str(i), n := _name(rng), n.replace(" ", ".").lower() + "@foo.com")
        for i in range(N_USERS)
    ]
    products = [
        (_sku(i), Decimal(rng.randrange(100, 10000)) / 100)
        for i in range(N_PRODUCTS)
    ]

    epoch = datetime(2024, 1, 1, tzinfo=timezone.utc)
    orders = []
    for i in range(n_orders):
        # out-of-order timestamps: every 7th order arrives "late"
        ts = epoch + timedelta(seconds=i * 10 - (300 if i % 7 == 0 else 0))
        items = [
            (_sku(rng.randrange(N_PRODUCTS)), rng.randrange(1, 11), None, None)
            for _ in range(rng.randrange(1, 4))
        ]
        if i % 31 == 0:  # unresolvable sku → order never fully priced
            items.append((UNKNOWN_SKU, 1, None, None))
        if i % 13 == 0:  # duplicate sku within one order
            items.append((items[0][0], rng.randrange(1, 11), None, None))
        if i % 41 == 0:  # zero-quantity line item (skip rule pin)
            items.append((_sku(rng.randrange(N_PRODUCTS)), 0, None, None))
        orders.append(
            (
                ts,
                f"AA-{i}",
                str(rng.randrange(N_USERS)),
                str(rng.randrange(N_STORES)),
                items,
            )
        )

    return {
        "stores": spark.createDataFrame(stores, STORE_SCHEMA),
        "users": spark.createDataFrame(users, USER_SCHEMA),
        "products": spark.createDataFrame(products, PRODUCT_SCHEMA),
        "purchase_orders": spark.createDataFrame(orders, PURCHASE_ORDER_SCHEMA),
    }


def orders_as_lineitems(orders: DataFrame, products: DataFrame) -> DataFrame:
    """Adapter: exploded reference orders → the line-item shape the
    product-stats operators consume (sku≡l_partkey via product join)."""
    from pyspark.sql import functions as F

    return (
        orders.select(
            "order_id", "store_id", F.explode("items").alias("item")
        )
        .join(products, F.col("item.sku") == F.col("sku"), "inner")
        .select(
            F.col("sku").alias("l_partkey"),
            F.col("store_id").cast("long").alias("l_suppkey"),
            F.col("order_id").alias("l_orderkey"),
            F.col("item.quantity").cast("double").alias("l_quantity"),
        )
    )
