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


def load_zipcodes_csv(spark: SparkSession, path: str) -> DataFrame:
    """Geography dimension from a reference-shaped ``zipcodes.csv``
    (header ``state_fips,state,state_abbr,zipcode,county,city``) — the
    file the reference's builder loads via commons-csv
    (``BuildSystem.java:241-270``, RFC4180 with header; the columns it
    consumes are zipcode, city, state_abbr).

    Spark's built-in CSV reader is the distributed equivalent: the
    schema is EXPLICIT and ``enforceSchema=false`` validates it against
    the file's header, so a column rename or reorder in the file fails
    loudly at read instead of silently shifting geography; at scale the
    read parallelizes per split and prunes to the three consumed
    columns.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("state_fips", T.StringType()),
            T.StructField("state", T.StringType()),
            T.StructField("state_abbr", T.StringType()),
            T.StructField("zipcode", T.StringType()),
            T.StructField("county", T.StringType()),
            T.StructField("city", T.StringType()),
        ]
    )
    return spark.read.option("enforceSchema", False).csv(
        path, header=True, schema=schema
    ).select(
        F.col("zipcode").alias("postal_code"),
        "city",
        F.col("state_abbr").alias("state"),
    )


def stores_from_zipcodes(
    spark: SparkSession,
    csv_path: str,
    n_stores: int = N_STORES,
    seed: int = 42,
) -> DataFrame:
    """Store dimension with geography drawn from a real zipcodes CSV —
    the builder's ``generateStore`` + ``getRandomZip``
    (``BuildSystem.java:224-239``) with a seeded RNG instead of
    ``RANDOM``.  The zip list is collected ordered (it is a bounded
    dimension — the reference holds the whole file in memory too), so
    the pick sequence is deterministic for a given (file, seed)."""
    zips = load_zipcodes_csv(spark, csv_path).orderBy("postal_code").collect()
    rng = random.Random(seed)
    rows = []
    for i in range(n_stores):
        z = zips[rng.randrange(len(zips))]
        rows.append((str(i), _name(rng), z.city, z.state, z.postal_code))
    return spark.createDataFrame(rows, STORE_SCHEMA)


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
