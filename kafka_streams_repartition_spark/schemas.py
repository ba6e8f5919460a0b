"""StructType schemas mirroring the reference domain model (SURVEY §1.2).

The reference serializes Jackson POJOs with a ``$type`` class tag
(``common/.../tools/serde/JsonDeserializer.java:38-44``); our engine owns
its schemas, so the tag becomes an optional constant column. Keys are
always strings (``Streams.java:39``); money is BigDecimal scale 2 HALF_EVEN
(``BuildSystem.java:217``) → DecimalType(12, 2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- dimensions ---------------------------------------------------------

# Store.java:12-20
STORE_SCHEMA = T.StructType(
    [
        T.StructField("store_id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postal_code", T.StringType()),
    ]
)

# User.java:8-14
USER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)

# Product.java:9-14
PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("price", T.DecimalType(12, 2)),
    ]
)

# --- facts --------------------------------------------------------------

# PurchaseOrder.LineItem (PurchaseOrder.java:14-20): quoted_price/price are
# null at generation (Producer.java:97) and filled by the product join.
LINE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("quoted_price", T.DecimalType(12, 2)),
        T.StructField("price", T.DecimalType(12, 2)),
    ]
)

# PurchaseOrder.java:12-34
PURCHASE_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("order_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("store_id", T.StringType(), False),
        T.StructField("items", T.ArrayType(LINE_ITEM_SCHEMA), False),
    ]
)

# Enriched pickup order (Streams.java:137-150): user + store structs filled.
PICKUP_ORDER_SCHEMA = T.StructType(
    list(PURCHASE_ORDER_SCHEMA.fields)
    + [
        T.StructField("user", USER_SCHEMA),
        T.StructField("store", STORE_SCHEMA),
    ]
)

# --- aggregates ---------------------------------------------------------

# ProductStatsV1.java:31-35 — per-store quantity as array<struct>.
STORE_QUANTITY_SCHEMA = T.StructType(
    [
        T.StructField("store_id", T.IntegerType(), False),
        T.StructField("quantity", T.IntegerType(), False),
    ]
)

PRODUCT_STATS_V1_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("orders", T.IntegerType(), False),
        T.StructField("quantity_by_store", T.ArrayType(STORE_QUANTITY_SCHEMA)),
        T.StructField("order_ids", T.ArrayType(T.StringType())),
    ]
)

# ProductStatsV2.java:16-20 — the deliberate schema evolution:
# quantity widens to long, per-store becomes map<string,long>.
PRODUCT_STATS_V2_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("quantity", T.LongType(), False),
        T.StructField("orders", T.LongType(), False),
        T.StructField("quantity_by_store", T.MapType(T.StringType(), T.LongType())),
        T.StructField("order_ids", T.ArrayType(T.StringType())),
    ]
)
