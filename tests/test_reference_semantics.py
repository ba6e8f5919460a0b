"""Reference-parity semantics on reference-shaped fixtures
(FIXTURES.md §A edge cases: unresolvable skus, duplicate skus,
zero-quantity items, tombstones, merge identity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_repartition_spark.operators.pickup_order import (
    enrich_pickup_orders,
)
from kafka_streams_repartition_spark.operators.product_stats import (
    product_stats_v1_typed,
    product_stats_v2_typed,
)
from kafka_streams_repartition_spark.operators.restore import merge_v1_into_v2
from kafka_streams_repartition_spark.sources.fixtures import (
    UNKNOWN_SKU,
    generate_reference_tables,
    orders_as_lineitems,
)
from kafka_streams_repartition_spark.sources.ktable import latest_per_key


@pytest.fixture(scope="module")
def ref(spark):
    return generate_reference_tables(spark, n_orders=400, seed=42)


def test_pickup_order_drops_unpriced(spark, ref):
    """R4 (Streams.java:167): orders with any unresolvable sku vanish."""
    out = enrich_pickup_orders(
        ref["purchase_orders"], ref["users"], ref["stores"], ref["products"]
    )
    rows = out.collect()
    bad_ids = {
        r["order_id"]
        for r in ref["purchase_orders"]
        .filter(
            F.exists("items", lambda i: i["sku"] == F.lit(UNKNOWN_SKU))
        )
        .collect()
    }
    assert bad_ids, "fixture must contain unresolvable orders"
    got_ids = {r["order_id"] for r in rows}
    assert not (bad_ids & got_ids)
    # every surviving order is fully priced, keeps item order + count
    src = {r["order_id"]: r for r in ref["purchase_orders"].collect()}
    for r in rows:
        assert all(i["price"] is not None for i in r["items"])
        orig = src[r["order_id"]]
        assert [i["sku"] for i in r["items"]] == [i["sku"] for i in orig["items"]]
    assert got_ids == set(src) - bad_ids


def test_pickup_order_enrichment_correct(spark, ref):
    """J1/J2/J3: user/store structs and per-sku prices are the dims'."""
    out = enrich_pickup_orders(
        ref["purchase_orders"], ref["users"], ref["stores"], ref["products"]
    ).collect()
    users = {r["user_id"]: r for r in ref["users"].collect()}
    stores = {r["store_id"]: r for r in ref["stores"].collect()}
    prices = {r["sku"]: r["price"] for r in ref["products"].collect()}
    for r in out[:50]:
        assert r["user"]["email"] == users[r["user_id"]]["email"]
        assert r["store"]["city"] == stores[r["store_id"]]["city"]
        for i in r["items"]:
            assert i["price"] == prices[i["sku"]]


def test_zero_quantity_skip_rule(spark, ref):
    """ProductStatsV1.java:50-53: qty<=0 records don't count at all."""
    li = orders_as_lineitems(ref["purchase_orders"], ref["products"])
    assert li.filter(F.col("l_quantity") <= 0).count() > 0
    stats = product_stats_v2_typed(li)
    want = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    got = {r["sku"]: (r["orders"], r["quantity"]) for r in stats.collect()}
    expected = {r["l_partkey"]: (r["n"], r["q"]) for r in want.collect()}
    assert got == expected


def test_merge_identity(spark, ref):
    """ProductStatsV2.merge: v1(prefix) ⊕ v2(suffix) == v2(all)."""
    li = orders_as_lineitems(ref["purchase_orders"], ref["products"])
    first = li.filter(F.col("l_orderkey") < "AA-2")  # lexicographic split
    rest = li.filter(~(F.col("l_orderkey") < "AA-2"))
    merged = merge_v1_into_v2(
        product_stats_v1_typed(first), product_stats_v2_typed(rest)
    )
    full = product_stats_v2_typed(li)

    def canon(df):
        return {
            r["sku"]: (
                r["orders"],
                r["quantity"],
                dict(r["quantity_by_store"]),
                sorted(r["order_ids"]),
            )
            for r in df.collect()
        }

    assert canon(merged) == canon(full)


def test_merge_identity_property(spark, ref):
    """Property form of merge identity: for ARBITRARY row partitions
    (hash splits, not just prefixes) v1(A) ⊕ v2(B) == v2(A ∪ B) —
    merge must be a true monoid fold over any replay slicing."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    li = orders_as_lineitems(ref["purchase_orders"], ref["products"]).cache()
    full = product_stats_v2_typed(li)

    def canon(df):
        return {
            r["sku"]: (
                r["orders"],
                r["quantity"],
                dict(r["quantity_by_store"]),
                sorted(r["order_ids"]),
            )
            for r in df.collect()
        }

    want = canon(full)

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(seed=st.integers(min_value=0, max_value=2**31 - 1))
    def check(seed: int) -> None:
        side = F.crc32(F.concat(F.col("l_orderkey"), F.lit(str(seed)))) % 2 == 0
        merged = merge_v1_into_v2(
            product_stats_v1_typed(li.filter(side)),
            product_stats_v2_typed(li.filter(~side)),
        )
        assert canon(merged) == want

    check()


def test_ktable_tombstones(spark):
    """Latest-per-key with tombstone: the latest null deletes the key,
    but an older null below a newer value does not."""
    df = spark.createDataFrame(
        [
            ("k1", 1, "a"),
            ("k1", 2, None),  # tombstone latest → k1 gone
            ("k2", 1, None),
            ("k2", 2, "b"),  # value after tombstone → k2 lives
            ("k3", 5, "c"),
        ],
        "key string, offset int, value string",
    )
    out = latest_per_key(df, ["key"], ["offset"], tombstone_col="value")
    got = {r["key"]: r["value"] for r in out.collect()}
    assert got == {"k2": "b", "k3": "c"}


def test_hopping_window_starts_floor_for_all_epochs(spark):
    """The closed-form hopping/tumbling window starts must match
    F.window's FLOOR alignment even for pre-1970 (negative-epoch)
    timestamps — the r3–r5 carried divergence, now closed.  Oracle
    parity is checked against DuckDB's positive-modulus form too."""
    import duckdb
    from pyspark.sql import functions as F

    from kafka_streams_repartition_spark.operators import windows as win

    ms_values = [
        -7_200_000, -5_400_001, -1, 0, 1, 1_799_999, 1_800_000,
        3_599_999, 3_600_000, 1_700_000_000_123,
    ]
    ev = spark.createDataFrame(
        [(i, m, 1.0, "t") for i, m in enumerate(ms_values)],
        "event_id long, ms long, value double, event_type string",
    ).select(
        "event_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "value",
        "event_type",
    )
    t2 = {"events": ev}

    # closed form vs F.window with slide: same (start, count) sets
    got = {
        (r["window_start_ms"], r["n_events"])
        for r in win.hopping_events(t2).collect()
    }
    want = {
        (r["s"], r["n"])
        for r in ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis("w.start").alias("s"), "n")
        .collect()
    }
    assert got == want

    # tumbling: F.window implementation vs the floor-mod oracle
    con = duckdb.connect()
    con.register("events_pd", ev.toPandas())
    con.execute("CREATE VIEW events AS SELECT * FROM events_pd")
    want_t = {
        (r[0], r[2])
        for r in con.execute(win.TUMBLING_EVENTS_ORACLE).fetchall()
    }
    got_t = {
        (r["window_start_ms"], r["n_events"])
        for r in win.tumbling_events(t2).collect()
    }
    assert got_t == want_t
    # pre-1970 starts really are floor-aligned (negative multiples)
    assert any(s < 0 and s % 3_600_000 == 0 for s, _ in got_t)
