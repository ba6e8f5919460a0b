"""Plan-quality regression tests — the local stand-in for a plan review
at cluster scale: broadcasts stay broadcasts, filters reach the scan,
scans stay pruned, no cartesian products sneak in."""

from __future__ import annotations

import pytest

from kafka_streams_repartition_spark.operators import (
    dedup as dd,
    pickup_order as po,
    product_stats as ps,
    similarity as sim,
    text_analysis as tx,
    windows as win,
)
from kafka_streams_repartition_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_read_schema_pruned,
    explain_str,
)
from kafka_streams_repartition_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return load_tables(spark, sf_dir)


def test_pickup_order_broadcasts_dims_and_prunes(t):
    df = po.pickup_order_summary(t)
    assert_broadcast_join(df, at_least=2)  # nation + region at minimum
    assert_no_cartesian(df)
    # lineitem has 11 columns; the query needs 3
    assert_read_schema_pruned(df, "lineitem", "l_extendedprice")
    assert_read_schema_pruned(df, "orders", "o_totalprice")


def test_product_stats_partial_aggregation(t):
    plan = explain_str(ps.product_stats_v1(t))
    # two-stage agg: partial HashAggregate before each exchange
    assert plan.count("HashAggregate") >= 4
    assert_read_schema_pruned(ps.product_stats_v1(t), "lineitem", "l_shipdate")


def test_ann_broadcasts_queries_no_cartesian_surprise(t):
    df = sim.ann_topk_lsh(t)
    assert_broadcast_join(df, at_least=1)
    plan = explain_str(sim.ann_topk_bruteforce(t))
    # the crossJoin is an explicit bounded query×corpus product via
    # BroadcastNestedLoopJoin — never a shuffled cartesian
    assert "CartesianProduct" not in plan


def test_text_ops_are_single_scan(t):
    from kafka_streams_repartition_spark.plans import count_scans

    for fn in [tx.text_stats, tx.lang_id, tx.token_count]:
        df = fn(t)
        # one scan of documents; no joins, no extra shuffle beyond fan_out
        assert count_scans(df) == 1
        assert "Join" not in explain_str(df)


def test_windows_prune_events(t):
    assert_read_schema_pruned(win.tumbling_events(t), "events", "props")
    assert_read_schema_pruned(win.session_events(t), "events", "props")


def test_minhash_no_cartesian(t):
    assert_no_cartesian(dd.dedup_minhash_lsh(t))
