"""Plan-quality regression tests — the local stand-in for a plan review
at cluster scale: broadcasts stay broadcasts, filters reach the scan,
scans stay pruned, no cartesian products sneak in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_narrow_ops_have_zero_key_shuffles(t):
    """SimHash, frame sampling, media meta/features: embarrassingly
    parallel by design — any hash/range exchange is a regression."""
    from kafka_streams_repartition_spark.operators import multimodal as mm
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    for fn in [dd.dedup_simhash, mm.multimodal_frames, mm.multimodal_meta,
               mm.multimodal_features]:
        assert count_key_exchanges(fn(t)) == 0, fn.__name__


def test_dedup_exact_shuffles_once_on_hash(t):
    """The only wide stage in exact dedup is the 32-byte-key groupBy."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    assert count_key_exchanges(dd.dedup_exact(t)) == 1


def test_curation_anti_join_either_strategy(t):
    """Near-dup removal is an anti-join on doc_id with NO forced
    broadcast (losers are a large fraction of a dup-heavy corpus, so
    the strategy is AQE's call): the plan must contain the anti-join
    under EITHER strategy and never degenerate to a cartesian."""
    df = tx.corpus_curation(t)
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_topk_plans_window_group_limit(t):
    """rank<=k filters must push into WindowGroupLimit so per-group
    sorts stay bounded by k instead of materializing full groups."""
    from kafka_streams_repartition_spark.operators import analytics as an

    assert "WindowGroupLimit" in explain_str(an.top_sellers_per_nation(t))


def test_partition_pruning_reaches_scan(spark, t, tmp_path):
    """Hive-style partitioned layout + a partition-column predicate:
    the scan must list only matching partitions (PartitionFilters), the
    foundation of date-partitioned 100 TB tables."""
    path = str(tmp_path / "li_part")
    t["lineitem"].select("l_orderkey", "l_quantity", "l_returnflag").write.partitionBy(
        "l_returnflag"
    ).mode("overwrite").parquet(path)
    df = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    plan = explain_str(df)
    assert "PartitionFilters" in plan and "l_returnflag" in plan
    # non-matching partitions never scanned: selected files all live
    # under the R partition directory
    files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert files and all("l_returnflag=R" in f for f in files)


def test_bucketed_join_is_exchange_free(spark, t):
    """Co-located join via bucketing: both sides pre-shuffled at write
    time, the join itself plans zero key exchanges (the warehouse
    analog of the reference's co-partitioned topics)."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges
    from kafka_streams_repartition_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    li = t["lineitem"].select("l_partkey", "l_quantity").limit(2000)
    pt = t["part"].select(
        F.col("p_partkey").alias("l_partkey"), "p_retailprice"
    )
    write_bucketed(li, "li_bucketed", 8, "l_partkey")
    write_bucketed(pt, "part_bucketed", 8, "l_partkey")
    joined = bucketed_join(spark, "li_bucketed", "part_bucketed", "l_partkey")
    assert count_key_exchanges(joined) == 0
    assert joined.count() > 0

    # mismatched bucket counts degrade to a shuffle, not wrong results
    write_bucketed(pt, "part_bucketed4", 4, "l_partkey")
    mismatched = bucketed_join(spark, "li_bucketed", "part_bucketed4", "l_partkey")
    assert mismatched.count() == joined.count()


def test_asof_join_single_user_shuffle_no_nested_loop(t):
    """The as-of join must be the union-merge form: window over one
    user_id exchange, never an inequality nested-loop join."""
    from kafka_streams_repartition_spark.operators import relational as rel

    plan = explain_str(rel.asof_join_events(t))
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_range_join_is_banded_equi_join(t):
    """The interval predicate must ride a (user, bin) equi-join — a raw
    range condition would degenerate to BroadcastNestedLoopJoin."""
    from kafka_streams_repartition_spark.operators import relational as rel

    plan = explain_str(rel.range_join_events(t))
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_sample_stratified_is_narrow(t):
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    assert count_key_exchanges(tx.sample_stratified(t)) == 0


def test_minhash_signatures_computed_map_side(t):
    """Signature/banding must not shuffle grams: at most the candidate
    self-join + verification joins repartition by key."""
    from kafka_streams_repartition_spark.plans import explain_str as es

    plan = es(dd.dedup_minhash_lsh(t))
    # no exploded-gram aggregation: array_min/transform appear instead
    assert "array_min" in plan and "array_intersect" in plan


def test_event_funnel_single_exchange(t):
    """Three chained conditional-min windows + the per-user dedup must
    all ride ONE user_id exchange — no self-joins, no re-shuffle."""
    from kafka_streams_repartition_spark.operators import windows as win
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = win.event_funnel(t)
    assert count_key_exchanges(df) == 1
    plan = explain_str(df)
    assert plan.count("Window") >= 3 and "Join" not in plan


def test_salted_agg_is_two_stage(t):
    """The salted aggregate must shuffle twice: wide partial on
    (event_type, salt), then the tiny regroup on event_type."""
    from kafka_streams_repartition_spark.operators import relational as rel
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = rel.salted_event_counts(t)
    assert count_key_exchanges(df) == 2
    plan = explain_str(df)
    # the salt alias is erased in the physical plan; the grouping
    # expression itself proves the wide stage is salted
    assert "% 16" in plan


def test_chunk_documents_zero_key_exchanges(t):
    """Chunking is a per-row 1->N expansion: no keyed shuffle anywhere
    (fan_out's round-robin is the only allowed exchange)."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = tx.chunk_documents(t)
    assert count_key_exchanges(df) == 0
    plan = explain_str(df)
    assert "Generate" in plan  # posexplode survived into the plan


def test_mixture_upsample_is_narrow(t):
    """Upsampling repeats rows map-side: no keyed shuffle at all."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = tx.mixture_upsample(t)
    assert count_key_exchanges(df) == 0
    assert "Generate" in explain_str(df)


def test_tfidf_single_tokenize_pass_and_no_term_window(t):
    """tf must be checkpointed so the tokenize pass runs ONCE (zero
    Generate nodes survive into the final plan — the explode happened
    inside the checkpoint job), and document frequency must be a
    groupBy (skew-safe partial agg), never a window partitioned by the
    corpus-hot term column."""
    plan = explain_str(tx.tfidf_top_terms(t))
    assert plan.count("Generate (") == 0
    assert "ExistingRDD" in plan  # the materialized inverted index
    assert "windowspecdefinition(term" not in plan


def test_repetition_stats_is_zero_shuffle(t):
    """All repetition signals are per-row array math — any key exchange
    means someone re-introduced a global explode+groupBy."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    assert count_key_exchanges(tx.repetition_stats(t)) == 0


def test_decontaminate_broadcasts_eval_grams(t):
    """The eval-set gram join must be a broadcast hash join (the corpus
    side never shuffles text); the only key exchanges are the tiny
    eval-gram distinct and the per-doc hit count."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = dd.decontaminate(t)
    assert "BroadcastHashJoin" in explain_str(df)
    assert count_key_exchanges(df) <= 2


def test_span_dedup_shuffles_hashes_not_text(t):
    """Every exchange in span dedup is keyed on the md5 span hash or
    doc_id — the text column must not survive past the scan projection,
    and nothing goes all-pairs."""
    df = dd.span_dedup(t)
    plan = explain_str(df)
    assert_no_cartesian(df)
    # text is consumed by the map-side shingle+md5 projection; no
    # Exchange detail line may carry the raw text column
    for ln in plan.splitlines():
        if "hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, ln


def test_pq_codes_single_corpus_shuffle(t):
    """The codebook broadcasts; the corpus side shuffles exactly once
    (the final groupBy(vec_id) with map-side struct-min combine). The
    second key exchange in the plan is the 10-row centroid training
    agg, not corpus data."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = sim.pq_codes(t)
    assert "BroadcastHashJoin" in explain_str(df)
    assert count_key_exchanges(df) <= 2


def test_no_lambda_in_filter_nodes(t):
    """A plain explode of a computed array makes the optimizer infer
    `size(arr)>0 AND isnotnull(arr)` and push it below the fan_out
    exchange — re-evaluating the whole shingle/tokenize lambda (twice)
    inside the serial scan task (measured 4x on decontaminate at
    sf0.1). The explode_outer + isNotNull shape keeps higher-order
    functions out of every Filter node; any lambda in a Filter means
    the regression is back."""
    for fn in [dd.decontaminate, dd.span_dedup]:
        plan = explain_str(fn(t))
        for block in plan.split("\n\n"):
            first = block.splitlines()[0] if block.splitlines() else ""
            if ") Filter" in first:
                assert "lambdafunction" not in block, f"{fn.__name__}:\n{block}"


def test_pack_sequences_single_key_exchange(t):
    """Packing = one shard shuffle; the running-sum window and pack-id
    math ride it."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    assert count_key_exchanges(tx.pack_sequences(t)) == 1


def test_sketch_plans_broadcast_and_prune(t):
    from kafka_streams_repartition_spark.operators import sketches as sk

    # CMS: the 128-row register table broadcasts into the point-query
    # join; events scans read only user_id (props/text never loaded).
    df = sk.cms_heavy_hitters(t)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, "events", "props")
    plan = explain_str(df)
    # the final top-k is the distributed TakeOrderedAndProject, not a
    # single-partition global sort
    assert "TakeOrderedAndProject" in plan

    # Bloom: the bitset broadcasts so the probe side is filtered
    # map-side; the urgent-orders predicate reaches the orders scan.
    df = sk.bloom_semi_join(t)
    assert_broadcast_join(df, at_least=2)  # bitset + summary singletons
    assert_no_cartesian(df)
    from kafka_streams_repartition_spark.plans import assert_pushed_filters

    assert_pushed_filters(df, "orders", "o_orderpriority")


def test_bm25_single_tokenize_and_broadcast_query_side(t):
    df = tx.bm25_search(t)
    # query terms / dfreq / stats all ride broadcasts
    assert_broadcast_join(df, at_least=3)
    assert_no_cartesian(df)
    plan = explain_str(df)
    # tf is localCheckpointed: the scan feeding scores is the RDD scan,
    # not a re-tokenize of documents (one ExistingRDD per checkpoint)
    assert "ExistingRDD" in plan


def test_scd2_single_user_exchange(t):
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = win.scd2_history(t)
    # lag + running sum + per-run agg + lead all reuse ONE user_id
    # exchange (the agg keys are supersets of the window partitioning)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "events", "props")


def test_new_iterative_and_incremental_plans_clean(t):
    from kafka_streams_repartition_spark.operators import graph as gr
    from kafka_streams_repartition_spark.operators import sketches as sk

    # PageRank: contribution table checkpointed (iterations read an
    # ExistingRDD, not the pair-expansion subtree); the only cross
    # joins are broadcast singletons.
    df = gr.pagerank_copurchase(t)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    # iterations read the checkpointed contribution table, not the
    # pair-expansion subtree (which is also why no lineitem scan
    # appears in the final plan)
    assert "ExistingRDD" in plan

    # Histogram sketch: range table broadcasts; events scan reads only
    # (event_type, value).
    df = sk.histogram_quantiles(t)
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, "events", "props")

    # Incremental dedup: no corpus×corpus anywhere.
    assert_no_cartesian(dd.dedup_incremental(t))


def test_round2_additions_plans(t):
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    # sample_per_group: the rank<=k filter must push a WindowGroupLimit
    # below the exchange (map-side per-lang top-k) or a lang-hot window
    # would funnel each language through one task at scale.
    df = tx.sample_per_group(t)
    assert "WindowGroupLimit" in explain_str(df)

    # zorder_layout: flat bit arithmetic — single agg exchange, pruned
    # scan (2 of lineitem's 11 columns), no joins at all.
    df = an.zorder_layout(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "lineitem", "l_extendedprice")

    # anomaly_zscore: one user-keyed exchange for the window; events
    # scan reads only (event_id, user_id, value).
    df = an.anomaly_zscore(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "events", "props")

    # knn_graph: bucket equi-join only — never an all-pairs cartesian.
    assert_no_cartesian(sim.knn_graph(t))

    # ngram_counts: gram construction is map-side; the only key
    # exchanges are the two partial-agg stages ((doc,gram) then gram).
    df = tx.ngram_counts(t)
    assert_no_cartesian(df)
    assert count_key_exchanges(df) <= 2


def test_round3_additions_plans(t):
    from kafka_streams_repartition_spark.operators import relational as rel
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import (
        assert_pushed_filters,
        count_key_exchanges,
    )

    # shipping_priority: both date filters reach their scans, the top-k
    # is TakeOrderedAndProject (never a global sort), no cartesian.
    df = th.shipping_priority(t)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert_no_cartesian(df)
    assert_pushed_filters(df, "orders", "o_orderdate")
    assert_pushed_filters(df, "lineitem", "l_shipdate")

    # order_priority_counts: EXISTS plans as a semi join (no row
    # multiplication), with the returnflag filter pushed to lineitem.
    df = th.order_priority_counts(t)
    assert "LeftSemi" in explain_str(df), explain_str(df)
    assert_pushed_filters(df, "lineitem", "l_returnflag")
    assert_read_schema_pruned(df, "lineitem", "l_extendedprice")

    # revenue_no_promo: pure scan-filter-aggregate — zero key exchanges
    # (the single-row final agg is a SinglePartition exchange, not a
    # hash shuffle of data rows) and every predicate pushed.
    df = th.revenue_no_promo(t)
    assert count_key_exchanges(df) == 0
    assert_pushed_filters(df, "lineitem", "l_discount")
    assert_read_schema_pruned(df, "lineitem", "l_orderkey")

    # rolling_user_value: both window frames share ONE user-keyed
    # exchange; events scan skips props/event_type.
    df = rel.rolling_user_value(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "events", "props")

    # user_percentiles: one hash exchange (the per-user agg); the
    # global window runs over the aggregated |users|-row frame only.
    df = rel.user_percentiles(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "events", "props")

    # pii_scrub: pure row expressions — zero key exchanges.
    assert count_key_exchanges(tx.pii_scrub(t)) == 0

    # duplicate_rate_by_source: distinct-agg is two-phase max; text
    # itself never crosses a shuffle (only source + md5 digest).
    df = tx.duplicate_rate_by_source(t)
    assert count_key_exchanges(df) <= 2
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, f"raw text crosses a shuffle:\n{ln}"

    # stratified_kfold: one agg exchange and the documents scan must
    # NOT read the text column at all (audit is metadata-only).
    df = tx.stratified_kfold(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "documents", "text")

    # embedding_dim_stats: one agg exchange over DIM_STATS_N groups;
    # label column pruned from the scan.
    df = sim.embedding_dim_stats(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "embeddings", "label")


def test_round3_graph_text_sketch_plans(t):
    from kafka_streams_repartition_spark.operators import graph as gr
    from kafka_streams_repartition_spark.operators import sketches as sk
    from kafka_streams_repartition_spark.plans import (
        assert_pushed_filters,
        count_key_exchanges,
    )

    # triangle_count: equi-joins only (the a<b orientation is a filter,
    # not a cartesian) and the triangle closure is a SEMI join — the
    # wedge set never multiplies.  (The lineitem scan itself sits behind
    # the edge checkpoint, so pushdown is asserted on the pre-checkpoint
    # shape other gates cover.)
    df = gr.triangle_count(t)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan, plan

    # tokenize_to_ids: encoding joins the BROADCAST vocab (text never
    # shuffles for the lookup); the only corpus-wide key exchanges are
    # the token count and the per-doc reassembly.
    df = tx.tokenize_to_ids(t)
    assert_broadcast_join(df, at_least=1)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan  # top-V vocab, no global sort

    # histogram_quantiles_meta: ONE scan of events (the range came from
    # footer metadata), vs the two-pass variant's two scans.
    from kafka_streams_repartition_spark.plans import count_scans

    assert count_scans(sk.histogram_quantiles_meta(t)) == 1
    # the two-pass variant's range pass sits below a checkpoint barrier
    # (its min/max frame is reused by two consumers), so exactly one
    # scan — the bin pass — remains visible in the plan
    assert count_scans(sk.histogram_quantiles(t)) == 1


def test_winnow_and_hll_intersect_plans(t):
    from kafka_streams_repartition_spark.operators import sketches as sk
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    # winnow_fingerprints: gram text never crosses a shuffle — only
    # (doc_id, pos, hash) triples reach the doc-keyed window exchange.
    df = tx.winnow_fingerprints(t)
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "gram" not in ln, f"gram text crosses a shuffle:\n{ln}"

    # hll_intersect_types: both value filters push to the events scans,
    # and no register exchange carries more than (branch, bucket) keys —
    # the whole sketch algebra is a handful of ≤16-row frames.
    df = sk.hll_intersect_types(t)
    assert_no_cartesian(df)  # 1-row estimate frames cross via broadcast
    from kafka_streams_repartition_spark.plans import assert_pushed_filters

    # pushed filters asserted below the checkpoint barrier (cohort
    # frames are checkpointed; the query plan hides their subtrees)
    set_a, set_b = sk._hll_cohorts(t)
    assert_pushed_filters(set_a, "events", "event_type")
    assert_pushed_filters(set_b, "events", "value")


def test_basket_rules_plan(t):
    from kafka_streams_repartition_spark.operators import graph as gr
    from kafka_streams_repartition_spark.plans import explain_str as es

    # top-N by lift must be TakeOrderedAndProject (never a global sort),
    # the item-count joins broadcast (dimension-sized), no cartesian
    # beyond the 1-row n_orders broadcast.
    plan = es(gr.basket_rules(t))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pca_single_data_scan(t):
    """The corpus is touched once: everything after the Gram build runs
    on checkpointed 256-row frames, so the physical plan shows at most
    one embeddings scan (zero once the lazy checkpoint hides it)."""
    from kafka_streams_repartition_spark.operators import similarity as sim2
    from kafka_streams_repartition_spark.plans import count_scans

    assert count_scans(sim2.pca_power_iteration(t)) <= 1


def test_tpch_q18_q10_plans(t):
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import assert_pushed_filters

    # Q18: the HAVING aggregate runs before any join (only qualifying
    # orders reach the enrichment) and the top-k never globally sorts.
    plan = explain_str(th.large_volume_customers(t))
    assert "TakeOrderedAndProject" in plan, plan
    assert_read_schema_pruned(th.large_volume_customers(t), "lineitem", "l_shipdate")

    # Q10: both predicates pushed, nation broadcast.
    df = th.returned_item_revenue(t)
    assert_pushed_filters(df, "orders", "o_orderdate")
    assert_pushed_filters(df, "lineitem", "l_returnflag")
    assert_broadcast_join(df, at_least=1)


def test_skyline_and_transitions_plans(t):
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    # skyline: the window formulation — NO self-join, no quadratic
    # BroadcastNestedLoop; just the level aggregate + level-frame window.
    plan = explain_str(an.skyline_parts(t))
    assert "BroadcastNestedLoop" not in plan or "Join Inner" in plan, plan
    assert "CartesianProduct" not in plan, plan

    # event_transitions: lag window + pair counts + normalization must
    # shuffle raw events exactly once (user key); the prob window runs
    # on the ≤|types|² matrix.
    df = win.event_transitions(t)
    assert count_key_exchanges(df) <= 3  # user window, pair agg, from_type window
    assert_read_schema_pruned(df, "events", "props")


def test_cube_and_q17_plans(t):
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    # sales_cube: grouping sets expand map-side — one Expand + one wide
    # exchange, nation broadcast.
    df = an.sales_cube(t)
    plan = explain_str(df)
    assert "Expand" in plan, plan
    assert_broadcast_join(df, at_least=1)

    # Q17: the correlated subquery must plan as aggregate + equi-join
    # (never per-row subquery re-execution); lineitem pruned to 3 cols.
    df = th.small_quantity_revenue(t)
    plan = explain_str(df)
    assert "Join" in plan and "CartesianProduct" not in plan, plan
    assert_read_schema_pruned(df, "lineitem", "l_shipdate")


def test_locf_and_weighted_sample_plans(t):
    from kafka_streams_repartition_spark.operators import windows as win2
    from kafka_streams_repartition_spark.plans import (
        assert_read_schema_pruned as prune,
        count_key_exchanges,
    )

    # daily_value_locf: the scaffold is sequence/explode against a
    # 1-row broadcast range — no shuffled cartesian; props never read.
    df = win2.daily_value_locf(t)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    prune(df, "events", "props")

    # weighted_sample: metadata-only scan (text never read) + top-k as
    # TakeOrderedAndProject; zero key exchanges.
    df = tx.weighted_sample(t)
    assert "TakeOrderedAndProject" in explain_str(df)
    assert count_key_exchanges(df) == 0
    prune(df, "documents", "text")


def test_ann_topk_pq_plan(t):
    """ADC search: the query distance tables broadcast (the corpus
    codes never shuffle against them), no cartesian, and the per-query
    top-k prunes as WindowGroupLimit."""
    df = sim.ann_topk_pq(t)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_bigram_logprob_plan(t):
    """Bigram construction is map-side (word_ngrams array expr — the
    token stream never shuffles raw); count joins are term-keyed; only
    the 1-row V frame broadcasts."""
    df = tx.bigram_logprob(t)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan or "BuildRight" in plan, plan


def test_q14_entropy_corr_plans(t):
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import (
        assert_pushed_filters,
        count_key_exchanges,
        count_scans,
    )

    # Q14: one fact⋈dim join, date filter pushed, single scan of each.
    df = th.promo_revenue_share(t)
    assert_pushed_filters(df, "lineitem", "l_shipdate")
    assert count_scans(df) == 2

    # entropy: the corpus is tokenized once — the vocab table is
    # checkpointed, so at most one documents scan appears in the plan
    # (zero once the lazy checkpoint hides the lineage).
    df = tx.corpus_token_entropy(t)
    assert count_scans(df) <= 1

    # correlations: ONE HashAggregate pass, zero key exchanges, pruned
    # scan (only the 4 measure columns).
    df = an.numeric_corr_profile(t)
    assert count_key_exchanges(df) == 0
    assert_read_schema_pruned(df, "lineitem", "l_orderkey")


def test_revenue_concentration_plan(t):
    """Gini/80-20: the global sort windows run over the PRE-AGGREGATED
    per-customer frame (|customers| rows), never raw orders; orders
    scan prunes to 2 columns."""
    from kafka_streams_repartition_spark.operators import analytics as an

    df = an.revenue_concentration(t)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    # pruning asserted below the checkpoint barrier (the ranked
    # per-customer frame is checkpointed; the query plan hides it)
    assert_read_schema_pruned(an._revenue_ranked(t), "orders", "o_orderdate")


def test_interarrival_and_modal_plans(t):
    from kafka_streams_repartition_spark.operators import windows as win2
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    # interarrival: the lag window and the per-user percentile share
    # ONE user-keyed exchange; props never read.
    df = win2.interarrival_stats(t)
    assert count_key_exchanges(df) == 1
    assert_read_schema_pruned(df, "events", "props")

    # modal type: struct-min AGGREGATE, not a window — two partial-
    # combining exchanges max ((user,type) then user), no Window node.
    df = win2.modal_event_type(t)
    assert count_key_exchanges(df) <= 2
    assert "WindowExec" not in explain_str(df)


def test_value_trend_regression_plan(t):
    """OLS trend: regression moments are ONE partial-combining
    aggregate — a single key exchange, no Window, pruned scan."""
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = an.value_trend_regression(t)
    assert count_key_exchanges(df) == 1
    assert "WindowExec" not in explain_str(df)
    assert_read_schema_pruned(df, "events", "props")


def test_seasonal_naive_backtest_plan(t):
    """The expanding-average window must run over the pre-aggregated
    daily frame (raw events shuffle once into the (type, day) agg) and
    the ROWS … 1 PRECEDING frame bars same-day leakage by plan shape."""
    from kafka_streams_repartition_spark.operators import windows as win2
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = win2.seasonal_naive_backtest(t)
    assert count_key_exchanges(df) <= 3  # day agg, weekday window, type agg
    assert_read_schema_pruned(df, "events", "props")


def test_decile_lift_plan(t):
    """ntile + rollup + shares all run over the pre-aggregated
    per-customer frame; orders scan prunes to 2 columns."""
    from kafka_streams_repartition_spark.operators import analytics as an

    df = an.decile_lift_table(t)
    assert "CartesianProduct" not in explain_str(df)
    assert_read_schema_pruned(df, "orders", "o_orderdate")


def test_chi_square_plan(t):
    """One documents scan feeds the contingency table; marginals and
    the grid derive from that aggregate (text never read)."""
    from kafka_streams_repartition_spark.operators import analytics as an

    df = an.chi_square_independence(t)
    # pruning asserted below the checkpoint barrier (the contingency
    # table is checkpointed; the query plan hides its subtree)
    assert_read_schema_pruned(an._chi_square_obs(t), "documents", "text")
    assert "CartesianProduct" not in explain_str(df)


def test_ks_two_sample_plan(t):
    """Both type filters push to the events scan; the ECDF windows run
    over the per-distinct-value aggregate, never raw rows."""
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import assert_pushed_filters

    df = an.ks_two_sample(t)
    assert_pushed_filters(df, "events", "event_type")
    assert_read_schema_pruned(df, "events", "props")


def test_group_size_histogram_plan(t):
    """Two back-to-back partial-combining aggregates; lineitem scan
    reads only the order key."""
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = an.group_size_histogram(t)
    # the per-order frame is checkpointed (fact scanned once); what
    # remains downstream is the one per-size exchange
    assert count_key_exchanges(df) <= 2
    assert "CartesianProduct" not in explain_str(df)


def test_tpch_star_joins_broadcast_dims(t):
    """Q5/Q8/Q9 star shapes: every dimension rides a broadcast; the only
    shuffles are fact-keyed; no cartesian anywhere."""
    from kafka_streams_repartition_spark.operators import tpch as th

    for q in (th.local_supplier_volume, th.market_share, th.part_type_profit):
        df = q(t)
        assert_broadcast_join(df, at_least=2)
        assert_no_cartesian(df)
    assert_read_schema_pruned(th.local_supplier_volume(t), "lineitem", "l_tax")


def test_idle_rich_customers_anti_join(t):
    """Q22 shape: NOT EXISTS must plan as LEFT ANTI (never a distinct +
    outer join), and the scalar threshold is a broadcast, not a
    recomputation per row."""
    from kafka_streams_repartition_spark.operators import tpch as th

    plan = explain_str(th.idle_rich_customers(t))
    assert "LeftAnti" in plan
    assert_broadcast_join(th.idle_rich_customers(t), at_least=2)


def test_top_supplier_single_fact_scan(t):
    """Q15 shape: the WHERE rev = max(rev) must not rescan lineitem —
    one scan feeds both the aggregate and the max."""
    from kafka_streams_repartition_spark.operators import tpch as th

    plan = explain_str(th.top_supplier(t))
    # formatted explain prints each scan node twice (tree + detail):
    # 4 occurrences == 2 physical scans (lineitem once + supplier)
    assert plan.count("Scan parquet") == 4
    assert "Window" in plan  # the max rides the dimension-sized window
    assert_no_cartesian(th.top_supplier(t))


def test_ks_binned_window_is_bounded(t):
    """The binned KS window sorts the <=64-row bin frame, never raw
    values: the sort must sit ABOVE the bin aggregate in the plan."""
    from kafka_streams_repartition_spark.operators import analytics as an

    plan = explain_str(an.ks_two_sample_binned(t))
    assert "Window" in plan
    # pruning is asserted below the checkpoint barrier (the query plan
    # hides the checkpointed subtree); events has 6 columns, the query
    # needs value + event_type only
    assert_read_schema_pruned(an._ks_binned_per_bin(t), "events", "props")
    assert_read_schema_pruned(an._ks_binned_per_bin(t), "events", "user_id")


def test_waiting_suppliers_decorrelated_plan(t):
    """Q21 shape: the EXISTS/NOT-EXISTS pair must decorrelate into ONE
    per-order aggregate (no correlated re-scan), supplier broadcast,
    top-k as TakeOrderedAndProject (never a global sort)."""
    from kafka_streams_repartition_spark.operators import tpch as th

    from kafka_streams_repartition_spark.plans import assert_pushed_filters

    df = th.waiting_suppliers(t)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert_broadcast_join(df, at_least=1)  # supplier dim
    assert_no_cartesian(df)
    # status filter reaches the orders scan; lineitem stays pruned
    assert_pushed_filters(df, "orders", "o_orderstatus")
    assert_read_schema_pruned(df, "lineitem", "l_extendedprice")


def test_min_cost_supplier_window_not_subquery(t):
    """Q2 shape: the correlated min-subquery must run as a per-part
    window over ONE (part, supplier) aggregate — one lineitem scan,
    supplier broadcast."""
    from kafka_streams_repartition_spark.operators import tpch as th

    from kafka_streams_repartition_spark.plans import count_scans_of

    df = th.min_cost_supplier(t)
    plan = explain_str(df)
    assert "Window" in plan
    assert count_scans_of(df, "lineitem") == 1
    assert count_scans_of(df, "supplier") == 1
    assert_broadcast_join(df, at_least=1)
    assert_read_schema_pruned(df, "lineitem", "l_quantity")


def test_first_touch_attribution_no_self_join(t):
    """Attribution must be the single-pass carry (one user-keyed
    exchange + window), never a click×purchase range self-join."""
    from kafka_streams_repartition_spark.plans import count_scans

    df = win.first_touch_attribution(t)
    plan = explain_str(df)
    assert count_scans(df) == 1  # one events scan, no self-join
    assert "Window" in plan
    assert "Join" not in plan
    assert_read_schema_pruned(df, "events", "props")
    assert_read_schema_pruned(df, "events", "value")


def test_out_of_order_stats_single_pass(t):
    """The lateness audit is one scan, one user-keyed window, one
    global aggregate — no joins."""
    from kafka_streams_repartition_spark.plans import count_scans

    df = win.out_of_order_stats(t)
    plan = explain_str(df)
    assert count_scans(df) == 1
    assert "Join" not in plan
    assert_read_schema_pruned(df, "events", "props")
    assert_read_schema_pruned(df, "events", "value")


def test_rfm_segmentation_aggregates_before_windows(t):
    """RFM: the three ntile windows run over the per-CUSTOMER aggregate
    (dimension-sized), never over raw orders rows."""
    from kafka_streams_repartition_spark.operators import analytics as an

    from kafka_streams_repartition_spark.plans import count_scans_of

    df = an.rfm_segmentation(t)
    plan = explain_str(df)
    assert "Window" in plan
    assert count_scans_of(df, "orders") == 1
    # ORDER-SENSITIVE: the tree prints consumer-first, so the subtree
    # printed after the DEEPEST Window is that window's input chain —
    # it must contain the per-customer aggregate (aggregate below the
    # window).  A regressed plan that windows raw orders rows and
    # aggregates afterwards prints the aggregate ABOVE every Window,
    # leaving only exchange/sort/scan below, and fails here.
    simple = explain_str(df, "simple")
    below_last_window = simple[simple.rindex("Window") :]
    assert "Aggregate" in below_last_window
    assert "Scan" in below_last_window  # same chain reaches the scan


def test_mad_outliers_single_scan_single_exchange(t):
    """MAD: both medians ride unordered windows over ONE user-keyed
    exchange — one events scan, no joins (the groupBy-then-join-back
    form scans the fact four times)."""
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import count_scans

    df = an.mad_outliers(t)
    plan = explain_str(df)
    assert count_scans(df) == 1
    assert "Join" not in plan
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, "events", "props")


def test_dedup_recall_eval_bounded_plan(t):
    """The recall gate reuses the bounded shapes of its two inputs:
    broadcast query grams on the truth side, no cartesian anywhere, and
    a single-row output."""
    df = dd.dedup_recall_eval(t)
    assert_no_cartesian(df)
    assert df.count() == 1
    row = df.collect()[0]
    assert row["n_lsh_found"] <= row["n_truth_pairs"]  # measured ⊆ truth


# --- round-5 additions: partsupp TPC-H, approx profile, embedding LSH ---


def test_min_cost_supplier_region_single_fact_scan(t):
    """Full Q2: the correlated regional-min subquery must run as a
    per-part window over ONE derived-partsupp aggregate — one lineitem
    scan, geo and part dims broadcast, LIMIT as TakeOrderedAndProject
    under a total order."""
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import count_scans_of

    df = th.min_cost_supplier_region(t)
    plan = explain_str(df)
    assert count_scans_of(df, "lineitem") == 1
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan
    assert_broadcast_join(df, at_least=2)  # geo side + part side
    assert_no_cartesian(df)
    # partsupp derivation reads ONLY the two key columns
    assert_read_schema_pruned(df, "lineitem", "l_quantity")
    assert_read_schema_pruned(df, "lineitem", "l_extendedprice")


def test_important_stock_pushes_region_and_broadcasts(t):
    """Full Q11 (pre-checkpoint frame): region predicate pushed to the
    region scan, supplier scope broadcast into partsupp, one lineitem
    scan feeding the per-part aggregate."""
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import (
        assert_pushed_filters,
        count_scans_of,
    )

    df = th._important_stock_per_part(t)
    assert count_scans_of(df, "lineitem") == 1
    assert_pushed_filters(df, "region", "r_name")
    assert_broadcast_join(df, at_least=1)
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, "lineitem", "l_quantity")


def test_supplier_part_counts_broadcast_anti_join(t):
    """Full Q16: the suspect-supplier NOT IN must plan as a broadcast
    anti join and the part filter as a broadcast inner join — the only
    exchange is the final dimension-bounded countDistinct."""
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import count_scans_of

    df = th.supplier_part_counts(t)
    plan = explain_str(df)
    assert count_scans_of(df, "lineitem") == 1
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, "lineitem", "l_quantity")


def test_promotable_suppliers_copartitioned_two_role(t):
    """Full Q20: exactly TWO lineitem scans (partsupp derivation + the
    year's shipped aggregate — semantic two-role read), the year filter
    pushed to the shipped scan, part/nation broadcast."""
    from kafka_streams_repartition_spark.operators import tpch as th
    from kafka_streams_repartition_spark.plans import (
        assert_pushed_filters,
        count_scans_of,
    )

    df = th.promotable_suppliers(t)
    assert count_scans_of(df, "lineitem") == 2
    assert_pushed_filters(df, "lineitem", "l_shipdate")
    assert_broadcast_join(df, at_least=2)
    assert_no_cartesian(df)


def test_table_profile_approx_single_scan_and_pruned(t):
    """The approx profile (pre-checkpoint register frame): ONE lineitem
    scan reading ONLY the six profiled columns — registers AND the
    exact count both derive from the one (column, canon) distinct
    exchange, never a second scan or a countDistinct Expand."""
    from kafka_streams_repartition_spark.operators import analytics as an
    from kafka_streams_repartition_spark.plans import count_scans_of

    df = an._profile_approx_regs(t)
    assert count_scans_of(df, "lineitem") == 1
    assert "Expand" not in explain_str(df)
    assert_no_cartesian(df)
    assert_read_schema_pruned(df, "lineitem", "l_tax")
    assert_read_schema_pruned(df, "lineitem", "l_discount")


def test_dedup_embedding_lsh_bucketed_verify_single_scan(t):
    """Corpus-wide embedding dedup: the (band, sig) bucket shuffle +
    Arrow tile verify — never a cartesian, never a pair-grained
    SHUFFLE join, no other table touched.  Two embeddings scans are
    the contract since the hot-bucket cap: one computes bucket sizes
    (collapses map-side to ≤ bands × 2^planes rows and joins back as a
    BROADCAST — the only join in the plan), one feeds the verify."""
    from kafka_streams_repartition_spark.operators import dedup as dd
    from kafka_streams_repartition_spark.plans import count_scans_of

    df = dd.dedup_embedding_lsh(t)
    plan = explain_str(df)
    assert_no_cartesian(df)
    # the sizes join must be broadcast; a sort-merge/shuffled-hash join
    # here would mean the pair-table-with-vectors shape we rejected
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan or "ArrowEvalPython" in plan
    assert count_scans_of(df, "lineitem") == 0
    assert count_scans_of(df, "documents") == 0
    assert count_scans_of(df, "embeddings") == 2


def test_cdc_apply_aggregate_not_window(t):
    """The changelog must collapse to latest-per-key via ONE max_by
    aggregate (partial-combining) — never an ordered window over raw
    changelog rows — with the date filter pushed to the orders scan
    and one scan per table."""
    from kafka_streams_repartition_spark.operators import relational as rel
    from kafka_streams_repartition_spark.plans import (
        assert_pushed_filters,
        count_scans_of,
    )

    df = rel.cdc_apply(t)
    plan = explain_str(df)
    assert "Window" not in plan
    assert "max_by" in plan
    assert count_scans_of(df, "orders") == 1
    assert count_scans_of(df, "customer") == 1
    assert_pushed_filters(df, "orders", "o_orderdate")
    assert_no_cartesian(df)


def test_audio_image_pipelines_parallel_and_single_scan(t):
    """The synthesize→decode→feature pipelines must fan the single
    small parquet file out to all cores BEFORE the Arrow decode stages
    (a 1-partition scan would run every decode on one core) and touch
    only the documents table, once."""
    from kafka_streams_repartition_spark.operators import multimodal as mm
    from kafka_streams_repartition_spark.plans import count_scans_of

    for df in (mm.audio_features(t), mm.image_features(t)):
        plan = explain_str(df)
        assert_no_cartesian(df)
        assert count_scans_of(df, "documents") == 1
        assert "Exchange" in plan  # fan_out's round-robin repartition
        simple = explain_str(df, "simple")
        assert simple.count("MapInPandas") == 2  # synthesize + featurize


def test_bpe_encode_single_corpus_aggregation(t):
    """Tokenizer application is map-side string work: one documents
    scan for the encode pass plus the trainer's vocab pass, and the
    only keyed aggregation is the final per-source rollup."""
    from kafka_streams_repartition_spark.operators import text_analysis as tx
    from kafka_streams_repartition_spark.plans import count_scans_of

    df = tx.bpe_encode(t)
    assert_no_cartesian(df)
    # the trainer's vocab passes are separate jobs (collected argmaxes);
    # the APPLICATION plan itself scans documents exactly once
    assert count_scans_of(df, "documents") == 1
    plan = explain_str(df)
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_dedup_collapsed_broadcasts_verdicts_not_pairs(t):
    """Collapse-then-minhash: no cartesian anywhere, the tiny rep-level
    verdict set joins back broadcast, and the pair-grained frames touch
    only representatives (the documents scans are the hash/collapse
    passes, bounded and column-pruned — never a pair-expanded corpus)."""
    from kafka_streams_repartition_spark.operators import dedup as dd
    from kafka_streams_repartition_spark.plans import assert_broadcast_join

    df = dd.dedup_collapsed(t)
    assert_no_cartesian(df)
    assert_broadcast_join(df)


def test_semdedup_cell_blocked_no_pair_join(t):
    """SemDeDup verifies per cell inside one Arrow task: no cartesian,
    no pair-grained shuffle join — the only joins are the assignment
    attach and the broadcast centroid attach."""
    from kafka_streams_repartition_spark.operators import dedup as dd

    df = dd.semdedup(t)
    plan = explain_str(df)
    assert_no_cartesian(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "BroadcastHashJoin" in plan  # centroid attach AND sizes attach
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1
    # the cell-cap tiling must not add a second Arrow verify stage: one
    # FlatMapGroupsInPandas node (formatted explain prints a node twice
    # - tree + detail section), with the sizes table joined broadcast
    # and only the narrow verdict OR-fold downstream
    assert plan.count("FlatMapGroupsInPandas") <= 2


def test_epoch_shuffle_one_exchange_pruned_scan(t):
    """The epoch shuffle is ONE keyed exchange (hash on shard) plus the
    per-shard local sort — never a global sort — and the documents scan
    reads doc_id only (the text column must not ride the shuffle)."""
    from kafka_streams_repartition_spark.operators import selection as sl
    from kafka_streams_repartition_spark.plans import (
        count_key_exchanges,
        count_scans_of,
    )

    df = sl.epoch_shuffle(t)
    assert count_key_exchanges(df) == 1
    assert count_scans_of(df, "documents") == 1
    assert_read_schema_pruned(df, "documents", "text")
    plan = explain_str(df)
    # per-shard Window sort, not a total-order Sort/rangepartitioning
    assert "rangepartitioning" not in plan
    assert_no_cartesian(df)


def test_shard_manifest_partial_agg_constant_state(t):
    """Manifest rolls up with ONE keyed exchange to EPOCH_SHARDS rows;
    the balance window then runs over those few rows (SinglePartition
    is fine at 8 rows — assert no second keyed exchange appears)."""
    from kafka_streams_repartition_spark.operators import selection as sl
    from kafka_streams_repartition_spark.plans import (
        count_key_exchanges,
        count_scans_of,
    )

    df = sl.shard_manifest(t)
    assert count_key_exchanges(df) == 1
    assert count_scans_of(df, "documents") == 1
    assert_no_cartesian(df)


def test_line_dedup_digest_only_shuffles(t):
    """Line-dedup exchanges carry 60-bit digests and counts, never the
    text or token-array columns; one documents scan feeds the whole
    DF-count/rejoin/rollup chain."""
    from kafka_streams_repartition_spark.operators import dedup as dd2
    from kafka_streams_repartition_spark.plans import (
        count_key_exchanges,
        count_scans_of,
    )

    df = dd2.line_dedup(t)
    assert count_key_exchanges(df) <= 4
    # DF-count branch partial-aggregates BEFORE its exchange, so its
    # exchange differs from the rejoin branch's and cannot be reused:
    # two pruned scans, the span_dedup/decontaminate family shape.
    assert count_scans_of(df, "documents") == 2
    assert_no_cartesian(df)
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln and " w#" not in ln, (
                f"wide column crosses a shuffle:\n{ln}"
            )


def test_domain_kl_vocab_sized_exchanges(t):
    """domain_kl tokenizes ONCE; corpus counts re-aggregate the
    (source, term) rollup rather than re-scanning text; the per-source
    totals and 1-row grand total broadcast; no cartesian product."""
    from kafka_streams_repartition_spark.operators import selection as sl
    from kafka_streams_repartition_spark.plans import (
        assert_broadcast_join,
        count_key_exchanges,
    )

    df = sl.domain_kl(t)
    assert count_key_exchanges(df) <= 4
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)
    # the localCheckpointed (source, term) rollup replaces the scan in
    # the plan; text appears in NO exchange
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, f"text crosses a shuffle:\n{ln}"


def test_domain_entropy_vocab_sized_exchanges(t):
    """domain_entropy mirrors domain_kl's shape: one tokenize pass into
    the (source, term) rollup, per-source totals broadcast back, no
    cartesian, and text in NO exchange."""
    from kafka_streams_repartition_spark.operators import selection as sl
    from kafka_streams_repartition_spark.plans import (
        assert_broadcast_join,
        count_key_exchanges,
    )

    df = sl.domain_entropy(t)
    assert count_key_exchanges(df) <= 3
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, f"text crosses a shuffle:\n{ln}"


def test_repeated_ngram_scan_hash_keyed_no_text_exchange(t):
    """repeated_ngram_scan md5s grams inside the per-doc array: every
    exchange is hash- or doc-keyed, raw text/grams never shuffle, and
    there is no cartesian/broadcast-nested-loop anywhere (the
    recurrence rollup is min!=max, never pairwise)."""
    from kafka_streams_repartition_spark.operators import dedup as dd

    for df in (dd.repeated_ngram_scan(t), dd.repeated_ngram_summary(t)):
        assert_no_cartesian(df)
        plan = explain_str(df)
        assert "CartesianProduct" not in plan
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln and "Arguments" in ln:
                assert "text" not in ln, f"text crosses a shuffle:\n{ln}"


def test_token_budget_one_exchange_constant_state(t):
    """The corpus-sized work is ONE keyed exchange to n_sources rows;
    the water-fill windows run single-partition over those few rows
    (no rangepartitioning — nothing global-sorts doc rows)."""
    from kafka_streams_repartition_spark.operators import selection as sl
    from kafka_streams_repartition_spark.plans import (
        count_key_exchanges,
        count_scans_of,
    )

    df = sl.token_budget(t)
    assert count_key_exchanges(df) == 1
    assert count_scans_of(df, "documents") == 1
    assert_read_schema_pruned(df, "documents", "doc_id")
    assert_no_cartesian(df)
    assert "rangepartitioning" not in explain_str(df)


def test_temperature_mixture_one_exchange_constant_state(t):
    """Same contract as token_budget: the corpus-sized work is ONE
    keyed exchange to n_sources rows; the normalizer windows run over
    those few rows; no global sort of doc rows."""
    from kafka_streams_repartition_spark.operators import selection as sl
    from kafka_streams_repartition_spark.plans import (
        count_key_exchanges,
        count_scans_of,
    )

    df = sl.temperature_mixture(t)
    assert count_key_exchanges(df) == 1
    assert count_scans_of(df, "documents") == 1
    assert_read_schema_pruned(df, "documents", "doc_id")
    assert_no_cartesian(df)
    assert "rangepartitioning" not in explain_str(df)


def test_sq_codes_broadcast_codebook_single_scan(t):
    """The encode pass scans embeddings ONCE (the trained DIM-row
    codebook is materialized, then broadcast back onto the exploded
    elements — never a shuffled join on d); its only keyed exchange is
    the per-vector rollup, partial-combining."""
    from kafka_streams_repartition_spark.plans import (
        count_key_exchanges,
        count_scans_of,
    )

    df = sim.sq_codes(t)
    assert count_scans_of(df, "embeddings") == 1
    assert_broadcast_join(df, 1)
    assert count_key_exchanges(df) == 1
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2  # partials before the exchange


def test_sq_recall_bounded_query_product(t):
    """The quantized scoring side is the brute-force shape: bounded
    query set via BroadcastNestedLoopJoin, never a shuffled cartesian;
    the reconstruction codebook broadcasts."""
    df = sim.sq_recall(t)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert_broadcast_join(df, 1)


def test_semantic_pipeline_no_cartesian_single_text_scan(t):
    """The gate verdict is computed in ONE documents scan; no stage
    degenerates to a cartesian product (the semdedup interior is
    cell-blocked; the verdict join is keyed)."""
    from kafka_streams_repartition_spark.operators import selection as sl

    df = sl.semantic_pipeline(t)
    assert_no_cartesian(df)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan


def test_source_overlap_digest_only_shuffles(t):
    """Spans collapse to distinct (source, 60-bit digest) rows before
    the pair self-join; text never crosses an exchange; the per-source
    counts broadcast back."""
    from kafka_streams_repartition_spark.plans import count_key_exchanges

    df = dd.source_overlap(t)
    assert_broadcast_join(df, 2)
    assert_no_cartesian(df)
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, f"text crosses a shuffle:\n{ln}"


def test_dedup_quality_aware_keeper_join_either_strategy(t):
    """The per-cluster keeper table re-joins on cluster_id with NO
    forced broadcast (cluster count grows with the corpus, so the
    strategy is AQE's call — either broadcast or sort-merge is
    acceptable); no stage is a cartesian, and document text never
    crosses an exchange (the quality join carries (doc_id, score)
    pairs only)."""
    df = dd.dedup_quality_aware(t)
    assert_no_cartesian(df)
    plan = explain_str(df)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, f"text crosses a shuffle:\n{ln}"


def test_leakage_split_no_cartesian_pruned_scan(t):
    """The audit's joins are keyed on doc ids (split tags broadcast
    onto the pair frame); nothing degenerates to a cartesian except
    the final 1-row x 1-row rollup stitches."""
    df = dd.leakage_split(t)
    plan = explain_str(df)
    # the only nested-loop joins are the single-row rollup stitches
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "Arguments" in ln:
            assert "text" not in ln, f"text crosses a shuffle:\n{ln}"


def test_minhash_band_tuning_single_pair_pass(t):
    """The design curve is ONE pass of the production LSH pair builder
    reduced to a single aggregate row — the layout fan-out happens
    AFTER the aggregate (explode of a literal array), so the pair
    table is scanned once, not once per layout."""
    df = dd.minhash_band_tuning(t)
    plan = explain_str(df)
    assert plan.count("Generate explode") <= 3  # grams + bands + layouts
    assert_no_cartesian(df)


def test_ann_ivfpq_residual_plan(t):
    """Residual IVFADC: the centroid table, the trained M x K residual
    codebook and the per-(query, cell) ADC tables all broadcast into
    keyed joins; the only nested-loop join is the bounded query x
    centroid probe/residual build; candidate generation stays an
    equi-join on cell id."""
    df = sim.ann_topk_ivfpq_residual(t)
    assert_broadcast_join(df, 3)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan


def test_ann_ivfpq_broadcasts_probe_and_codebook(t):
    """The probe list and the ADC tables broadcast into keyed joins;
    the only nested-loop join is the bounded query x centroid probe
    build (|queries| x n_cells rows); candidate generation is an
    equi-join on cell id."""
    df = sim.ann_topk_ivfpq(t)
    assert_broadcast_join(df, 2)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan


def test_hamming_neighbors_broadcast_equijoin(t):
    """The MIH search plans as ONE broadcast (chunk, value) equi-join
    against the capped query side — the corpus never key-exchanges for
    candidate generation, and scoring happens in place (no join-back),
    so no cartesian product exists anywhere in the plan."""
    df = dd.hamming_neighbors(t)
    assert_broadcast_join(df, 1)
    assert_no_cartesian(df)


def test_rho_loss_select_vocab_never_broadcasts(t):
    """RHO-loss scoring joins the two count tables on term as keyed
    joins of vocab-sized frames; only the 1-row totals and the vocab
    count broadcast.  The top-N plans as TakeOrderedAndProject, never
    a global sort materialization."""
    from kafka_streams_repartition_spark.operators import selection as sel

    df = sel.rho_loss_select(t)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_mmr_plans_broadcast_and_bound(t):
    """The MMR family's physical plans carry the scale contract: the
    shortlist scan broadcasts the bounded query set (gated on the
    UNCACHED pool build — the localCheckpoint that keeps the greedy
    rounds' plans flat truncates the final explain above it), the
    full plan never degrades to a shuffled cartesian, and the
    per-query ranks are WindowGroupLimit-prunable so exchanges carry
    pool-sized rows, not the corpus."""
    emb = sim._corpus(t)
    shortlist = emb.crossJoin(F.broadcast(sim._queries(emb, sim._ann_qcap(t))))
    # explicit bounded query×corpus product → BroadcastNestedLoopJoin
    # (no equi-key), the ann_topk_bruteforce shape
    assert "BroadcastNestedLoopJoin" in explain_str(shortlist)
    plan = explain_str(sim.mmr_rerank(t))
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_ngram_coverage_curve_ranks_topk_not_corpus(t):
    """The coverage curve's ranking window must run AFTER a
    TakeOrderedAndProject cut to the top-max(ks) grams — a global sort
    of the vocabulary would not survive 100 TB."""
    plan = explain_str(tx.ngram_coverage_curve(t))
    assert "TakeOrderedAndProject" in plan
    assert_read_schema_pruned(
        tx.ngram_coverage_curve(t), "documents", "lang"
    )


def test_order_statistics_profiles_prune_scans(t):
    """doc_length_profile reads only (source, doc_id, n_chars) — the
    text column never leaves the parquet scan; embedding_clip_bounds
    is join-free (explode + window + one rollup)."""
    assert_read_schema_pruned(
        tx.doc_length_profile(t), "documents", "text"
    )
    plan = explain_str(sim.embedding_clip_bounds(t))
    assert "CartesianProduct" not in plan


def test_cluster_validation_broadcasts_centroids(t):
    """Both quantizer-validation ops assign/score via broadcast
    centroid state — no corpus-sized join for the label or distance
    side beyond the keyed purity rollup."""
    assert_broadcast_join(sim.silhouette_simplified(t), at_least=1)
    plan = explain_str(sim.cluster_purity(t))
    assert "CartesianProduct" not in plan
