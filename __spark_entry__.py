"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pickup-order query at sf0.001 (smoke).
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
north-star extensions); each takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents keyed the same.
Column names/aliases match between both sides (driver hashes values with
columns sorted by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_repartition_spark.sources.tables import load_tables
from kafka_streams_repartition_spark.operators import pickup_order as po
from kafka_streams_repartition_spark.operators import product_stats as ps
from kafka_streams_repartition_spark.operators import restore as rst
from kafka_streams_repartition_spark.operators import windows as win
from kafka_streams_repartition_spark.operators import dedup as dd
from kafka_streams_repartition_spark.operators import similarity as sim
from kafka_streams_repartition_spark.operators import text_analysis as tx
from kafka_streams_repartition_spark.operators import multimodal as mm
from kafka_streams_repartition_spark.operators import analytics as an
from kafka_streams_repartition_spark.operators import relational as rel
from kafka_streams_repartition_spark.operators import sketches as sk
from kafka_streams_repartition_spark.operators import graph as gr
from kafka_streams_repartition_spark.operators import tpch as th


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    return po.pickup_order_summary(t)


def _q(fn) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_tables(spark, sf_dir))

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver grades registry order and truncates at 50.
    # Per VERDICT r3 item 1, oracle-UNPROVEN entries lead: (A1) the block
    # that failed r2 on the since-fixed NTZ timestamp loader bug and was
    # never re-graded, (A2) entries never driver-graded in any round, then
    # (B) entries new this round (capped at 31 so A+B fit the 50-window),
    # then (C) everything with a green CORRECTNESS row in some round.
    return {
        # -- A1: failed r2 (loader bug, fixed), never re-graded ---------
        "ktable_latest_event": _q(win.ktable_latest_event),
        "scd2_history": _q(win.scd2_history),
        "tumbling_events": _q(win.tumbling_events),
        "hopping_events": _q(win.hopping_events),
        "session_events": _q(win.session_events),
        "sliding_events": _q(win.sliding_events),
        "event_funnel": _q(win.event_funnel),
        "asof_join_events": _q(rel.asof_join_events),
        "range_join_events": _q(rel.range_join_events),
        # -- A2: never driver-graded in any round -----------------------
        "table_profile": _q(an.table_profile),
        "cms_heavy_hitters": _q(sk.cms_heavy_hitters),
        "bloom_semi_join": _q(sk.bloom_semi_join),
        "histogram_quantiles": _q(sk.histogram_quantiles),
        "pagerank_copurchase": _q(gr.pagerank_copurchase),
        "knn_graph": _q(sim.knn_graph),
        "ngram_counts": _q(tx.ngram_counts),
        "anomaly_zscore": _q(an.anomaly_zscore),
        "zorder_layout": _q(an.zorder_layout),
        "sample_per_group": _q(tx.sample_per_group),
        # -- B: new this round (max 31 entries) -------------------------
        "ks_two_sample_binned": _q(an.ks_two_sample_binned),
        "local_supplier_volume": _q(th.local_supplier_volume),
        "volume_shipping": _q(th.volume_shipping),
        "market_share": _q(th.market_share),
        "customer_order_distribution": _q(th.customer_order_distribution),
        "part_type_profit": _q(th.part_type_profit),
        "ship_delay_priority": _q(th.ship_delay_priority),
        "top_supplier": _q(th.top_supplier),
        "discounted_revenue_disjunctive": _q(th.discounted_revenue_disjunctive),
        "idle_rich_customers": _q(th.idle_rich_customers),
        "embedding_centroid_per_label": _q(sim.embedding_centroid_per_label),
        "embedding_norm_outliers": _q(sim.embedding_norm_outliers),
        "cosine_sim_histogram": _q(sim.cosine_sim_histogram),
        "ewma_user_value": _q(win.ewma_user_value),
        "cusum_changepoint": _q(win.cusum_changepoint),
        "feature_hashing": _q(tx.feature_hashing),
        "hourly_seasonality": _q(win.hourly_seasonality),
        # -- C: driver-green in r1/r2/r3 --------------------------------
        "ann_recall_eval": _q(sim.ann_recall_eval),
        "basket_rules": _q(gr.basket_rules),
        "pca_power_iteration": _q(sim.pca_power_iteration),
        "large_volume_customers": _q(th.large_volume_customers),
        "returned_item_revenue": _q(th.returned_item_revenue),
        "hll_running_union": _q(sk.hll_running_union),
        "skyline_parts": _q(an.skyline_parts),
        "event_transitions": _q(win.event_transitions),
        "sales_cube": _q(an.sales_cube),
        "small_quantity_revenue": _q(th.small_quantity_revenue),
        "daily_value_locf": _q(win.daily_value_locf),
        "weighted_sample": _q(tx.weighted_sample),
        "weekly_value_trend": _q(win.weekly_value_trend),
        "ann_topk_pq": _q(sim.ann_topk_pq),
        "bigram_logprob": _q(tx.bigram_logprob),
        "promo_revenue_share": _q(th.promo_revenue_share),
        "corpus_token_entropy": _q(tx.corpus_token_entropy),
        "numeric_corr_profile": _q(an.numeric_corr_profile),
        "revenue_concentration": _q(an.revenue_concentration),
        "interarrival_stats": _q(win.interarrival_stats),
        "modal_event_type": _q(win.modal_event_type),
        "value_trend_regression": _q(an.value_trend_regression),
        "seasonal_naive_backtest": _q(win.seasonal_naive_backtest),
        "decile_lift_table": _q(an.decile_lift_table),
        "chi_square_independence": _q(an.chi_square_independence),
        "ks_two_sample": _q(an.ks_two_sample),
        "group_size_histogram": _q(an.group_size_histogram),
        "winnow_fingerprints": _q(tx.winnow_fingerprints),
        "hll_intersect_types": _q(sk.hll_intersect_types),
        "triangle_count": _q(gr.triangle_count),
        "tokenize_to_ids": _q(tx.tokenize_to_ids),
        "histogram_quantiles_meta": _q(sk.histogram_quantiles_meta),
        "shipping_priority": _q(th.shipping_priority),
        "order_priority_counts": _q(th.order_priority_counts),
        "revenue_no_promo": _q(th.revenue_no_promo),
        "rolling_user_value": _q(rel.rolling_user_value),
        "user_percentiles": _q(rel.user_percentiles),
        "pii_scrub": _q(tx.pii_scrub),
        "duplicate_rate_by_source": _q(tx.duplicate_rate_by_source),
        "stratified_kfold": _q(tx.stratified_kfold),
        "embedding_dim_stats": _q(sim.embedding_dim_stats),
        "pq_codes": _q(sim.pq_codes),
        "retention_cohorts": _q(an.retention_cohorts),
        "pivot_event_types": _q(an.pivot_event_types),
        "user_day_segments": _q(an.user_day_segments),
        "hll_distinct_users": _q(sk.hll_distinct_users),
        "hll_union_daily": _q(sk.hll_union_daily),
        "bm25_search": _q(tx.bm25_search),
        "unigram_logprob": _q(tx.unigram_logprob),
        "bpe_pair_stats": _q(tx.bpe_pair_stats),
        "pickup_order_summary": _q(po.pickup_order_summary),
        "pickup_order_nested": _q(po.pickup_order_nested),
        "product_stats_v1": _q(ps.product_stats_v1),
        "product_stats_v2": _q(ps.product_stats_v2),
        "restore_merge": _q(rst.restore_merge),
        "event_props_stats": _q(win.event_props_stats),
        "dedup_exact": _q(dd.dedup_exact),
        "dedup_ngram_jaccard": _q(dd.dedup_ngram_jaccard),
        "dedup_minhash_lsh": _q(dd.dedup_minhash_lsh),
        "dedup_simhash": _q(dd.dedup_simhash),
        "dedup_edit_distance": _q(dd.dedup_edit_distance),
        "dedup_incremental": _q(dd.dedup_incremental),
        "dedup_embedding": _q(dd.dedup_embedding),
        "ann_topk_bruteforce": _q(sim.ann_topk_bruteforce),
        "ann_topk_vectorized": _q(sim.ann_topk_vectorized),
        "ann_topk_lsh": _q(sim.ann_topk_lsh),
        "ann_topk_ivf": _q(sim.ann_topk_ivf),
        "kmeans_cells": _q(sim.kmeans_cells),
        "text_stats": _q(tx.text_stats),
        "lang_id": _q(tx.lang_id),
        "token_count": _q(tx.token_count),
        "doc_fingerprint": _q(tx.doc_fingerprint),
        "multimodal_meta": _q(mm.multimodal_meta),
        "multimodal_frames": _q(mm.multimodal_frames),
        "multimodal_features": _q(mm.multimodal_features),
        "top_sellers_per_nation": _q(an.top_sellers_per_nation),
        "sales_rollup": _q(an.sales_rollup),
        "supplier_volume": _q(an.supplier_volume),
        "corpus_curation": _q(tx.corpus_curation),
        "quantile_stats": _q(rel.quantile_stats),
        "dedup_clusters": _q(dd.dedup_clusters),
        "tfidf_top_terms": _q(tx.tfidf_top_terms),
        "sample_stratified": _q(tx.sample_stratified),
        "pack_sequences": _q(tx.pack_sequences),
        "salted_event_counts": _q(rel.salted_event_counts),
        "chunk_documents": _q(tx.chunk_documents),
        "mixture_upsample": _q(tx.mixture_upsample),
        "pricing_summary": _q(an.pricing_summary),
        "repetition_stats": _q(tx.repetition_stats),
        "decontaminate": _q(dd.decontaminate),
        "span_dedup": _q(dd.span_dedup),
    }


def oracle_sql() -> dict[str, str]:
    sql = {
        "ann_recall_eval": sim.ANN_RECALL_EVAL_ORACLE,
        "basket_rules": gr.BASKET_RULES_ORACLE,
        "pca_power_iteration": sim.PCA_POWER_ITERATION_ORACLE,
        "large_volume_customers": th.LARGE_VOLUME_CUSTOMERS_ORACLE,
        "returned_item_revenue": th.RETURNED_ITEM_REVENUE_ORACLE,
        "hll_running_union": sk.HLL_RUNNING_UNION_ORACLE,
        "skyline_parts": an.SKYLINE_PARTS_ORACLE,
        "event_transitions": win.EVENT_TRANSITIONS_ORACLE,
        "sales_cube": an.SALES_CUBE_ORACLE,
        "small_quantity_revenue": th.SMALL_QUANTITY_REVENUE_ORACLE,
        "daily_value_locf": win.DAILY_VALUE_LOCF_ORACLE,
        "weighted_sample": tx.WEIGHTED_SAMPLE_ORACLE,
        "weekly_value_trend": win.WEEKLY_VALUE_TREND_ORACLE,
        "ann_topk_pq": sim.ANN_TOPK_PQ_ORACLE,
        "bigram_logprob": tx.BIGRAM_LOGPROB_ORACLE,
        "promo_revenue_share": th.PROMO_REVENUE_SHARE_ORACLE,
        "corpus_token_entropy": tx.CORPUS_TOKEN_ENTROPY_ORACLE,
        "numeric_corr_profile": an.NUMERIC_CORR_PROFILE_ORACLE,
        "revenue_concentration": an.REVENUE_CONCENTRATION_ORACLE,
        "interarrival_stats": win.INTERARRIVAL_STATS_ORACLE,
        "modal_event_type": win.MODAL_EVENT_TYPE_ORACLE,
        "value_trend_regression": an.VALUE_TREND_REGRESSION_ORACLE,
        "seasonal_naive_backtest": win.SEASONAL_NAIVE_BACKTEST_ORACLE,
        "decile_lift_table": an.DECILE_LIFT_TABLE_ORACLE,
        "chi_square_independence": an.CHI_SQUARE_INDEPENDENCE_ORACLE,
        "ks_two_sample": an.KS_TWO_SAMPLE_ORACLE,
        "ks_two_sample_binned": an.KS_TWO_SAMPLE_BINNED_ORACLE,
        "local_supplier_volume": th.LOCAL_SUPPLIER_VOLUME_ORACLE,
        "volume_shipping": th.VOLUME_SHIPPING_ORACLE,
        "market_share": th.MARKET_SHARE_ORACLE,
        "customer_order_distribution": th.CUSTOMER_ORDER_DISTRIBUTION_ORACLE,
        "part_type_profit": th.PART_TYPE_PROFIT_ORACLE,
        "ship_delay_priority": th.SHIP_DELAY_PRIORITY_ORACLE,
        "top_supplier": th.TOP_SUPPLIER_ORACLE,
        "discounted_revenue_disjunctive": th.DISCOUNTED_REVENUE_DISJUNCTIVE_ORACLE,
        "idle_rich_customers": th.IDLE_RICH_CUSTOMERS_ORACLE,
        "embedding_centroid_per_label": sim.EMBEDDING_CENTROID_PER_LABEL_ORACLE,
        "embedding_norm_outliers": sim.EMBEDDING_NORM_OUTLIERS_ORACLE,
        "cosine_sim_histogram": sim.COSINE_SIM_HISTOGRAM_ORACLE,
        "ewma_user_value": win.EWMA_USER_VALUE_ORACLE,
        "cusum_changepoint": win.CUSUM_CHANGEPOINT_ORACLE,
        "feature_hashing": tx.FEATURE_HASHING_ORACLE,
        "hourly_seasonality": win.HOURLY_SEASONALITY_ORACLE,
        "group_size_histogram": an.GROUP_SIZE_HISTOGRAM_ORACLE,
        "winnow_fingerprints": tx.WINNOW_FINGERPRINTS_ORACLE,
        "hll_intersect_types": sk.HLL_INTERSECT_TYPES_ORACLE,
        "triangle_count": gr.TRIANGLE_COUNT_ORACLE,
        "tokenize_to_ids": tx.TOKENIZE_TO_IDS_ORACLE,
        "histogram_quantiles_meta": sk.HISTOGRAM_QUANTILES_META_ORACLE,
        "shipping_priority": th.SHIPPING_PRIORITY_ORACLE,
        "order_priority_counts": th.ORDER_PRIORITY_COUNTS_ORACLE,
        "revenue_no_promo": th.REVENUE_NO_PROMO_ORACLE,
        "rolling_user_value": rel.ROLLING_USER_VALUE_ORACLE,
        "user_percentiles": rel.USER_PERCENTILES_ORACLE,
        "pii_scrub": tx.PII_SCRUB_ORACLE,
        "duplicate_rate_by_source": tx.DUPLICATE_RATE_BY_SOURCE_ORACLE,
        "stratified_kfold": tx.STRATIFIED_KFOLD_ORACLE,
        "embedding_dim_stats": sim.EMBEDDING_DIM_STATS_ORACLE,
        "pickup_order_summary": po.PICKUP_ORDER_SUMMARY_ORACLE,
        "pickup_order_nested": po.PICKUP_ORDER_NESTED_ORACLE,
        "product_stats_v1": ps.PRODUCT_STATS_V1_ORACLE,
        "product_stats_v2": ps.PRODUCT_STATS_V2_ORACLE,
        "restore_merge": rst.RESTORE_MERGE_ORACLE,
        "ktable_latest_event": win.KTABLE_LATEST_EVENT_ORACLE,
        "scd2_history": win.SCD2_HISTORY_ORACLE,
        "tumbling_events": win.TUMBLING_EVENTS_ORACLE,
        "hopping_events": win.HOPPING_EVENTS_ORACLE,
        "session_events": win.SESSION_EVENTS_ORACLE,
        "sliding_events": win.SLIDING_EVENTS_ORACLE,
        "event_props_stats": win.EVENT_PROPS_STATS_ORACLE,
        "dedup_exact": dd.DEDUP_EXACT_ORACLE,
        "dedup_ngram_jaccard": dd.DEDUP_NGRAM_JACCARD_ORACLE,
        "dedup_minhash_lsh": dd.DEDUP_MINHASH_LSH_ORACLE,
        "dedup_simhash": dd.DEDUP_SIMHASH_ORACLE,
        "dedup_edit_distance": dd.DEDUP_EDIT_DISTANCE_ORACLE,
        "dedup_incremental": dd.DEDUP_INCREMENTAL_ORACLE,
        "dedup_embedding": dd.DEDUP_EMBEDDING_ORACLE,
        "ann_topk_bruteforce": sim.ANN_TOPK_BRUTEFORCE_ORACLE,
        "ann_topk_vectorized": sim.ANN_TOPK_VECTORIZED_ORACLE,
        "ann_topk_lsh": sim.ANN_TOPK_LSH_ORACLE,
        "ann_topk_ivf": sim.ANN_TOPK_IVF_ORACLE,
        "kmeans_cells": sim.KMEANS_CELLS_ORACLE,
        "text_stats": tx.TEXT_STATS_ORACLE,
        "lang_id": tx.LANG_ID_ORACLE,
        "token_count": tx.TOKEN_COUNT_ORACLE,
        "doc_fingerprint": tx.DOC_FINGERPRINT_ORACLE,
        "multimodal_meta": mm.MULTIMODAL_META_ORACLE,
        "multimodal_frames": mm.MULTIMODAL_FRAMES_ORACLE,
        "multimodal_features": mm.MULTIMODAL_FEATURES_ORACLE,
        "top_sellers_per_nation": an.TOP_SELLERS_PER_NATION_ORACLE,
        "sales_rollup": an.SALES_ROLLUP_ORACLE,
        "supplier_volume": an.SUPPLIER_VOLUME_ORACLE,
        "corpus_curation": tx.CORPUS_CURATION_ORACLE,
        "asof_join_events": rel.ASOF_JOIN_EVENTS_ORACLE,
        "range_join_events": rel.RANGE_JOIN_EVENTS_ORACLE,
        "quantile_stats": rel.QUANTILE_STATS_ORACLE,
        "dedup_clusters": dd.DEDUP_CLUSTERS_ORACLE,
        "tfidf_top_terms": tx.TFIDF_TOP_TERMS_ORACLE,
        "sample_stratified": tx.SAMPLE_STRATIFIED_ORACLE,
        "pack_sequences": tx.PACK_SEQUENCES_ORACLE,
        "event_funnel": win.EVENT_FUNNEL_ORACLE,
        "salted_event_counts": rel.SALTED_EVENT_COUNTS_ORACLE,
        "chunk_documents": tx.CHUNK_DOCUMENTS_ORACLE,
        "mixture_upsample": tx.MIXTURE_UPSAMPLE_ORACLE,
        "pricing_summary": an.PRICING_SUMMARY_ORACLE,
        "repetition_stats": tx.REPETITION_STATS_ORACLE,
        "decontaminate": dd.DECONTAMINATE_ORACLE,
        "span_dedup": dd.SPAN_DEDUP_ORACLE,
        "pq_codes": sim.PQ_CODES_ORACLE,
        "retention_cohorts": an.RETENTION_COHORTS_ORACLE,
        "pivot_event_types": an.PIVOT_EVENT_TYPES_ORACLE,
        "user_day_segments": an.USER_DAY_SEGMENTS_ORACLE,
        "hll_distinct_users": sk.HLL_DISTINCT_USERS_ORACLE,
        "hll_union_daily": sk.HLL_UNION_DAILY_ORACLE,
        "bm25_search": tx.BM25_SEARCH_ORACLE,
        "unigram_logprob": tx.UNIGRAM_LOGPROB_ORACLE,
        "bpe_pair_stats": tx.BPE_PAIR_STATS_ORACLE,
        "table_profile": an.TABLE_PROFILE_ORACLE,
        "cms_heavy_hitters": sk.CMS_HEAVY_HITTERS_ORACLE,
        "bloom_semi_join": sk.BLOOM_SEMI_JOIN_ORACLE,
        "histogram_quantiles": sk.HISTOGRAM_QUANTILES_ORACLE,
        "pagerank_copurchase": gr.PAGERANK_COPURCHASE_ORACLE,
        "knn_graph": sim.KNN_GRAPH_ORACLE,
        "ngram_counts": tx.NGRAM_COUNTS_ORACLE,
        "anomaly_zscore": an.ANOMALY_ZSCORE_ORACLE,
        "zorder_layout": an.ZORDER_LAYOUT_ORACLE,
        "sample_per_group": tx.SAMPLE_PER_GROUP_ORACLE,
    }
    # Same grading-priority order as queries().
    return {k: sql[k] for k in queries() if k in sql}
