#!/usr/bin/env python
"""Regenerate PLANS.md: the physical plans of the headline queries, as
evidence the plans match the 100 TB design claims (broadcast dims,
pushed filters, pruned scans, single key exchanges, top-k without a
global sort).  Run after any operator change:

    python tools/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_repartition_spark.session import get_spark  # noqa: E402
from kafka_streams_repartition_spark.sources.tables import load_tables  # noqa: E402

# (query key, claim the plan must show)
HEADLINERS = [
    ("pickup_order_summary", "flagship: dims broadcast, facts shuffle once on their natural keys, every scan pruned to needed columns"),
    ("pickup_order_nested", "re-nest: map-side partial collect_list, ONE string exchange, SMJ reuses the aggregate's partitioning"),
    ("product_stats_v1", "cumulative stats: two-stage aggregation (partial map-side), no row explosion before the exchange"),
    ("revenue_no_promo", "TPC-H Q6 shape: zero joins, zero key exchanges — every predicate pushed to the scan"),
    ("shipping_priority", "TPC-H Q3 shape: date filters pushed to BOTH scans, top-k as TakeOrderedAndProject (never a global sort)"),
    ("waiting_suppliers", "TPC-H Q21 shape: correlated EXISTS pair decorrelated to ONE per-order aggregate, supplier broadcast"),
    ("dedup_exact", "dedup: only 32-byte md5 digests shuffle, never document text"),
    ("dedup_minhash_lsh", "near-dup: banded LSH bucket join — signatures shuffle, exact Jaccard only on band collisions"),
    ("ann_topk_lsh", "ANN: hyperplane-signature bucket join, query side broadcast, no cartesian"),
    ("tokenize_to_ids", "tokenize: vocabulary broadcast — text never shuffles for the lookup"),
    ("salted_event_counts", "skew: explicit two-stage salted aggregation (two exchanges by design)"),
    ("first_touch_attribution", "attribution: single scan + one user-keyed window — no click-x-purchase self-join"),
    ("ks_two_sample_binned", "drift at scale: the ordered window sees <=64 bin rows at ANY input size"),
    ("histogram_quantiles", "mergeable quantile sketch: <=64 counters per group map-side, one exchange"),
    ("min_cost_supplier_region", "TPC-H Q2 full: correlated regional min decorrelated to a per-part window over the derived partsupp; geo+part dims broadcast; deterministic TakeOrderedAndProject"),
    ("promotable_suppliers", "TPC-H Q20 full: partsupp and the year's shipped aggregate shuffle on the SAME (partkey,suppkey) key; year filter pushed"),
    ("table_profile_approx", "profile at scale: HLL registers — the shuffle carries <=16 rows per column whatever the cardinality (exact side present only as the acceptance gate)"),
    ("dedup_embedding_lsh", "corpus-wide embedding dedup: embeddings scan into (band,sig) buckets + a map-side-collapsed sizes pass joined back BROADCAST (the hot-bucket tiling knob); Arrow/BLAS tile verify, no pair-grained shuffle join"),
    ("dedup_collapsed", "replication-robust dedup: exact-collapse to representatives FIRST (one digest groupBy), minhash over reps only, tiny verdict set broadcast back - replication never becomes candidate pairs"),
    ("semdedup", "semantic dedup: k-means cell blocking, centroids broadcast, per-cell row-blocked Arrow/BLAS verify - only per-member verdicts leave a task"),
    ("dsir_select", "DSIR: one tokenize pass (bucket ids shuffle, never token strings), 128-row log-ratio table broadcast, Gumbel top-K as TakeOrderedAndProject"),
    ("quality_logreg", "trained logreg quality filter: per-round broadcast of the <=65-row weight frame, sparse centered gradient via two scalars, feats checkpointed once"),
    ("pretrain_pipeline", "the whole pretraining path as ONE plan: gopher gate inlined into the digest scan, digest-keyed exact dedup, broadcast anti-join on the LSH loser set, one-shuffle shard packing"),
    ("audio_features", "media decode: fan-out then two chained Arrow stages over ONE documents scan - no keyed shuffle anywhere"),
    ("bpe_encode", "tokenizer apply: learned merges as map-side chained replaces; the only exchange is the per-source rollup"),
    ("ann_topk_ivfpq", "composed IVF-PQ: probe list and ADC tables broadcast, candidates from an equi-join on cell id, DECIMAL-exact ADC sums, top-k rank prunable"),
    ("filter_attribution", "gate cascade accounting: four flags from narrow maps + digest-keyed keeper + broadcast LSH loser set; text never crosses an exchange"),
    ("token_yield", "token funnel: same one-pass flag frame re-weighed by n_tokens; one partial-combining groupBy(source)"),
    ("minhash_band_tuning", "banding design curve: ONE pair-builder pass to a single aggregate row, layout fan-out AFTER the aggregate"),
    ("jl_project", "JL projection: sign matrix broadcast, 16 rows per vector cross the exchange, bounded query broadcast for the distortion pairs"),
    ("leakage_split", "split audit: bucket expression map-side, split tags joined onto the collision-bounded pair frame, one-row stitches"),
    ("ann_topk_mrl", "MRL shortlist-rerank: corpus scan touches only 16 of 64 dims, the full-dim dot computes AFTER the shortlist row_number filter (constant rows per query), query side one bounded broadcast"),
    ("kcenter_coverage", "k-center coverage: one corpus scan, min-dist as least() over k broadcast-literal unrolled dots inside codegen, 21-bucket rollup is the only exchange"),
    ("hard_negative_mining", "hard negatives: label filter applied BEFORE the ranking window — cross-label pairs only ever reach row_number; same bounded broadcast scan as the brute scorer"),
]


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("plans", shuffle_partitions=32)
    sf_dir = "/root/testdata/sf0.001"
    load_tables(spark, sf_dir)
    qs = entrymod.queries()
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Auto-generated by `tools/dump_plans.py` (sf0.001, AQE on; plans",
        "are pre-AQE so every exchange is visible). Each section states",
        "the scale claim the plan must exhibit — broadcasts, pushed",
        "filters (`PushedFilters`), pruned scans (`ReadSchema`), and",
        "exchange counts are the things to read.",
        "",
    ]
    for name, claim in HEADLINERS:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"**Claim:** {claim}", "", "```"]
        out.append(buf.getvalue().rstrip())
        out += ["```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path} ({len(HEADLINERS)} plans)")


if __name__ == "__main__":
    main()
