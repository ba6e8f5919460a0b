"""Round-13 optimization invariants: the shared-intermediate memos and
expression rewrites must be output-invariant.

Each test pins that an optimized path produces EXACTLY what the
unoptimized computation produces — the optimizations are allowed to
change where work happens (memoized model artifacts, scalar-literal
unrolls, probe-superset sharing), never what any query computes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_repartition_spark.operators import dedup as dd
from kafka_streams_repartition_spark.operators import similarity as sim
from kafka_streams_repartition_spark.operators import text_analysis as tx
from kafka_streams_repartition_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return load_tables(spark, sf_dir)


def _rows(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_kmeans_memo_matches_fresh_training(t):
    """kmeans_model's memoized centroid rows equal the fresh-training
    producer (bit-exact doubles).  ALL upstream memos are cleared
    first (r13 advisor: leaving _LCENT_MEMO warm meant the "fresh"
    run still read memoized seed centroids, so a stale seed would
    have escaped this test), and since r14 ``kmeans_cells`` IS the
    always-fresh path (producer discipline), so the comparison is
    memoized-model vs fresh-training by construction."""
    sim._KMEANS_MEMO.clear()
    sim._LCENT_MEMO.clear()
    sim._NVEC_MEMO.clear()
    a1 = sim.kmeans_model(t)[0]  # trains, populates the memo
    a2 = sim.kmeans_model(t)[0]  # memo hit
    fresh = sim.kmeans_cells(t)  # always-fresh producer
    assert _rows(a1) == _rows(fresh)
    assert _rows(a2) == _rows(fresh)


def test_bf_truth_matches_bruteforce(t):
    """_bf_truth serves exactly ann_topk_bruteforce's (query, cand)
    pairs — the gates' memoized truth is the declared query's answer."""
    sim._BF_TRUTH_MEMO.clear()
    want = _rows(sim.ann_topk_bruteforce(t).select("query_id", "cand_id"))
    got = _rows(sim._bf_truth(t))
    assert got == want
    assert _rows(sim._bf_truth(t)) == want  # memo hit


def test_embdup_truth_matches_inline(t):
    """_embdup_truth_pairs equals the inline lo/hi distinct pair set."""
    dd._EMBDUP_TRUTH_CACHE.clear()
    want = _rows(
        dd.dedup_embedding(t)
        .select(
            F.least("query_id", "cand_id").alias("lo"),
            F.greatest("query_id", "cand_id").alias("hi"),
        )
        .distinct()
    )
    assert _rows(dd._embdup_truth_pairs(t)) == want


def test_bpe_merges_memo_matches_trainer(t):
    """_bpe_merges equals the (lhs, rhs) sequence of the declared
    trainer query, in round order."""
    tx._BPE_MERGES_MEMO.clear()
    want = [
        (r["lhs"], r["rhs"])
        for r in tx.bpe_train_merges(t).orderBy("round").collect()
    ]
    assert tx._bpe_merges(t) == want


def test_dot_literal_bit_equals_array_form(spark):
    """dot_literal reproduces dot_unrolled-against-a-literal-array
    bit-for-bit (same left-associated order, same IEEE doubles)."""
    from kafka_streams_repartition_spark.functions.vectors import (
        dot_literal,
        dot_unrolled,
    )

    vals = [0.1 * i - 1.7 for i in range(16)]
    df = spark.createDataFrame(
        [([(0.3 * i + 0.01) * (-1) ** i for i in range(16)],)], "v array<double>"
    )
    lit_arr = F.array(*[F.lit(float(x)) for x in vals])
    out = df.select(
        dot_unrolled(F.col("v"), lit_arr, 16).alias("a"),
        dot_literal(F.col("v"), vals).alias("b"),
    ).collect()[0]
    assert out["a"] == out["b"]


def test_rpq_probe_superset_filter_equals_direct_topk(t):
    """ivfpq_design_table's probe-superset sharing is exact: ranking
    the max-probe ADC frame filtered to prn <= p equals running the
    production pipeline (_rpq_topk) directly at n_probe = p."""
    emb, cent, cells, rsub = sim._rpq_shared(t)
    cb1, codes = sim._rpq_codebook(rsub, 8)
    qcap = sim._ann_qcap(t)
    adc4 = sim._rpq_adc(emb, cent, cells, cb1, codes, 4, qcap)
    for p in (1, 2):
        want = _rows(sim._rpq_topk(emb, cent, cells, cb1, codes, p, qcap))
        got = _rows(sim._rpq_rank(adc4.filter(F.col("prn") <= p)))
        assert got == want, f"n_probe={p} superset cut diverged"
