#!/usr/bin/env python
"""Build an sf1-equivalent dataset (~6 M lineitem) by key-offset
replication of the driver's sf0.1 testdata — the local scale probe for
"does the plan curve linearly at 10x the data".

Each of the 10 copies shifts every entity key by a per-domain offset
(1e9 · copy) applied CONSISTENTLY on both the dimension and every fact
foreign key, so joins land exactly as in the original: the scaled
dataset has 10x the orders, customers, suppliers, parts, users, docs
and vectors, with per-entity group sizes unchanged — the TPC-H scaling
model (fact AND dimensions grow with sf, per-key density constant).
``region``/``nation`` stay fixed, as in TPC-H.

Timestamps and payloads are untouched; copy 0 is the original byte-for
-byte, so any query's sf0.1 answer embeds in the scaled answer.

Usage: python tools/make_scale_probe.py [src_sf_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 -> .scale/sf1, 10 copies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_repartition_spark.session import get_spark  # noqa: E402
from kafka_streams_repartition_spark.sources.tables import load_table  # noqa: E402

K = 1_000_000_000  # per-domain key offset per copy (all source keys << 1e9)

# table -> columns that carry an entity key needing the offset
KEYED = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1",
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scale-probe")
    os.makedirs(dst, exist_ok=True)

    for name in COPY_ONCE:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        print(f"{name}: copied once")

    for name, keys in KEYED.items():
        base = load_table(spark, src, name)
        scaled = None
        for i in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * K)).cast("long"))
            scaled = c if scaled is None else scaled.unionByName(c)
        out = os.path.join(dst, f"{name}.parquet")
        # 32 files → full local[32] scan parallelism without fan_out
        scaled.repartition(32).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{name}: {copies} copies -> {n} rows")


if __name__ == "__main__":
    main()
