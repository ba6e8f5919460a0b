#!/usr/bin/env python
"""Build the sf10-equivalent TEXT probe datasets (documents only) for
the collision-driven dedup plans — VERDICT r5 item 5: one more decade
past BENCH_sf1.json's 10x.

Two scaling models, because they answer different questions:

- ``raw``   — key-offset replication, text UNCHANGED (the BENCH_sf1
  model continued).  Every doc gains C-1 exact twins, so near-dup
  PAIRS grow ~C² by construction: this measures how the plans absorb
  collision COMPOUNDING (the adversarial end).
- ``decor`` — key-offset replication with a per-copy token suffix
  (every whitespace token gets "·<copy>" appended).  Cross-copy
  Jaccard drops to 0 while each copy's internal dup structure is
  preserved exactly (the transform is injective per copy), so
  per-key density stays constant — the TPC-H scaling model, where a
  healthy plan should curve ~linearly.

Usage: python tools/make_text_probe.py [src_sf_dir] [dst_root] [copies]
Defaults: /root/testdata/sf0.1 -> .scale/, 100 copies
(→ .scale/sf10_text_raw/documents.parquet and .../sf10_text_decor/).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_repartition_spark.session import get_spark  # noqa: E402
from kafka_streams_repartition_spark.sources.tables import load_table  # noqa: E402

K = 1_000_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    spark = get_spark("make-text-probe")
    base = load_table(spark, src, "documents")

    for mode in ("raw", "decor"):
        scaled = None
        for i in range(copies):
            c = base.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * K)).cast("long")
            )
            if mode == "decor" and i > 0:
                suffix = f"·{i}"
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(suffix)),
                        ),
                        " ",
                    ),
                )
            scaled = c if scaled is None else scaled.unionByName(c)
        out = os.path.join(root, f"sf10_text_{mode}", "documents.parquet")
        scaled.repartition(32).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        print(f"{mode}: {copies} copies -> {n} docs at {out}")


if __name__ == "__main__":
    main()
