#!/usr/bin/env python
"""Build the sf10-equivalent EMBEDDINGS probe (embeddings only) for the
residual-family decade leg: 10 key-offset copies of the sf1 probe's
embeddings table (the make_scale_probe convention — vec_id += 1e9·copy,
so the % QUERY_MOD query subset scales with the corpus and the derived
ANN query cap is what bounds the work).  The loader resolves tables
lazily per name, so a directory holding only embeddings.parquet serves
every embeddings-only query (the sf10_text_* precedent).

Usage: python tools/make_emb_probe.py [src_sf1_dir] [dst_dir] [copies]
Defaults: .scale/sf1 -> .scale/sf10_emb, 10 copies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_repartition_spark.session import get_spark  # noqa: E402
from kafka_streams_repartition_spark.sources.tables import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 1_000_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scale", "sf1")
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale", "sf10_emb"
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-emb-probe")
    os.makedirs(dst, exist_ok=True)
    base = load_table(spark, src, "embeddings")
    scaled = None
    for i in range(copies):
        c = base.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(i * K)).cast("long")
        )
        scaled = c if scaled is None else scaled.unionByName(c)
    out = os.path.join(dst, "embeddings.parquet")
    scaled.repartition(32).write.mode("overwrite").parquet(out)
    print("embeddings:", spark.read.parquet(out).count(), "rows ->", out)


if __name__ == "__main__":
    main()
