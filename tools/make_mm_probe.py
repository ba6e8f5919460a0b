#!/usr/bin/env python
"""Build the sf10-equivalent MULTIMODAL probe dataset (documents +
embeddings) for the embedding-side decade probes — VERDICT r8 item 6:
the text decor model alone cannot probe ``ann_topk_ivfpq`` /
``jl_project`` / ``crossmodal_clusters``, because verbatim-copied
embeddings make every cross-copy cosine 1.0 (pair compounding by
construction).

Decor model for embeddings: copy i > 0 applies a SIGNED CIRCULAR SHIFT
— ``new[j] = s_ij · old[(j + i) mod DIM]`` with ``s_ij`` the ±1 md5
signs of ``hex_sign`` (the repo's oracle-portable sign source).  A
signed permutation is orthogonal, so every WITHIN-copy cosine (and
euclidean distance) is preserved bit-for-bit — each copy's internal
near-dup/cluster structure is exactly the original's — while
cross-copy cosines collapse to ~N(0, 1/DIM) noise, keeping cross-copy
≥-threshold pair density near zero: the density-constant (TPC-H)
scaling model, under which a healthy plan should curve ~linearly.

Documents get the per-copy token-suffix decor (same transform as
``make_text_probe.py``) with the SAME key offsets, so the
text/embedding id spaces stay aligned for ``crossmodal_clusters``.

Usage: python tools/make_mm_probe.py [src_sf_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 -> .scale/sf10_mm_decor, 100 copies.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_repartition_spark.functions.hashing import hex_sign  # noqa: E402
from kafka_streams_repartition_spark.session import get_spark  # noqa: E402
from kafka_streams_repartition_spark.sources.tables import load_table  # noqa: E402

K = 1_000_000_000
DIM = 64


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf10_mm_decor",
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    spark = get_spark("make-mm-probe")
    os.makedirs(dst, exist_ok=True)

    docs = load_table(spark, src, "documents")
    scaled = None
    for i in range(copies):
        c = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * K)).cast("long")
        )
        if i > 0:
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
    out = os.path.join(dst, "documents.parquet")
    scaled.repartition(32).write.mode("overwrite").parquet(out)
    print(f"documents: {spark.read.parquet(out).count()} rows at {out}")

    emb = load_table(spark, src, "embeddings")
    scaled = None
    for i in range(copies):
        c = emb.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(i * K)).cast("long")
        )
        if i > 0:
            rot = i % (DIM - 1) + 1  # nonzero shift
            signs = [hex_sign(f"embprobe{i}:{j}") for j in range(DIM)]
            c = c.withColumn(
                "embedding",
                F.array(
                    *[
                        (
                            F.element_at("embedding", (j + rot) % DIM + 1)
                            * F.lit(float(signs[j]))
                        ).cast("float")
                        for j in range(DIM)
                    ]
                ),
            )
        scaled = c if scaled is None else scaled.unionByName(c)
    out = os.path.join(dst, "embeddings.parquet")
    scaled.repartition(32).write.mode("overwrite").parquet(out)
    print(f"embeddings: {spark.read.parquet(out).count()} rows at {out}")


if __name__ == "__main__":
    main()
