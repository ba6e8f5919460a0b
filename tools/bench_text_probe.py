#!/usr/bin/env python
"""sf10 decade probe for the collision-driven dedup plans + the
embedding pair-growth re-measurement (VERDICT r5 item 5).

Benches span_dedup and dedup_minhash_lsh at sf1 (.scale/sf1, the
BENCH_sf1 dataset) and at the two sf10 text datasets
(tools/make_text_probe.py), one repeat each in fresh JVMs, and records
sf10/sf1 ratios per scaling model.  Separately re-measures
dedup_embedding_lsh (now bucket-tiled) at sf0.1 vs .scale/sf1: wall
time and OUTPUT PAIR COUNT, the pair-growth statistic r5 tracked.

Writes BENCH_sf10.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEXT_QUERIES = ["span_dedup", "dedup_minhash_lsh"]


def run_bench(sf_dir: str, out_path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(TEXT_QUERIES),
        SPARK_GRAFT_BENCH_OUT=out_path,
        SPARK_GRAFT_BENCH_REPEATS="1",
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
    )
    with open(out_path) as fh:
        return json.load(fh)


def emb_measure(sf_dir: str) -> dict:
    """(wall_sec, n_pairs) for dedup_embedding_lsh in this process."""
    from kafka_streams_repartition_spark.operators.dedup import (
        dedup_embedding_lsh,
    )
    from kafka_streams_repartition_spark.session import get_spark
    from kafka_streams_repartition_spark.sources.tables import load_tables

    spark = get_spark("emb-probe")
    t = load_tables(spark, sf_dir)
    t0 = time.perf_counter()
    n = dedup_embedding_lsh(t).count()
    return {"sec": round(time.perf_counter() - t0, 2), "n_pairs": n}


def main() -> None:
    scale = os.path.join(REPO, ".scale")
    out: dict = {"metric": "scale_ratio_sf10_over_sf1", "queries": {}}
    sf1 = run_bench(os.path.join(scale, "sf1"), "/tmp/btp_sf1.json")
    for mode in ("raw", "decor"):
        big = run_bench(
            os.path.join(scale, f"sf10_text_{mode}"),
            f"/tmp/btp_sf10_{mode}.json",
        )
        for q in TEXT_QUERIES:
            if q in sf1.get("queries", {}) and q in big.get("queries", {}):
                out["queries"].setdefault(q, {"sf1_sec": sf1["queries"][q]})
                out["queries"][q][f"sf10_{mode}_sec"] = big["queries"][q]
                out["queries"][q][f"ratio_{mode}"] = round(
                    big["queries"][q] / sf1["queries"][q], 2
                )
        if "errors" in big:
            out.setdefault("errors", {})[mode] = big["errors"]

    if len(sys.argv) > 1 and sys.argv[1] == "--emb":
        # embedding pair growth: run each scale in a fresh subprocess
        emb = {}
        for label, d in (("sf0.1", "/root/testdata/sf0.1"),
                         ("sf1", os.path.join(scale, "sf1"))):
            r = subprocess.run(
                [sys.executable, "-c",
                 "import sys, json; sys.path.insert(0, %r); "
                 "from tools.bench_text_probe import emb_measure; "
                 "print(json.dumps(emb_measure(%r)))" % (REPO, d)],
                cwd=REPO, capture_output=True, text=True, check=True,
            )
            emb[label] = json.loads(r.stdout.strip().splitlines()[-1])
        emb["pair_growth"] = round(
            emb["sf1"]["n_pairs"] / emb["sf0.1"]["n_pairs"], 1
        )
        emb["wall_ratio"] = round(emb["sf1"]["sec"] / emb["sf0.1"]["sec"], 2)
        out["dedup_embedding_lsh"] = emb

    path = os.path.join(REPO, "BENCH_sf10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
