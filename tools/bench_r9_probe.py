#!/usr/bin/env python
"""10x scale probe for the round-9 additions and r9-touched queries:
bench each at sf0.1 and at .scale/sf1 (10x rows, TPC-H density
scaling) in fresh JVMs, one repeat each, and record sf1/sf0.1 wall
ratios against the same <=12 linearity bar BENCH_sf1.json uses.

Writes BENCH_sf1_r9.json.  Run from the repo root:

    python tools/bench_r9_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = [
    # r9 additions
    "ann_topk_ivfpq_residual",
    "ivfpq_residual_recall",
    "embdup_plane_tuning",
    # r9-touched: the capped ANN quartet + jaccard cap + unforced joins
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_pq",
    "dedup_ngram_jaccard",
    "crossmodal_clusters",
    "dedup_quality_aware",
    "corpus_curation",
    "filter_attribution",
]
RATIO_BAR = 12.0  # 10x rows: <=12 is "linear-ish" (same bar as BENCH_sf1)


def run_bench(sf_dir: str, out_path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
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


def main() -> None:
    small = run_bench(
        "/root/testdata/sf0.1", os.path.join(REPO, ".scale", "r9_sf01.json")
    )
    big = run_bench(
        os.path.join(REPO, ".scale", "sf1"),
        os.path.join(REPO, ".scale", "r9_sf1.json"),
    )
    ratios = {}
    for q in QUERIES:
        a, b = small["queries"].get(q), big["queries"].get(q)
        if a and b:
            ratios[q] = round(b / a, 2)
    out = {
        "metric": "sf1_over_sf01_ratio_r9",
        "ratio_bar": RATIO_BAR,
        "sf01_sec": {q: small["queries"].get(q) for q in QUERIES},
        "sf1_sec": {q: big["queries"].get(q) for q in QUERIES},
        "ratio": ratios,
        "over_bar": [q for q, r in ratios.items() if r > RATIO_BAR],
        "loadavg_sf1": big.get("loadavg_start"),
        "load_flag_sf1": big.get("load_flag"),
        "repeats": 1,
        "errors": {**small.get("errors", {}), **big.get("errors", {})},
    }
    path = os.path.join(REPO, "BENCH_sf1_r9.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
