#!/usr/bin/env python
"""Decade (100x) probe for the ORIGINAL ANN quartet — the four ops the
round-9 cap backport touched (`ann_topk_bruteforce/lsh/ivf/pq`) get the
same sf1 vs sf10_mm_decor treatment as the composed indexes in
``tools/bench_r9_decade.py``:

- default config: the %-subset query count grows 10x between the legs
  (200 -> 2000 queries, still under ANN_QUERY_CAP=4096), so
  query-count x corpus work grows ~100x — measured honestly;
- ANN_QUERY_CAP=200 leg: pins the query count at sf1's natural size,
  isolating per-query scaling, which a healthy capped plan should hold
  ~linear.

Writes BENCH_sf10_r9_quartet.json.  Run from the repo root:

    python tools/bench_r9_quartet.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq"]
RATIO_BAR = 12.0
TIMEOUT = 2400


def run_bench(sf_dir: str, out_path: str, extra_env: dict | None = None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
        SPARK_GRAFT_BENCH_OUT=out_path,
        SPARK_GRAFT_BENCH_REPEATS="1",
        **(extra_env or {}),
    )
    try:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO,
            env=env,
            check=True,
            stdout=subprocess.DEVNULL,
            timeout=TIMEOUT,
        )
    except subprocess.TimeoutExpired:
        return {"queries": {}, "errors": {q: f"timeout>{TIMEOUT}s" for q in QUERIES}}
    with open(out_path) as fh:
        return json.load(fh)


def main() -> None:
    sf1_dir = os.path.join(REPO, ".scale", "sf1")
    sf10_dir = os.path.join(REPO, ".scale", "sf10_mm_decor")
    scratch = os.path.join(REPO, ".scale")

    sf1 = run_bench(sf1_dir, os.path.join(scratch, "r9q_sf1.json"))
    sf10 = run_bench(sf10_dir, os.path.join(scratch, "r9q_sf10.json"))
    sf10_cap = run_bench(
        sf10_dir, os.path.join(scratch, "r9q_sf10_cap.json"),
        {"ANN_QUERY_CAP": "200"},
    )

    def ratios(big: dict) -> dict:
        return {
            q: round(b / sf1["queries"][q], 2)
            for q, b in big.get("queries", {}).items()
            if sf1["queries"].get(q)
        }

    r_def, r_cap = ratios(sf10), ratios(sf10_cap)
    out = {
        "metric": "sf10_over_sf1_ratio_r9_ann_quartet",
        "scaling_model": "signed-rotation decor (see BENCH_sf10_r9.json)",
        "ratio_bar": RATIO_BAR,
        "sf1_sec": sf1.get("queries", {}),
        "sf10_sec": sf10.get("queries", {}),
        "sf10_capped_sec": sf10_cap.get("queries", {}),
        "ratio_default": r_def,
        "ratio_capped_200": r_cap,
        "over_bar_default": [q for q, r in r_def.items() if r > RATIO_BAR],
        "over_bar_capped": [q for q, r in r_cap.items() if r > RATIO_BAR],
        "loadavg_sf10": sf10.get("loadavg_start"),
        "load_flag_sf10": sf10.get("load_flag"),
        "repeats": 1,
        "errors": {
            **sf1.get("errors", {}),
            **{f"sf10:{k}": v for k, v in sf10.get("errors", {}).items()},
            **{f"sf10_capped:{k}": v for k, v in sf10_cap.get("errors", {}).items()},
        },
    }
    path = os.path.join(REPO, "BENCH_sf10_r9_quartet.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
