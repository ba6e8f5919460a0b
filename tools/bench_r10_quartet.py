#!/usr/bin/env python
"""Decade (100x) re-probe of ``ann_topk_pq`` after the round-10 ADC
rewrite (VERDICT r9 item 2): the old plan shuffled N·Q·M
per-(query, cand, subspace) rows into a re-aggregation — its default
sf10 leg DIED under the r9 probe's wall cap and its capped leg read
11.84x (vs ivf's 4.2).  The rewrite scores by broadcast per-query
distance-map lookups inside whole-stage codegen (nothing pair-grained
ever exchanges), so this probe records the honest default leg to
completion plus the capped leg:

- default config: the %-subset query count grows 10x between the legs
  (200 -> 2000 queries, under ANN_QUERY_CAP=4096), so query-count x
  corpus work grows ~100x — measured honestly, the cap is the knob;
- ANN_QUERY_CAP=200 leg: pins the query count at sf1's natural size,
  isolating per-query scaling.

``ann_topk_ivf`` rides along as the same-family reference point.
Writes BENCH_sf10_r10_quartet.json.  Run from the repo root:

    python tools/bench_r10_quartet.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["ann_topk_pq", "ann_topk_ivf"]
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
    except subprocess.CalledProcessError as exc:
        return {"queries": {}, "errors": {q: f"exit {exc.returncode}" for q in QUERIES}}
    with open(out_path) as fh:
        return json.load(fh)


def main() -> None:
    sf1_dir = os.path.join(REPO, ".scale", "sf1")
    sf10_dir = os.path.join(REPO, ".scale", "sf10_mm_decor")
    scratch = os.path.join(REPO, ".scale")

    sf1 = run_bench(sf1_dir, os.path.join(scratch, "r10q_sf1.json"))
    sf10 = run_bench(sf10_dir, os.path.join(scratch, "r10q_sf10.json"))
    sf10_cap = run_bench(
        sf10_dir,
        os.path.join(scratch, "r10q_sf10_cap.json"),
        {"ANN_QUERY_CAP": "200"},
    )

    def ratios(big: dict) -> dict:
        out = {}
        for q, b in big.get("queries", {}).items():
            a = sf1.get("queries", {}).get(q)
            if a and b:
                out[q] = round(b / a, 2)
        return out

    r_default = ratios(sf10)
    r_capped = ratios(sf10_cap)
    out = {
        "metric": "sf10_over_sf1_ratio_r10_pq_adc_rewrite",
        "ratio_bar": RATIO_BAR,
        "sf1_sec": sf1.get("queries", {}),
        "sf10_sec": sf10.get("queries", {}),
        "sf10_capped_sec": sf10_cap.get("queries", {}),
        "ratio_default": r_default,
        "ratio_capped_200": r_capped,
        "over_bar_default": [q for q, r in r_default.items() if r > RATIO_BAR],
        "over_bar_capped": [q for q, r in r_capped.items() if r > RATIO_BAR],
        "loadavg_sf10": sf10.get("loadavg_start"),
        "load_flag_sf10": sf10.get("load_flag"),
        "repeats": 1,
        "errors": {
            **{f"sf1:{k}": v for k, v in sf1.get("errors", {}).items()},
            **{f"sf10:{k}": v for k, v in sf10.get("errors", {}).items()},
            **{f"sf10_capped:{k}": v for k, v in sf10_cap.get("errors", {}).items()},
        },
    }
    path = os.path.join(REPO, "BENCH_sf10_r10_quartet.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
