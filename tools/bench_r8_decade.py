#!/usr/bin/env python
"""sf10 decade probe for the round-8 TEXT-side operators: bench each
at .scale/sf1 (10x sf0.1) and at .scale/sf10_text_decor (100x sf0.1,
density-constant scaling — per-copy token suffixes keep cross-copy
Jaccard at 0, so a healthy collision-driven plan should curve
~linearly), one repeat each in fresh JVMs, and record sf10/sf1 wall
ratios against the same <=12 bar the 10x probes use.

The raw (adversarial, pair-compounding) model was characterized for
the shared MinHash pair builder in BENCH_sf10.json (round 7); the new
operators reuse that builder, so this probe answers the remaining
question — their OWN stages' linearity.

Writes BENCH_sf10_r8.json.  Run from the repo root:

    python tools/bench_r8_decade.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = [
    "dedup_quality_aware",
    "leakage_split",
    "minhash_band_tuning",
    "filter_attribution",
    "token_yield",
]
RATIO_BAR = 12.0  # 10x rows between the two legs


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
    sf1 = run_bench(
        os.path.join(REPO, ".scale", "sf1"),
        os.path.join(REPO, ".scale", "r8dec_sf1.json"),
    )
    sf10 = run_bench(
        os.path.join(REPO, ".scale", "sf10_text_decor"),
        os.path.join(REPO, ".scale", "r8dec_sf10.json"),
    )
    ratios = {}
    for q in QUERIES:
        a, b = sf1["queries"].get(q), sf10["queries"].get(q)
        if a and b:
            ratios[q] = round(b / a, 2)
    out = {
        "metric": "sf10_over_sf1_ratio_r8_text_decade",
        "scaling_model": "decor (density-constant, per-copy token suffix)",
        "ratio_bar": RATIO_BAR,
        "sf1_sec": {q: sf1["queries"].get(q) for q in QUERIES},
        "sf10_sec": {q: sf10["queries"].get(q) for q in QUERIES},
        "ratio": ratios,
        "over_bar": [q for q, r in ratios.items() if r > RATIO_BAR],
        "loadavg_sf10": sf10.get("loadavg_start"),
        "load_flag_sf10": sf10.get("load_flag"),
        "repeats": 1,
        "errors": {**sf1.get("errors", {}), **sf10.get("errors", {})},
    }
    path = os.path.join(REPO, "BENCH_sf10_r8.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
