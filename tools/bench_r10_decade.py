#!/usr/bin/env python
"""sf10 decade probe for DEFAULT-CONFIG crossmodal_clusters (VERDICT r9
item 1): round 9 measured the 4-plane default OOMing at 100× and the
8-plane override passing; round 10 derives planes from corpus size
(``dedup.derived_band_planes``: 20k vecs → 5 planes at sf1, 200k → 8 at
sf10), so the SAME default config must now complete both legs with NO
env override.

Corpus: ``.scale/sf10_mm_decor`` (signed-rotation decor — within-copy
cosine structure exact, cross-copy ~N(0, 1/64) noise; see
``tools/make_mm_probe.py``).  Fresh JVM per leg, one repeat.

Writes BENCH_sf10_r10.json.  Run from the repo root:

    python tools/bench_r10_decade.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = ["crossmodal_clusters", "dedup_embedding_lsh"]
RATIO_BAR = 12.0  # 10x rows between the two legs
TIMEOUT = 2400  # per-leg wall cap: a leg that can't finish is the finding


def run_bench(sf_dir: str, out_path: str, queries: list[str]) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(queries),
        SPARK_GRAFT_BENCH_OUT=out_path,
        SPARK_GRAFT_BENCH_REPEATS="1",
    )
    env.pop("EMBDUP_BAND_PLANES", None)  # the point: NO manual override
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
        return {"queries": {}, "errors": {q: f"timeout>{TIMEOUT}s" for q in queries}}
    except subprocess.CalledProcessError as exc:
        return {"queries": {}, "errors": {q: f"exit {exc.returncode}" for q in queries}}
    with open(out_path) as fh:
        return json.load(fh)


def main() -> None:
    sf1_dir = os.path.join(REPO, ".scale", "sf1")
    sf10_dir = os.path.join(REPO, ".scale", "sf10_mm_decor")
    scratch = os.path.join(REPO, ".scale")

    sf1 = run_bench(sf1_dir, os.path.join(scratch, "r10dec_sf1.json"), QUERIES)
    # let the sf1 leg's 1-min loadavg decay so the sf10 leg's load flag
    # reflects EXTERNAL contention, not our own back-to-back burst
    time.sleep(120)
    sf10 = run_bench(sf10_dir, os.path.join(scratch, "r10dec_sf10.json"), QUERIES)

    ratios = {}
    for q, b in sf10.get("queries", {}).items():
        a = sf1.get("queries", {}).get(q)
        if a and b:
            ratios[q] = round(b / a, 2)

    out = {
        "metric": "sf10_over_sf1_ratio_r10_default_banding",
        "scaling_model": (
            "signed-rotation decor; planes DERIVED per corpus size "
            "(sf1 20k vecs -> 5 planes, sf10 200k -> 8), no env override"
        ),
        "ratio_bar": RATIO_BAR,
        "sf1_sec": sf1.get("queries", {}),
        "sf10_sec": sf10.get("queries", {}),
        "ratio_default": ratios,
        "over_bar_default": [q for q, r in ratios.items() if r > RATIO_BAR],
        "loadavg_sf10": sf10.get("loadavg_start"),
        "load_flag_sf10": sf10.get("load_flag"),
        "repeats": 1,
        "errors": {
            **{f"sf1:{k}": v for k, v in sf1.get("errors", {}).items()},
            **{f"sf10:{k}": v for k, v in sf10.get("errors", {}).items()},
        },
    }
    path = os.path.join(REPO, "BENCH_sf10_r10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
