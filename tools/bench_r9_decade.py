#!/usr/bin/env python
"""sf10 decade probe for the EMBEDDING-side operators (VERDICT r8 item
6): the text decor corpus cannot probe them (verbatim-copied vectors
make every cross-copy cosine 1.0), so this uses
``.scale/sf10_mm_decor`` — per-copy SIGNED-ROTATION decor
(``tools/make_mm_probe.py``): within-copy cosine structure preserved
exactly, cross-copy cosines collapse to ~N(0, 1/64) noise.

Legs (fresh JVM each, one repeat):

- ``sf1``   (10x)  — all probed queries, default config.
- ``sf10``  (100x) — default config.  Two KNOWN scale effects are being
  measured honestly here, each with its mitigation leg:
  * the ANN query subset (% QUERY_MOD) grows with the corpus until
    ANN_QUERY_CAP binds, so query-count × corpus work grows ~100x
    between the legs → the ``sf10_capped`` leg pins ANN_QUERY_CAP=200
    (sf1's natural query count), isolating PER-QUERY scaling;
  * 4-plane banding admits a quadratic tail of cross-item noise pairs
    at 100x (cos 0.3 is only 72°) → the ``sf10_planes8`` leg runs
    ``crossmodal_clusters`` with EMBDUP_BAND_PLANES=8, the
    log(corpus)-scaled deploy knob.

Writes BENCH_sf10_r9.json.  Run from the repo root:

    python tools/bench_r9_decade.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANN_QUERIES = ["ann_topk_ivfpq", "ann_topk_ivfpq_residual", "jl_project"]
CM_QUERIES = ["crossmodal_clusters"]
RATIO_BAR = 12.0  # 10x rows between the two legs
TIMEOUT = 2400  # per-leg wall cap: a leg that can't finish is the finding


def run_bench(
    sf_dir: str, out_path: str, queries: list[str], extra_env: dict | None = None
) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(queries),
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
        return {"queries": {}, "errors": {q: f"timeout>{TIMEOUT}s" for q in queries}}
    with open(out_path) as fh:
        return json.load(fh)


def main() -> None:
    sf1_dir = os.path.join(REPO, ".scale", "sf1")
    sf10_dir = os.path.join(REPO, ".scale", "sf10_mm_decor")
    scratch = os.path.join(REPO, ".scale")

    sf1 = run_bench(
        sf1_dir, os.path.join(scratch, "r9dec_sf1.json"),
        ANN_QUERIES + CM_QUERIES,
    )
    sf10 = run_bench(
        sf10_dir, os.path.join(scratch, "r9dec_sf10.json"),
        ANN_QUERIES + CM_QUERIES,
    )
    sf10_capped = run_bench(
        sf10_dir, os.path.join(scratch, "r9dec_sf10_cap.json"),
        ANN_QUERIES, {"ANN_QUERY_CAP": "200"},
    )
    sf10_planes8 = run_bench(
        sf10_dir, os.path.join(scratch, "r9dec_sf10_p8.json"),
        CM_QUERIES, {"EMBDUP_BAND_PLANES": "8"},
    )

    def ratios(big: dict) -> dict:
        out = {}
        for q, b in big.get("queries", {}).items():
            a = sf1["queries"].get(q)
            if a and b:
                out[q] = round(b / a, 2)
        return out

    r_default = ratios(sf10)
    r_capped = ratios(sf10_capped)
    r_planes8 = ratios(sf10_planes8)
    out = {
        "metric": "sf10_over_sf1_ratio_r9_embedding_decade",
        "scaling_model": (
            "signed-rotation decor (within-copy cosines exact, cross-copy"
            " ~N(0,1/64); residual cross-copy |cos|>=0.3 rate ~1.4%)"
        ),
        "ratio_bar": RATIO_BAR,
        "sf1_sec": sf1.get("queries", {}),
        "sf10_sec": sf10.get("queries", {}),
        "sf10_capped_sec": sf10_capped.get("queries", {}),
        "sf10_planes8_sec": sf10_planes8.get("queries", {}),
        "ratio_default": r_default,
        "ratio_capped_200": r_capped,
        "ratio_planes8": r_planes8,
        "over_bar_default": [q for q, r in r_default.items() if r > RATIO_BAR],
        "over_bar_mitigated": sorted(
            [q for q, r in r_capped.items() if r > RATIO_BAR]
            + [q for q, r in r_planes8.items() if r > RATIO_BAR]
        ),
        "loadavg_sf10": sf10.get("loadavg_start"),
        "load_flag_sf10": sf10.get("load_flag"),
        "repeats": 1,
        "errors": {
            **sf1.get("errors", {}),
            **{f"sf10:{k}": v for k, v in sf10.get("errors", {}).items()},
            **{f"sf10_capped:{k}": v for k, v in sf10_capped.get("errors", {}).items()},
            **{f"sf10_planes8:{k}": v for k, v in sf10_planes8.get("errors", {}).items()},
        },
    }
    path = os.path.join(REPO, "BENCH_sf10_r9.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
