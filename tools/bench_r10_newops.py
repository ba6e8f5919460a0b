#!/usr/bin/env python
"""Decade (100x) probe for the round-10 continuation's NEW operators —
the "would this survive 100x" evidence recorded in the round they ship,
not deferred:

- text leg (``.scale/sf10_text_decor`` — per-copy token-suffix decor,
  density-constant): doremi_weights, rho_loss_select, zipf_fit,
  hamming_neighbors, hamming_threshold_curve.  The vocab grows ~C
  under decor (every token gains per-copy variants), so the LM-family
  rollups and the 64-vote code pass are measured against a growing
  vocabulary, the honest direction.
- embedding leg (``.scale/sf10_mm_decor`` — signed-rotation decor):
  mrl_recall_curve, ivf_cell_balance.

sf1 baselines come from ``.scale/sf1``.  One repeat, fresh JVM per
leg, 120 s settle between legs so load flags reflect external
contention.  Writes BENCH_sf10_r10_newops.json.  Run from repo root:

    python tools/bench_r10_newops.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEXT_QUERIES = [
    "doremi_weights",
    "rho_loss_select",
    "zipf_fit",
    "hamming_neighbors",
    "hamming_threshold_curve",
]
EMB_QUERIES = ["mrl_recall_curve", "ivf_cell_balance"]
RATIO_BAR = 12.0
TIMEOUT = 2400
SETTLE = 120


def run_bench(sf_dir: str, out_path: str, queries: list[str]) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ONLY=",".join(queries),
        SPARK_GRAFT_BENCH_OUT=out_path,
        SPARK_GRAFT_BENCH_REPEATS="1",
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
    except subprocess.CalledProcessError as exc:
        return {"queries": {}, "errors": {q: f"exit {exc.returncode}" for q in queries}}
    with open(out_path) as fh:
        return json.load(fh)


def main() -> None:
    scratch = os.path.join(REPO, ".scale")
    sf1_dir = os.path.join(scratch, "sf1")
    text_dir = os.path.join(scratch, "sf10_text_decor")
    mm_dir = os.path.join(scratch, "sf10_mm_decor")

    legs = {}
    legs["sf1_text"] = run_bench(
        sf1_dir, os.path.join(scratch, "r10n_sf1_text.json"), TEXT_QUERIES
    )
    time.sleep(SETTLE)
    legs["sf10_text"] = run_bench(
        text_dir, os.path.join(scratch, "r10n_sf10_text.json"), TEXT_QUERIES
    )
    time.sleep(SETTLE)
    legs["sf1_emb"] = run_bench(
        sf1_dir, os.path.join(scratch, "r10n_sf1_emb.json"), EMB_QUERIES
    )
    time.sleep(SETTLE)
    legs["sf10_emb"] = run_bench(
        mm_dir, os.path.join(scratch, "r10n_sf10_emb.json"), EMB_QUERIES
    )

    def ratios(big: dict, small: dict) -> dict:
        out = {}
        for q, b in big.get("queries", {}).items():
            a = small.get("queries", {}).get(q)
            if a and b:
                out[q] = round(b / a, 2)
        return out

    r_text = ratios(legs["sf10_text"], legs["sf1_text"])
    r_emb = ratios(legs["sf10_emb"], legs["sf1_emb"])
    over = [q for r in (r_text, r_emb) for q, v in r.items() if v > RATIO_BAR]
    errors = {}
    for leg in legs.values():
        errors.update(leg.get("errors", {}))
    out = {
        "metric": "sf10_over_sf1_ratio_r10_new_operators",
        "scaling_model": (
            "text: per-copy token-suffix decor (vocab grows ~C); "
            "embeddings: signed-rotation decor"
        ),
        "ratio_bar": RATIO_BAR,
        "sf1_sec": {
            **legs["sf1_text"].get("queries", {}),
            **legs["sf1_emb"].get("queries", {}),
        },
        "sf10_sec": {
            **legs["sf10_text"].get("queries", {}),
            **legs["sf10_emb"].get("queries", {}),
        },
        "ratio_default": {**r_text, **r_emb},
        "over_bar_default": over,
        "load_flags": {
            k: v.get("load_flag") for k, v in legs.items()
        },
        "repeats": 1,
        "errors": errors,
    }
    with open(os.path.join(REPO, "BENCH_sf10_r10_newops.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
