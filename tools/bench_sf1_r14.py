#!/usr/bin/env python
"""Round-14 sf1 close-out: the 18 most expensive / this-round-touched
queries at sf1 (the 10× key-offset probe), run at BOTH 32 and 8 cores
(fresh bench process each, SPARK_GRAFT_CPUS honored by bench.py via
get_spark) — VERDICT r13 item 9: at sf0.1 the suite is driver/plan
bound (8 cores beat 32); sf1 is the test that the operators actually
parallelize once data dominates.  Also records each query's sf1/sf0.1
ratio against the round's committed baseline sweep.

    python tools/bench_sf1_r14.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_r11_decade import run_bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QS = [
    "crossmodal_clusters", "ivfpq_design_table", "ivfpq_residual_recall",
    "ann_topk_ivfpq_residual", "quality_logreg", "dedup_embedding_lsh",
    "semantic_pipeline", "mrl_recall_curve", "repeated_ngram_scan",
    "repeated_ngram_summary", "table_profile_approx", "embdup_plane_tuning",
    "dedup_stacked", "kmeans_cells", "sq_recall", "pricing_summary",
    "ngram_coverage_curve", "domain_entropy",
]


def main() -> None:
    scratch = os.path.join(REPO, ".scale")
    sf1_dir = os.path.join(scratch, "sf1")
    runs = {}
    for cpus in ("32", "8"):
        runs[cpus] = run_bench(
            sf1_dir, QS, os.path.join(scratch, f"r14_sf1_c{cpus}.json"),
            extra_env={"SPARK_GRAFT_CPUS": cpus,
                       "SPARK_GRAFT_BENCH_REPEATS": "2"},
        )
    base = json.load(open(os.path.join(scratch, "r14",
                                       "bench_before_head.json")))
    sf01 = base.get("queries", {})
    q32 = runs["32"].get("queries", {})
    ratio = {q: round(q32[q] / sf01[q], 2)
             for q in q32 if sf01.get(q)}
    out = {
        "metric": "sf1_closeout_r14_32_vs_8_cores",
        "queries": QS,
        "repeats": 2,
        "stat": "median",
        "sf1_sec_c32": q32,
        "sf1_sec_c8": runs["8"].get("queries", {}),
        "total_c32": round(sum(q32.values()), 2),
        "total_c8": round(sum(runs["8"].get("queries", {}).values()), 2),
        "sf1_over_sf01_ratio_c32": ratio,
        "over_30x": [q for q, v in ratio.items() if v > 30],
        "samples_c32": runs["32"].get("samples", {}),
        "samples_c8": runs["8"].get("samples", {}),
        "load_flags": {c: r.get("load_flag") for c, r in runs.items()},
        "external_busy_cores": {
            c: r.get("external_busy_cores") for c, r in runs.items()
        },
        "errors": {c: r.get("errors", {}) for c, r in runs.items()},
    }
    with open(os.path.join(REPO, "BENCH_sf1_r14.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "total_c32": out["total_c32"], "total_c8": out["total_c8"],
        "over_30x": out["over_30x"],
    }))


if __name__ == "__main__":
    main()
