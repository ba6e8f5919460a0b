#!/usr/bin/env python
"""Round-12 decade (100×) probes — median-of-3 everywhere, raw samples
committed (the r11 recording discipline).

Three families, each its own committed artifact:

1. BENCH_sf10_r12_retr.json — the r11 weak items CLOSED and measured:
   ann_topk_mrl / ann_topk_ivf / hard_negative_mining default legs
   under the corpus-DERIVED module-wide query cap
   (derived_ann_query_cap: clamp(12.8M // n, 64, 4096), no override —
   sf1 probe 20k vecs → cap 640, natural 200 queries bind; sf10 probe
   200k vecs → cap 64 binds, Q·N budgeted).  r11 read 18.8× (mrl) and
   22.63× (ivf) under the fixed cap; hard_negative_mining re-runs at
   repeats=3 (its r11 default leg carried one sample).  Capped-200
   legs recorded alongside, as before, as the fixed-query-list deploy
   config.
2. BENCH_sf10_r12_probes.json — decade evidence for the 5 r11 ops that
   shipped without a probed ratio (VERDICT r11 missing item 2):
   kcenter_coverage (post-memo: the selection loop is shared with
   kcenter_select and the histogram is one scan × k codegen dots),
   mrl_shortlist_recall (mm probe); dedup_containment,
   langid_confusion, tokenizer_fertility (text probe, one bench
   process per query so a slow leg cannot starve the others).
3. BENCH_sf10_r12_newops.json — this round's additions at 100×:
   mmr_rerank, cluster_purity, silhouette_simplified,
   embedding_clip_bounds (mm probe); ngram_coverage_curve,
   dedup_inflation, doc_length_profile (text probe).

Run from the repo root with NOTHING else on the machine (bench.py
measures external CPU and flags the artifact otherwise):

    python tools/bench_r12_decade.py [family ...]

Families: retr probes newops (default: all three).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_r11_decade import RATIO_BAR, errs, ratios, run_bench, write  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _merge(*runs: dict) -> dict:
    out: dict = {"queries": {}, "samples": {}, "errors": {},
                 "load_flag": [], "external_busy_cores": []}
    for r in runs:
        out["queries"].update(r.get("queries", {}))
        out["samples"].update(r.get("samples", {}))
        out["errors"].update(r.get("errors", {}))
        out["load_flag"].append(r.get("load_flag"))
        out["external_busy_cores"].append(r.get("external_busy_cores"))
    return out


def family_retr(sf1_dir: str, sf10_dir: str, scratch: str) -> None:
    qs = ["ann_topk_mrl", "ann_topk_ivf", "hard_negative_mining"]
    sf1 = run_bench(sf1_dir, qs, os.path.join(scratch, "r12r_sf1.json"))
    sf10 = run_bench(sf10_dir, qs, os.path.join(scratch, "r12r_sf10.json"))
    sf10c = run_bench(
        sf10_dir, qs, os.path.join(scratch, "r12r_sf10_cap.json"),
        {"ANN_QUERY_CAP": "200", "MRL_QUERY_CAP": "200"},
    )
    rd, rc = ratios(sf1, sf10), ratios(sf1, sf10c)
    write("BENCH_sf10_r12_retr.json", {
        "metric": "sf10_over_sf1_ratio_r12_derived_ann_cap",
        "scaling_model": "module-wide query cap DERIVES from corpus size "
                         "(clamp(12.8M // n, 64, 4096)): sf1 natural 200 "
                         "queries (cap 640 not binding), sf10 cap 64 — "
                         "per-leg Q*N budgeted, NO env override.  r11 "
                         "fixed-cap defaults read 18.8x/22.63x.",
        "ratio_bar": RATIO_BAR,
        "repeats": 3,
        "stat": "median",
        "sf1_sec": sf1.get("queries", {}),
        "sf10_sec": sf10.get("queries", {}),
        "sf10_capped_sec": sf10c.get("queries", {}),
        "ratio_default": rd,
        "ratio_capped_200": rc,
        "over_bar_default": [q for q, v in rd.items() if v > RATIO_BAR],
        "over_bar_capped": [q for q, v in rc.items() if v > RATIO_BAR],
        "samples_sf1": sf1.get("samples", {}),
        "samples_sf10": sf10.get("samples", {}),
        "samples_sf10_capped": sf10c.get("samples", {}),
        "load_flags": {"sf1": sf1.get("load_flag"),
                       "sf10": sf10.get("load_flag"),
                       "sf10_capped": sf10c.get("load_flag")},
        "external_busy_cores": {
            "sf1": sf1.get("external_busy_cores"),
            "sf10": sf10.get("external_busy_cores"),
            "sf10_capped": sf10c.get("external_busy_cores"),
        },
        "errors": errs(sf1=sf1, sf10=sf10, sf10_capped=sf10c),
    })


def _per_query(sf_dir: str, qs: list[str], scratch: str, tag: str) -> dict:
    runs = []
    for q in qs:
        runs.append(
            run_bench(sf_dir, [q], os.path.join(scratch, f"r12_{tag}_{q}.json"))
        )
    return _merge(*runs)


def family_probes(
    sf1_dir: str, sf10_dir: str, sf10_text: str, scratch: str
) -> None:
    mm = ["kcenter_coverage", "mrl_shortlist_recall"]
    tx = ["dedup_containment", "langid_confusion", "tokenizer_fertility"]
    sf1_mm = run_bench(sf1_dir, mm, os.path.join(scratch, "r12p_sf1_mm.json"))
    sf10_mm = run_bench(sf10_dir, mm, os.path.join(scratch, "r12p_sf10_mm.json"))
    sf1_tx = _per_query(sf1_dir, tx, scratch, "p_sf1")
    sf10_tx = _per_query(sf10_text, tx, scratch, "p_sf10")
    rd = {**ratios(sf1_mm, sf10_mm), **ratios(sf1_tx, sf10_tx)}
    write("BENCH_sf10_r12_probes.json", {
        "metric": "sf10_over_sf1_ratio_r12_previously_unprobed",
        "scaling_model": "mm: signed-rotation decor; text: token-suffix "
                         "decor.  kcenter_coverage measured post-memo "
                         "(shares the selection loop with kcenter_select "
                         "inside one bench process).",
        "ratio_bar": RATIO_BAR,
        "repeats": 3,
        "stat": "median",
        "sf1_sec": {**sf1_mm.get("queries", {}), **sf1_tx.get("queries", {})},
        "sf10_sec": {**sf10_mm.get("queries", {}), **sf10_tx.get("queries", {})},
        "ratio_default": rd,
        "over_bar_default": [q for q, v in rd.items() if v > RATIO_BAR],
        "samples": {
            "sf1_mm": sf1_mm.get("samples", {}),
            "sf10_mm": sf10_mm.get("samples", {}),
            "sf1_text": sf1_tx.get("samples", {}),
            "sf10_text": sf10_tx.get("samples", {}),
        },
        "load_flags": {
            "sf1_mm": sf1_mm.get("load_flag"),
            "sf10_mm": sf10_mm.get("load_flag"),
            "sf1_text": sf1_tx.get("load_flag"),
            "sf10_text": sf10_tx.get("load_flag"),
        },
        "external_busy_cores": {
            "sf1_mm": sf1_mm.get("external_busy_cores"),
            "sf10_mm": sf10_mm.get("external_busy_cores"),
            "sf1_text": sf1_tx.get("external_busy_cores"),
            "sf10_text": sf10_tx.get("external_busy_cores"),
        },
        "errors": errs(sf1_mm=sf1_mm, sf10_mm=sf10_mm,
                       sf1_text=sf1_tx, sf10_text=sf10_tx),
    })


def family_newops(
    sf1_dir: str, sf10_dir: str, sf10_text: str, scratch: str
) -> None:
    mm = [
        "mmr_rerank", "mmr_diversity_gain", "cluster_purity",
        "silhouette_simplified", "embedding_clip_bounds",
    ]
    tx = ["ngram_coverage_curve", "dedup_inflation", "doc_length_profile"]
    sf1_mm = run_bench(sf1_dir, mm, os.path.join(scratch, "r12n_sf1_mm.json"))
    sf10_mm = run_bench(sf10_dir, mm, os.path.join(scratch, "r12n_sf10_mm.json"))
    sf1_tx = run_bench(sf1_dir, tx, os.path.join(scratch, "r12n_sf1_tx.json"))
    sf10_tx = run_bench(sf10_text, tx, os.path.join(scratch, "r12n_sf10_tx.json"))
    rd = {**ratios(sf1_mm, sf10_mm), **ratios(sf1_tx, sf10_tx)}
    write("BENCH_sf10_r12_newops.json", {
        "metric": "sf10_over_sf1_ratio_r12_new_operators",
        "scaling_model": "mm: signed-rotation decor; text: token-suffix "
                         "decor.  mmr_rerank's corpus term is the budgeted "
                         "bounded-query shortlist scan; the greedy loop is "
                         "constant-size.  cluster_purity / silhouette ride "
                         "the Lloyd trainer (k broadcast map passes).",
        "ratio_bar": RATIO_BAR,
        "repeats": 3,
        "stat": "median",
        "sf1_sec": {**sf1_mm.get("queries", {}), **sf1_tx.get("queries", {})},
        "sf10_sec": {**sf10_mm.get("queries", {}), **sf10_tx.get("queries", {})},
        "ratio_default": rd,
        "over_bar_default": [q for q, v in rd.items() if v > RATIO_BAR],
        "samples": {
            "sf1_mm": sf1_mm.get("samples", {}),
            "sf10_mm": sf10_mm.get("samples", {}),
            "sf1_text": sf1_tx.get("samples", {}),
            "sf10_text": sf10_tx.get("samples", {}),
        },
        "load_flags": {
            "sf1_mm": sf1_mm.get("load_flag"),
            "sf10_mm": sf10_mm.get("load_flag"),
            "sf1_text": sf1_tx.get("load_flag"),
            "sf10_text": sf10_tx.get("load_flag"),
        },
        "external_busy_cores": {
            "sf1_mm": sf1_mm.get("external_busy_cores"),
            "sf10_mm": sf10_mm.get("external_busy_cores"),
            "sf1_text": sf1_tx.get("external_busy_cores"),
            "sf10_text": sf10_tx.get("external_busy_cores"),
        },
        "errors": errs(sf1_mm=sf1_mm, sf10_mm=sf10_mm,
                       sf1_text=sf1_tx, sf10_text=sf10_tx),
    })


def main() -> None:
    scratch = os.path.join(REPO, ".scale")
    sf1 = os.path.join(scratch, "sf1")
    sf10 = os.path.join(scratch, "sf10_mm_decor")
    sf10_text = os.path.join(scratch, "sf10_text_decor")
    fams = sys.argv[1:] or ["retr", "probes", "newops"]
    if "retr" in fams:
        family_retr(sf1, sf10, scratch)
    if "probes" in fams:
        family_probes(sf1, sf10, sf10_text, scratch)
    if "newops" in fams:
        family_newops(sf1, sf10, sf10_text, scratch)


if __name__ == "__main__":
    main()
