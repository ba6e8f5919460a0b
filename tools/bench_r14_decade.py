#!/usr/bin/env python
"""Round-14 decade (10×) probes — median-of-3, raw samples committed.

Two artifacts:

BENCH_sf10_r14_newops.json — the text family the r13 verdict's
done-criteria cover (items 5/6/7, carried to r14 item 6):

- domain_entropy (r13 op, first decade leg): per-source unigram
  entropy — one (source, term) rollup exchange.
- repeated_ngram_scan (r13 op, REWRITTEN r14: shared cached
  (doc, gh) frame + fused per-doc aggregation).
- repeated_ngram_summary (r13 op, rides the same shared frame).
- ngram_coverage_curve (r12 rewrite re-probe: the committed r12 leg
  read 8.11× — the thinnest margin; the single-exchange rewrite has
  never had a committed decade leg).

Text legs run on the TEXT decor probes (token-suffix decoration —
gram tables grow adversarially, the worst case for all four).

BENCH_sf10_r14_resid.json — one residual-family query
(ivfpq_residual_recall) post-`_rpq_sdist`-unroll, on the embeddings
probes (.scale/sf1 → .scale/sf10_emb; build the latter with
tools/make_emb_probe.py first).

Run from the repo root with NOTHING else on the machine (bench.py
measures external CPU and flags the artifact otherwise):

    python tools/bench_r14_decade.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_r11_decade import RATIO_BAR, errs, ratios, run_bench, write  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEXT_QS = [
    "domain_entropy",
    "repeated_ngram_scan",
    "repeated_ngram_summary",
    "ngram_coverage_curve",
]
RESID_QS = ["ivfpq_residual_recall"]


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


def _per_query(sf_dir: str, qs: list[str], scratch: str, tag: str) -> dict:
    return _merge(*[
        run_bench(sf_dir, [q], os.path.join(scratch, f"r14_{tag}_{q}.json"))
        for q in qs
    ])


def main() -> None:
    scratch = os.path.join(REPO, ".scale")
    sf1_dir = os.path.join(scratch, "sf1")
    sf10_text = os.path.join(scratch, "sf10_text_decor")
    sf10_emb = os.path.join(scratch, "sf10_emb")

    sf1 = _per_query(sf1_dir, TEXT_QS, scratch, "n_sf1")
    sf10 = _per_query(sf10_text, TEXT_QS, scratch, "n_sf10")
    rd = ratios(sf1, sf10)
    write("BENCH_sf10_r14_newops.json", {
        "metric": "sf10_over_sf1_ratio_r14_newops",
        "scaling_model": "text probes (token-suffix decor, adversarial "
                         "gram growth); one bench process per query; "
                         "repeated_ngram pair re-probed post-r14 shared-"
                         "frame rewrite; ngram_coverage_curve re-probed "
                         "post-r13 single-exchange rewrite (r12 committed "
                         "leg: 8.11x).",
        "ratio_bar": RATIO_BAR,
        "repeats": 3,
        "stat": "median",
        "sf1_sec": sf1.get("queries", {}),
        "sf10_sec": sf10.get("queries", {}),
        "ratio_default": rd,
        "over_bar_default": [q for q, v in rd.items() if v > RATIO_BAR],
        "samples_sf1": sf1.get("samples", {}),
        "samples_sf10": sf10.get("samples", {}),
        "load_flags": {"sf1": sf1.get("load_flag"),
                       "sf10": sf10.get("load_flag")},
        "external_busy_cores": {
            "sf1": sf1.get("external_busy_cores"),
            "sf10": sf10.get("external_busy_cores"),
        },
        "errors": errs(sf1=sf1, sf10=sf10),
    })

    r1 = _per_query(sf1_dir, RESID_QS, scratch, "r_sf1")
    r10 = _per_query(sf10_emb, RESID_QS, scratch, "r_sf10")
    rr = ratios(r1, r10)
    write("BENCH_sf10_r14_resid.json", {
        "metric": "sf10_over_sf1_ratio_r14_residual",
        "scaling_model": "embeddings probe (vec_id key-offset copies; "
                         "query cap derives from corpus size, so the "
                         "Q*N budget — not the raw subset — bounds each "
                         "leg); residual ADC path post-_rpq_sdist unroll "
                         "(r13) + probe-superset sharing.",
        "ratio_bar": RATIO_BAR,
        "repeats": 3,
        "stat": "median",
        "sf1_sec": r1.get("queries", {}),
        "sf10_sec": r10.get("queries", {}),
        "ratio_default": rr,
        "over_bar_default": [q for q, v in rr.items() if v > RATIO_BAR],
        "samples_sf1": r1.get("samples", {}),
        "samples_sf10": r10.get("samples", {}),
        "load_flags": {"sf1": r1.get("load_flag"),
                       "sf10": r10.get("load_flag")},
        "external_busy_cores": {
            "sf1": r1.get("external_busy_cores"),
            "sf10": r10.get("external_busy_cores"),
        },
        "errors": errs(sf1=r1, sf10=r10),
    })


if __name__ == "__main__":
    main()
