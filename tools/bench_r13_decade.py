#!/usr/bin/env python
"""Round-13 decade (100×) probes — median-of-3, raw samples committed.

One family, one artifact:

BENCH_sf10_r13_newops.json — this round's additions plus the one
re-probed rewrite, each query in its OWN bench process (text probe:
one slow leg cannot starve the others):

- domain_entropy (r13): per-source unigram entropy — one (source,
  term) rollup exchange, per-source totals broadcast.
- repeated_ngram_scan (r13): intra-corpus repeated 13-gram audit —
  hash-keyed rollup + verdict join, text never shuffles.
- ngram_coverage_curve (REWRITE re-probe): r12's committed leg read
  8.11× — the thinnest margin of any committed leg (VERDICT r12 item
  5).  The rewrite computes total mass from per-doc arithmetic and
  collapses the two-level groupBy, cutting four full gram-table
  exchanges to one.

Both legs run on the TEXT decor probes (token-suffix decoration —
gram tables grow adversarially, the worst case for all three).

Run from the repo root with NOTHING else on the machine (bench.py
measures external CPU and flags the artifact otherwise):

    python tools/bench_r13_decade.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_r11_decade import RATIO_BAR, errs, ratios, run_bench, write  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QS = ["domain_entropy", "repeated_ngram_scan", "ngram_coverage_curve"]


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
        run_bench(sf_dir, [q], os.path.join(scratch, f"r13_{tag}_{q}.json"))
        for q in qs
    ])


def main() -> None:
    scratch = os.path.join(REPO, ".scale")
    sf1_dir = os.path.join(scratch, "sf1")
    sf10_text = os.path.join(scratch, "sf10_text_decor")
    sf1 = _per_query(sf1_dir, QS, scratch, "n_sf1")
    sf10 = _per_query(sf10_text, QS, scratch, "n_sf10")
    rd = ratios(sf1, sf10)
    write("BENCH_sf10_r13_newops.json", {
        "metric": "sf10_over_sf1_ratio_r13_newops",
        "scaling_model": "text probes (token-suffix decor, adversarial "
                         "gram growth); one bench process per query; "
                         "ngram_coverage_curve re-probed post-rewrite "
                         "(r12 committed leg: 8.11x).",
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


if __name__ == "__main__":
    main()
