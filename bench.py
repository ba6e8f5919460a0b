#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_runtime", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is fully materialized through the noop sink (forces every
column to compute — a bare count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

import __spark_entry__ as entrymod
from kafka_streams_repartition_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")

    # Warm the JVM + parquet footers once so timings measure the queries.
    entrymod.entry(spark).count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    verbose = os.environ.get("SPARK_GRAFT_BENCH_VERBOSE", "") == "1"
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        # Fault-isolated: one broken query records an error and moves on
        # instead of zeroing the whole artifact (round-2 failure mode:
        # the harness died at query 6 and emitted nothing).
        best = None
        try:
            for _ in range(repeats):  # report best-of-N: JIT/GC noise is ±20%
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        if verbose:
            print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeats": repeats,
    }
    if errors:
        out["errors"] = errors
    # Durable artifact: the round driver's stdout tail-capture truncated
    # BENCH_r03 to 75/109 timings ("parsed": null).  The file is the full
    # record; stdout stays a single compact JSON line.
    results_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_results.json")
    with open(results_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, separators=(",", ":")))
    # The round driver tail-captures ~2 KB of stdout (BENCH_r03 kept only
    # the last 75 of 109 timings, so the full line above truncates at the
    # FRONT and parses as null).  Close stdout with a compact line that
    # always fits the window: headline metric + pointer to the complete
    # per-query artifact written above.
    print(json.dumps({
        "metric": "total_runtime", "value": total, "unit": "sec",
        "sf": sf, "n_queries": len(timings), "n_errors": len(errors),
        "queries_in": "bench_results.json",
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
