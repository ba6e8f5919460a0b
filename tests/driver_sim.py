"""Simulate the external driver: a vanilla SparkSession the repo did not
configure, running every ``queries()`` entry against its DuckDB oracle.

Run as a script (the test launches it in a subprocess so the bare session
cannot reuse an already-configured JVM via ``getOrCreate``):

    python tests/driver_sim.py [sf_dir]

Exits 0 iff every query matches its oracle (rows-only for entries without
one).  Round 1 was zeroed by a session-conf dependency in the loader that
only a test like this catches — ``tests/conftest.py`` uses the repo's
``get_spark()`` and hid it.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle import assert_parity  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only=") :].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    # Deliberately NO repo confs: this is the driver's session, not ours.
    # (master/ui/log-level are harness ergonomics, not read semantics.)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, str] = {}
    failed = 0
    for name in sorted(queries):
        if only is not None and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = df.count()
                assert n >= 0
                results[name] = f"rows-only ok ({n})"
            else:
                assert_parity(df, sql, sf_dir)
                results[name] = "ok"
        except Exception:
            failed += 1
            results[name] = "FAIL: " + traceback.format_exc(limit=3)

    # entry() smoke, same bare session (skipped under --only)
    if only is not None:
        print(json.dumps({"failed": failed, "results": results}, indent=1))
        return 1 if failed else 0
    try:
        n = entrymod.entry(spark).count()
        results["__entry__"] = f"ok ({n} rows)" if n > 0 else "FAIL: 0 rows"
        failed += 0 if n > 0 else 1
    except Exception:
        failed += 1
        results["__entry__"] = "FAIL: " + traceback.format_exc(limit=3)

    print(json.dumps({"failed": failed, "results": results}, indent=1))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
