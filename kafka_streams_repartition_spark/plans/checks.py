"""Physical-plan inspection utilities.

The scale contract of this repo is enforced in tests, not prose: a
query that claims "broadcast the dimension" or "the filter reaches the
scan" asserts it against ``explain`` output, so a regression that adds
a shuffle or drops pushdown fails CI — the local stand-in for a plan
review on a 1000-executor cluster.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = explain_str(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, saw {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def _scan_blocks(plan: str) -> list[str]:
    """Split formatted-explain output into per-operator detail blocks."""
    return plan.split("\n\n")


def count_scans(df: DataFrame) -> int:
    return explain_str(df).count("Location: InMemoryFileIndex")


def count_scans_of(df: DataFrame, table_fragment: str) -> int:
    """Scans of one table, by its path fragment in the Location line —
    robust to explain-format drift that substring counts over the whole
    plan text ("Scan parquet" appears once per mention) are not."""
    plan = explain_str(df)
    return sum(
        1
        for block in _scan_blocks(plan)
        for line in block.splitlines()
        if "Location: InMemoryFileIndex" in line and table_fragment in line
    )


def assert_pushed_filters(df: DataFrame, table_fragment: str, fragment: str) -> None:
    """The named table's scan must push a filter containing ``fragment``."""
    plan = explain_str(df)
    for block in _scan_blocks(plan):
        if "Location:" in block and table_fragment in block:
            if any("PushedFilters" in ln and fragment in ln for ln in block.splitlines()):
                return
    raise AssertionError(
        f"no PushedFilters containing {fragment!r} on scan of {table_fragment}:\n{plan}"
    )


def assert_read_schema_pruned(
    df: DataFrame, table_fragment: str, forbidden_column: str
) -> None:
    """The scan of a table must NOT read a column the query never uses."""
    plan = explain_str(df)
    found = False
    for block in _scan_blocks(plan):
        if "Location:" in block and table_fragment in block:
            found = True
            for line in block.splitlines():
                if "ReadSchema" in line:
                    assert forbidden_column not in line, (
                        f"scan of {table_fragment} reads unused column "
                        f"{forbidden_column}:\n{line}"
                    )
    assert found, f"no scan of {table_fragment} found:\n{plan}"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    return explain_str(df).count("Exchange")


def count_key_exchanges(df: DataFrame) -> int:
    """Shuffles that repartition BY KEY (hash/range) — the expensive
    kind at scale. Round-robin fan-out exchanges (local parallelism for
    single-file scans) are excluded: on a real cluster the input arrives
    pre-split and they vanish."""
    plan = explain_str(df)
    return sum(
        ("hashpartitioning" in ln or "rangepartitioning" in ln)
        and "Arguments" in ln
        for ln in plan.splitlines()
    )
