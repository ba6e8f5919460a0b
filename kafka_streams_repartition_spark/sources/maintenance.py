"""Table maintenance: small-file compaction.

The small-file problem is the dominant operational failure of long-
running file-based pipelines (every streaming micro-batch and every
over-parallel write leaves files far below the ideal scan unit; at
100 TB a listing of millions of tiny files costs more than the scan).
``compact_small_files`` rewrites a parquet directory into
target-sized files — the OPTIMIZE/rewrite-data-files operation table
formats ship, expressed on plain parquet.

Scale notes: the rewrite is one ``repartition(n)`` job — a full
shuffle of the table, the unavoidable price of re-binpacking; run it
partition-by-partition on date-partitioned layouts.  The swap is
write-to-temp + directory rename, so a crashed compaction leaves the
original table intact (rename is atomic per POSIX dir move locally;
on object stores use the table format's commit protocol instead).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def compact_small_files(
    spark: SparkSession, path: str, target_file_mb: int = 128,
    keep_backup: bool = False,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(bytes / target_file_mb)`` files.  Returns a report dict
    (files/bytes before and after, rows preserved) for the caller's
    audit log.

    Crash safety: the swap is two plain renames (``path`` -> ``.compact_old``,
    ``.compact_tmp`` -> ``path``), NOT atomic — a crash between them leaves
    NO table at ``path`` until an operator restores ``.compact_old`` by
    hand, and concurrent readers error during the window.  Data is never
    lost (it survives at ``.compact_old`` / ``.compact_tmp``), but
    availability is.  With ``keep_backup=True`` the ``.compact_old`` copy
    is retained after a successful swap for manual rollback; by default
    it is deleted to reclaim space."""
    before_files = _data_files(path)
    before_bytes = _dir_bytes(path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_target = max(1, math.ceil(before_bytes / (target_file_mb * 1024 * 1024)))

    tmp = path.rstrip("/") + ".compact_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.repartition(n_target).write.mode("overwrite").parquet(tmp)

    backup = path.rstrip("/") + ".compact_old"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(path, backup)
    os.rename(tmp, path)
    if not keep_backup:
        shutil.rmtree(backup)

    after = _data_files(path)
    return {
        "files_before": len(before_files),
        "files_after": len(after),
        "bytes_before": before_bytes,
        "bytes_after": _dir_bytes(path),
        "rows": n_rows,
    }
