"""Continuously-maintained snapshot: a CDC changelog stream folded into
a parquet table (the incremental materialized view / Delta-`MERGE INTO`
loop, and the streaming face of ``operators.relational.cdc_apply``).

Layout: ``root/version=<batch_id>/`` parquet per applied batch, plus a
``_CURRENT`` pointer file whose CONTENT names the committed version.
The pointer is written tmp-then-rename — the single atomic commit
point (same discipline as ``streaming/eos.py``):

- crash mid-write → ``_CURRENT`` still names the old version; readers
  never see a torn table; the replayed batch overwrites the orphan dir.
- crash post-rename → the replayed batch sees ``_CURRENT`` already at
  (or past) its batch id and SKIPS — apply-exactly-once without a
  separate ledger.

Correctness rests on ``apply_changelog``'s incremental identity
(``apply(apply(S, D1), D2) == apply(S, D1 ∪ D2)`` for seq-ordered batch
cuts), proven in ``tests/test_streaming.py`` by comparing the drained
stream's final snapshot against the one-shot batch merge.

Scale: each micro-batch costs one delta latest-per-key aggregate + one
co-keyed full-outer join against the current snapshot, and rewrites the
snapshot.  Rewriting is the plain-parquet cost of this pattern — on a
real lakehouse the same loop targets a format with row-level merge
(Delta/Iceberg) and only the join changes owner.  Old versions are
retained for rollback/time-travel; prune with ``prune_versions``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.relational import apply_changelog

_POINTER = "_CURRENT"
_RUN = "_RUN_ID"


def _checkpoint_query_id(checkpoint_dir: str) -> str | None:
    """The streaming query id Spark persists in ``<ckpt>/metadata`` —
    stable across restarts on the SAME checkpoint, fresh when the
    checkpoint is recreated.  That makes it the run identity that ties
    a snapshot to the checkpoint whose batch ids it has applied."""
    import json

    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as fh:
            return json.load(fh).get("id")
    except (FileNotFoundError, ValueError):
        return None


def snapshot_version(root: str) -> int | None:
    """Committed version id, or None if no snapshot exists yet."""
    try:
        with open(os.path.join(root, _POINTER)) as fh:
            return int(fh.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """The committed snapshot (key, value), or None before any commit."""
    v = snapshot_version(root)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(root, f"version={v}"))


def prune_versions(root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` version dirs (never the
    committed one); returns the pruned ids."""
    current = snapshot_version(root)
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("version=")
    )
    victims = [v for v in versions[:-keep] if v != current]
    for v in victims:
        shutil.rmtree(os.path.join(root, f"version={v}"))
    return victims


def maintain_snapshot(
    spark: SparkSession,
    delta_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    key: str = "key",
) -> None:
    """Drain ``delta_stream`` (columns: key, seq, op, value) with
    availableNow, folding each micro-batch into the snapshot at
    ``root`` via :func:`apply_changelog`.  See module doc for the
    commit/replay contract."""
    os.makedirs(root, exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # Replay-skip is only sound if these batch ids come from the SAME
        # checkpoint lineage the snapshot was built from: a lost/recreated
        # checkpoint restarts batch ids at 0, and silently skipping those
        # would freeze the snapshot forever.  The query id recorded beside
        # _CURRENT is that lineage; mismatch fails LOUDLY.
        qid = _checkpoint_query_id(checkpoint_dir)
        run_path = os.path.join(root, _RUN)
        stored = None
        try:
            with open(run_path) as fh:
                stored = fh.read().strip() or None
        except FileNotFoundError:
            pass
        current = snapshot_version(root)
        if current is not None and stored is not None and qid != stored:
            raise RuntimeError(
                f"snapshot at {root} was built by streaming query {stored} "
                f"but this checkpoint ({checkpoint_dir}) is query {qid}: "
                "its batch ids do not line up with the applied versions. "
                "checkpoint_dir and snapshot root must live and die as a "
                "pair — restore the original checkpoint, or start a fresh "
                "snapshot root for the new checkpoint."
            )
        if (stored is None or current is None) and qid is not None:
            # adopt this checkpoint's identity: first fold ever, or a
            # root with no committed version yet (nothing to protect)
            tmp = os.path.join(root, f".{_RUN}.tmp")
            with open(tmp, "w") as fh:
                fh.write(qid)
            os.rename(tmp, run_path)
        if current is not None and current >= batch_id:
            return  # replayed batch already committed — skip whole
        prev = read_snapshot(spark, root)
        if prev is None:
            prev = spark.createDataFrame(
                [], batch_df.select(key, "value").schema
            )
        new = apply_changelog(prev, batch_df, key=key).select(key, "value")
        out = os.path.join(root, f"version={batch_id}")
        new.write.mode("overwrite").parquet(out)
        tmp = os.path.join(root, f".{_POINTER}.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.rename(tmp, os.path.join(root, _POINTER))  # atomic commit

    q = (
        delta_stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
