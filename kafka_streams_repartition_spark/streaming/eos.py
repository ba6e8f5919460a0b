"""Exactly-once-effect sinks for Structured Streaming (SURVEY §2.10).

The reference runs Kafka Streams EOS v2 — one broker transaction spans
the consume-process-produce cycle (``streams/.../Streams.java:46``
``EXACTLY_ONCE_V2``; ``publisher/.../Producer.java:110-127`` opens and
commits producer transactions).  Spark's built-in Kafka sink is
at-least-once: a micro-batch that fails after produce but before the
checkpoint commit is re-produced on restart.  This module closes that
gap the Spark-idiomatic way — **deterministic batch replay + idempotent
commit** — rather than imitating broker transactions:

1. Structured Streaming replays a failed micro-batch with the SAME
   ``batch_id`` and the SAME rows (offsets are fixed in the write-ahead
   log before processing starts).
2. Therefore any sink whose effect is (a) keyed by ``batch_id`` and
   (b) committed atomically is exactly-once end-to-end: a replayed
   batch either sees its own completed commit and skips, or redoes the
   whole effect from scratch.

Two deployable sinks:

- :func:`transactional_dir_sink` — files: stage to a hidden temp dir,
  ``rename`` to ``batch=<id>`` as the single commit point.  A crash at
  ANY point (mid-write, post-write-pre-rename, post-rename-pre-ack)
  yields no duplicate and no torn output on restart.  This is the same
  idea as Spark's own file-sink manifest, generalized to any directory
  layout.
- :func:`exactly_once_kafka_sink` — Kafka: per-batch produce prefixed
  by a ledger check.  A fully-committed batch is never re-produced
  (skip on replay); a partially-produced batch IS re-sent, so every
  record carries a deterministic idempotence key
  (:func:`with_idempotence_key`) that lets compacted topics or
  consumer-side dedup collapse the rare replay — "effectively once",
  the strongest guarantee available without broker transactions, which
  the Spark Kafka sink does not expose.

At 100 TB both sinks add ONE driver-side ledger probe per micro-batch
(no per-row overhead, no shuffle); the idempotence key is a map-side
column expression.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEDGER_DIR = "_eos_ledger"


def committed_batches(out_dir: str) -> set[int]:
    """Batch ids whose effects are fully committed at ``out_dir``."""
    ledger = os.path.join(out_dir, LEDGER_DIR)
    if not os.path.isdir(ledger):
        return set()
    return {int(f) for f in os.listdir(ledger) if f.isdigit()}


def _mark_committed(out_dir: str, batch_id: int) -> None:
    ledger = os.path.join(out_dir, LEDGER_DIR)
    os.makedirs(ledger, exist_ok=True)
    tmp = os.path.join(ledger, f".{batch_id}.tmp")
    with open(tmp, "w") as fh:
        fh.write("committed")
    os.rename(tmp, os.path.join(ledger, str(batch_id)))  # atomic on POSIX


def with_idempotence_key(batch_df: DataFrame, batch_id: int) -> DataFrame:
    """Add ``eos_key``: a deterministic per-record id, stable across
    replays of the same micro-batch.

    Prefers the source coordinates ``(topic, partition, offset)`` when
    the frame still carries Kafka lineage (they uniquely name the input
    record forever); otherwise falls back to
    ``sha1(batch_id || all columns)`` — deterministic because replay
    re-delivers identical rows.  Consumers dedup on ``eos_key`` (e.g. a
    compacted topic keyed by it), which collapses any replayed produce.
    """
    cols = set(batch_df.columns)
    if {"topic", "partition", "offset"} <= cols:
        key = F.concat_ws(
            "/", F.col("topic"), F.col("partition"), F.col("offset")
        )
    else:
        key = F.sha1(
            F.concat_ws(
                "\x1f",
                F.lit(str(batch_id)),
                *[F.col(c).cast("string") for c in sorted(cols)],
            )
        )
    return batch_df.withColumn("eos_key", key)


def transactional_dir_sink(
    out_dir: str, fmt: str = "parquet"
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink with exactly-once file effects.

    Protocol per micro-batch: (1) replayed-and-committed? skip;
    (2) write to ``.staging-<id>`` (crash here leaves only garbage that
    the next attempt overwrites); (3) ``rename`` staging →
    ``batch=<id>`` — the atomic commit point; (4) write the ledger
    marker (crash between 3 and 4 is healed by treating an existing
    batch dir as committed).  Readers see either none or all of a
    batch, never a torn write.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(out_dir, f"batch={batch_id}")
        if batch_id in committed_batches(out_dir) or os.path.isdir(final):
            if not os.path.isfile(
                os.path.join(out_dir, LEDGER_DIR, str(batch_id))
            ):
                _mark_committed(out_dir, batch_id)  # heal 3-before-4 crash
            return
        staging = os.path.join(out_dir, f".staging-{batch_id}")
        if os.path.isdir(staging):
            shutil.rmtree(staging)  # debris from a mid-write crash
        batch_df.write.mode("overwrite").format(fmt).save(staging)
        os.rename(staging, final)
        _mark_committed(out_dir, batch_id)

    return sink


def exactly_once_dir_query(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "append",
    available_now: bool = True,
):
    """Wire ``df`` to :func:`transactional_dir_sink` and start it."""
    writer = (
        df.writeStream.foreachBatch(transactional_dir_sink(out_dir))
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def exactly_once_kafka_sink(
    bootstrap: str,
    topic: str,
    key_col: str,
    ledger_dir: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink producing to Kafka with ledger-skip + per-record
    idempotence keys (carried as the Kafka header ``eos_key``).

    Guarantee ladder, honestly stated: fully-committed batches are never
    re-produced; a batch that crashed mid-produce is re-sent whole, and
    the stable ``eos_key`` header lets the consumer side (compacted
    topic keyed by it, or a seen-set) discard the duplicates — the
    reference gets the same end state via broker transactions
    (``Producer.java:110-127``), which Spark's sink cannot open.
    """
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batches(ledger_dir):
            return
        keyed = with_idempotence_key(batch_df, batch_id)
        payload = [c for c in batch_df.columns if c != key_col]
        records = keyed.select(
            F.col(key_col).cast("string").alias("key"),
            F.to_json(F.struct(*payload)).alias("value"),
            F.array(
                F.struct(
                    F.lit("eos_key").alias("key"),
                    F.col("eos_key").cast("binary").alias("value"),
                )
            ).alias("headers"),
        )
        (
            records.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .option("includeHeaders", "true")
            .save()
        )
        _mark_committed(ledger_dir, batch_id)

    return sink
