"""Skew utilities, restore job, streaming pickup-order, state reader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_repartition_spark.functions.debug import peek, with_task_info
from kafka_streams_repartition_spark.functions.skew import salted_agg
from kafka_streams_repartition_spark.operators.restore import changelog_restore_job
from kafka_streams_repartition_spark.sources.fixtures import generate_reference_tables
from kafka_streams_repartition_spark.sources.tables import load_table
from kafka_streams_repartition_spark.streaming import (
    run_to_memory_available_now,
    stream_pickup_orders,
    stream_product_stats,
)


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = salted_agg(
        li,
        ["l_partkey"],
        lambda: [
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
        ],
        lambda: [
            F.sum("n").alias("n"),
            F.sum("q").alias("q"),
        ],
        n_salts=8,
    )
    want = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    g = {r["l_partkey"]: (r["n"], round(r["q"], 6)) for r in got.collect()}
    w = {r["l_partkey"]: (r["n"], round(r["q"], 6)) for r in want.collect()}
    assert g == w


def test_changelog_restore_job(spark):
    """M1+M2: raw changelog records → latest snapshot, repartitioned."""
    schema = T.StructType(
        [T.StructField("sku", T.StringType()), T.StructField("qty", T.LongType())]
    )
    raw = spark.createDataFrame(
        [
            ("p1", '{"sku":"p1","qty":1}', "cl", 0, 0, None),
            ("p1", '{"sku":"p1","qty":7}', "cl", 0, 9, None),
            ("p2", '{"sku":"p2","qty":3}', "cl", 1, 1, None),
            ("p3", '{"sku":"p3","qty":5}', "cl", 1, 2, None),
            ("p3", None, "cl", 1, 8, None),  # tombstoned before snapshot
        ],
        "key string, value string, topic string, partition int, offset long, timestamp timestamp",
    )
    snap = changelog_restore_job(raw, schema, n_output_partitions=8)
    got = {r["key"]: r["qty"] for r in snap.collect()}
    assert got == {"p1": 7, "p2": 3}
    assert snap.rdd.getNumPartitions() == 8


def test_stream_pickup_orders_equals_batch(spark, tmp_path):
    ref = generate_reference_tables(spark, n_orders=150, seed=3)
    from kafka_streams_repartition_spark.operators.pickup_order import (
        enrich_pickup_orders,
    )

    path = str(tmp_path / "orders")
    ref["purchase_orders"].repartition(3).write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(ref["purchase_orders"].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_pickup_orders(stream, ref["users"], ref["stores"], ref["products"])
    final = run_to_memory_available_now(spark, out, mode="complete")
    batch = enrich_pickup_orders(
        ref["purchase_orders"], ref["users"], ref["stores"], ref["products"]
    )

    def canon(df):
        return {
            r["order_id"]: (
                r["user"]["email"],
                r["store"]["city"],
                tuple((i["sku"], i["quantity"], str(i["price"])) for i in r["items"]),
            )
            for r in df.collect()
        }

    assert canon(final) == canon(batch)


def test_state_store_reader(spark, tmp_path):
    """P2: a streaming aggregation's keyed state is inspectable from
    the checkpoint."""
    li = generate_reference_tables(spark, n_orders=60, seed=5)
    from kafka_streams_repartition_spark.sources.fixtures import orders_as_lineitems

    items = orders_as_lineitems(li["purchase_orders"], li["products"])
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    items.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(items.schema).parquet(src)
    agg = stream_product_stats(stream).select("l_partkey", "orders", "quantity")
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from kafka_streams_repartition_spark.streaming import read_state_store

    state = read_state_store(spark, ckpt)
    assert state.count() == items.filter(F.col("l_quantity") > 0).select(
        "l_partkey"
    ).distinct().count()


def test_peek_and_task_info(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    observed = peek(li, "li_in")
    assert observed.count() == li.count()
    tagged = with_task_info(li.limit(10))
    assert all(r["_partition_id"] >= 0 for r in tagged.collect())


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL sink → source round-trip preserves rows; a malformed line
    lands in quarantine instead of failing the read (the reference's
    log-and-continue serde behavior, file-based)."""
    import os

    from kafka_streams_repartition_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )
    from kafka_streams_repartition_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    # inject a corrupt line as its own file (appending to a Spark part
    # file would invalidate its Hadoop .crc checksum sidecar)
    with open(os.path.join(path, "part-99999-manual.json"), "w") as fh:
        fh.write('{"doc_id": 999999, "lang": BROKEN\n')

    good, quarantine = read_jsonl(spark, path, docs.schema)
    assert good.count() == docs.count()
    assert quarantine.count() == 1
    assert "BROKEN" in quarantine.first()["raw"]
    # value-level round trip
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in good.collect())
    assert a == b


def test_compact_small_files(spark, tmp_path):
    """Compaction collapses a fragmented table into few target-sized
    files, preserves every row, and survives via write-temp-then-swap
    (the original is never in a half-written state)."""
    from kafka_streams_repartition_spark.sources.maintenance import (
        compact_small_files,
    )
    from kafka_streams_repartition_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "fragmented")
    li.repartition(64).write.parquet(path)  # simulate micro-batch litter

    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    report = compact_small_files(spark, path, target_file_mb=128)

    assert report["files_before"] == 64
    assert report["files_after"] == 1  # tiny table → one target file
    assert report["rows"] == len(before)
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    import os

    assert not os.path.exists(path + ".compact_tmp")
    assert not os.path.exists(path + ".compact_old")


def test_jsonl_split_unpersists_cache(spark, tmp_path):
    """The context-manager form drops the shared cached parse on exit
    (ADVICE r3: read_jsonl leaked storage memory in long-lived sessions)."""
    from kafka_streams_repartition_spark.sources.jsonl import (
        jsonl_split,
        write_jsonl,
    )
    from kafka_streams_repartition_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    path = str(tmp_path / "docs_jsonl_cm")
    write_jsonl(docs, path)

    cm = jsonl_split(spark, path, docs.schema)
    with cm as (good, quarantine):
        assert good.count() == docs.count()
        assert quarantine.count() == 0
        assert cm._parent.storageLevel.useMemory  # cached inside the block
    assert not cm._parent.storageLevel.useMemory  # unpersisted on exit


def test_compact_keep_backup(spark, tmp_path):
    """keep_backup=True retains the pre-compaction copy for rollback."""
    import os

    from kafka_streams_repartition_spark.sources.maintenance import (
        compact_small_files,
    )
    from kafka_streams_repartition_spark.sources.tables import load_table

    nat = load_table(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_frag")
    nat.repartition(8).write.parquet(path)

    report = compact_small_files(spark, path, keep_backup=True)
    assert report["files_after"] == 1
    backup = path + ".compact_old"
    assert os.path.exists(backup)
    assert spark.read.parquet(backup).count() == nat.count()


def test_fan_out_probe_memoized(spark):
    """fan_out probes a given DataFrame's scan partitioning ONCE per
    frame object (ADVICE r3: the plan->RDD probe ran on every call)."""
    from kafka_streams_repartition_spark.sources import tables as tb

    df = tb.load_table(spark, "/root/testdata/sf0.001", "documents")
    tb._FANOUT_PROBE.pop(df, None)
    base = tb._fanout_probe_count
    a = tb.fan_out(df)
    b = tb.fan_out(df)
    assert tb._fanout_probe_count == base + 1  # second call memoized
    assert a.rdd.getNumPartitions() == b.rdd.getNumPartitions()


def test_stratified_kfold_hash_safe_for_large_ids(spark):
    """The fold hash must not overflow int64 for doc_id > ~3.5e9
    (ADVICE r3): compare the Spark column formula against exact Python
    bignum arithmetic on boundary-sized ids."""
    from pyspark.sql import functions as F

    from kafka_streams_repartition_spark.operators.text_analysis import (
        KFOLD_K,
        KFOLD_MULT,
    )

    ids = [1, 2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**40 + 123, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    reduced = F.col("doc_id") % F.lit(2**32)
    a_hi = (reduced / F.lit(65536)).cast("long")
    a_lo = reduced % F.lit(65536)
    m = F.lit(2**32)
    fold = (
        ((a_hi * F.lit(KFOLD_MULT) % m) * F.lit(65536) % m
         + a_lo * F.lit(KFOLD_MULT) % m) % m % F.lit(KFOLD_K)
    )
    got = {r["doc_id"]: r["fold"] for r in df.withColumn("fold", fold).collect()}
    want = {i: (i % 2**32) * KFOLD_MULT % 2**32 % KFOLD_K for i in ids}
    assert got == want


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling — the runtime half of the skew story
    (the compile-time half is `salted_agg`/`salted_event_counts`): a
    hot join key must be split into multiple tasks by
    OptimizeSkewedJoin, visible as `skew=true` in the final adaptive
    plan.  This is the conf posture a 100 TB job relies on instead of
    hand-salting every join."""
    import contextlib
    import io

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # left: one hot key (0) with ~300k rows + uniform cold keys
        hot = spark.range(300_000).select(
            F.lit(0).alias("k"), F.col("id").alias("payload")
        )
        cold = spark.range(100_000).select(
            (F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("payload")
        )
        left = hot.unionByName(cold)
        right = spark.range(1001).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
        )
        joined = left.join(right, "k")
        # execute the join's OWN queryExecution (count() would plan a
        # separate aggregate query and leave this plan un-finalized)
        assert len(joined.collect()) == 400_000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_release_local_checkpoint_drops_blocks(spark):
    """release_local_checkpoint walks a PRIVATE py4j surface
    (queryExecution().analyzed().rdd()) and swallows failures for its
    callers, so a Spark upgrade that changes the analyzed-plan shape
    could silently turn the measured CC-ladder OOM fix back into a
    per-round leak.  This pin asks the JVM itself: an eager local
    checkpoint must appear in the storage status, the release must
    remove it, and the failure counter must stay untouched — if the
    private surface ever breaks, this test fails loudly instead of the
    leak returning unnoticed (r10 advisor finding)."""
    import time

    from kafka_streams_repartition_spark.functions import caching

    def persisted_rdd_ids() -> set[int]:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {infos[i].id() for i in range(len(infos))}

    before = persisted_rdd_ids()
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).localCheckpoint(eager=True)
    assert df.count() == 10_000
    added = persisted_rdd_ids() - before
    assert added, "eager localCheckpoint left no trace in storage status"

    failures_before = caching._release_failures
    caching.release_local_checkpoint(df)
    assert caching._release_failures == failures_before, (
        "release_local_checkpoint hit its exception fallback — the "
        "private analyzed-plan surface changed under this Spark version"
    )
    # unpersist(blocking=False) is async; give the block manager a beat
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        if not (persisted_rdd_ids() & added):
            break
        time.sleep(0.2)
    assert not (persisted_rdd_ids() & added), (
        "checkpointed blocks still pinned after release"
    )
