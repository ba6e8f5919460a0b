"""Invariants of the epoch-shuffle / shard-manifest / line-dedup trio,
checked ON TOP of the DuckDB oracle parity: the shuffle is a true
deterministic permutation (every doc exactly once, contiguous per-shard
positions, seed-sensitive), the manifest ties out to the corpus, the
sharded writer produces files internally ordered by read position, and
the line-dedup document-frequency rule fires on cross-doc boilerplate
but never on within-doc repetition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_repartition_spark.operators import dedup as dd
from kafka_streams_repartition_spark.operators import selection as sl
from kafka_streams_repartition_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return load_tables(spark, sf_dir)


def test_epoch_shuffle_is_permutation(t):
    """Every document appears exactly once, and each shard's positions
    are exactly 0..n_k-1 (the rank-striped loader contract)."""
    rows = sl.epoch_shuffle(t).collect()
    n_docs = t["documents"].count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < sl.EPOCH_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard


def test_epoch_shuffle_deterministic_and_seed_sensitive(t, monkeypatch):
    """Same seed → bit-identical (resumable training); a different
    seed → an independent permutation (not the identity rerun)."""
    a = {(r["doc_id"]): (r["shard"], r["pos"]) for r in sl.epoch_shuffle(t).collect()}
    b = {(r["doc_id"]): (r["shard"], r["pos"]) for r in sl.epoch_shuffle(t).collect()}
    assert a == b
    monkeypatch.setattr(sl, "EPOCH_SEED", sl.EPOCH_SEED + 1)
    c = {(r["doc_id"]): (r["shard"], r["pos"]) for r in sl.epoch_shuffle(t).collect()}
    assert c != a


def test_shard_manifest_ties_out(t):
    """Manifest totals equal the corpus; balance ratios average to 1
    (the definition of 'ratio to mean')."""
    rows = sl.shard_manifest(t).collect()
    assert sum(r["n_docs"] for r in rows) == t["documents"].count()
    assert len(rows) <= sl.EPOCH_SHARDS
    mean_ratio = sum(r["balance_ratio"] for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 0.01
    # md5 is uniform: no shard should be pathologically starved/hot
    assert all(0.2 < r["balance_ratio"] < 5.0 for r in rows)


def test_write_training_shards_ordered_files(t, tmp_path):
    """The production writer: read-back equals the assignment, files
    land under shard=<k>/ partitions, and every parquet file is internally
    sorted by pos so a reader streams training order without sorting."""
    out = str(tmp_path / "shards")
    back = sl.write_training_shards(t, out, max_records_per_file=100)
    n_docs = t["documents"].count()
    assert back.count() == n_docs
    want = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in sl.epoch_shuffle(t).collect()
    }
    got = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in back.select("doc_id", "shard", "pos").collect()
    }
    assert got == want
    # per-file internal order: pos strictly ascending inside every file
    import pathlib

    import pyarrow.parquet as pq

    files = sorted(pathlib.Path(out).glob("shard=*/*.parquet"))
    assert files
    for f in files:
        pos = pq.read_table(f, columns=["pos"]).column("pos").to_pylist()
        assert pos == sorted(pos), f
        assert len(pos) <= 100


def _docs(spark, texts):
    return {
        "documents": spark.createDataFrame(
            [(i, s, "en", "srcT", len(s)) for i, s in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    }


def test_line_dedup_df_rule(spark):
    """A 10-word line present in >=LINE_DF_MIN distinct docs is
    boilerplate in EVERY doc; the same line twice within ONE doc is
    not (document frequency, not instance count)."""
    boiler = "a b c d e f g h i j"  # one exact 10-word line
    uniq = ["u%d w x y z q r s t v" % i for i in range(4)]
    texts = [
        boiler + " " + uniq[0],  # docs 0-2 share the boiler line
        boiler + " " + uniq[1],
        boiler + " " + uniq[2],
        boiler + " " + boiler,  # within-doc repeat only adds instances
        uniq[3] + " " + uniq[3],  # within-doc dup line, df=1 -> kept
    ]
    rows = {
        r["doc_id"]: r for r in dd.line_dedup(_docs(spark, texts)).collect()
    }
    for d in (0, 1, 2):
        assert rows[d]["n_lines"] == 2
        assert rows[d]["n_boiler"] == 1  # the shared line, not the unique one
        assert rows[d]["kept_tokens"] == 10
    # doc 3 is two instances of the corpus-wide boiler line: both removed
    assert rows[3]["n_boiler"] == 2 and rows[3]["kept_tokens"] == 0
    # doc 4's duplicated line appears in one doc only: df=1, fully kept
    assert rows[4]["n_boiler"] == 0 and rows[4]["kept_tokens"] == 20
    assert rows[4]["boiler_frac"] == 0.0


def test_line_dedup_short_tail_line(spark):
    """The trailing partial chunk is a line too, with its true token
    count; empty docs drop out instead of tripping sequence()."""
    out = dd.line_dedup(
        _docs(spark, ["one two three", "", "one two three"])
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {0, 2}  # empty doc absent, like the oracle
    for d in (0, 2):
        assert rows[d]["n_lines"] == 1
        assert rows[d]["kept_tokens"] == 3  # df=2 < LINE_DF_MIN: kept
        assert rows[d]["n_boiler"] == 0
