"""Loader robustness against testdata regeneration (data-shape drift).

The driver regenerates the parquet testdata between rounds and has
already shipped ``events.ts`` in two different physical encodings:

- round 1: INT64 TIMESTAMP(NANOS)  → Spark reads ``bigint`` under
  ``spark.sql.legacy.parquet.nanosAsLong``
- round 2: naive TIMESTAMP(MICROS) → Spark 4 reads ``TIMESTAMP_NTZ``

Each switch broke every events query at analysis time (CORRECTNESS_r02:
12 erred rows from one root cause).  This gate writes the SAME rows in
all three plausible encodings — nanos, naive micros, UTC-adjusted
micros — and asserts ``load_table`` lands every one of them on
``TimestampType`` with identical downstream results.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafka_streams_repartition_spark.operators import windows as win
from kafka_streams_repartition_spark.sources.tables import load_table, load_tables

SRC = "/root/testdata/sf0.001/events.parquet"

ENCODINGS = {
    # arrow ts type, parquet format version (2.6 required for NANOS)
    "nanos": (pa.timestamp("ns"), "2.6"),
    "ntz_micros": (pa.timestamp("us"), "2.6"),
    "ltz_micros": (pa.timestamp("us", tz="UTC"), "2.6"),
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """One sf-dir per encoding, each holding the same events rows."""
    base = tmp_path_factory.mktemp("ts_encodings")
    src = pq.read_table(SRC)
    # Source may itself be naive micros; go through int64 epoch-us so the
    # re-encoding is exact for every target.
    ts_us = src.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
    dirs = {}
    for name, (ts_type, version) in ENCODINGS.items():
        if ts_type.unit == "ns":
            ts_col = pa.compute.multiply(ts_us, pa.scalar(1000, pa.int64())).cast(
                pa.timestamp("ns")
            )
        else:
            ts_col = ts_us.cast(pa.timestamp("us")).cast(ts_type)
        tbl = src.set_column(src.schema.get_field_index("ts"), "ts", ts_col)
        d = base / name
        d.mkdir()
        pq.write_table(
            tbl,
            str(d / "events.parquet"),
            version=version,
            coerce_timestamps=None,
            store_schema=False,  # plain parquet logical types, no arrow hint
        )
        dirs[name] = str(d)
    return dirs


def test_raw_encodings_differ(encoded_dirs):
    """The fixture must actually produce three distinct physical types —
    otherwise this gate tests nothing."""
    logical = set()
    for name, d in encoded_dirs.items():
        schema = pq.read_schema(os.path.join(d, "events.parquet"))
        logical.add(str(schema.field("ts").type))
    assert len(logical) == 3, logical


def test_all_encodings_normalize_to_timestamp(spark, encoded_dirs):
    for name, d in encoded_dirs.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{name}: ts is {dict(df.dtypes)['ts']}, want timestamp"
        )


def test_all_encodings_agree_downstream(spark, encoded_dirs):
    """A real windows query must produce identical rows on every
    encoding (nanos truncate to micros, so all three carry the same
    instant)."""
    results = {}
    for name, d in encoded_dirs.items():
        out = win.tumbling_events(load_tables(spark, d))
        results[name] = sorted(tuple(r) for r in out.collect())
    first = next(iter(results.values()))
    assert first, "tumbling_events returned no rows on synthetic data"
    for name, rows in results.items():
        assert rows == first, f"{name} diverges from other encodings"
