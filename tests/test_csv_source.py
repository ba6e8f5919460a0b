"""S8: the CSV file source — the reference's builder loads
``zipcodes.csv`` through commons-csv (``BuildSystem.java:241-270``) and
draws each store's geography from it (``generateStore`` +
``getRandomZip``, ``BuildSystem.java:224-239``).  These tests exercise
the literal ``spark.read.csv`` path against a reference-shaped file —
header, column set, and the store-builder join — which no fixture test
previously did."""

from __future__ import annotations

import pytest

from kafka_streams_repartition_spark.schemas import STORE_SCHEMA
from kafka_streams_repartition_spark.sources.fixtures import (
    load_zipcodes_csv,
    stores_from_zipcodes,
)

HEADER = "state_fips,state,state_abbr,zipcode,county,city"
ROWS = [
    "27,Minnesota,MN,55001,Washington,Afton",
    "27,Minnesota,MN,55041,Wabasha,Lake City",
    "27,Minnesota,MN,55401,Hennepin,Minneapolis",
    "19,Iowa,IA,50001,Warren,Ackworth",
    "55,Wisconsin,WI,53001,Sheboygan,Adell",
]


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "zipcodes.csv"
    p.write_text("\n".join([HEADER, *ROWS]) + "\n")
    return str(p)


def test_load_zipcodes_csv_reads_reference_header(spark, csv_path):
    got = sorted(
        (r.postal_code, r.city, r.state)
        for r in load_zipcodes_csv(spark, csv_path).collect()
    )
    want = sorted(
        (z, city, abbr)
        for _, _, abbr, z, _, city in (row.split(",") for row in ROWS)
    )
    assert got == want


def test_load_zipcodes_csv_rejects_shifted_header(spark, tmp_path):
    """enforceSchema=false makes a reordered header a loud failure, not
    silently swapped geography columns."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "zipcode,city,state_abbr,state_fips,county,state\n"
        "55001,Afton,MN,27,Washington,Minnesota\n"
    )
    with pytest.raises(Exception, match="(?i)header|schema"):
        load_zipcodes_csv(spark, str(p)).collect()


def test_stores_from_zipcodes_joins_csv_geography(spark, csv_path):
    stores = stores_from_zipcodes(spark, csv_path, n_stores=20, seed=7)
    assert stores.schema == STORE_SCHEMA
    rows = stores.collect()
    assert len(rows) == 20
    valid = {
        (z, city, abbr)
        for _, _, abbr, z, _, city in (row.split(",") for row in ROWS)
    }
    for r in rows:
        assert (r.postal_code, r.city, r.state) in valid
    # deterministic for a given (file, seed)
    again = stores_from_zipcodes(spark, csv_path, n_stores=20, seed=7)
    assert [tuple(r) for r in again.collect()] == [tuple(r) for r in rows]
