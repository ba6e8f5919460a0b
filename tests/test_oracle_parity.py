"""Every queries() entry must hash-match its oracle_sql() — the same
gate the driver runs at sf0.01 (here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import assert_parity, duckdb_run


def _pairs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, sf_dir, name, fn, sql):
    df = fn(spark, sf_dir)
    if sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_parity(df, sql, sf_dir)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
