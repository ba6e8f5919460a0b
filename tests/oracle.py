"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables, canonicalizes both (columns sorted by name, rows sorted by all
columns), and asserts value equality.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(duckdb_run(oracle_sql, sf_dir))
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            bad = [
                (a, b)
                for a, b in zip(g, w)
                if not (
                    (pd.isna(a) and pd.isna(b))
                    or (a == b)
                    or (float_tol and math.isclose(a, b, abs_tol=float_tol))
                )
            ]
        else:
            bad = [
                (a, b)
                for a, b in zip(g, w)
                if not ((pd.isna(a) and pd.isna(b)) or a == b)
            ]
        assert not bad, f"column {col}: {len(bad)} mismatches, first 5: {bad[:5]}"
