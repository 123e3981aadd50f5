"""Local stand-in for the driver's DuckDB correctness gate.

Runs a Spark query and its oracle SQL side-by-side on the same parquet
tables and asserts: equal column-name sets, equal row counts, and
(after sorting columns by name and rows by all values) equal values —
the same discipline as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

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


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list,)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")


def assert_matches(spark_df, sql: str, sf_dir: str, name: str = "?") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_run(sql, sf_dir))
    assert set(got.columns) == set(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r} (float mismatch)"
            else:
                ok = x == y or (pd.isna(x) and pd.isna(y))
                assert ok, f"{name}.{c}[{i}]: {x!r} != {y!r}"
