"""Test helpers: DuckDB oracle runner + frame comparison."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def assert_frames_match(ray_result, duck_df: pd.DataFrame):
    if hasattr(ray_result, "to_pandas"):
        ray_df = ray_result.to_pandas()
    else:
        ray_df = pd.DataFrame(ray_result)
    a = normalize(ray_df)
    b = normalize(duck_df)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    # the driver hashes raw values, where int64 5 != float64 5.0 — so
    # dtype *kind* must match too (int vs float vs object)
    kinds_a = [a[c].dtype.kind for c in a.columns]
    kinds_b = [b[c].dtype.kind for c in b.columns]
    assert kinds_a == kinds_b, (
        list(zip(a.columns, kinds_a, kinds_b)),
        "dtype-kind mismatch: driver value-hash would fail",
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
