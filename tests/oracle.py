"""Spark-vs-DuckDB comparison helper used by the correctness tests.

Mirrors the driver's check: same column set, same row count, and
order-insensitive value equality (rows sorted by all columns; floats
compared with tight tolerance).
"""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, duck, oracle_sql: str, rel_tol: float = 1e-9) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck.execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            bad = [
                (a, b)
                for a, b in zip(g.astype(float), w.astype(float))
                if not (
                    (math.isnan(a) and math.isnan(b))
                    or math.isclose(a, b, rel_tol=rel_tol, abs_tol=1e-9)
                )
            ]
            assert not bad, f"column {c}: {len(bad)} value mismatches, first: {bad[:3]}"
        else:
            diff = g.astype(str) != w.astype(str)
            assert not diff.any(), (
                f"column {c}: {int(diff.sum())} mismatches, first rows:\n"
                f"spark={g[diff].head(3).tolist()} oracle={w[diff].head(3).tolist()}"
            )
