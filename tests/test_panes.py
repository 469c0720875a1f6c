"""Pane-layer parity: pane_windowed_aggregate (both recombination
strategies) must reproduce windowed_aggregate (built-in window()) exactly.

This mirrors the reference's design contract: the pane/incremental paths
are performance features whose semantics are defined by the whole-window
re-compute path (Aggregation.java processDataPerWindow vs incremental).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from saber_spark.operators.aggregation import AggSpec, windowed_aggregate
from saber_spark.operators.panes import pane_windowed_aggregate
from saber_spark.operators.windows import RANGE, ROW, WindowDef
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

AGGS = [
    AggSpec("cnt", "*", "n"),
    AggSpec("sum", "text_len", "s"),
    AggSpec("avg", "text_len", "a"),
    AggSpec("min", "text_len", "mn"),
    AggSpec("max", "text_len", "mx"),
]


def _prep(spark):
    t = transcripts(spark, SF_SMOKE)
    return t.select(
        "conv_id", "turn_idx", "ts", F.length("text").cast("long").alias("text_len")
    )


def _cmp(a_df, b_df):
    a = a_df.toPandas()
    b = b_df.toPandas()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
    for c in cols:
        if pd.api.types.is_float_dtype(a[c]):
            pd.testing.assert_series_equal(a[c], b[c].astype(a[c].dtype),
                                           rtol=1e-12, check_names=False)
        else:
            assert (a[c] == b[c]).all(), f"col {c} differs"


@pytest.mark.parametrize("method", ["fanout", "incremental"])
@pytest.mark.parametrize(
    "wd,keys",
    [
        (WindowDef(RANGE, 3600, 600), []),
        (WindowDef(RANGE, 3600, 600), ["tool"]),
        (WindowDef(RANGE, 7200, 1800), ["role"]),
    ],
    ids=["range-nokey", "range-tool", "range-role"],
)
def test_range_pane_parity(spark, method, wd, keys):
    t = transcripts(spark, SF_SMOKE).select(
        "conv_id", "role", "tool", "ts", F.length("text").cast("long").alias("text_len")
    )
    oracle = windowed_aggregate(t, wd, AGGS, keys=keys)
    pane = pane_windowed_aggregate(t, wd, AGGS, keys=keys, method=method)
    _cmp(oracle, pane)


@pytest.mark.parametrize("method", ["fanout", "incremental"])
@pytest.mark.parametrize("wd", [WindowDef(ROW, 16, 4), WindowDef(ROW, 12, 3)],
                         ids=["16-4", "12-3"])
def test_row_pane_parity(spark, method, wd):
    t = _prep(spark)
    oracle = windowed_aggregate(t, wd, AGGS)
    pane = pane_windowed_aggregate(t, wd, AGGS, method=method)
    _cmp(oracle, pane)


def test_pane_math():
    wd = WindowDef(RANGE, 3600, 300)
    assert wd.pane_size == 300
    assert wd.num_panes == 12
    assert wd.panes_per_slide == 1
    wd2 = WindowDef(ROW, 1024, 96)
    assert wd2.pane_size == 32
