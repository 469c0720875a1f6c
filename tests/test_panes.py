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


@pytest.mark.parametrize("method", ["fanout", "incremental"])
def test_pane_parity_with_nulls(spark, method):
    """AVG/CNT(col)/SUM skip nulls (F.avg semantics): the pane layer must
    track a per-column non-null count, not the row count, or avg/cnt(col)
    silently diverge on nullable columns. Includes an all-null window."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        # val null for every 3rd row; rows 80..119 (a whole 600 s window
        # at 15 s spacing) entirely null
        null = (i % 3 == 0) or (80 <= i < 120)
        rows.append(
            ("k" + str(i % 2), base + dt.timedelta(seconds=15 * i),
             None if null else i * 7 % 101)
        )
    df = spark.createDataFrame(rows, "tool string, ts timestamp, v long")
    aggs = [
        AggSpec("cnt", "*", "n_rows"),
        AggSpec("cnt", "v", "n_vals"),
        AggSpec("sum", "v", "s"),
        AggSpec("avg", "v", "a"),
        AggSpec("min", "v", "mn"),
        AggSpec("max", "v", "mx"),
    ]
    wd = WindowDef(RANGE, 600, 150)
    oracle = windowed_aggregate(df, wd, aggs, keys=["tool"])
    pane = pane_windowed_aggregate(df, wd, aggs, keys=["tool"], method=method)
    a = oracle.toPandas().sort_values(["window_start", "tool"]).reset_index(drop=True)
    b = pane.toPandas().sort_values(["window_start", "tool"]).reset_index(drop=True)
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].astype("object"), b[cols].astype("object"), check_dtype=False
    )
    # the all-null stretch must produce rows with n_vals=0 and null avg
    assert (a["n_vals"] == 0).any()


def test_pane_math():
    wd = WindowDef(RANGE, 3600, 300)
    assert wd.pane_size == 300
    assert wd.num_panes == 12
    assert wd.panes_per_slide == 1
    wd2 = WindowDef(ROW, 1024, 96)
    assert wd2.pane_size == 32


# --------------------------------------------------------------------------
# Multi-query window sharing: one pane aggregation, N queries
# --------------------------------------------------------------------------

_SHARED_QUERIES = {
    "hour_by_10min": WindowDef(RANGE, 3600, 600),
    "halfhour_by_5min": WindowDef(RANGE, 1800, 300),
    "2hour_tumbling": WindowDef(RANGE, 7200, 7200),
}


@pytest.mark.parametrize("keys", [[], ["tool"]], ids=["nokey", "tool"])
def test_shared_pane_legs_match_individual_runs(spark, keys):
    """Every leg of the shared plan must be bit-identical to running
    pane_windowed_aggregate (and therefore windowed_aggregate — the
    existing parity suite) for that window alone."""
    from saber_spark.operators.panes import shared_pane_aggregate

    t = transcripts(spark, SF_SMOKE).select(
        "tool", "ts", F.length("text").cast("long").alias("text_len")
    )
    shared = shared_pane_aggregate(t, _SHARED_QUERIES, AGGS, keys=keys)
    for name, wd in _SHARED_QUERIES.items():
        leg = shared.where(F.col("query") == name).drop("query")
        solo = pane_windowed_aggregate(t, wd, AGGS, keys=keys, method="fanout")
        _cmp(leg, solo)


def test_shared_pane_is_one_scan_two_shuffles(spark):
    """The point of sharing: one scan, one pane aggregation and one
    merge aggregation serve ALL queries — the plan must contain exactly
    one FileScan and two hash-partitioning exchanges no matter how many
    windows subscribe."""
    import re

    from saber_spark.operators.panes import shared_pane_aggregate

    t = transcripts(spark, SF_SMOKE).select(
        "tool", "ts", F.length("text").cast("long").alias("text_len")
    )
    df = shared_pane_aggregate(t, _SHARED_QUERIES, AGGS, keys=["tool"])
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, "input scanned more than once"
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "BatchEvalPython" not in plan


# (ROW-window sharing is now supported — the rejection test became the
# mixed-kind rejection below.)


_SHARED_ROW_QUERIES = {
    "w16_s4": WindowDef(ROW, 16, 4),
    "w12_s3": WindowDef(ROW, 12, 3),
    "w8_s8": WindowDef(ROW, 8, 8),
}


def test_shared_row_pane_legs_match_individual_runs(spark):
    """ROW (count) window sharing: global pane = gcd over tuple sizes
    and slides; each leg bit-identical to the solo ROW pane path."""
    from saber_spark.operators.panes import shared_pane_aggregate

    t = _prep(spark)
    shared = shared_pane_aggregate(t, _SHARED_ROW_QUERIES, AGGS)
    for name, wd in _SHARED_ROW_QUERIES.items():
        leg = shared.where(F.col("query") == name).drop("query")
        solo = pane_windowed_aggregate(t, wd, AGGS, method="fanout")
        _cmp(leg, solo)


def test_shared_pane_rejects_mixed_kinds(spark):
    from saber_spark.operators.panes import shared_pane_aggregate

    t = _prep(spark)
    with pytest.raises(ValueError, match="cannot share"):
        shared_pane_aggregate(
            t, {"a": WindowDef(RANGE, 3600, 600), "b": WindowDef(ROW, 8, 4)}, AGGS
        )
