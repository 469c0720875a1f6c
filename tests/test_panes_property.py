"""Property-based pane-layer parity: random window geometries.

Hypothesis drives (size, slide) over the space the reference's figure-11
slide sweep explores (figure-11b.sh:48-142 — slides 2..1024 against a
fixed window); both recombination strategies must equal the built-in
window() aggregation on every geometry.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from saber_spark.operators.aggregation import AggSpec, windowed_aggregate
from saber_spark.operators.panes import pane_windowed_aggregate
from saber_spark.operators.windows import RANGE, ROW, WindowDef
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

AGGS = [
    AggSpec("cnt", "*", "n"),
    AggSpec("sum", "text_len", "s"),
    AggSpec("min", "text_len", "mn"),
    AggSpec("max", "text_len", "mx"),
]

_CACHE: dict = {}


def _data(spark):
    if "df" not in _CACHE:
        _CACHE["df"] = (
            transcripts(spark, SF_SMOKE)
            .select("conv_id", "turn_idx", "ts",
                    F.length("text").cast("long").alias("text_len"))
            .cache()
        )
        _CACHE["df"].count()
    return _CACHE["df"]


def _check(spark, wd: WindowDef):
    df = _data(spark)
    want = windowed_aggregate(df, wd, AGGS).toPandas()
    for method in ("fanout", "incremental"):
        got = pane_windowed_aggregate(df, wd, AGGS, method=method).toPandas()
        cols = sorted(want.columns)
        a = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(1, 48), st.integers(1, 48))
def test_range_pane_parity_random_geometry(spark, a, b):
    size_s, slide_s = max(a, b), min(a, b)
    _check(spark, WindowDef(RANGE, size_s * 300, slide_s * 300))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(1, 64), st.integers(1, 64))
def test_row_pane_parity_random_geometry(spark, a, b):
    size, slide = max(a, b), min(a, b)
    _check(spark, WindowDef(ROW, size, slide))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(1, 24), st.integers(1, 24)),
                min_size=2, max_size=4, unique=True))
def test_shared_pane_parity_random_query_sets(spark, geoms):
    """Any set of 2-4 random RANGE window geometries shared through one
    gcd-pane pass must reproduce each geometry's solo pane result
    bit-for-bit — the multi-query fan-out math holds for arbitrary
    (size, slide) mixes, not just the hand-picked bench set."""
    from saber_spark.operators.panes import shared_pane_aggregate

    # scale to seconds; slide <= size per WindowDef's contract
    queries = {}
    for i, (a, b) in enumerate(geoms):
        size_s, slide_s = max(a, b) * 60, min(a, b) * 60
        queries[f"q{i}_{size_s}_{slide_s}"] = WindowDef(RANGE, size_s, slide_s)
    df = _data(spark)
    shared = shared_pane_aggregate(df, queries, AGGS).toPandas()
    for name, wd in queries.items():
        got = shared[shared["query"] == name].drop(columns=["query"])
        want = pane_windowed_aggregate(df, wd, AGGS, method="fanout").toPandas()
        cols = sorted(want.columns)
        a_ = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        b_ = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(a_, b_, check_dtype=False)
