"""Error-bound checks for the sketch aggregates (operators/sketches.py):
each sketch is compared against its exact twin computed on the same
data, with the bound taken from the sketch's published contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from saber_spark.operators import sketches as sk
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_ORACLE}/events.parquet")


def test_approx_distinct_within_rsd(events):
    exact = events.select("user_id").distinct().count()
    got = sk.approx_distinct(events, "user_id", rsd=0.02).collect()[0][0]
    # HLL++ rsd is a standard deviation; 5 sigma is a safe test bound
    assert abs(got - exact) <= max(5, 5 * 0.02 * exact)


def test_approx_distinct_grouped(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in sk.approx_distinct(
            events, "user_id", group_cols=["event_type"], rsd=0.02
        ).collect()
    }
    assert set(got) == set(exact)
    for k, v in exact.items():
        assert abs(got[k] - v) <= max(5, 5 * 0.02 * v)


def test_approx_quantiles_rank_error(events, spark):
    probs = [0.1, 0.5, 0.9]
    n = events.count()
    acc = 10_000
    got = sk.approx_quantiles(events, "value", probs, accuracy=acc).collect()[0][
        "quantiles"
    ]
    # rank-error contract: the returned value's exact rank is within
    # n/accuracy of the requested rank (2x margin for the nearest-rank
    # vs count(<=) definitional off-by-ones)
    vals = events.select(F.col("value").cast("double").alias("v"))
    for p, q in zip(probs, got):
        rank = vals.where(F.col("v") <= q).count()
        assert abs(rank - p * n) <= 2 * n / acc + 2


def test_frequent_items_no_false_negatives(events):
    n = events.count()
    exact_heavy = {
        r["event_type"]
        for r in events.groupBy("event_type")
        .count()
        .where(F.col("count") > 0.1 * n)
        .collect()
    }
    got = {r["item"] for r in sk.frequent_items(events, "event_type", min_frac=0.1).collect()}
    # one-sided contract: every true heavy hitter is present
    assert exact_heavy <= got


def test_guards(events):
    with pytest.raises(ValueError):
        sk.approx_distinct(events, "user_id", rsd=0.0)
    with pytest.raises(ValueError):
        sk.approx_quantiles(events, "value", [])
    with pytest.raises(ValueError):
        sk.approx_quantiles(events, "value", [1.5])
    with pytest.raises(ValueError):
        sk.frequent_items(events, "event_type", min_frac=1.0)
