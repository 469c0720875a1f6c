"""Storage bucketing: the write-once shuffle actually disappears from
later joins and aggregations (executed-plan assertions), and results
are identical to the unbucketed plans."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from saber_spark.sources.bucketed import bucketed_join, write_bucketed
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_ORACLE

_TABLES = ("bk_turns", "bk_tools", "bk_turns_nosort")


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    t = transcripts(spark, SF_ORACLE)
    turns = t.select("conv_id", "turn_idx", "role", "ts")
    tools = (
        t.where(F.col("tool").isNotNull())
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_tool_turns"))
    )
    write_bucketed(turns, "bk_turns", "conv_id", 8, sort_keys="conv_id")
    write_bucketed(tools, "bk_tools", "conv_id", 8, sort_keys="conv_id")
    yield {"turns": turns, "tools": tools}
    for tbl in _TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    j = bucketed_join(spark, "bk_turns", "bk_tools", "conv_id")
    plan = _plan(j)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan, (
        "bucketed join must read co-located buckets without a shuffle"
    )


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_tables, no_broadcast):
    got = sorted(
        bucketed_join(spark, "bk_turns", "bk_tools", "conv_id")
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("n_tool_turns").alias("t"))
        .collect()
    )
    want = sorted(
        bucketed_tables["turns"]
        .join(bucketed_tables["tools"], "conv_id")
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("n_tool_turns").alias("t"))
        .collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    agg = (
        spark.table("bk_turns")
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_idx"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, (
        "group-by on the bucket key must aggregate in place"
    )


def test_unbucketed_baseline_does_shuffle(spark, bucketed_tables, no_broadcast):
    """Sanity check that the assertion above is meaningful: the same
    join over non-bucketed inputs DOES contain a shuffle Exchange."""
    j = bucketed_tables["turns"].join(bucketed_tables["tools"], "conv_id")
    assert "Exchange hashpartitioning" in _plan(j)


def test_mismatched_bucket_counts_still_correct(spark, bucketed_tables, no_broadcast):
    """Joining n=8 against n=4 buckets: Spark may shuffle one side or
    coalesce buckets, but never returns wrong rows."""
    tools4 = spark.table("bk_tools").limit(100)
    write_bucketed(tools4, "bk_turns_nosort", "conv_id", 4)
    j = bucketed_join(spark, "bk_turns", "bk_turns_nosort", "conv_id")
    assert j.count() > 0
