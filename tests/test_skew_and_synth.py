"""Skew handling (salting) and the deterministic transcript synthesizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from saber_spark.operators.join import salted_equi_join, windowed_theta_join
from saber_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def zipf(spark):
    return synthesize_transcripts(
        spark, n_turns=20_000, n_convs=500, seed=7, zipf_exponent=3.0
    ).cache()


def test_synthesizer_deterministic_across_parallelism(spark):
    """Pure function of (id, seed): identical rows at any partition count."""
    a = synthesize_transcripts(spark, n_turns=5_000, n_convs=100, seed=11, partitions=2)
    b = synthesize_transcripts(spark, n_turns=5_000, n_convs=100, seed=11, partitions=16)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == 5_000


def test_synthesizer_invariants(spark, zipf):
    # (conv_id, turn_idx) is a primary key; ts strictly monotone per conv
    n = zipf.count()
    assert zipf.select("conv_id", "turn_idx").distinct().count() == n
    w = zipf.groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx"), F.count(F.lit(1)).alias("c")
    )
    assert w.where(F.col("mx") != F.col("c") - 1).count() == 0  # dense idx
    from pyspark.sql import Window

    lagged = zipf.withColumn(
        "prev", F.lag("ts").over(Window.partitionBy("conv_id").orderBy("turn_idx"))
    )
    assert lagged.where(F.col("prev") >= F.col("ts")).count() == 0


def test_zipf_skew_present(spark, zipf):
    """The head conversation must dominate (exercises the salting path)."""
    counts = zipf.groupBy("conv_id").count().toPandas().sort_values("count", ascending=False)
    # u^3 mapping: head conv draws (1/n_convs)^(1/3) ≈ 12.6% of all turns
    assert counts.iloc[0]["count"] > 0.08 * counts["count"].sum()
    assert counts.iloc[0]["count"] > 20 * counts["count"].median()


def test_salted_join_equals_plain_join_under_skew(spark, zipf):
    a = zipf.where(F.col("role") == "assistant").select(
        "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts"))
    b = zipf.where(F.col("role") == "tool").select(
        F.col("conv_id").alias("b_conv"), F.col("turn_idx").alias("b_turn"),
        F.col("ts").alias("b_ts"))
    bound = (
        F.abs(F.col("a_ts").cast("timestamp").cast("double")
              - F.col("b_ts").cast("timestamp").cast("double")) <= 60.0
    )
    plain = windowed_theta_join(
        a, b.withColumnRenamed("b_conv", "conv_id"), keys=("conv_id",),
        time_bound_s=60, left_ts="a_ts", right_ts="b_ts",
    ).select(a["conv_id"], "a_turn", "b_turn")
    salted = salted_equi_join(
        a, b.withColumnRenamed("b_conv", "conv_id"), key="conv_id",
        n_salt=8, extra=bound,
    ).select(a["conv_id"], "a_turn", "b_turn")
    assert plain.count() > 0
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_hot_key_salted_join_parity_and_replication(spark, zipf):
    """Hot-key-only salting must (a) equal the plain join, (b) replicate
    far fewer right rows than full salting: only hot keys get the extra
    n_salt-1 copies."""
    from saber_spark.operators.join import hot_key_salted_join

    a = zipf.where(F.col("role") == "assistant").select(
        "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts"))
    b = zipf.where(F.col("role") == "tool").select(
        F.col("conv_id").alias("b_conv"), F.col("turn_idx").alias("b_turn"),
        F.col("ts").alias("b_ts"))
    bound = (
        F.abs(F.col("a_ts").cast("timestamp").cast("double")
              - F.col("b_ts").cast("timestamp").cast("double")) <= 60.0
    )
    threshold = 200  # Zipf head convs only (20k turns / 500 convs, median ~13)
    plain = windowed_theta_join(
        a, b.withColumnRenamed("b_conv", "conv_id"), keys=("conv_id",),
        time_bound_s=60, left_ts="a_ts", right_ts="b_ts",
    ).select(a["conv_id"], "a_turn", "b_turn")
    hot = hot_key_salted_join(
        a, b.withColumnRenamed("b_conv", "conv_id"), key="conv_id",
        n_salt=8, hot_threshold=threshold, extra=bound,
    ).select(a["conv_id"], "a_turn", "b_turn")
    assert plain.count() > 0
    assert hot.exceptAll(plain).count() == 0
    assert plain.exceptAll(hot).count() == 0
    # replication accounting: full salting pays 8x on every right row
    n_right = b.count()
    hot_keys = (
        a.groupBy("conv_id").count().where(F.col("count") > threshold)
    )
    n_hot = hot_keys.count()
    assert 0 < n_hot < 10, f"{n_hot} hot keys — threshold should isolate the Zipf head"
    n_hot_right = b.withColumnRenamed("b_conv", "conv_id").join(
        hot_keys.select("conv_id"), "conv_id", "left_semi").count()
    replicated = n_right + 7 * n_hot_right
    assert replicated < 0.5 * 8 * n_right, (
        f"hot-only replication {replicated} rows vs full {8 * n_right}"
    )


def test_salting_spreads_hot_key(spark, zipf):
    """The hot conversation's rows must land in all n_salt buckets."""
    hot = (
        zipf.groupBy("conv_id").count().orderBy(F.col("count").desc()).first()["conv_id"]
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in zipf.columns]), F.lit(8))
    spread = (
        zipf.where(F.col("conv_id") == hot)
        .select(salt.alias("s"))
        .groupBy("s")
        .count()
        .toPandas()
    )
    assert len(spread) == 8
    assert spread["count"].min() > 0.05 * spread["count"].sum()


def test_asof_join_null_semantics_match_duckdb(spark):
    """ASOF carries the WHOLE latest right row: a null value in the
    latest right row must come through as null (not a stale non-null
    from an older row), and null-ts rows never match (the predicate
    l.ts >= r.ts is NULL). Non-null-ts rows are checked against DuckDB's
    native ASOF JOIN; the null-ts rows are asserted directly because
    DuckDB's implementation pairs NULL ts with NULL ts (a NULLS-LAST
    sort artifact we deliberately do not copy)."""
    import duckdb
    import pandas as pd

    from saber_spark.operators.join import asof_join

    right_pd = pd.DataFrame(
        {
            "k": ["x", "x", "x"],
            "rts": [1.0, 2.0, None],
            "a": [7.0, None, 9.0],
            "b": [None, 3.0, 9.0],
        }
    )
    left_pd = pd.DataFrame({"k": ["x", "x", "x"], "lts": [0.5, 5.0, None]})
    got = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            key="k",
            left_ts="lts",
            right_ts="rts",
            right_values=["a", "b"],
        )
        .toPandas()
        .sort_values("lts", na_position="first")
        .reset_index(drop=True)
    )
    # null-ts left row: matches nothing (strict predicate semantics)
    null_row = got[got.lts.isna()]
    assert len(null_row) == 1
    assert null_row.asof_a.isna().all() and null_row.asof_b.isna().all()
    # non-null rows: exact DuckDB ASOF parity, including the whole-row
    # null carry (lts=5 -> latest right row rts=2 has a=NULL: stays NULL)
    con = duckdb.connect()
    con.register("l", left_pd.dropna(subset=["lts"]))
    con.register("r", right_pd)
    want = con.execute(
        """
        SELECT l.lts, r.a AS asof_a, r.b AS asof_b
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts >= r.rts
        ORDER BY l.lts
        """
    ).df().reset_index(drop=True)
    nn = got[got.lts.notna()].reset_index(drop=True)
    assert nn[["lts", "asof_a", "asof_b"]].equals(want), f"\ngot:\n{nn}\nwant:\n{want}"
