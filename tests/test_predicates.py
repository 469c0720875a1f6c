"""Predicate surface: comparison ops incl. the 2-stream (column-vs-column)
form, n-ary connectives, wide OR."""

from __future__ import annotations

from pyspark.sql import functions as F

from saber_spark.operators.predicates import and_, cmp, or_, wide_or


def test_cmp_column_vs_column(spark):
    """The reference's 2-stream predicate form compares two columns
    (IntComparisonPredicate with two expressions); cmp() must accept a
    Column value without rebinding it through F.col."""
    df = spark.createDataFrame([(1, 2), (3, 3), (5, 4)], "a int, b int")
    got = sorted(r["a"] for r in df.where(cmp("a", "<", F.col("b"))).collect())
    assert got == [1]
    got = sorted(r["a"] for r in df.where(cmp("a", ">=", F.col("b") + 1)).collect())
    assert got == [5]


def test_connectives_and_wide_or(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "x int")
    p = and_(cmp("x", ">=", 5), or_(cmp("x", "<", 8), cmp("x", "=", 15)))
    assert sorted(r["x"] for r in df.where(p).collect()) == [5, 6, 7, 15]
    w = wide_or("x", "=", [2, 4, 6])
    assert sorted(r["x"] for r in df.where(w).collect()) == [2, 4, 6]
