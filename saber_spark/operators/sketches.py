"""Approximate (sketch-backed) aggregates: the scale path next to the
engine's exact operators for cardinality, quantiles, and heavy hitters.

At 100 TB an exact COUNT(DISTINCT) is a full shuffle of every distinct
value and an exact median is a global sort; the sketch versions are
single-scan, map-side-mergeable, and constant-memory per group — the
standard trade for monitoring dashboards, mix diagnostics, and
pre-flight corpus stats where a 1-5% error is free speed. Exact twins
stay available (`heavy_hitter_terms` in retrieval.py is the exact
frequency mine; `groupBy().countDistinct()` the exact cardinality), and
the tests bound each sketch against its exact twin on real data.

All three are JVM-side built-ins (HyperLogLog++, Greenwald-Khanna /
KLL-style quantile summaries, Karp-Papadimitriou-Shenker frequent
items) — no Python in the path, partial merges happen map-side, and the
shuffled state per group is the fixed-size sketch, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_distinct", "approx_quantiles", "frequent_items"]


def approx_distinct(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct count of `value_col`, optionally per group.
    `rsd` is the target relative standard deviation (Spark default
    0.05). Returns (group_cols..., approx_distinct). Shuffles one
    fixed-size HLL register set per group — never the values.
    """
    if not (0.0 < rsd < 1.0):
        raise ValueError("approx_distinct: rsd must be in (0, 1)")
    agg = F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: list[float],
    *,
    group_cols: list[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles of `value_col` at the given probabilities
    (rank error ≤ 1/accuracy), optionally per group. Returns
    (group_cols..., quantiles: array<double> aligned with
    `probabilities`). One scan, mergeable summaries, no sort.
    """
    if not probabilities:
        raise ValueError("approx_quantiles: probabilities must be non-empty")
    if any(not (0.0 <= p <= 1.0) for p in probabilities):
        raise ValueError("approx_quantiles: probabilities must be in [0, 1]")
    if accuracy < 1:
        raise ValueError("approx_quantiles: accuracy must be >= 1")
    agg = F.percentile_approx(
        F.col(value_col).cast("double"),
        F.array(*[F.lit(p) for p in probabilities]),
        F.lit(accuracy),
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def frequent_items(
    df: DataFrame,
    value_col: str,
    *,
    min_frac: float = 0.01,
) -> DataFrame:
    """Single-pass frequent-items sketch (KPS/lossy-count style, via
    DataFrame.freqItems): every value occurring in > `min_frac` of rows
    is guaranteed present; false positives possible (the classic
    one-sided sketch contract — verify the shortlist exactly if needed,
    the shortlist is tiny). Returns one row per candidate: (item).
    """
    if not (0.0 < min_frac < 1.0):
        raise ValueError("frequent_items: min_frac must be in (0, 1)")
    freq = df.stat.freqItems([value_col], support=min_frac)
    # freqItems yields a single row with an array column `<col>_freqItems`
    return freq.select(
        F.explode(F.col(f"{value_col}_freqItems")).alias("item")
    ).where(F.col("item").isNotNull())
