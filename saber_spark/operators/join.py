"""Join operators.

Reference: one join — the windowed nested-loop **ThetaJoin**
(``cql/operators/cpu/ThetaJoin.java:96-272``): two timestamp-ordered
streams, each arriving tuple scans the opposite stream's current window
under an arbitrary predicate, with per-side window eviction
(``ThetaJoin.java:171-196,239-267``). Equi-join is theta with EQUAL_OP.

Spark-first re-expression:

- ``windowed_theta_join`` — equi keys (conv_id) + a time-interval bound +
  optional theta predicate. Catalyst runs the equi part as a shuffled
  hash/sort-merge join (or broadcast if one side is small) and applies
  the interval + theta conditions as join filters; the reference's
  window eviction becomes the interval bound (batch) / watermark state
  eviction (streaming, see streaming/jobs.py). At scale both sides
  shuffle once on conv_id — never the O(n·m) scan of the reference.
- ``asof_join`` — "latest right row at or before each left row" (absent
  in the reference; standard for transcript/tool-event alignment).
  Implemented shuffle-once with the union-tag trick: tag both sides,
  single sort-within-partition by (key, ts, side), carry right values
  forward with ``last(ignorenulls)`` over an unbounded-preceding window,
  keep left rows. No fan-out, no UDF, no driver loop — O(n log n) per
  partition and exactly one exchange on the key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def windowed_theta_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("conv_id",),
    time_bound_s: int | None = None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    theta: Column | None = None,
    how: str = "inner",
    row_bound: int | None = None,
    left_idx: str = "turn_idx",
    right_idx: str = "turn_idx",
) -> DataFrame:
    """Equi-join on keys, bounded to |l.ts - r.ts| <= time_bound_s (the
    reference's RANGE-window eviction) and/or |l.idx - r.idx| <=
    row_bound (its ROW-window eviction, ``ThetaJoin.java:171-196`` — a
    tuple joins only the opposite stream's last N tuples), plus an
    arbitrary theta predicate. Columns of both sides must be pre-aliased
    to distinct names (reference merges tuple schemas the same way —
    ``ExpressionsUtil.mergeTupleSchemas``)."""
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    if time_bound_s is not None:
        bound = (
            F.abs(
                left[left_ts].cast("timestamp").cast("double")
                - right[right_ts].cast("timestamp").cast("double")
            )
            <= F.lit(float(time_bound_s))
        )
        cond = bound if cond is None else cond & bound
    if row_bound is not None:
        rb = F.abs(left[left_idx] - right[right_idx]) <= F.lit(row_bound)
        cond = rb if cond is None else cond & rb
    if theta is not None:
        cond = theta if cond is None else cond & theta
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for each left row, the values of the latest
    right row with ``right.ts <= left.ts`` (``<`` if strict) on the same
    key. Matches DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics for
    non-null timestamps; null-ts rows on EITHER side match nothing (the
    SQL predicate is NULL) — DuckDB's native ASOF instead pairs NULL ts
    with NULL ts via its NULLS-LAST sort, a quirk we do not copy.

    Single shuffle on ``key``; the sort + running ``last(ignorenulls)``
    happen within partitions (whole-stage codegen window exec).
    """
    lcols = left.columns
    # side tag orders right rows before left at equal ts => '<=' semantics
    r_tag, l_tag = (1, 0) if strict else (0, 1)
    # The right row's values travel as ONE struct so the carried match is
    # always a single whole row — per-column last(ignorenulls) would
    # compose values from DIFFERENT right rows when right columns hold
    # nulls (a stale non-null smearing past the latest row's null).
    # NULL-ts right rows are dropped: the ASOF predicate l.ts >= r.ts is
    # never true for them (they would otherwise sort first and "match"
    # every left row that has no real predecessor).
    r = right.where(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(r_tag).alias("_side"),
        F.struct(*[F.col(v) for v in right_values]).alias("_rv"),
        *[F.lit(None).alias(f"_lv_{c}") for c in lcols],
    )
    rv_type = dict(r.dtypes)["_rv"]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(l_tag).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
        *[F.col(c).alias(f"_lv_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*", F.last(F.col("_rv"), ignorenulls=True).over(w).alias("_asof")
    )
    is_left = F.col("_side") == F.lit(l_tag)
    return carried.where(is_left).select(
        *[F.col(f"_lv_{c}").alias(c) for c in lcols],
        *[F.col("_asof")[v].alias(f"asof_{v}") for v in right_values],
    )


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    extra: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left rows get a deterministic salt in
    [0, n_salt); the right side is replicated n_salt times; the join key
    becomes (key, salt). A hot key (one conversation with millions of
    turns — the Zipf head of the north_star workload) is thereby spread
    over n_salt shuffle partitions instead of one straggler task.

    Result rows are identical to the unsalted join for inner/left/semi
    (verified against the same oracle in plans/saber_queries.py); right
    and full outer would emit unmatched right rows once per salt, so
    those modes are rejected. Use when AQE's skew-join splitting isn't
    available or the skew is known up front; cost is n_salt× replication
    of the (smaller) right side. For replication restricted to hot keys
    only, see ``hot_key_salted_join``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"salted_equi_join supports inner/left/left_semi only (got {how!r}): "
            "unmatched right rows would be duplicated n_salt times"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_s = left.withColumn("_salt", salt)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    r_s = right.withColumn("_salt", salts)
    cond = (l_s[key] == r_s[key]) & (l_s["_salt"] == r_s["_salt"])
    if extra is not None:
        cond = cond & extra
    return l_s.join(r_s, cond, how).drop("_salt")


def hot_key_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    hot_threshold: int = 100_000,
    extra: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join that salts ONLY keys above a frequency
    threshold (two-pass): pass 1 counts left-side key frequencies and
    keeps the (tiny) hot set, broadcast everywhere; pass 2 salts left
    rows of hot keys into n_salt buckets and replicates ONLY the hot
    right rows per salt — every other row joins unsalted.

    vs ``salted_equi_join`` (which replicates the whole right side
    n_salt×): shuffle volume is |right| + (n_salt-1)·|right ∩ hot|
    instead of n_salt·|right|. On a Zipf-head workload the hot set is a
    handful of keys, so the replication cost collapses while stragglers
    still split. The frequency scan is one extra pass over the (already
    pruned) left side — at 100 TB that pass is map-side count-distinct
    volume, far cheaper than 8× shuffle replication.

    Same how restriction as salted_equi_join (inner/left/left_semi).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"hot_key_salted_join supports inner/left/left_semi only (got {how!r})"
        )
    hot = (
        left.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_freq"))
        .where(F.col("_freq") > hot_threshold)
        .select(F.col(key).alias("_hot_key"))
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_s = (
        left.join(F.broadcast(hot), left[key] == F.col("_hot_key"), "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot_key").isNotNull(), salt).otherwise(F.lit(0)),
        )
        .drop("_hot_key")
    )
    # right: one unsalted copy (salt 0) + replicas 1..n-1 for hot keys only
    r_hot = (
        right.join(F.broadcast(hot), right[key] == F.col("_hot_key"), "inner")
        .drop("_hot_key")
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(1, n_salt)])))
    )
    r_s = right.withColumn("_salt", F.lit(0).cast("int")).unionByName(
        r_hot.withColumn("_salt", F.col("_salt").cast("int"))
    )
    cond = (l_s[key] == r_s[key]) & (l_s["_salt"] == r_s["_salt"])
    if extra is not None:
        cond = cond & extra
    return l_s.join(r_s, cond, how).drop("_salt")
