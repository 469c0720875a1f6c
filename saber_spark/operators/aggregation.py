"""Windowed aggregation — the reference engine's core operator family.

Covers reference ``cql/operators/cpu/Aggregation.java`` (all four paths:
whole-window, incremental, hash group-by, incremental group-by) with the
complete aggregate-function set CNT/SUM/AVG/MIN/MAX (reference
``AggregationType.java:3-5``). On Spark:

- RANGE windows (tumbling + sliding)  → ``groupBy(F.window(ts, size, slide))``
  — Tungsten hash aggregate with map-side partials; the opening/closing/
  pending/complete cross-batch merge of the reference (``PartialResultSlot.
  java:105-685``) is subsumed by the Structured Streaming state store.
- ROW windows (count-based, no Spark primitive) → dense per-key index
  bucketing: tumbling is one ``floor(idx/size)``; sliding fans each row
  out to its ``size/slide`` owning windows via a literal offset array +
  ``explode`` (Catalyst codegen; no Python).
- The pane-partial incremental path (Saber's signature optimization) lives
  in ``panes.py``; this module is the semantic oracle for it.

At scale: a groupBy(window, keys) shuffles once on (window, keys); partial
aggregation happens map-side, so shuffle volume is #distinct groups, not
#rows. Sliding fan-out multiplies rows by size/slide *before* the partial
aggregate — for large ratios prefer the pane layer (panes.py) which keeps
the fan-out at pane granularity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.windows import RANGE, ROW, WindowDef

#: complete reference aggregate set (AggregationType.java:3-5)
AGG_FNS = {
    "cnt": lambda c: F.count(c if c != "*" else F.lit(1)),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class AggSpec:
    fn: str  # one of AGG_FNS
    col: str | Column
    alias: str

    def to_column(self) -> Column:
        if self.fn not in AGG_FNS:
            raise KeyError(f"unknown aggregate {self.fn!r}; known: {sorted(AGG_FNS)}")
        return AGG_FNS[self.fn](self.col).alias(self.alias)


def session_aggregate(
    df: DataFrame,
    gap_s: int | Column,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = ("conv_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Session-window aggregate (gap-based). Absent in the reference —
    required by the north_star; semantics are Spark's ``session_window``:
    an event extends its session to ``ts + gap``; a new session starts
    when the next event's ts >= previous session end. Emits session_start
    / session_end as epoch seconds plus the aggregates.

    ``gap_s`` may be a per-event interval Column (dynamic session gap —
    e.g. shorter timeouts for tool turns): each event's window is
    [ts, ts+gap(event)) and overlapping windows merge, so session_end is
    the max of ts+gap over the merged events. Events with a non-positive
    gap are dropped by Spark's session operator.

    Batch form here; the same expression works under ``readStream`` with
    a watermark (state-store session merge) — see streaming/jobs.py.
    """
    gap = gap_s if isinstance(gap_s, Column) else f"{gap_s} seconds"
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("session"), *[F.col(k) for k in keys]).agg(
        *[a.to_column() for a in aggs]
    )
    return out.select(
        F.col("session.start").cast("timestamp").cast("long").alias("session_start"),
        F.col("session.end").cast("timestamp").cast("long").alias("session_end"),
        *keys,
        *[F.col(a.alias) for a in aggs],
    )


def windowed_aggregate(
    df: DataFrame,
    wd: WindowDef,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    key_for_row_windows: str = "conv_id",
) -> DataFrame:
    """Aggregate per window instance (and optional group-by keys).

    RANGE output: ``window_start``/``window_end`` epoch-seconds BIGINT +
    keys + aggregates. ROW output: ``key_for_row_windows`` + ``window_id``
    + keys + aggregates (count windows are per-conversation, mirroring the
    reference's single totally-ordered stream per query).
    """
    agg_cols = [a.to_column() for a in aggs]
    if wd.kind == RANGE:
        win = wd.range_window_col(ts_col)
        out = df.groupBy(win.alias("window"), *[F.col(k) for k in keys]).agg(*agg_cols)
        # TIMESTAMP_NTZ (parquet) → epoch long via LTZ cast; session TZ is
        # pinned to UTC so this equals DuckDB's epoch() on naive timestamps.
        return out.select(
            F.col("window.start").cast("timestamp").cast("long").alias("window_start"),
            F.col("window.end").cast("timestamp").cast("long").alias("window_end"),
            *keys,
            *[F.col(a.alias) for a in aggs],
        )

    assert wd.kind == ROW
    if wd.is_tumbling:
        wid = wd.row_window_id(idx_col).alias("window_id")
        grouped = df.groupBy(F.col(key_for_row_windows), wid, *[F.col(k) for k in keys])
    else:
        # Sliding count window: row idx belongs to window w (w = start/slide)
        # iff w*slide <= idx < w*slide + size. Fan out by literal offsets —
        # stays inside whole-stage codegen, no UDF.
        n = wd.windows_per_row
        offsets = F.array(*[F.lit(i) for i in range(n)])
        base = F.floor(F.col(idx_col) / F.lit(wd.slide)).cast("long")
        fanned = (
            df.withColumn("_k", F.explode(offsets))
            .withColumn("window_id", base - F.col("_k"))
            .where(
                (F.col("window_id") >= 0)
                & (F.col(idx_col) < F.col("window_id") * wd.slide + wd.size)
            )
        )
        grouped = fanned.groupBy(
            F.col(key_for_row_windows), F.col("window_id"), *[F.col(k) for k in keys]
        )
    out = grouped.agg(*agg_cols)
    return out.select(
        key_for_row_windows,
        "window_id",
        *keys,
        *[F.col(a.alias) for a in aggs],
    )
