"""Pane-based sliding-window aggregation — Saber's signature optimization.

Reference semantics: a sliding window (size w, slide s) is decomposed into
panes of ``gcd(w, s)`` (``WindowDefinition.java:28-57``); each pane is
aggregated once and every window instance is the combination of its
``w/pane`` panes (``WindowBatch.java:352-643``, ``Reduction.cl:41-120``).
For invertible functions (CNT/SUM/AVG) the reference additionally keeps a
running aggregate mutated by add/subtract deltas between consecutive
windows (``Aggregation.java:78,607-653,1042-1168``).

Spark's built-in sliding ``window()`` duplicates each *row* into its
``w/s`` owning windows before aggregating. The pane layer instead:

1. **Pane partials** — one ``groupBy(pane [, keys])``: shuffle volume is
   #panes × #keys, independent of the w/s ratio. The key property (why a
   pane-level recombination is exact): every row of a pane belongs to
   exactly the same set of windows, because window starts are multiples
   of s and pane divides s.
2. **Recombination**, two interchangeable strategies:
   - ``fanout`` (pure DataFrame): each pane partial is exploded to its
     ≤⌈w/s⌉ owning windows and partials are merged by a second groupBy.
     Fan-out now happens at *pane* granularity — for 100 TB of rows with
     w/s = 12 this is 12× a few thousand pane rows, not 12× the input.
   - ``incremental`` (Arrow-batched ``applyInPandas``, the reference's
     subtract-on-evict re-expressed as vectorized pandas): per key, each
     pane partial fans out to its ≤⌈w/s⌉ aligned windows and one groupby
     merges per stat — the running add/subtract aggregate and two-stacks
     MIN/MAX collapse to O(#panes × fanout) work, independent of the
     pane-id span. No per-row Python; one pandas batch per key.

AVG partial merge uses sum/cnt — algebraically the reference's
``((v1*c2)+(v2*c1))/(c1+c2)`` (``PartialResultSlot.java:190-197``).

Output schema and values are identical to ``windowed_aggregate`` (the
semantic oracle); parity is bit-exact for integer inputs and checked by
tests/test_panes.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.aggregation import AggSpec
from saber_spark.operators.windows import RANGE, ROW, WindowDef

#: partial statistics required per aggregate function. ``cntc`` is the
#: per-column NON-NULL count — F.avg / F.count(col) skip nulls, so cnt
#: of rows cannot stand in for the avg denominator or cnt(col) when the
#: aggregated column is nullable.
def _needs(fn: str, col) -> tuple[str, ...]:
    if fn == "cnt":
        return ("cnt",) if (isinstance(col, str) and col == "*") else ("cntc",)
    if fn == "sum":
        return ("sum", "cntc")  # cntc restores null for all-null windows
    if fn == "avg":
        return ("sum", "cntc")
    return (fn,)  # min / max


_PARTIAL_FN = {
    "cnt": lambda c: F.count(F.lit(1)),
    "cntc": F.count,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}

_MERGE_FN = {"cnt": F.sum, "cntc": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _src_name(a: AggSpec) -> str:
    return a.col if isinstance(a.col, str) else a.alias


def _partial_cols(aggs: Sequence[AggSpec]) -> dict[str, tuple[str, str | object]]:
    """name -> (stat, source col). Shared stats are deduplicated."""
    # _cnt is always computed: it decides which windows are non-empty
    out: dict[str, tuple[str, object]] = {"_cnt": ("cnt", "*")}
    for a in aggs:
        for stat in _needs(a.fn, a.col):
            if stat == "cnt":
                continue
            out.setdefault(f"_{stat}_{_src_name(a)}", (stat, a.col))
    return out


def _final_col(a: AggSpec) -> F.Column:
    src = _src_name(a)
    if a.fn == "cnt":
        if isinstance(a.col, str) and a.col == "*":
            return F.col("_cnt").alias(a.alias)
        return F.col(f"_cntc_{src}").alias(a.alias)
    if a.fn == "avg":
        # null sum / zero cntc for an all-null window → null, like F.avg
        return (F.col(f"_sum_{src}") / F.col(f"_cntc_{src}")).alias(a.alias)
    return F.col(f"_{a.fn}_{src}").alias(a.alias)


def pane_windowed_aggregate(
    df: DataFrame,
    wd: WindowDef,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    row_key: str = "conv_id",
    method: str = "fanout",
) -> DataFrame:
    """Sliding-window aggregate via pane decomposition.

    Output matches ``windowed_aggregate`` exactly: RANGE →
    (window_start, window_end, *keys, *aggs); ROW → (row_key, window_id,
    *keys, *aggs).
    """
    if method not in ("fanout", "incremental"):
        raise ValueError(f"method must be fanout|incremental, got {method!r}")
    pane = wd.pane_size
    if wd.kind == RANGE:
        pos = F.floor(F.col(ts_col).cast("timestamp").cast("double") / F.lit(pane)).cast("long")
        part_keys = list(keys)
    else:
        pos = F.floor(F.col(idx_col) / F.lit(pane)).cast("long")
        part_keys = [row_key, *keys]

    partials = _pane_partials(df, pos, aggs, part_keys)

    if method == "fanout":
        combined = _recombine_fanout(partials, wd, aggs, part_keys)
    else:
        combined = _recombine_incremental(partials, wd, aggs, part_keys)

    if wd.kind == RANGE:
        return combined.select(
            (F.col("_w") * pane).alias("window_start"),
            (F.col("_w") * pane + wd.size).alias("window_end"),
            *keys,
            *[F.col(a.alias) for a in aggs],
        )
    return combined.select(
        F.col(row_key),
        # _w is the window start in pane units; window_id = start/slide
        ((F.col("_w") * pane) / wd.slide).cast("long").alias("window_id"),
        *keys,
        *[F.col(a.alias) for a in aggs],
    )


def _pane_partials(df, pos, aggs, part_keys) -> DataFrame:
    pcols = _partial_cols(aggs)
    agg_exprs = []
    for name, (stat, src) in pcols.items():
        agg_exprs.append(_PARTIAL_FN[stat](F.lit(1) if stat == "cnt" else src).alias(name))
    return df.groupBy(pos.alias("_pane"), *[F.col(k) for k in part_keys]).agg(*agg_exprs)


def _recombine_fanout(partials, wd, aggs, part_keys) -> DataFrame:
    """Pane -> windows explode + merge groupBy (pure Catalyst).

    (The multi-query sharing path, :func:`shared_pane_aggregate`,
    recombines at the FINER global-gcd pane with its own single-explode
    fan-out over (query, window) pairs rather than through this
    per-window helper.)"""
    pane = wd.pane_size
    stride = wd.slide // pane  # panes per slide
    n = wd.windows_per_row  # ceil(size/slide) candidate windows per pane
    pcols = _partial_cols(aggs)
    offsets = F.array(*[F.lit(i) for i in range(n)])
    # latest window start (in pane units, aligned to stride) <= pane
    base = (F.floor(F.col("_pane") / F.lit(stride)) * F.lit(stride)).cast("long")
    fanned = (
        partials.withColumn("_j", F.explode(offsets))
        .withColumn("_w", base - F.col("_j") * F.lit(stride))
        # window [w, w + size) must still contain this pane
        .where(F.col("_pane") * pane < F.col("_w") * pane + wd.size)
    )
    if wd.kind == ROW:
        # count-based windows start at tuple 0 — no negative-start windows
        fanned = fanned.where(F.col("_w") >= 0)
    merged = fanned.groupBy(F.col("_w"), *[F.col(k) for k in part_keys]).agg(
        *[_MERGE_FN[stat](F.col(name)).alias(name) for name, (stat, _) in pcols.items()]
    )
    return merged.select("_w", *part_keys, *[_final_col(a) for a in aggs])


def _recombine_incremental(partials, wd, aggs, part_keys) -> DataFrame:
    """Subtract-on-evict over sparse pane partials inside applyInPandas.

    One Arrow batch per key group; pane→window fan-out + per-stat groupby
    = the running add/subtract aggregate and two-stacks min/max, at
    O(#panes × fanout) regardless of pane-id span. Falls back to a
    single global group when no keys are given (documented: a global
    sliding aggregate is a single logical series; the pane partials that
    feed it are still computed distributed).
    """
    import pyspark.sql.types as T

    pane = wd.pane_size
    np_win = wd.num_panes  # panes per window
    stride = wd.panes_per_slide
    allow_negative_starts = wd.kind == RANGE
    pcols = _partial_cols(aggs)
    stat_of = {name: stat for name, (stat, _) in pcols.items()}

    schema_fields = [T.StructField("_w", T.LongType())]
    for k in part_keys:
        schema_fields.append(T.StructField(k, partials.schema[k].dataType))
    for a in aggs:
        if a.fn == "cnt":
            t = T.LongType()
        elif a.fn == "avg":
            t = T.DoubleType()
        else:
            src = f"_{a.fn}_{_src_name(a)}"
            t = partials.schema[src].dataType
        schema_fields.append(T.StructField(a.alias, t))
    out_schema = T.StructType(schema_fields)

    agg_specs = [(a.alias, a.fn, _src_name(a)) for a in aggs]
    part_names = list(pcols.keys())
    int_aliases = {
        f.name
        for f in schema_fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType))
        and f.name not in ("_w", *part_keys)
    }

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        # SPARSE window recombination: each pane fans out to its
        # ≤ ceil(np_win/stride) candidate (aligned) windows and a groupby
        # merges per-stat — cost O(#panes × fanout), independent of the
        # pane-id SPAN (a dense [min, max] grid OOMs on one corrupt
        # far-out pane id). Integer partials (counts always; sums when
        # Arrow delivered null-free int64) merge in int64, so running
        # sums past 2^53 stay EXACT, matching the fanout method and the
        # streaming twin; null sum partials (all-null pane) are NaN,
        # which pandas' sum skips — the cntc mask restores window-level
        # null below.
        p = pdf["_pane"].to_numpy(dtype=np.int64)
        frames = []
        for k in range(-(-np_win // stride)):
            w = p // stride - k
            m = (w * stride + np_win) > p  # pane inside window
            if not allow_negative_starts:
                m &= w >= 0
            if not m.any():
                continue
            d = {"_wid": w[m]}
            for name in part_names:
                d[name] = pdf[name].to_numpy()[m]
            frames.append(pd.DataFrame(d))
        if frames:
            merge_of = {"cnt": "sum", "cntc": "sum", "sum": "sum",
                        "min": "min", "max": "max"}
            gb = (
                pd.concat(frames, ignore_index=True)
                .groupby("_wid", as_index=False)
                .agg(**{n: (n, merge_of[stat_of[n]]) for n in part_names})
                .sort_values("_wid")
            )
        else:
            gb = pd.DataFrame(columns=["_wid", *part_names])
        out = {name: gb[name].to_numpy() for name in part_names}
        n_win = len(gb)
        keep = np.ones(n_win, dtype=bool)  # every candidate has >=1 row

        def masked(vals: np.ndarray, mask: np.ndarray | None, alias: str):
            """Window values → column, null where mask is False / val NaN."""
            s = pd.Series(vals)
            if mask is not None:
                s = s.where(mask)
            # nullable dtypes so NaN → true null through Arrow (F.avg of an
            # all-null window is NULL, never NaN)
            return s.astype("Int64" if alias in int_aliases else "Float64")

        res = {"_w": gb["_wid"].to_numpy(dtype=np.int64) * stride}
        for k in part_keys:
            res[k] = np.repeat(pdf[k].iloc[0], n_win)
        for alias, fn, src in agg_specs:
            if fn == "cnt" and src == "*":
                res[alias] = out["_cnt"][keep].astype(np.int64)
            elif fn == "cnt":
                res[alias] = out[f"_cntc_{src}"][keep].astype(np.int64)
            elif fn == "avg":
                cntc = out[f"_cntc_{src}"][keep]
                with np.errstate(invalid="ignore", divide="ignore"):
                    vals = out[f"_sum_{src}"][keep] / cntc
                res[alias] = masked(vals, cntc > 0, alias)
            elif fn == "sum":
                cntc = out[f"_cntc_{src}"][keep]
                res[alias] = masked(out[f"_sum_{src}"][keep], cntc > 0, alias)
            else:
                res[alias] = masked(out[f"_{fn}_{src}"][keep], None, alias)
        return pd.DataFrame(res)

    if part_keys:
        grouped = partials.groupBy(*part_keys)
    else:
        grouped = partials.withColumn("_g", F.lit(1)).groupBy("_g")
    return grouped.applyInPandas(combine, out_schema)


def shared_pane_aggregate(
    df: DataFrame,
    queries: dict[str, WindowDef],
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    row_key: str = "conv_id",
) -> DataFrame:
    """MULTI-QUERY window sharing: N concurrent RANGE sliding-window
    queries answered from ONE pane-partial aggregation in ONE plan.

    Saber runs many window queries over the same stream (figure-07's
    CM/SG/LRB set); each differs only in (size, slide). Decomposing at
    the GLOBAL pane — gcd over every query's size and slide — lets one
    ``groupBy(pane, keys)`` serve them all. Rather than unioning N
    recombinations (which plans N aggregations and relies on exchange
    reuse that Catalyst does not guarantee across union branches), each
    pane partial fans out to its owning (query, window) pairs in a
    single explode, and one merge groupBy keyed on (query, window,
    keys) finishes every query at once. The physical plan is exactly:
    scan → pane partial agg → exchange → explode(Σ_q ceil(size/slide))
    → merge agg → exchange — one scan and two shuffles TOTAL regardless
    of how many queries subscribe (asserted in tests/test_panes.py).
    The batch analogue of Saber dispatching one stream to many query
    tasks.

    Returns the union-shaped result tagged by ``query`` name, each leg
    bit-identical to ``pane_windowed_aggregate(df, wd, ...)`` run alone.
    RANGE (event-time) and ROW (count over the dense per-conversation
    ``idx_col``) query sets are both supported — but not mixed, since
    the two pane grids are incommensurable.

    Scale: shuffle volume is #global-panes × #keys (finer gcd → more
    panes — the cost of sharing is pane granularity, bounded by
    gcd(all sizes, all slides); degenerate 1-second global panes over
    years of data mean the queries were too heterogeneous to share —
    split the set instead).
    """
    if not queries:
        raise ValueError("need at least one query")
    import math as _math

    kinds = {wd.kind for wd in queries.values()}
    if len(kinds) > 1:
        raise ValueError(
            "shared panes need ONE pane grid; RANGE (event-time) and ROW "
            f"(count) queries cannot share it — got {sorted(kinds)}"
        )
    kind = kinds.pop()
    pane = 0
    for wd in queries.values():
        pane = _math.gcd(pane, _math.gcd(wd.size, wd.slide))

    if kind == RANGE:
        pos = F.floor(
            F.col(ts_col).cast("timestamp").cast("double") / F.lit(pane)
        ).cast("long")
        part_keys = list(keys)
    else:
        pos = F.floor(F.col(idx_col) / F.lit(pane)).cast("long")
        part_keys = [row_key, *keys]
    partials = _pane_partials(df, pos, aggs, part_keys)

    # every (query, candidate-offset) this pane could feed, as literals
    entries = [
        F.struct(
            F.lit(name).alias("q"),
            F.lit(j).alias("j"),
            F.lit(wd.slide // pane).alias("stride"),
            F.lit(wd.size).alias("size"),
            F.lit(wd.slide).alias("slide"),
        )
        for name, wd in queries.items()
        for j in range(wd.windows_per_row)
    ]
    pcols = _partial_cols(aggs)
    base = (
        F.floor(F.col("_pane") / F.col("_e.stride")) * F.col("_e.stride")
    ).cast("long")
    fanned = (
        partials.withColumn("_e", F.explode(F.array(*entries)))
        .withColumn("_w", base - F.col("_e.j") * F.col("_e.stride"))
        # window [w, w + size) must still contain this pane
        .where(F.col("_pane") * pane < F.col("_w") * pane + F.col("_e.size"))
    )
    if kind == ROW:
        # count-based windows start at tuple 0 — no negative-start windows
        fanned = fanned.where(F.col("_w") >= 0)
    merged = fanned.groupBy(
        F.col("_e.q").alias("query"),
        F.col("_e.size").alias("_size"),
        F.col("_e.slide").alias("_slide"),
        F.col("_w"),
        *[F.col(k) for k in part_keys],
    ).agg(
        *[_MERGE_FN[stat](F.col(name)).alias(name) for name, (stat, _) in pcols.items()]
    )
    if kind == RANGE:
        return merged.select(
            "query",
            (F.col("_w") * pane).alias("window_start"),
            (F.col("_w") * pane + F.col("_size")).alias("window_end"),
            *keys,
            *[_final_col(a) for a in aggs],
        )
    return merged.select(
        "query",
        F.col(row_key),
        # _w is aligned to stride, so _w*pane is a multiple of the slide
        ((F.col("_w") * pane) / F.col("_slide")).cast("long").alias("window_id"),
        *keys,
        *[_final_col(a) for a in aggs],
    )
