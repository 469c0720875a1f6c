"""Streaming pane-based sliding-window aggregation — the north-star
operator: Saber's slide-decomposition + subtract-on-evict running
aggregate, on an unbounded watermarked stream.

Reference semantics re-expressed (``WindowBatch.java:352-643``,
``Aggregation.java:607-653``, ``PartialResultSlot.java:105-300``):

- each micro-batch's rows are collapsed to **pane partials** (pane =
  ``gcd(size, slide)`` grid) with vectorized pandas ops — the analogue
  of the reference computing closing/pending/opening fragments per task;
- partials merge into **keyed state** (one pane ring per group key, the
  reference's intermediate result slots). State is typed array columns,
  not an opaque blob, so the state store tracks real sizes;
- a window emits exactly once, when the **event-time watermark** passes
  its end: window values come from a sparse pane→window fan-out +
  per-stat groupby (the add/subtract running aggregate and two-stacks
  min-max of ``Aggregation.java:1042-1168``) — never a re-scan of rows,
  and never an allocation proportional to the pane-id span;
- panes are **evicted** once the last window containing them has
  emitted (the reference frees result slots the same way,
  ``ResultAggregator.java:211-216``), so state per key is bounded by
  ``size/pane + watermark-lag`` panes regardless of stream length;
- an **event-time timeout** set to the next pending window end makes a
  group emit/flush even when it receives no further rows — a silent
  conversation cannot hold its windows hostage.

Unlike Spark's built-in sliding ``window()`` (which replicates every
*row* into size/slide windows before the streaming agg), state and
shuffle here scale with #panes × #keys.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from saber_spark.operators.windows import RANGE, WindowDef


def streaming_pane_sliding_aggregate(
    stream: DataFrame,
    wd: WindowDef,
    value_col: str = "text_len",
    keys: Sequence[str] = ("tool",),
    ts_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Sliding RANGE-window CNT/SUM/MIN/MAX/AVG per key on a stream.

    Emits one row per (key, window) with columns
    (window_start, window_end, *keys, n_rows, sum_val, min_val,
    max_val, avg_val) — epoch-second window bounds identical to the
    batch pane layer and to ``F.window``. ``value_col`` must be
    non-null (the row count doubles as the value count).

    A window [w, w+size) is emitted in the first micro-batch whose
    watermark reaches ``w+size`` (watermark = max event time −
    ``watermark`` delay); rows later than the watermark are dropped
    upstream by ``withWatermark``, which is exactly what makes the
    emit-once decision safe.
    """
    if wd.kind != RANGE:
        raise ValueError("streaming panes are event-time; ROW windows use "
                         "streaming_count_windows")
    pane = wd.pane_size
    size = wd.size
    np_win = wd.num_panes
    stride = wd.panes_per_slide
    keys = list(keys)

    src = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    # the watermark-tagged ts column must flow INTO the stateful operator
    # (EventTimeTimeout requires it); the epoch is derived in the fn
    src = src.withWatermark(ts_col, watermark).select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("long").alias("_v"),
    )

    key_fields = [T.StructField(k, src.schema[k].dataType) for k in keys]
    out_schema = T.StructType(
        [
            T.StructField("window_start", T.LongType()),
            T.StructField("window_end", T.LongType()),
            *key_fields,
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.LongType()),
            T.StructField("max_val", T.LongType()),
            T.StructField("avg_val", T.DoubleType()),
        ]
    )
    # typed pane-partial ring + high-water mark of emitted window ends
    state_schema = T.StructType(
        [
            T.StructField("panes", T.ArrayType(T.LongType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("sums", T.ArrayType(T.LongType())),
            T.StructField("mins", T.ArrayType(T.LongType())),
            T.StructField("maxs", T.ArrayType(T.LongType())),
            T.StructField("emitted_ms", T.LongType()),
        ]
    )

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            panes, cnts, sums, mins, maxs, emitted_ms = state.get
            pend = pd.DataFrame(
                {"p": panes, "c": cnts, "s": sums, "mn": mins, "mx": maxs}
            )
        else:
            pend = pd.DataFrame(columns=["p", "c", "s", "mn", "mx"], dtype="int64")
            emitted_ms = 0

        fresh = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            ns = pdf["_ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            pid = pd.Series(ns // (pane * 1_000_000_000), index=pdf.index)
            g = pdf.groupby(pid)["_v"].agg(["count", "sum", "min", "max"])
            fresh.append(
                pd.DataFrame(
                    {
                        "p": g.index.to_numpy(dtype="int64"),
                        "c": g["count"].to_numpy(dtype="int64"),
                        "s": g["sum"].to_numpy(dtype="int64"),
                        "mn": g["min"].to_numpy(dtype="int64"),
                        "mx": g["max"].to_numpy(dtype="int64"),
                    }
                )
            )
        if fresh:
            pend = (
                pd.concat([pend, *fresh], ignore_index=True)
                .groupby("p", as_index=False)
                .agg(c=("c", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            )

        wm_ms = int(state.getCurrentWatermarkMs())

        out = None
        if not pend.empty:
            # SPARSE window recombination: each pane fans out to its
            # ≤ ceil(np_win/stride) candidate windows and a groupby
            # merges — cost O(#panes × fanout), independent of the
            # pane-id SPAN. (The previous dense [min, max] grid let one
            # far-future timestamp — a bad client clock — inflate the
            # per-batch allocation to (bad_ts − now)/pane elements for
            # that key until the watermark caught up.)
            p_arr = pend["p"].to_numpy(dtype="int64")
            parts = []
            for k in range(-(-np_win // stride)):
                w = p_arr // stride - k
                m = (w * stride + np_win) > p_arr  # pane inside window
                if not m.any():
                    continue
                parts.append(
                    pd.DataFrame(
                        {
                            "w": w[m],
                            "c": pend["c"].to_numpy()[m],
                            "s": pend["s"].to_numpy()[m],
                            "mn": pend["mn"].to_numpy()[m],
                            "mx": pend["mx"].to_numpy()[m],
                        }
                    )
                )
            cand = (
                pd.concat(parts, ignore_index=True)
                .groupby("w", as_index=False)
                .agg(c=("c", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            )
            w_arr = cand["w"].to_numpy(dtype="int64")
            w_c = cand["c"].to_numpy(dtype="int64")
            w_s = cand["s"].to_numpy(dtype="int64")
            abs_start_s = w_arr * stride * pane
            abs_end_s = abs_start_s + size
            # emit-once: ends the watermark just passed, not yet emitted
            emit = (abs_end_s * 1000 <= wm_ms) & (abs_end_s * 1000 > emitted_ms)
            if emit.any():
                n = int(emit.sum())
                data = {
                    "window_start": abs_start_s[emit],
                    "window_end": abs_end_s[emit],
                }
                for i, k in enumerate(keys):
                    data[k] = np.repeat(key[i], n)
                data["n_rows"] = w_c[emit]
                data["sum_val"] = w_s[emit]
                data["min_val"] = cand["mn"].to_numpy(dtype="int64")[emit]
                data["max_val"] = cand["mx"].to_numpy(dtype="int64")[emit]
                data["avg_val"] = w_s[emit] / w_c[emit]
                out = pd.DataFrame(data)

            # evict panes whose LAST containing window has emitted: that
            # window starts at the greatest slide multiple <= pane start
            last_start_s = (p_arr * pane) // wd.slide * wd.slide
            keep = (last_start_s + size) * 1000 > wm_ms
            pend = pend[keep]

        if pend.empty:
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    pend["p"].tolist(),
                    pend["c"].tolist(),
                    pend["s"].tolist(),
                    pend["mn"].tolist(),
                    pend["mx"].tolist(),
                    max(int(emitted_ms), wm_ms),
                )
            )
            # wake this key when the watermark passes the next slide-grid
            # window end, even if it never receives another row
            # (flush-on-silence): ends are m*slide + size, so the next one
            # after the watermark is a pure grid computation
            e_s = ((wm_ms - size * 1000) // (wd.slide * 1000) + 1) * wd.slide + size
            state.setTimeoutTimestamp(max(e_s * 1000 - 1, wm_ms + 1))
        if out is not None:
            yield out

    return src.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )


def streaming_shared_pane_aggregate(
    stream: DataFrame,
    queries: dict[str, WindowDef],
    value_col: str = "text_len",
    keys: Sequence[str] = ("tool",),
    ts_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """MULTI-QUERY window sharing on a stream: N concurrent RANGE
    sliding/tumbling window queries served by ONE pane ring per key.

    The streaming twin of ``operators/panes.py::shared_pane_aggregate``
    (and the true Saber analogue — one stream, many window queries):
    pane partials accumulate once at the GLOBAL gcd pane, every query
    recombines the same ring with its own fan-out, emit-once tracking is
    per query, and a pane is evicted only when its last containing
    window across ALL queries has emitted. State per key is
    #global-panes for the largest window (+ watermark lag) TOTAL — not
    the Σ of per-query rings N separate streams would hold — and the
    input is read, keyed and shuffled once for all queries.

    Emits (query, window_start, window_end, *keys, n_rows, sum_val,
    min_val, max_val, avg_val); each query's rows are identical to
    running ``streaming_pane_sliding_aggregate`` for that window alone
    (parity-tested against the batch shared plan in
    tests/test_streaming.py).
    """
    import math as _math

    if not queries:
        raise ValueError("need at least one query")
    for name, wd in queries.items():
        if wd.kind != RANGE:
            raise ValueError(f"query {name!r}: streaming panes are event-time")
    pane = 0
    for wd in queries.values():
        pane = _math.gcd(pane, _math.gcd(wd.size, wd.slide))
    qnames = sorted(queries)
    sizes = {n: queries[n].size for n in qnames}
    strides = {n: queries[n].slide // pane for n in qnames}
    np_wins = {n: queries[n].size // pane for n in qnames}
    slides = {n: queries[n].slide for n in qnames}
    keys = list(keys)

    src = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = src.withWatermark(ts_col, watermark).select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("long").alias("_v"),
    )

    key_fields = [T.StructField(k, src.schema[k].dataType) for k in keys]
    out_schema = T.StructType(
        [
            T.StructField("query", T.StringType()),
            T.StructField("window_start", T.LongType()),
            T.StructField("window_end", T.LongType()),
            *key_fields,
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.LongType()),
            T.StructField("max_val", T.LongType()),
            T.StructField("avg_val", T.DoubleType()),
        ]
    )
    # ONE shared pane ring + a per-query emitted high-water mark; the
    # query names ride along so a checkpoint resume with a changed query
    # set fails loudly instead of mispairing emit marks positionally
    state_schema = T.StructType(
        [
            T.StructField("panes", T.ArrayType(T.LongType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("sums", T.ArrayType(T.LongType())),
            T.StructField("mins", T.ArrayType(T.LongType())),
            T.StructField("maxs", T.ArrayType(T.LongType())),
            T.StructField("emitted_ms", T.ArrayType(T.LongType())),
            T.StructField("qnames", T.ArrayType(T.StringType())),
        ]
    )

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            panes, cnts, sums, mins, maxs, emitted, saved_names = state.get
            if list(saved_names) != qnames:
                raise ValueError(
                    "streaming_shared_pane_aggregate: query set changed "
                    f"across checkpoint resume (state has {list(saved_names)}, "
                    f"job has {qnames}) — per-query emit-once marks cannot be "
                    "remapped; restart from a fresh checkpoint"
                )
            pend = pd.DataFrame(
                {"p": panes, "c": cnts, "s": sums, "mn": mins, "mx": maxs}
            )
            emitted_ms = dict(zip(qnames, emitted))
        else:
            pend = pd.DataFrame(columns=["p", "c", "s", "mn", "mx"], dtype="int64")
            emitted_ms = {n: 0 for n in qnames}

        fresh = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            ns = pdf["_ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            pid = pd.Series(ns // (pane * 1_000_000_000), index=pdf.index)
            g = pdf.groupby(pid)["_v"].agg(["count", "sum", "min", "max"])
            fresh.append(
                pd.DataFrame(
                    {
                        "p": g.index.to_numpy(dtype="int64"),
                        "c": g["count"].to_numpy(dtype="int64"),
                        "s": g["sum"].to_numpy(dtype="int64"),
                        "mn": g["min"].to_numpy(dtype="int64"),
                        "mx": g["max"].to_numpy(dtype="int64"),
                    }
                )
            )
        if fresh:
            pend = (
                pd.concat([pend, *fresh], ignore_index=True)
                .groupby("p", as_index=False)
                .agg(c=("c", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            )

        wm_ms = int(state.getCurrentWatermarkMs())

        outs = []
        if not pend.empty:
            p_arr = pend["p"].to_numpy(dtype="int64")
            for qn in qnames:
                stride, np_win, size = strides[qn], np_wins[qn], sizes[qn]
                parts = []
                for k in range(-(-np_win // stride)):
                    w = p_arr // stride - k
                    m = (w * stride + np_win) > p_arr
                    if not m.any():
                        continue
                    parts.append(
                        pd.DataFrame(
                            {
                                "w": w[m],
                                "c": pend["c"].to_numpy()[m],
                                "s": pend["s"].to_numpy()[m],
                                "mn": pend["mn"].to_numpy()[m],
                                "mx": pend["mx"].to_numpy()[m],
                            }
                        )
                    )
                if not parts:
                    continue
                cand = (
                    pd.concat(parts, ignore_index=True)
                    .groupby("w", as_index=False)
                    .agg(c=("c", "sum"), s=("s", "sum"),
                         mn=("mn", "min"), mx=("mx", "max"))
                )
                w_arr = cand["w"].to_numpy(dtype="int64")
                abs_start_s = w_arr * stride * pane
                abs_end_s = abs_start_s + size
                emit = (abs_end_s * 1000 <= wm_ms) & (
                    abs_end_s * 1000 > emitted_ms[qn]
                )
                if emit.any():
                    n = int(emit.sum())
                    w_c = cand["c"].to_numpy(dtype="int64")[emit]
                    w_s = cand["s"].to_numpy(dtype="int64")[emit]
                    data = {
                        "query": np.repeat(qn, n),
                        "window_start": abs_start_s[emit],
                        "window_end": abs_end_s[emit],
                    }
                    for i, k in enumerate(keys):
                        data[k] = np.repeat(key[i], n)
                    data["n_rows"] = w_c
                    data["sum_val"] = w_s
                    data["min_val"] = cand["mn"].to_numpy(dtype="int64")[emit]
                    data["max_val"] = cand["mx"].to_numpy(dtype="int64")[emit]
                    data["avg_val"] = w_s / w_c
                    outs.append(pd.DataFrame(data))
                emitted_ms[qn] = max(emitted_ms[qn], wm_ms)

            # a pane survives while ANY query still owes a window for it
            keep = np.zeros(len(p_arr), dtype=bool)
            for qn in qnames:
                last_start_s = (p_arr * pane) // slides[qn] * slides[qn]
                keep |= (last_start_s + sizes[qn]) * 1000 > wm_ms
            pend = pend[keep]

        if pend.empty:
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    pend["p"].tolist(),
                    pend["c"].tolist(),
                    pend["s"].tolist(),
                    pend["mn"].tolist(),
                    pend["mx"].tolist(),
                    [emitted_ms[n] for n in qnames],
                    qnames,
                )
            )
            # flush-on-silence: wake at the EARLIEST next grid window end
            # across all queries
            next_ends = [
                ((wm_ms - sizes[qn] * 1000) // (slides[qn] * 1000) + 1)
                * slides[qn] + sizes[qn]
                for qn in qnames
            ]
            e_s = min(next_ends)
            state.setTimeoutTimestamp(max(e_s * 1000 - 1, wm_ms + 1))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    return src.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
