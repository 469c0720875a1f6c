"""Custom stateful streaming operator: count-based (ROW_BASED) windows.

Spark has no count-window primitive for streams; the reference's
ROW_BASED windows (``WindowDefinition.java:5-18``, tumbling AND sliding —
figure-11b sweeps row-window slides) are re-expressed as an
``applyInPandasWithState`` operator keyed by conv_id:

- every micro-batch's rows for a conversation are pre-aggregated into
  per-pane partials with vectorized pandas ops (pane id =
  ``turn_idx // gcd(size, slide)`` — dense per-conversation index);
- partials merge into typed keyed state (arrays of pane/cnt/sum/min/max
  — the cross-batch opening/pending window carry of the reference,
  ``ResultAggregator.java:76-136``);
- a window [w·slide, w·slide+size) emits exactly when its turn count
  REACHES ``size`` (every owned turn has arrived — the reference closes
  a window when tuples beyond it arrive). Emission is transition-based:
  windows complete after this batch's merge minus those complete before
  it, so arbitrary within-conversation arrival order needs no extra
  bookkeeping;
- panes are evicted once every window containing them has emitted;
- optionally, an **event-time TTL** expires a conversation that has been
  silent while the watermark advanced ``ttl_s`` past its last event —
  freeing its pending partial windows (the reference frees batch
  buffers deterministically, ``ResultAggregator.java:211-216``; on an
  unbounded stream, conversations that die mid-window must not leak
  state forever).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _output_schema(key: str, key_type: T.DataType) -> T.StructType:
    """Output schema follows the ``key`` parameter (name AND type) — a
    fixed conv_id:string field silently broke non-default keys."""
    return T.StructType(
        [
            T.StructField(key, key_type),
            T.StructField("window_id", T.LongType()),
            T.StructField("n_turns", T.LongType()),
            T.StructField("sum_val", T.LongType()),
            T.StructField("min_val", T.LongType()),
            T.StructField("max_val", T.LongType()),
            T.StructField("avg_val", T.DoubleType()),
        ]
    )


#: default-key schema, kept for callers that import it directly
OUTPUT_SCHEMA = _output_schema("conv_id", T.StringType())

STATE_SCHEMA = T.StructType(
    [
        T.StructField("panes", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.LongType())),
        T.StructField("mins", T.ArrayType(T.LongType())),
        T.StructField("maxs", T.ArrayType(T.LongType())),
        T.StructField("last_ts_ms", T.LongType()),
        # all windows below this id are complete+emitted (monotone):
        # panes owned only by windows below it are safe to evict
        T.StructField("frontier", T.LongType()),
    ]
)


def streaming_count_windows(
    stream: DataFrame,
    size: int,
    slide: int | None = None,
    value_col: str = "text_len",
    key: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
    ttl_s: int | None = None,
    watermark: str = "0 seconds",
    max_window_lag: int | None = 4096,
) -> DataFrame:
    """Count windows of ``size`` turns sliding by ``slide`` (default:
    tumbling) per conversation.

    Input stream needs columns (key, idx_col, value_col) and — when
    ``ttl_s`` is set — ``ts_col`` for the event-time watermark that
    drives state expiry. Output emits one row per *completed* window
    with CNT/SUM/MIN/MAX/AVG; ``window_id`` is start/slide (the batch
    row-window convention).

    ``max_window_lag`` bounds sliding-window state against poison gaps:
    the eviction frontier normally advances only through COMPLETE
    windows, so a hole in turn_idx (a dropped/corrupt turn) leaves one
    window that never completes and would otherwise pin every later
    pane in state forever. When the NEWEST PANE SEEN implies a window
    more than ``max_window_lag`` windows ahead of the frontier, the
    stalled windows are ABANDONED (they can never emit — their panes
    evict) and the frontier jumps to (newest - max_window_lag). The
    bound is measured from the newest pane, not the newest complete
    window: a stream whose gaps recur at least once per window span
    never completes ANY window, so a completion-based bound would never
    fire and state would still grow without limit. The trade is
    explicit: a window whose missing turn arrives later than
    size + max_window_lag·slide turns out of order is dropped rather
    than kept as immortal state. None disables the bound (bounded
    replays / parity tests)."""
    slide = size if slide is None else slide
    if not (0 < slide <= size):
        raise ValueError(f"need 0 < slide <= size, got {size=} {slide=}")
    if slide < size and ttl_s is None and max_window_lag is None:
        import warnings

        warnings.warn(
            "sliding count windows keep one frontier row per conversation "
            "forever when ttl_s is unset (the eviction frontier must survive "
            "quiet periods) and unbounded pane state behind a permanently-"
            "incomplete window when max_window_lag is None; fine for bounded "
            "replays, but set ttl_s and/or max_window_lag on an unbounded "
            "stream",
            stacklevel=2,
        )
    g = math.gcd(size, slide)
    size_p = size // g  # panes per window
    stride = slide // g  # panes per slide

    cols = [key, idx_col, value_col]
    if ttl_s is not None:
        src = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        src = src.withWatermark(ts_col, watermark).select(
            *cols, F.col(ts_col).alias("_ts")
        )
        timeout = "EventTimeTimeout"
    else:
        src = stream.select(*cols)
        timeout = "NoTimeout"

    # max windows any one pane can belong to (the fan-out bound)
    k_fan = -(-size_p // stride)

    def complete_windows(pend: pd.DataFrame) -> pd.DataFrame:
        """(window_id, n, s, mn, mx) for every complete window.

        SPARSE: each pane fans out to its ≤ k_fan candidate windows and
        a groupby recombines — cost O(#panes × k_fan), independent of the
        pane-id SPAN. (A dense [min_pane, max_pane] grid here was a
        poison pill: one corrupt turn_idx=10^12 row allocated a ~10^11-
        element grid, OOM-crash-looping the query out of its own state.)
        Completion is ``n >= size``, not ``==``: an at-least-once
        upstream can double-deliver a turn, and an overshooting window
        must still emit rather than stall the eviction frontier forever."""
        if pend.empty:
            return pd.DataFrame(columns=["w", "n", "s", "mn", "mx"])
        p = pend["p"].to_numpy(dtype="int64")
        parts = []
        for k in range(k_fan):
            w = p // stride - k
            keep = (w >= 0) & (w * stride + size_p > p)
            if not keep.any():
                continue
            parts.append(
                pd.DataFrame(
                    {
                        "w": w[keep],
                        "c": pend["c"].to_numpy()[keep],
                        "s": pend["s"].to_numpy()[keep],
                        "mn": pend["mn"].to_numpy()[keep],
                        "mx": pend["mx"].to_numpy()[keep],
                    }
                )
            )
        if not parts:
            return pd.DataFrame(columns=["w", "n", "s", "mn", "mx"])
        gb = (
            pd.concat(parts, ignore_index=True)
            .groupby("w", as_index=False)
            .agg(n=("c", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        )
        return gb[gb["n"] >= size].reset_index(drop=True)

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        timed_out = bool(getattr(state, "hasTimedOut", False))
        if state.exists:
            panes, cnts, sums, mins, maxs, last_ts_ms, frontier = state.get
            pend = pd.DataFrame(
                {"p": panes, "c": cnts, "s": sums, "mn": mins, "mx": maxs}
            )
        else:
            pend = pd.DataFrame(columns=["p", "c", "s", "mn", "mx"], dtype="int64")
            last_ts_ms = 0
            frontier = 0

        if timed_out:
            # conversation silent for ttl_s of event time: free its state
            # (pending partial windows can never complete deterministically)
            state.remove()
            return

        # tumbling evicts a window's panes the batch it completes, so
        # state NEVER holds a complete tumbling window — skip the pass
        before = (
            pd.DataFrame(columns=["w"])
            if stride == size_p
            else complete_windows(pend)
        )
        fresh = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pid = (pdf[idx_col] // g).astype("int64")
            gb = pdf.groupby(pid)[value_col].agg(["count", "sum", "min", "max"])
            fresh.append(
                pd.DataFrame(
                    {
                        "p": gb.index.to_numpy(dtype="int64"),
                        "c": gb["count"].to_numpy(dtype="int64"),
                        "s": gb["sum"].to_numpy(dtype="int64"),
                        "mn": gb["min"].to_numpy(dtype="int64"),
                        "mx": gb["max"].to_numpy(dtype="int64"),
                    }
                )
            )
            if ttl_s is not None:
                ns = pdf["_ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                last_ts_ms = max(int(last_ts_ms), int(ns.max() // 1_000_000))
        if fresh:
            pend = (
                pd.concat([pend, *fresh], ignore_index=True)
                .groupby("p", as_index=False)
                .agg(c=("c", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            )
        after = complete_windows(pend)
        after_w = set(after["w"].tolist())

        # emit = windows that BECAME complete in this batch
        done = after[~after["w"].isin(set(before["w"]))]

        # Eviction. Tumbling (stride == panes/window): windows are
        # disjoint, so a pane is droppable the moment its own window
        # completes — a permanently-incomplete window elsewhere cannot
        # block it. Sliding: neighbouring windows share panes, so evict
        # behind an all-complete frontier ("last window complete" alone
        # is NOT sufficient under out-of-order arrival — an earlier
        # window missing a middle pane could still need this pane; a
        # frontier stalled on a conversation that died mid-window keeps
        # its trailing panes, which is what the event-time TTL bounds).
        frontier = int(frontier)
        while frontier in after_w:
            frontier += 1
        if max_window_lag is not None and not pend.empty:
            # poison-gap bound, anchored to the NEWEST PANE (not the
            # newest complete window — recurring gaps can keep every
            # window incomplete forever): windows stalled more than
            # max_window_lag behind it are abandoned (docstring trade) —
            # their panes evict below
            newest = int(pend["p"].to_numpy(dtype="int64").max() // stride)
            if newest - frontier > max_window_lag:
                frontier = newest - max_window_lag
                while frontier in after_w:
                    frontier += 1
        if not pend.empty:
            p_arr = pend["p"].to_numpy(dtype="int64")
            if stride == size_p:
                done_w = np.fromiter(after_w, dtype="int64", count=len(after_w))
                pend = pend[~np.isin(p_arr // stride, done_w)]
            else:
                pend = pend[(p_arr // stride) >= frontier]

        if pend.empty and stride == size_p:
            # tumbling: no cross-batch invariant beyond the panes — free
            # the key entirely. Sliding keeps its frontier even with no
            # pending panes: dropping it would reset eviction to window 0
            # on resume and strand every later pane in state.
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
                    int(last_ts_ms),
                    frontier,
                )
            )
            if ttl_s is not None:
                wm_ms = int(state.getCurrentWatermarkMs())
                state.setTimeoutTimestamp(
                    max(int(last_ts_ms) + ttl_s * 1000, wm_ms + 1)
                )

        if len(done):
            yield pd.DataFrame(
                {
                    key: np.repeat(key_tuple[0], len(done)),
                    "window_id": done["w"].to_numpy(dtype="int64"),
                    "n_turns": done["n"].to_numpy(dtype="int64"),
                    "sum_val": done["s"].to_numpy(dtype="int64"),
                    "min_val": done["mn"].to_numpy(dtype="int64"),
                    "max_val": done["mx"].to_numpy(dtype="int64"),
                    "avg_val": done["s"].to_numpy() / done["n"].to_numpy(),
                }
            )

    return src.groupBy(key).applyInPandasWithState(
        fn,
        _output_schema(key, stream.schema[key].dataType),
        STATE_SCHEMA,
        "append",
        timeout,
    )
