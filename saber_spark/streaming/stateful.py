"""Custom stateful streaming operator: count-based (ROW_BASED) windows.

Spark has no count-window primitive for streams; the reference's
ROW_BASED windows (WindowDefinition.java:5-18) are re-expressed as an
``applyInPandasWithState`` operator keyed by conv_id:

- every micro-batch's rows for a conversation are pre-aggregated into
  per-window partials with vectorized pandas ops (window id =
  ``turn_idx // size`` — dense per-conversation index),
- partials merge into keyed state (the cross-batch opening/pending
  window carry of the reference, ResultAggregator.java:76-136),
- a window emits exactly when its count reaches ``size`` (the stream has
  passed its end; trailing partial windows stay pending, as in the
  reference where a window closes only when tuples beyond it arrive).

State is a JSON blob per conversation mapping window_id -> partial
(cnt/sum/min/max). Arbitrary out-of-order arrival *within* a
conversation is tolerated because merging is per window id.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("window_id", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("sum_val", T.LongType()),
        T.StructField("min_val", T.LongType()),
        T.StructField("max_val", T.LongType()),
        T.StructField("avg_val", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("pending", T.StringType())])


def streaming_count_windows(
    stream: DataFrame,
    size: int,
    value_col: str = "text_len",
    key: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Tumbling count windows of ``size`` turns per conversation.

    Input stream needs columns (key, idx_col, value_col). Output emits
    one row per *completed* window with CNT/SUM/MIN/MAX/AVG.
    """

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        pending: dict[str, list] = (
            json.loads(state.get[0]) if state.exists else {}
        )
        for pdf in pdfs:
            if pdf.empty:
                continue
            wid = (pdf[idx_col] // size).astype("int64")
            g = pdf.groupby(wid)[value_col].agg(["count", "sum", "min", "max"])
            for w, row in g.iterrows():
                cur = pending.get(str(w))
                if cur is None:
                    pending[str(w)] = [int(row["count"]), int(row["sum"]),
                                       int(row["min"]), int(row["max"])]
                else:
                    cur[0] += int(row["count"])
                    cur[1] += int(row["sum"])
                    cur[2] = min(cur[2], int(row["min"]))
                    cur[3] = max(cur[3], int(row["max"]))
        done = {w: v for w, v in pending.items() if v[0] >= size}
        pending = {w: v for w, v in pending.items() if v[0] < size}
        state.update((json.dumps(pending),))
        if done:
            yield pd.DataFrame(
                {
                    "conv_id": [key_tuple[0]] * len(done),
                    "window_id": [int(w) for w in done],
                    "n_turns": [v[0] for v in done.values()],
                    "sum_val": [v[1] for v in done.values()],
                    "min_val": [v[2] for v in done.values()],
                    "max_val": [v[3] for v in done.values()],
                    "avg_val": [v[1] / v[0] for v in done.values()],
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout"
    )
