"""Streaming ANN enrichment: approximate top-k neighbours from a static
corpus for a STREAM of query embeddings — the online serving twin of the
batch ``operators/similarity.py::ivf_topk`` (same IVF layout, same
scores, same tie-breaks; parity-tested).

Streaming constraints reshape the batch plan in two places:

- **Probe selection cannot use a ranking window** (unsupported on
  streams). The codebook is collected to the driver once — bounded by
  |codebook| rows, the same driver state MLlib's KMeansModel keeps —
  and compiled into a LITERAL array-of-structs expression, so each
  streaming row picks its ``n_probes`` best cells with pure per-row
  expressions (``transform`` → ``array_sort`` → ``slice``): no shuffle,
  no state, evaluates inside whole-stage codegen.
- **Top-k cannot use row_number either**: the final ranking is a
  keyed ``applyInPandasWithState`` running top-k — per (query, window)
  the state is EXACTLY the k best (-cosine, nbr_id) pairs seen so far,
  merged and re-truncated every micro-batch — emitting once per window
  on an event-time timeout when the watermark passes window end. State
  per group is O(k) BY CONSTRUCTION, independent of probed-cell sizes:
  a query probing a hot cell at 100 TB never holds that cell's scores
  in a state row (a ``collect_list``-then-slice windowed aggregate
  would — its state grows with Σ probed-cell sizes, the round-4 scale
  nit this design removes).

The candidate join itself is the same cell_id equi-join as the batch
path: the corpus is shuffled ONCE into nearest-centroid cells (static
side, reusable across micro-batches), and each query row fans out only
``n_probes`` ways. At 100 TB corpus / unbounded query stream, per-batch
cost is Σ |probed cell| per query — never a corpus scan.

Reference analogue: none (Saber has no similarity ops) — this is the
training/serving-pipeline surface next to the batch ANN operators.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from saber_spark.operators.similarity import (
    _cells_for,
    dot,
    ivf_centroids,
    with_norm,
)

def merge_topk(
    negs: list, ids: list, new_negs: list, new_ids: list, k: int
) -> tuple[list, list]:
    """Fold a batch of candidates into a k-bounded running top-k.

    Inputs and output are parallel (neg_cosine, nbr_id) arrays; the
    output is sorted by (neg asc, id asc) — the exact tie-break of the
    batch ``ivf_topk``'s ``array_sort(struct(_nc, nbr_id))`` — and
    TRUNCATED to k, so state never exceeds k entries no matter how many
    candidates one micro-batch (or a hot probed cell) contributes."""
    items = sorted([*zip(negs, ids), *zip(new_negs, new_ids)])
    del items[k:]
    return [n for n, _ in items], [i for _, i in items]


def _literal_codebook(cent_rows) -> Column:
    """The collected (cell_id, _cv, _cn) rows as one array-of-structs
    literal — per-row probe selection without a join or a window."""
    if not cent_rows:
        raise ValueError(
            "streaming_ivf_topk: empty codebook — refusing to build a "
            "stream that would silently emit no rows"
        )
    return F.array(
        *[
            F.struct(
                F.lit(r["cell_id"]).alias("cell_id"),
                F.array(*[F.lit(float(x)) for x in r["_cv"]]).alias("_cv"),
                F.lit(float(r["_cn"])).alias("_cn"),
            )
            for r in cent_rows
        ]
    )


def streaming_ivf_topk(
    query_stream: DataFrame,
    base: DataFrame,
    k: int = 5,
    n_probes: int = 3,
    stride: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    window_s: int = 600,
    watermark: str = "0 seconds",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(win, query_id, nbr_id, cosine, rk≤k) per query in the stream.

    ``base`` is the static corpus (batch DataFrame); ``query_stream``
    must carry ``id_col``, ``vec_col`` and an event-time ``ts_col``.
    Scores, rounding, and (cosine desc, nbr_id asc) tie-breaks are
    identical to the batch ``ivf_topk`` — per-window results match it
    row-for-row (tests/test_streaming.py)."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(base, id_col, vec_col, stride)
    )
    codebook = _literal_codebook(cents.collect())
    # static side: corpus shuffled once into nearest-centroid cells
    assigned = _cells_for(base, cents, 1, "nbr_id", vec_col, id_col).select(
        "nbr_id", F.col("_sv").alias("_bv"), F.col("_sn").alias("_bn"), "cell_id"
    )
    q = with_norm(query_stream, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        # session TZ is UTC, so NTZ event times cast losslessly; the
        # watermark machinery requires TIMESTAMP proper
        F.col(ts_col).cast("timestamp").alias("_ts"),
    )
    # per-row probe selection: rank the literal codebook by
    # (cosine desc, cell_id asc) — negated-score struct sort
    scored_cells = F.transform(
        codebook,
        lambda c: F.struct(
            (
                -F.round(
                    dot(F.col("_qv"), c["_cv"]) / (F.col("_qn") * c["_cn"]), 6
                )
            ).alias("_ns"),
            c["cell_id"].alias("cell_id"),
        ),
    )
    probe_cells = F.slice(F.array_sort(scored_cells), 1, n_probes)
    qp = q.withColumn(
        "cell_id", F.explode(F.transform(probe_cells, lambda s: s["cell_id"]))
    )
    # each base vector lives in exactly ONE cell and probe cells are
    # distinct, so (query, nbr) candidates are unique by construction —
    # no dropDuplicates (stateful on a stream) needed
    cand = (
        qp.join(assigned, "cell_id")
        .where(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "_ts",
            "nbr_id",
            F.round(
                dot(F.col("_qv"), F.col("_bv")) / (F.col("_qn") * F.col("_bn")),
                6,
            ).alias("cosine"),
        )
    )
    # k-bounded running top-k per (query, window): applyInPandasWithState
    # keyed on (query_id, window-start-micros), state = the k best
    # (neg_cosine, nbr_id) pairs so far (merge_topk re-truncates every
    # micro-batch), emitted once on event-time timeout at window end —
    # the same emit-once-when-watermark-passes contract as a declarative
    # windowed agg, but with O(k) state instead of O(Σ probed-cell size).
    win_us = window_s * 1_000_000
    us = F.unix_micros(F.col("_ts"))
    keyed = cand.withWatermark("_ts", watermark).withColumn(
        "_ws_us", (us - F.pmod(us, F.lit(win_us))).cast("long")
    )
    q_id_type = query_stream.schema[id_col].dataType
    nbr_id_type = base.schema[id_col].dataType
    state_schema = T.StructType(
        [
            T.StructField("negs", T.ArrayType(T.DoubleType())),
            T.StructField("ids", T.ArrayType(nbr_id_type)),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("_ws_us", T.LongType()),
            T.StructField("query_id", q_id_type),
            T.StructField("nbr_id", nbr_id_type),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rk", T.IntegerType()),
        ]
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        # key scalars arrive as numpy types; state/timeout values are
        # JSON-serialized, so coerce to Python int up front
        query_id, ws_us = key[0], int(key[1])
        if bool(getattr(state, "hasTimedOut", False)):
            # watermark passed window end: emit the final top-k, free state
            negs, ids = state.get
            state.remove()
            n = len(negs)
            if n:
                yield pd.DataFrame(
                    {
                        "_ws_us": np.repeat(np.int64(ws_us), n),
                        "query_id": np.repeat(query_id, n),
                        "nbr_id": list(ids),
                        "cosine": [-x for x in negs],
                        "rk": np.arange(1, n + 1, dtype="int32"),
                    }
                )
            return
        negs, ids = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        for pdf in pdfs:
            if pdf.empty:
                continue
            negs, ids = merge_topk(
                negs,
                ids,
                (-pdf["cosine"].to_numpy()).tolist(),
                pdf["nbr_id"].tolist(),
                k,
            )
        state.update((negs, ids))
        wm_ms = int(state.getCurrentWatermarkMs())
        end_ms = ws_us // 1000 + window_s * 1000
        # event-time timeouts fire when the watermark STRICTLY exceeds
        # the timestamp, while a declarative windowed agg emits at
        # watermark >= window end — end_ms - 1 keeps those aligned, else
        # a window whose end equals the final watermark never emits
        # (same convention as streaming/panes.py)
        state.setTimeoutTimestamp(max(end_ms - 1, wm_ms + 1))

    top = keyed.groupBy("query_id", "_ws_us").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
    ws_ts = F.timestamp_micros(F.col("_ws_us"))
    return top.select(
        F.struct(
            ws_ts.alias("start"),
            F.timestamp_micros(F.col("_ws_us") + F.lit(win_us)).alias("end"),
        ).alias("win"),
        "query_id",
        "nbr_id",
        "cosine",
        "rk",
    )
