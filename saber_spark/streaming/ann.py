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
  watermark-gated windowed aggregation — ``collect_list`` of
  (-cosine, nbr_id) structs, ``array_sort``, ``slice k`` — whose state
  per (window, query) is bounded by the candidate count
  (≤ Σ probed-cell sizes), and which emits exactly once per window when
  the watermark passes.

The candidate join itself is the same cell_id equi-join as the batch
path: the corpus is shuffled ONCE into nearest-centroid cells (static
side, reusable across micro-batches), and each query row fans out only
``n_probes`` ways. At 100 TB corpus / unbounded query stream, per-batch
cost is Σ |probed cell| per query — never a corpus scan.

Reference analogue: none (Saber has no similarity ops) — this is the
training/serving-pipeline surface next to the batch ANN operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.similarity import (
    _cells_for,
    dot,
    ivf_centroids,
    with_norm,
)


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
    top = (
        cand.withWatermark("_ts", watermark)
        .groupBy(
            F.window("_ts", f"{window_s} seconds").alias("win"), "query_id"
        )
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("cosine")).alias("_nc"), F.col("nbr_id")
                        )
                    )
                ),
                1,
                k,
            ).alias("_top")
        )
    )
    return top.select(
        "win",
        "query_id",
        F.posexplode("_top").alias("_pos", "_s"),
    ).select(
        "win",
        "query_id",
        F.col("_s.nbr_id").alias("nbr_id"),
        (-F.col("_s._nc")).alias("cosine"),
        (F.col("_pos") + 1).cast("int").alias("rk"),
    )
