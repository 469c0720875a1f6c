"""Streaming query builders.

The reference's runtime (circular buffers, task dispatcher, result
aggregator — SURVEY.md §3) collapses into Structured Streaming:

- fixed-size byte batches            → micro-batches (maxFilesPerTrigger /
                                       trigger interval)
- opening/closing/pending/complete
  window-fragment merge across
  batches (PartialResultSlot.java)   → state-store window accumulation
- in-order result ring               → watermark-gated append output
- ThetaJoin window eviction
  (ThetaJoin.java:171-196)           → watermark + time-interval join
                                       condition state cleanup

The reference assumes in-order input and has no watermarks (SURVEY.md
§1.3); watermarks here are the north_star extension that makes the same
queries correct under out-of-order transcript streams.

Builders reuse the batch operators (aggregation.py) so batch and stream
share one plan definition — batch-vs-stream parity is a test invariant
(tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from saber_spark.operators.aggregation import AggSpec, AGG_FNS
from saber_spark.operators.windows import RANGE, WindowDef

#: transcripts schema (BASELINE.json input_hint); ts is TIMESTAMP_NTZ to
#: match what spark writes/reads for parquet event time in this repo.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def read_transcript_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    schema: T.StructType = TRANSCRIPT_SCHEMA,
) -> DataFrame:
    """File-source stream over a transcripts parquet directory.

    In production this is ``spark.readStream.format("iceberg")`` with
    ``stream-from-timestamp`` (sources/iceberg.py); the file source has
    identical semantics for tests and gives deterministic micro-batch
    slicing via ``maxFilesPerTrigger`` — the analogue of the reference's
    fixed batch-size knob (QueryConf.java:9).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def read_iceberg_stream(
    spark: SparkSession, location: str, starting: str = "earliest"
) -> DataFrame:
    """Streaming read of a from-scratch Iceberg table
    (sources/iceberg_datasource.py): every append snapshot committed
    after the stream's checkpointed offset becomes part of the next
    micro-batch — the "10^12-turn Iceberg transcript stream" input shape
    the north rule names, with the schema taken from table metadata."""
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    return (
        spark.readStream.format("saber_iceberg")
        .option("location", location)
        .option("starting-offsets", starting)
        .load()
    )


def read_iceberg_changelog_stream(
    spark: SparkSession, location: str, starting: str = "earliest"
) -> DataFrame:
    """CDC streaming read of a from-scratch Iceberg table: each committed
    snapshot's row-level insert/delete events (data columns +
    ``_change_type``/``_change_ordinal``/``_commit_snapshot_id``) arrive
    as micro-batches. This is how a downstream consumer correctly tails
    a table that takes deletes/merges — the plain append stream refuses
    such history outright (silent loss for an append consumer). Planned
    as per-file executor tasks; semantics identical to the batch
    ``IcebergTable.changes`` (parity-tested)."""
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    return (
        spark.readStream.format("saber_iceberg")
        .option("location", location)
        .option("mode", "changelog")
        .option("starting-offsets", starting)
        .load()
    )


def streaming_windowed_aggregate(
    stream: DataFrame,
    wd: WindowDef,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked event-time windowed aggregate (tumbling or sliding).

    Emits the same columns as the batch ``windowed_aggregate`` so the two
    can be diffed row-for-row. State per key×window lives in the state
    store (RocksDB provider, session.py) and is evicted once the
    watermark passes window end — the reference's result-slot
    reclamation (ResultAggregator.java:211-216), done by Spark.
    """
    if wd.kind != RANGE:
        raise ValueError("streaming windows are event-time; ROW windows use "
                         "streaming_count_windows (stateful.py)")
    # watermarks need TIMESTAMP (LTZ); NTZ parquet ts is identical under UTC
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = wd.range_window_col(ts_col)
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), *[F.col(k) for k in keys])
        .agg(*[a.to_column() for a in aggs])
    )
    return out.select(
        F.col("window.start").cast("timestamp").cast("long").alias("window_start"),
        F.col("window.end").cast("timestamp").cast("long").alias("window_end"),
        *keys,
        *[F.col(a.alias) for a in aggs],
    )


def streaming_session_aggregate(
    stream: DataFrame,
    gap_s: int,
    aggs: Sequence[AggSpec],
    keys: Sequence[str] = ("conv_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked session windows (state-store session merge)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("session"), *[F.col(k) for k in keys])
        .agg(*[a.to_column() for a in aggs])
    )
    return out.select(
        F.col("session.start").cast("timestamp").cast("long").alias("session_start"),
        F.col("session.end").cast("timestamp").cast("long").alias("session_end"),
        *keys,
        *[F.col(a.alias) for a in aggs],
    )


def streaming_stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    left_ts: str = "a_ts",
    right_ts: str = "b_ts",
    time_bound_s: int = 3600,
    watermark: str = "30 minutes",
    theta=None,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join keyed on conv_id with a
    time-interval condition (ThetaJoin semantics, SURVEY.md §2.1 #7).

    Both sides are watermarked; the interval condition bounds join state:
    a row is droppable once the other side's watermark passes
    ``ts + time_bound_s`` — exactly the reference's per-side window
    eviction, managed by the state store.
    """
    left = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    right = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {time_bound_s} SECONDS"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {time_bound_s} SECONDS"))
    )
    if theta is not None:
        cond = cond & theta
    return lw.join(rw, cond, how)


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Exact dedup on a live stream: first occurrence of each normalized-
    content hash passes, replicas arriving within the watermark horizon
    are dropped — curation's exact-dedup stage (operators/dedup.py) as a
    streaming operator.

    State is bounded by the watermark (``dropDuplicatesWithinWatermark``):
    a hash is remembered only until the event-time watermark passes its
    first occurrence + delay, so state size tracks the duplicate-arrival
    horizon, not the stream's life — the property that makes this viable
    on an unbounded 10^12-turn ingest, where the batch operator's
    "groupBy everything ever" is not. Duplicates separated by more than
    the watermark horizon are NOT caught (re-run the batch exact_dedup in
    compaction for those — the standard lambda split).
    """
    from saber_spark.operators.textops import normalize_text

    hashed = stream.withColumn(
        "content_hash", F.md5(normalize_text(text_col))
    ).withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash", *extra_keys]
    )


def streaming_windowed_sketches(
    stream: DataFrame,
    wd: WindowDef,
    distinct_col: str,
    quantile_col: str | None = None,
    probabilities: Sequence[float] = (0.5, 0.95, 0.99),
    keys: Sequence[str] = (),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    rsd: float = 0.05,
    accuracy: int = 10_000,
) -> DataFrame:
    """Streamed twin of the batch sketch layer (operators/sketches.py):
    per event-time window (and optional keys), a HyperLogLog++ distinct
    count of ``distinct_col`` plus optional approximate quantiles of
    ``quantile_col`` — the monitoring-dashboard aggregate over an
    unbounded transcript stream (distinct conversations per minute,
    latency percentiles per window) that an exact COUNT(DISTINCT) or
    sort-based percentile cannot provide without unbounded state.

    Both sketches are Spark imperative aggregates with mergeable
    buffers, so they run natively inside the streaming state store: the
    per-window state is ONE fixed-size HLL register set / GK summary,
    merged map-side across micro-batches and evicted when the watermark
    passes window end — exactly the bounded-state contract the exact
    aggregates in streaming_windowed_aggregate have. HLL register merge
    is max(), hence order-independent: the streamed count equals the
    batch sketch on the same rows bit-for-bit (asserted in tests); GK
    summaries are merge-order sensitive, so quantiles carry the usual
    rank-error bound rather than equality.
    """
    if wd.kind != RANGE:
        raise ValueError("streaming_windowed_sketches: event-time windows only")
    if not (0.0 < rsd < 1.0):
        raise ValueError("streaming_windowed_sketches: rsd must be in (0, 1)")
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    aggs = [
        F.approx_count_distinct(distinct_col, rsd=rsd).alias("approx_distinct")
    ]
    if quantile_col is not None:
        aggs.append(
            F.percentile_approx(
                F.col(quantile_col).cast("double"),
                F.array(*[F.lit(float(p)) for p in probabilities]),
                F.lit(accuracy),
            ).alias("quantiles")
        )
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(wd.range_window_col(ts_col).alias("window"),
                 *[F.col(k) for k in keys])
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").cast("timestamp").cast("long").alias("window_start"),
        F.col("window.end").cast("timestamp").cast("long").alias("window_end"),
        *keys,
        *[c for c in ("approx_distinct", "quantiles")
          if quantile_col is not None or c == "approx_distinct"],
    )
