"""Streaming queries surfaced through the driver contract.

Each entry actually executes a Structured Streaming query over the
transcripts (written as chronological parquet chunks, then streamed with
``maxFilesPerTrigger``) and returns the materialized result — so the
DuckDB oracle checks the *streaming* execution path end-to-end, not just
the batch plan it shares.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saber_spark.operators.aggregation import AggSpec
from saber_spark.operators.windows import RANGE, WindowDef
from saber_spark.plans.registry import register
from saber_spark.plans.saber_queries import _THETA_ORACLE, _YSB_ORACLE, transcripts
from saber_spark.sources.transcripts import with_transcripts_oracle
from saber_spark.streaming.jobs import (
    TRANSCRIPT_SCHEMA,
    read_transcript_stream,
    streaming_windowed_aggregate,
)
from saber_spark.streaming.stateful import streaming_count_windows

_TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp")


def _source_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the events source (path+size+mtime of every
    file) — invalidates staged chunks when the sf dataset is regenerated
    in place or two sf_dirs share a basename."""
    import hashlib

    root = os.path.join(os.path.realpath(sf_dir), "events.parquet")
    parts = [root]
    if os.path.isdir(root):
        for d, _, files in sorted(os.walk(root)):
            for fn in sorted(files):
                st = os.stat(os.path.join(d, fn))
                parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(root):
        st = os.stat(root)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _stage_chunks(spark: SparkSession, sf_dir: str, tag: str, n_files: int = 4) -> str:
    """Write transcripts as chronological chunk files for the file source."""
    fp = _source_fingerprint(sf_dir)
    path = os.path.join(_TMP, "driver_stream", f"{tag}_{fp[:12]}")
    marker = os.path.join(path, "_STAGED")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == fp:
                return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    t = transcripts(spark, sf_dir).withColumn("text_len", F.length("text").cast("long"))
    lo, hi = t.select(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / n_files
    for k in range(n_files):
        a = lo + k * span
        upper = None if k == n_files - 1 else lo + (k + 1) * span
        cond = F.col("ts") >= F.lit(a)
        if upper is not None:
            cond = cond & (F.col("ts") < F.lit(upper))
        t.where(cond).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"chunk={k:03d}")
        )
    with open(marker, "w") as fh:
        fh.write(fp)
    return path


def _stream_schema():
    import pyspark.sql.types as T

    return T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField("text_len", T.LongType())]
    )


def _run_complete(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    ckpt = os.path.join(_TMP, "driver_stream", f"ckpt_{name}")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        df.writeStream.outputMode("complete" if name.endswith("complete") else "append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # materialize before the memory sink table is replaced by a later run
    out = spark.sql(f"SELECT * FROM {name}")
    pdf = out.toPandas()
    return spark.createDataFrame(pdf, schema=out.schema)


@register("ysb_windowed_agg_streamed", _YSB_ORACLE)
def ysb_windowed_agg_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YSB flagship executed as a Structured Streaming job (file
    source in 4 chronological micro-batch groups, complete mode) —
    streaming path checked against the same DuckDB oracle as the batch
    plan."""
    path = _stage_chunks(spark, sf_dir, "ysb")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    )
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant"),
        WindowDef(RANGE, 600),
        [
            AggSpec("cnt", "*", "n_turns"),
            AggSpec("sum", "text_len", "sum_len"),
            AggSpec("avg", "text_len", "avg_len"),
        ],
        watermark="30 minutes",
    )
    return _run_complete(spark, agg, "ysb_streamed_complete")


_COUNTWIN_STREAM_ORACLE = with_transcripts_oracle("""
SELECT conv_id,
       CAST(floor(turn_idx / 16) AS BIGINT) AS window_id,
       count(*)                             AS n_turns,
       CAST(sum(length(text)) AS BIGINT)    AS sum_val
FROM transcripts
GROUP BY 1, 2
HAVING count(*) >= 16
""")


def row_window_streamed_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based TUMBLING windows as a custom stateful streaming
    operator (applyInPandasWithState keyed on conv_id); completed
    windows only — the oracle filters to full windows accordingly.

    Not a registry entry (50-entry consolidation): tumbling is the
    slide==size special case of the registered row_window_sliding_streamed
    (same operator, streaming/stateful.py), and the tumbling state path
    keeps pytest coverage in tests/test_streaming.py."""
    path = _stage_chunks(spark, sf_dir, "cw")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).select("conv_id", "turn_idx", "text_len")
    out = streaming_count_windows(stream, size=16, value_col="text_len").select(
        "conv_id", "window_id", "n_turns", "sum_val"
    )
    return _run_complete(spark, out, "row_window_streamed")


# Sliding ROW windows on the stream (reference WindowDefinition.java:5-18;
# figure-11b sweeps row-window slides): window = 16 turns, slide = 4 —
# completed windows only, so the oracle keeps the full-count windows.
_COUNTWIN_SLIDE_STREAM_ORACLE = with_transcripts_oracle("""
SELECT conv_id,
       CAST(floor(turn_idx / 4) AS BIGINT) - r.k AS window_id,
       count(*)                                   AS n_turns,
       CAST(sum(length(text)) AS BIGINT)          AS sum_val,
       CAST(max(length(text)) AS BIGINT)          AS max_val
FROM transcripts, range(0, 4) AS r(k)
WHERE CAST(floor(turn_idx / 4) AS BIGINT) - r.k >= 0
  AND turn_idx < (CAST(floor(turn_idx / 4) AS BIGINT) - r.k) * 4 + 16
GROUP BY 1, 2
HAVING count(*) = 16
""")


@register("row_window_sliding_streamed", _COUNTWIN_SLIDE_STREAM_ORACLE)
def row_window_sliding_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding count windows (16 turns / slide 4) as the stateful pane
    operator: per-conversation pane partials in typed state, a window
    emits when its turn count reaches the window size."""
    path = _stage_chunks(spark, sf_dir, "cws")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).select("conv_id", "turn_idx", "text_len")
    out = streaming_count_windows(stream, size=16, slide=4, value_col="text_len").select(
        "conv_id", "window_id", "n_turns", "sum_val", "max_val"
    )
    return _run_complete(spark, out, "row_window_sliding_streamed_mem")


# YSB through the EXACTLY-ONCE ICEBERG SINK, end to end: stream ->
# windowed agg (append mode, 0 s watermark) -> ExactlyOnceIcebergSink
# (one Iceberg snapshot per micro-batch on the from-scratch table format
# in sources/iceberg_format.py: optimistic metadata commit, idempotent
# commit-tags, per-record latency percentiles in snapshot summaries) ->
# snapshot-isolated scan. The driver value-checks what a downstream
# consumer would actually read back from committed snapshots — the
# north_rule's "exactly-once idempotent Iceberg sink" itself, not a
# memory-sink stand-in. Append mode emits exactly the windows whose
# end <= final watermark (= max assistant ts at 0 s delay), which the
# oracle reproduces with a scalar subquery.
_YSB_SUNK_ORACLE = with_transcripts_oracle("""
, a AS (SELECT ts, length(text) AS tl FROM transcripts WHERE role = 'assistant'),
wm AS (SELECT max(epoch(ts)) AS w FROM a),
agg AS (
    SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) * 600       AS window_start,
           CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 + 600 AS window_end,
           count(*)                                            AS n_turns,
           CAST(sum(tl) AS BIGINT)                             AS sum_len,
           avg(tl)                                             AS avg_len
    FROM a GROUP BY 1, 2
)
SELECT * FROM agg WHERE window_end <= (SELECT w FROM wm)
""")


@register("ysb_windowed_agg_sunk", _YSB_SUNK_ORACLE)
def ysb_windowed_agg_sunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YSB flagship executed as the full Iceberg loop the north rule
    describes: transcripts live in an Iceberg table; the query STREAMS
    from it (sources/iceberg_datasource.py — append snapshots become
    micro-batches) and lands in a second Iceberg table through the
    exactly-once snapshot-per-batch sink (streaming/iceberg_sink.py);
    the result is read back via a snapshot-isolated scan of committed
    snapshots only. Chronological appends are interleaved with
    processAllAvailable so each snapshot is a genuine micro-batch —
    table → stream → windowed aggregate → sink → scan, all
    driver-verified against one oracle (reference analogue: result
    re-dispatch, ResultAggregator.java:164-209, which persists nothing;
    the table-format loop is new engineering on Spark primitives)."""
    from saber_spark.sources.iceberg_format import IcebergTable
    from saber_spark.streaming.iceberg_sink import ExactlyOnceIcebergSink
    from saber_spark.streaming.jobs import read_iceberg_stream

    path = _stage_chunks(spark, sf_dir, "ysbsunk")
    src_dir = os.path.join(_TMP, "driver_stream", "sunk_ice_src")
    out_dir = os.path.join(_TMP, "driver_stream", "sunk_ice_table")
    ckpt = os.path.join(_TMP, "driver_stream", "ckpt_sunk_ice")
    for d in (src_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    source_table = IcebergTable.create(src_dir, _stream_schema())
    stream = read_iceberg_stream(spark, src_dir)
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant"),
        WindowDef(RANGE, 600),
        [
            AggSpec("cnt", "*", "n_turns"),
            AggSpec("sum", "text_len", "sum_len"),
            AggSpec("avg", "text_len", "avg_len"),
        ],
        watermark="0 seconds",
    )
    # unpartitioned + coalesce(1): a windowed aggregate emits a few
    # thousand rows per batch, so one data file per snapshot is the
    # right Iceberg write shape (partition pruning is exercised by
    # tests/test_iceberg_format.py on a partitioned table)
    table = IcebergTable.create(out_dir, agg)
    sink = ExactlyOnceIcebergSink(
        table, ckpt, "ysb_ice_driver", event_ts_col="window_end", coalesce=1
    )
    # Drive loop with RESUME-ON-FAILURE: if the stream dies mid-run
    # (executor loss, transient planner error), restart it from the SAME
    # checkpoint — offsets continue after the last committed batch and
    # the sink's idempotent commit-tags absorb the one batch that may
    # replay across the restart boundary. This is the north_rule's
    # "resumable mid-stream" exercised on the driver path itself (the
    # kill/resume property is separately forced in tests/test_streaming.py
    # and tests/test_iceberg_property.py).
    q = sink.start(agg, output_mode="append")

    def _drain():
        nonlocal q
        for attempt in range(3):
            try:
                q.processAllAvailable()
                return
            except Exception:
                if attempt == 2:
                    raise
                try:
                    q.stop()
                except Exception:
                    pass
                q = sink.start(agg, output_mode="append")

    try:
        for chunk in sorted(os.listdir(path)):
            if not chunk.startswith("chunk="):
                continue
            source_table.append(
                spark.read.schema(_stream_schema()).parquet(os.path.join(path, chunk))
            )
            _drain()
        _drain()  # no-data batch: watermark tail flush
    finally:
        # always stop — a query left running would race the next
        # invocation's rmtree of the staging/output dirs
        q.stop()
    return sink.read_committed(spark).select(
        "window_start", "window_end", "n_turns", "sum_len", "avg_len"
    )


@register("theta_join_streamed", _THETA_ORACLE)
def theta_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed ThetaJoin executed as a real stream-stream join
    (QueryApplication.java:63-85 two-stream entry point): both sides are
    watermarked streams; the interval condition bounds join state — a
    row is droppable once the other side's watermark passes
    ts + bound, the reference's per-side window eviction
    (ThetaJoin.java:171-196) done by the state store. Inner join +
    chronological micro-batches ⇒ every match is emitted, so the
    streaming execution is checked against the SAME oracle as the batch
    plan."""
    from saber_spark.streaming.jobs import streaming_stream_stream_join

    path = _stage_chunks(spark, sf_dir, "ssj")
    a = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).where(F.col("role") == "assistant").select(
        F.col("conv_id"), F.col("turn_idx").alias("a_turn"),
        F.col("text_len").cast("int").alias("a_len"), F.col("ts").alias("a_ts"))
    b = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).where(F.col("role") == "tool").select(
        F.col("conv_id").alias("b_conv"), F.col("turn_idx").alias("b_turn"),
        F.col("text_len").cast("int").alias("b_len"), F.col("ts").alias("b_ts"))
    joined = streaming_stream_stream_join(
        a, b.withColumnRenamed("b_conv", "conv_id"),
        key="conv_id", left_ts="a_ts", right_ts="b_ts",
        time_bound_s=21600, watermark="0 seconds",
        theta=F.col("a_len") > F.col("b_len"),
    )
    out = joined.select(a["conv_id"].alias("conv_id"),
                        "a_turn", "b_turn", "a_len", "b_len")
    return _run_complete(spark, out, "theta_streamed")


# CM1 on the STREAMING pane path: the subtract-on-evict pane operator over
# a real watermarked stream. With a 0 s watermark delay the final watermark
# is the max event time of the (tool <> '') stream, so the emitted set is
# exactly the windows whose end <= that watermark — which the oracle
# reproduces with a scalar subquery over the same filtered input.
_CM1_STREAMED_ORACLE = with_transcripts_oracle("""
, wm AS (SELECT max(epoch(ts)) AS w FROM transcripts WHERE tool <> ''),
cm AS (
    SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - r.k) * 300        AS window_start,
           (CAST(floor(epoch(ts) / 300) AS BIGINT) - r.k) * 300 + 3600 AS window_end,
           tool,
           count(*)                                                     AS n_turns,
           avg(length(text))                                            AS avg_len,
           CAST(max(length(text)) AS BIGINT)                            AS max_len
    FROM transcripts, range(0, 12) AS r(k)
    WHERE tool <> ''
    GROUP BY 1, 2, 3
)
SELECT * FROM cm WHERE window_end <= (SELECT w FROM wm)
""")


@register("cm1_grouped_sliding_agg_streamed", _CM1_STREAMED_ORACLE)
def cm1_grouped_sliding_agg_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CM1 (1 h window / 5 min slide, grouped by tool) executed on the
    streaming pane path: pane partials merged in applyInPandasWithState
    keyed state, windows emitted once when the watermark passes their
    end, panes evicted after their last window emits
    (streaming/panes.py — the north-star operator, driver-checked
    against the same window values as the batch pane layer)."""
    from saber_spark.operators.windows import WindowDef as _WD
    from saber_spark.streaming.panes import streaming_pane_sliding_aggregate

    path = _stage_chunks(spark, sf_dir, "cm1p")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).where(F.col("tool") != "")
    agg = streaming_pane_sliding_aggregate(
        stream, _WD(RANGE, 3600, 300), value_col="text_len", keys=("tool",),
        watermark="0 seconds",
    )
    out = agg.select(
        "window_start", "window_end", "tool",
        F.col("n_rows").alias("n_turns"),
        F.col("avg_val").alias("avg_len"),
        F.col("max_val").alias("max_len"),
    )
    return _run_complete(spark, out, "cm1_pane_streamed")


# Sessions whose end (last ts + gap) is at or below the final watermark are
# flushed by the no-data micro-batch; the oracle reproduces exactly that
# subset with a scalar-subquery watermark (max ts - delay over the whole
# input — deterministic for bounded replay).
_SESSION_STREAM_GAP = 1800
_SESSION_STREAM_DELAY = 1800

_SESSION_STREAMED_ORACLE = with_transcripts_oracle(f"""
, marked AS (
    SELECT conv_id, turn_idx, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) >= {_SESSION_STREAM_GAP}
                THEN 1 ELSE 0 END AS new_sess
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
sess AS (
    SELECT *, SUM(new_sess) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                  ROWS UNBOUNDED PRECEDING) AS sess_no
    FROM marked
),
wm AS (SELECT max(ts) AS max_ts FROM transcripts)
SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(max(ts))) AS BIGINT) + {_SESSION_STREAM_GAP} AS session_end,
       conv_id,
       count(*) AS n_turns
FROM sess
GROUP BY conv_id, sess_no
HAVING epoch(max(ts)) + {_SESSION_STREAM_GAP}
       <= (SELECT epoch(max_ts) FROM wm) - {_SESSION_STREAM_DELAY}
""")


@register("session_window_streamed", _SESSION_STREAMED_ORACLE)
def session_window_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session windows on a real stream (append mode): the
    driver value-checks exactly the sessions the watermark closed."""
    from saber_spark.operators.aggregation import AggSpec
    from saber_spark.streaming.jobs import streaming_session_aggregate

    path = _stage_chunks(spark, sf_dir, "sess")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    )
    agg = streaming_session_aggregate(
        stream,
        gap_s=_SESSION_STREAM_GAP,
        aggs=[AggSpec("cnt", "*", "n_turns")],
        keys=("conv_id",),
        watermark=f"{_SESSION_STREAM_DELAY} seconds",
    )
    return _run_complete(spark, agg, "session_streamed")


# LRB4 accident notification as ONE streaming query with TWO chained
# stateful operators — Saber's defining feature is multi-operator query
# pipelines over streams (`connectTo`, Query.java:243-264); Spark's
# analogue is multiple stateful operators in a single plan (supported in
# append mode since 3.5). Stage 1 (stateful agg): per (600 s window,
# tool) event counts, kept where n_stopped >= 2 — the "accident" stream.
# Stage 2 (stream-stream join): the raw tool-turn stream joins accidents
# whose window immediately precedes the turn's — vehicles entering the
# segment right after an accident get notified. Watermark propagation
# delays the agg side's output watermark by the window length so join
# state on the raw side is retained exactly long enough (SPARK-40925
# semantics). The agg emits windows with end <= final watermark (0 s
# delay => max tool-turn ts), which the oracle reproduces.
_LRB4_STREAM_W = 600

_LRB4_STREAMED_ORACLE = with_transcripts_oracle(f"""
, acc AS (
    SELECT tool, CAST(floor(epoch(ts) / {_LRB4_STREAM_W}) AS BIGINT) * {_LRB4_STREAM_W} AS w,
           count(*) AS n_stopped
    FROM transcripts WHERE tool <> ''
    GROUP BY 1, 2 HAVING count(*) >= 2
),
wm AS (SELECT max(epoch(ts)) AS mx FROM transcripts WHERE tool <> '')
SELECT a.w + {_LRB4_STREAM_W} AS window_start, t.tool, t.conv_id, t.turn_idx, a.n_stopped
FROM transcripts t JOIN acc a ON a.tool = t.tool
 AND epoch(t.ts) >= a.w + {_LRB4_STREAM_W}
 AND epoch(t.ts) <  a.w + {2 * _LRB4_STREAM_W}
WHERE t.tool <> '' AND a.w + {_LRB4_STREAM_W} <= (SELECT mx FROM wm)
""")


@register("lrb4_notify_streamed", _LRB4_STREAMED_ORACLE)
def lrb4_notify_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accident notification as a streamed two-stateful-operator DAG:
    windowed agg (accident detection) chained into a stream-stream join
    back to the raw turn stream, in one Structured Streaming plan."""
    w = _LRB4_STREAM_W
    path = _stage_chunks(spark, sf_dir, "lrb4s")
    tool_stream = (
        read_transcript_stream(
            spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
        )
        .where(F.col("tool") != "")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    acc = (
        tool_stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", f"{w} seconds").alias("w"), "tool")
        .agg(F.count("*").alias("n_stopped"))
        .where(F.col("n_stopped") >= 2)
    )
    raw = (
        read_transcript_stream(
            spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
        )
        .where(F.col("tool") != "")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "0 seconds")
        .select("conv_id", "turn_idx", F.col("tool").alias("r_tool"), "ts")
    )
    joined = raw.join(
        acc,
        (F.col("r_tool") == acc["tool"])
        & (F.col("ts") >= F.col("w.end"))
        & (F.col("ts") < F.col("w.end") + F.expr(f"INTERVAL {w} seconds")),
        "inner",
    ).select(
        F.col("w.end").cast("double").cast("long").alias("window_start"),
        F.col("r_tool").alias("tool"),
        "conv_id",
        "turn_idx",
        "n_stopped",
    )
    return _run_complete(spark, joined, "lrb4_notify_streamed_mem")


def lrb3_toll_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LRB3 toll assessment as a THREE-stateful-operator streaming DAG in
    one Structured Streaming plan: windowed segment-stats aggregation →
    stream-stream join applying each segment's PREVIOUS-window stats to
    the current window's turns (conditional toll) → per-(window, conv)
    toll aggregation. This is Saber's deepest `connectTo` pipeline shape
    (Query.java:243-264) on the streaming path; Spark chains the three
    stateful operators under one watermark with SPARK-40925 propagation.
    Exported builder + batch-parity pytest (not a registry entry — the
    batch `lrb3_toll_assessment` carries the driver oracle; this builder
    must equal it on every window the final watermark closed)."""
    w = 21600  # _LRB3_W: 6h windows, matching the batch shape
    path = _stage_chunks(spark, sf_dir, "lrb3s")

    def tool_stream():
        return (
            read_transcript_stream(
                spark, f"{path}/chunk=*", max_files_per_trigger=1,
                schema=_stream_schema(),
            )
            .where(F.col("tool") != "")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "0 seconds")
        )

    seg = (
        tool_stream()
        .groupBy(F.window("ts", f"{w} seconds").alias("sw"), "tool")
        .agg(F.count(F.lit(1)).alias("n_seg"), F.avg("text_len").alias("seg_avg"))
        .select(F.col("tool").alias("s_tool"), "sw", "n_seg", "seg_avg")
    )
    raw = tool_stream().select(
        "conv_id", F.col("tool").alias("r_tool"), "ts"
    )
    toll = (
        F.when(
            (F.col("seg_avg") < 28.5) & (F.col("n_seg") >= 21),
            2 * (F.col("n_seg") - 20) * (F.col("n_seg") - 20),
        ).otherwise(F.lit(0))
    )
    # previous-window join: a turn at ts is tolled by the seg window that
    # ENDED just before its own window started — ts ∈ [sw.end, sw.end + w)
    joined = raw.join(
        seg,
        (F.col("r_tool") == F.col("s_tool"))
        & (F.col("ts") >= F.col("sw.end"))
        & (F.col("ts") < F.col("sw.end") + F.expr(f"INTERVAL {w} seconds")),
        "inner",
    ).select("conv_id", "ts", toll.alias("toll"))
    out = (
        joined.groupBy(F.window("ts", f"{w} seconds").alias("tw"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("toll").cast("long").alias("toll_total"),
        )
        .select(
            F.col("tw.start").cast("double").cast("long").alias("window_start"),
            "conv_id",
            "n_turns",
            "toll_total",
        )
    )
    return _run_complete(spark, out, "lrb3_toll_streamed_mem")
