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
from saber_spark.plans.saber_queries import _THETA_BODY, _YSB_ORACLE, transcripts
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


def ysb_windowed_agg_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YSB flagship executed as a Structured Streaming job (file
    source in 4 chronological micro-batch groups, complete mode) —
    streaming path checked against the same DuckDB oracle as the batch
    plan.

    Rotated out of the 50-entry registry in round 4 (green CORRECTNESS
    rows in r2+r3): ysb_windowed_agg_sunk subsumes it — the same YSB
    stream driver-checked through the FULL Iceberg loop (table → stream
    → agg → exactly-once sink → snapshot scan) rather than a memory
    sink. Its slot now carries lrb3_toll_streamed, the deepest streamed
    DAG. The builder stays exported with pytest coverage."""
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


#: shared ROW-window SELECT bodies — standalone (rotated-out) oracles and
#: the mode-tagged union oracle compose from these single copies.
_ROWWIN_TUM_BODY = """
SELECT conv_id,
       CAST(floor(turn_idx / 16) AS BIGINT)  AS window_id,
       count(*)                              AS n_turns,
       CAST(sum(length(text)) AS BIGINT)     AS sum_val,
       CAST(max(length(text)) AS BIGINT)     AS max_val
FROM transcripts
GROUP BY 1, 2
HAVING count(*) >= 16
"""

_COUNTWIN_STREAM_ORACLE = with_transcripts_oracle(_ROWWIN_TUM_BODY)


def row_window_streamed_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based TUMBLING windows as a custom stateful streaming
    operator (applyInPandasWithState keyed on conv_id); completed
    windows only — the oracle filters to full windows accordingly.
    Driver-checked through row_window_streamed (mode='tumbling');
    the tumbling state path also keeps pytest coverage in
    tests/test_streaming.py."""
    path = _stage_chunks(spark, sf_dir, "cw")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).select("conv_id", "turn_idx", "text_len")
    out = streaming_count_windows(stream, size=16, value_col="text_len").select(
        "conv_id", "window_id", "n_turns", "sum_val", "max_val"
    )
    return _run_complete(spark, out, "row_window_streamed_tum")


# Sliding ROW windows on the stream (reference WindowDefinition.java:5-18;
# figure-11b sweeps row-window slides): window = 16 turns, slide = 4 —
# completed windows only, so the oracle keeps the full-count windows.
_ROWWIN_SLIDE_BODY = """
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
"""

_COUNTWIN_SLIDE_STREAM_ORACLE = with_transcripts_oracle(_ROWWIN_SLIDE_BODY)


def row_window_sliding_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding count windows (16 turns / slide 4) as the stateful pane
    operator: per-conversation pane partials in typed state, a window
    emits when its turn count reaches the window size. Driver-checked
    through row_window_streamed (mode='sliding')."""
    path = _stage_chunks(spark, sf_dir, "cws")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    ).select("conv_id", "turn_idx", "text_len")
    out = streaming_count_windows(stream, size=16, slide=4, value_col="text_len").select(
        "conv_id", "window_id", "n_turns", "sum_val", "max_val"
    )
    return _run_complete(spark, out, "row_window_sliding_streamed_mem")


# Tumbling AND sliding stateful row windows in ONE driver row (r4 registry
# rotation: the tumbling streamed path previously had no CORRECTNESS row) —
# each mode runs its own real stream through the applyInPandasWithState
# operator; results are mode-tagged and unioned against one oracle.
_ROWWIN_STREAMED_ORACLE = with_transcripts_oracle(f"""
, tum AS ({_ROWWIN_TUM_BODY}),
sli AS ({_ROWWIN_SLIDE_BODY})
SELECT 'tumbling' AS mode, * FROM tum
UNION ALL
SELECT 'sliding' AS mode, * FROM sli
""")


@register("row_window_streamed", _ROWWIN_STREAMED_ORACLE)
def row_window_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW (count) windows on the stream in BOTH forms, mode-tagged:
    'tumbling' (16-turn disjoint windows, per-window eviction) and
    'sliding' (16-turn window / 4-turn slide, frontier eviction) —
    the custom stateful operator streaming/stateful.py executed twice
    over real micro-batched streams and value-checked in one row."""
    tum = row_window_streamed_stateful(spark, sf_dir).select(
        F.lit("tumbling").alias("mode"), "*")
    sli = row_window_sliding_streamed(spark, sf_dir).select(
        F.lit("sliding").alias("mode"), "*")
    return tum.unionByName(sli)


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


def theta_join_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed ThetaJoin executed as a real stream-stream join
    (QueryApplication.java:63-85 two-stream entry point): both sides are
    watermarked streams; the interval condition bounds join state — a
    row is droppable once the other side's watermark passes
    ts + bound, the reference's per-side window eviction
    (ThetaJoin.java:171-196) done by the state store. Inner join +
    chronological micro-batches ⇒ every match is emitted, so the
    streaming execution is checked against the SAME oracle as the batch
    plan. (Driver-checked through theta_join_strategies since r4.)"""
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


# Batch plan AND real stream-stream execution of the SAME windowed
# ThetaJoin in one driver row (r4 rotation, cm1_pane_strategies
# discipline): both produce the identical match set, so the tagged union
# value-checks that the state-store eviction path agrees row-for-row
# with the Catalyst equi-join + interval-filter plan.
_THETA_STRATEGIES_ORACLE = with_transcripts_oracle(f"""
, tj AS ({_THETA_BODY})
SELECT 'batch' AS strategy, * FROM tj
UNION ALL
SELECT 'streamed' AS strategy, * FROM tj
""")


@register("theta_join_strategies", _THETA_STRATEGIES_ORACLE)
def theta_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from saber_spark.plans.saber_queries import theta_join_windowed

    batch = theta_join_windowed(spark, sf_dir).select(
        F.lit("batch").alias("strategy"), "*")
    streamed = theta_join_streamed(spark, sf_dir).select(
        F.lit("streamed").alias("strategy"), "*")
    return batch.unionByName(streamed)


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

def session_window_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session windows on a real stream (append mode): the
    driver value-checks exactly the sessions the watermark closed.
    (Driver-checked through session_window_strategies since r4, with
    sum_len added so both legs share one schema.)"""
    from saber_spark.operators.aggregation import AggSpec
    from saber_spark.streaming.jobs import streaming_session_aggregate

    path = _stage_chunks(spark, sf_dir, "sess")
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    )
    agg = streaming_session_aggregate(
        stream,
        gap_s=_SESSION_STREAM_GAP,
        aggs=[AggSpec("cnt", "*", "n_turns"),
              AggSpec("sum", F.col("text_len").cast("long"), "sum_len")],
        keys=("conv_id",),
        watermark=f"{_SESSION_STREAM_DELAY} seconds",
    )
    return _run_complete(spark, agg, "session_streamed")


# Batch session_window AND the watermarked streaming execution in one
# driver row (r4 rotation): same 30-min gap, so one gaps-and-islands CTE
# feeds both legs — the batch leg is every session, the streamed leg the
# subset the final watermark closed (append-mode emit set). The tagged
# union value-checks native session_window against the state-store
# session path row-for-row. A third 'dynamic_gap' leg exercises Spark's
# per-event session gap (tool turns time out after 120 s, human/model
# turns after 1200 s): each event's window is [ts, ts+gap(event)) and
# overlapping windows merge, so the oracle's islands flag compares each
# ts against the running MAX of ts+gap over all preceding events (a lag
# of just the previous row is wrong — a long-gap event can bridge past a
# short-gap one).
_SESSION_DYN_GAP_TOOL = 120
_SESSION_DYN_GAP_OTHER = 1200
_SESSION_STRATEGIES_ORACLE = with_transcripts_oracle(f"""
, marked AS (
    SELECT conv_id, turn_idx, ts, length(text) AS text_len,
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
wm AS (SELECT max(ts) AS max_ts FROM transcripts),
grouped AS (
    SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) + {_SESSION_STREAM_GAP} AS session_end,
           conv_id,
           count(*) AS n_turns,
           CAST(sum(text_len) AS BIGINT) AS sum_len,
           epoch(max(ts)) AS last_ts
    FROM sess GROUP BY conv_id, sess_no
),
dmarked AS (
    SELECT conv_id, turn_idx, ts, length(text) AS text_len,
           CASE WHEN role = 'tool' THEN {_SESSION_DYN_GAP_TOOL}
                ELSE {_SESSION_DYN_GAP_OTHER} END AS gap
    FROM transcripts
),
dflag AS (
    SELECT *, CASE WHEN max(epoch(ts) + gap) OVER dw IS NULL
                     OR epoch(ts) >= max(epoch(ts) + gap) OVER dw
                   THEN 1 ELSE 0 END AS new_sess
    FROM dmarked
    WINDOW dw AS (PARTITION BY conv_id ORDER BY ts, turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
dsess AS (
    SELECT *, SUM(new_sess) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                  ROWS UNBOUNDED PRECEDING) AS sess_no
    FROM dflag
),
dgrouped AS (
    SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(max(floor(epoch(ts)) + gap) AS BIGINT) AS session_end,
           conv_id, count(*) AS n_turns,
           CAST(sum(text_len) AS BIGINT) AS sum_len
    FROM dsess GROUP BY conv_id, sess_no
)
SELECT 'batch' AS strategy, session_start, session_end, conv_id, n_turns, sum_len
FROM grouped
UNION ALL
SELECT 'streamed' AS strategy, session_start, session_end, conv_id, n_turns, sum_len
FROM grouped
WHERE last_ts + {_SESSION_STREAM_GAP}
      <= (SELECT epoch(max_ts) FROM wm) - {_SESSION_STREAM_DELAY}
UNION ALL
SELECT 'dynamic_gap' AS strategy, session_start, session_end, conv_id, n_turns, sum_len
FROM dgrouped
""")


@register("session_window_strategies", _SESSION_STRATEGIES_ORACLE)
def session_window_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from saber_spark.operators.aggregation import AggSpec, session_aggregate
    from saber_spark.plans.saber_queries import session_window_agg
    from saber_spark.plans.saber_queries import transcripts as _tx

    batch = session_window_agg(spark, sf_dir).select(
        F.lit("batch").alias("strategy"), "*")
    streamed = session_window_streamed(spark, sf_dir).select(
        F.lit("streamed").alias("strategy"), "*")

    t = _tx(spark, sf_dir)
    # string literals, not INTERVAL exprs: session_window requires
    # CalendarIntervalType and only the string form casts to it
    gap = F.when(
        F.col("role") == "tool", F.lit(f"{_SESSION_DYN_GAP_TOOL} seconds")
    ).otherwise(F.lit(f"{_SESSION_DYN_GAP_OTHER} seconds"))
    dynamic = session_aggregate(
        t.select("conv_id", "role", "ts", F.length("text").alias("text_len")),
        gap_s=gap,
        aggs=[AggSpec("cnt", "*", "n_turns"),
              AggSpec("sum", F.col("text_len").cast("long"), "sum_len")],
    ).select(F.lit("dynamic_gap").alias("strategy"), "*")

    return batch.unionByName(streamed).unionByName(dynamic)


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


# LRB3 streamed: the three-stateful-op chain emits exactly the turn
# windows the final watermark closed — window_start + W <= max tool-turn
# ts (0 s delay), the same rule the batch-parity pytest proves. The
# oracle IS the batch LRB3 oracle body (imported — one copy of the toll
# formula) restricted to that window set.
from saber_spark.plans.saber_queries import _LRB3_CTES, _LRB3_SELECT, _LRB3_W

_LRB3_STREAMED_ORACLE = with_transcripts_oracle(
    _LRB3_CTES
    + ",\nwm AS (SELECT max(epoch(ts)) AS mx FROM transcripts WHERE tool <> '')"
    + _LRB3_SELECT
    + f"HAVING w + {_LRB3_W} <= (SELECT mx FROM wm)\n"
)


@register("lrb3_toll_streamed", _LRB3_STREAMED_ORACLE)
def lrb3_toll_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LRB3 toll assessment as a THREE-stateful-operator streaming DAG in
    one Structured Streaming plan: windowed segment-stats aggregation →
    stream-stream join applying each segment's PREVIOUS-window stats to
    the current window's turns (conditional toll) → per-(window, conv)
    toll aggregation. This is Saber's deepest `connectTo` pipeline shape
    (Query.java:243-264) on the streaming path; Spark chains the three
    stateful operators under one watermark with SPARK-40925 propagation.
    Registered in round 4 (registry rotation): the driver value-checks
    the emitted set against the batch pipeline restricted to the windows
    the final watermark closed — the same rule the batch-parity pytest
    proves."""
    w = _LRB3_W  # 6h windows, matching the batch shape
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


# --------------------------------------------------------------------------
# Late-data drop accounting (north_star: watermarks / out-of-order input).
# The input is staged OUT OF ORDER on purpose: a deterministic "late" set
# (portable md5 bucket % 20 == 0, restricted to the first half of the time
# span) is withheld from the three chronological on-time chunks and
# appended as the LAST file. By the time it arrives the watermark has
# passed its windows by a wide margin (guarded below), so Structured
# Streaming must drop every late row — and the per-operator
# numRowsDroppedByWatermark metric must account for exactly that set.
# The driver row value-checks BOTH: the kept windows (aggregates over
# on-time rows only, ends closed by the final watermark) AND the audit
# row carrying the engine-reported drop count, against one DuckDB oracle
# that reproduces the late set and the watermark arithmetic.
#
# Metric semantics (measured, then modeled in the oracle): the drop
# counter sits AT the stateful operator, downstream of the micro-batch's
# partial aggregation — the late rows are map-side combined into one
# partial row per distinct window before the watermark predicate sees
# them, so the engine reports DISTINCT LATE WINDOWS, not raw late rows
# (260 staged late rows → 244 dropped partials at sf0.01). The late
# file is coalesced to one parquet file (single input partition), which
# makes that collapse exact and deterministic.
# --------------------------------------------------------------------------

_LATE_DELAY_S = 1800
_LATE_WIN_S = 600

# first 8 md5 hex digits parsed positionally — the portable bucket
# primitive (operators/textops.py md5_bucket; bias ~7e-8)
_LATE_BUCKET_SQL = " + ".join(
    f"(instr('0123456789abcdef', substr(h, {i}, 1)) - 1) * {16 ** (8 - i)}"
    for i in range(1, 9)
)

_LATE_ORACLE = with_transcripts_oracle(f"""
, mid AS (SELECT (min(epoch(ts)) + max(epoch(ts))) / 2.0 AS m FROM transcripts),
marked AS (
    SELECT conv_id, turn_idx, ts, length(text) AS tl,
           (({_LATE_BUCKET_SQL}) % 20 = 0 AND epoch(ts) < (SELECT m FROM mid)) AS is_late
    FROM (SELECT *, md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)) AS h
          FROM transcripts)
),
wm AS (SELECT max(epoch(ts)) - {_LATE_DELAY_S} AS w FROM marked WHERE NOT is_late),
kept AS (
    SELECT CAST(floor(epoch(ts) / {_LATE_WIN_S}) AS BIGINT) * {_LATE_WIN_S} AS window_start,
           CAST(floor(epoch(ts) / {_LATE_WIN_S}) AS BIGINT) * {_LATE_WIN_S} + {_LATE_WIN_S} AS window_end,
           count(*)                          AS n_turns,
           CAST(sum(tl) AS BIGINT)           AS sum_len
    FROM marked WHERE NOT is_late
    GROUP BY 1, 2
)
SELECT 'window' AS part, window_start, window_end, n_turns, sum_len
FROM kept WHERE window_end <= (SELECT w FROM wm)
UNION ALL
SELECT 'late_dropped', CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       count(DISTINCT CAST(floor(epoch(ts) / {_LATE_WIN_S}) AS BIGINT)),
       CAST(-1 AS BIGINT)
FROM marked WHERE is_late
""")


def _stage_late_chunks(spark: SparkSession, sf_dir: str) -> str:
    """Three chronological on-time chunks + the late set as the LAST file
    (file source processes in write order). Guarded: the late windows
    must close at least one full micro-batch before the late file
    arrives, so their state is emitted AND evicted by then — making the
    drop set exact, not racing batch-boundary emission."""
    from saber_spark.operators.textops import md5_bucket

    fp = _source_fingerprint(sf_dir)
    path = os.path.join(_TMP, "driver_stream", f"late_{fp[:12]}")
    marker = os.path.join(path, "_STAGED")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == fp:
                return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    t = transcripts(spark, sf_dir).withColumn(
        "text_len", F.length("text").cast("long")
    )
    ep = F.col("ts").cast("timestamp").cast("double")
    lo, hi = t.select(F.min(ep), F.max(ep)).collect()[0]
    mid = (lo + hi) / 2.0
    key = F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"))
    is_late = (md5_bucket(key, 20) == 0) & (ep < F.lit(mid))
    two_thirds = lo + (hi - lo) * 2.0 / 3.0
    if not (mid + _LATE_WIN_S < two_thirds - _LATE_DELAY_S):
        raise ValueError(
            "late_data_accounting needs a time span where the late set's "
            "windows close a full batch before the late file arrives: "
            f"span {hi - lo:.0f}s too small for delay {_LATE_DELAY_S}s"
        )
    ontime = t.where(~is_late)
    bounds = [lo, lo + (hi - lo) / 3.0, two_thirds, hi + 1.0]
    for k in range(3):
        cond = (ep >= F.lit(bounds[k])) & (ep < F.lit(bounds[k + 1]))
        ontime.where(cond).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"chunk={k:03d}")
        )
    t.where(is_late).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "chunk=003")
    )
    with open(marker, "w") as fh:
        fh.write(fp)
    return path


@register("late_data_accounting", _LATE_ORACLE)
def late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling agg over a deliberately out-of-order stream:
    kept windows must aggregate the on-time rows only, and the engine's
    numRowsDroppedByWatermark must equal the staged late set exactly —
    both value-checked in one driver row ('window' rows + one
    'late_dropped' audit row).

    The audit oracle models the drop counter as DISTINCT LATE WINDOWS,
    which is exact only while the late file is read as ONE input
    partition (the batch's partial aggregation then collapses late rows
    to exactly one partial per window before the counter). coalesce(1)
    staging guarantees one FILE; one PARTITION is pinned here by raising
    spark.sql.files.maxPartitionBytes for the run (restored after) —
    without the pin, a late file larger than the split size (or a
    lowered config) would split, the counter would exceed the distinct-
    window count, and the row would go red on a config knob rather than
    a semantics bug. This entry is a correctness harness at driver scale
    factors; on an unbounded production stream the counter reads as
    >= distinct late windows."""
    path = _stage_late_chunks(spark, sf_dir)
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 31))
    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    )
    agg = streaming_windowed_aggregate(
        stream,
        WindowDef(RANGE, _LATE_WIN_S),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
        watermark=f"{_LATE_DELAY_S} seconds",
    )
    name = "late_accounting_mem"
    ckpt = os.path.join(_TMP, "driver_stream", f"ckpt_{name}")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        dropped = sum(
            s.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for s in p.get("stateOperators", [])
        )
    finally:
        q.stop()
        if prev_mpb is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
    kept = spark.sql(f"SELECT * FROM {name}").toPandas()
    kept = spark.createDataFrame(kept, schema=spark.table(name).schema).select(
        F.lit("window").alias("part"),
        "window_start",
        "window_end",
        "n_turns",
        "sum_len",
    )
    audit = spark.createDataFrame(
        [("late_dropped", -1, -1, int(dropped), -1)],
        "part string, window_start long, window_end long, n_turns long, sum_len long",
    )
    return kept.unionByName(audit)


# Row-level CDC over the from-scratch Iceberg format: two appends then a
# merge-on-read DELETE; changes(None -> current) must announce every
# appended row as an insert stamped with its commit ordinal and exactly
# the deleted rows as deletes. The oracle reproduces the event multiset
# from the same transcripts derivation — commit ordinals are fixed by
# the staged history (append 0, append 1, delete 2).
_CHANGELOG_ORACLE = with_transcripts_oracle("""
, base AS (SELECT conv_id, turn_idx, role, tool FROM transcripts
           WHERE turn_idx < 8)
SELECT conv_id, turn_idx, role, tool,
       'insert' AS change_type,
       CAST(CASE WHEN turn_idx < 4 THEN 0 ELSE 1 END AS INTEGER)
           AS change_ordinal
FROM base
UNION ALL
SELECT conv_id, turn_idx, role, tool,
       'delete' AS change_type,
       CAST(2 AS INTEGER) AS change_ordinal
FROM base WHERE tool = 'code'
""")


@register("iceberg_changelog", _CHANGELOG_ORACLE)
def iceberg_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog scan of the Iceberg layer, driver-checked end to
    end: stage a transcript table with two append snapshots, apply a
    merge-on-read DELETE (position-delete file, no data file touched),
    then read ``changes()`` over the whole history — the general-history
    replay primitive a downstream consumer uses where ``incremental``
    refuses non-append tables (sources/iceberg_format.py::changes;
    MoR/trim/compaction exactness rules in its docstring, every-pair
    reconstruction property in tests/test_iceberg_changelog.py).
    Reference analogue: none — Saber persists no tables; this is the
    sink side of SURVEY.md §2.5 extended to spec-v2 CDC."""
    from saber_spark.sources.iceberg_format import IcebergTable

    t = transcripts(spark, sf_dir).where(F.col("turn_idx") < 8)
    loc = os.path.join(_TMP, "driver_stream", "cdc_table")
    shutil.rmtree(loc, ignore_errors=True)
    tbl = IcebergTable.create(loc, t)
    tbl.append(t.where(F.col("turn_idx") < 4))
    tbl.append(t.where(F.col("turn_idx") >= 4))
    tbl.delete_where(spark, [("tool", "=", "code")], mode="merge-on-read")
    return tbl.changes(spark).select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        F.col("_change_type").alias("change_type"),
        F.col("_change_ordinal").alias("change_ordinal"),
    )
