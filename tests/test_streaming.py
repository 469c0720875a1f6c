"""Structured Streaming: batch/stream parity, watermarks, exactly-once
resume, stateful count windows, stream-stream join.

Test corpus: the deterministic transcripts derivation at sf0.001 written
as 6 time-range-ordered parquet files (chronological micro-batches, like
the reference's in-timestamp-order stream — SURVEY.md §1.3).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from saber_spark.operators.aggregation import AggSpec, windowed_aggregate
from saber_spark.operators.windows import RANGE, ROW, WindowDef
from saber_spark.plans.saber_queries import transcripts
from saber_spark.streaming.jobs import (
    read_transcript_stream,
    streaming_stream_stream_join,
    streaming_windowed_aggregate,
)
from saber_spark.streaming.sink import ExactlyOnceParquetSink
from saber_spark.streaming.stateful import streaming_count_windows
from tests.conftest import SF_SMOKE

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")

AGGS = [
    AggSpec("cnt", "*", "n_turns"),
    AggSpec("sum", "text_len", "sum_len"),
    AggSpec("max", "text_len", "max_len"),
]


def _write_ordered_stream(spark, path: str, n_files: int = 6) -> None:
    """Six chronological parquet files (file k covers the k-th time span)."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)
    t = transcripts(spark, SF_SMOKE).withColumn(
        "text_len", F.length("text").cast("long")
    )
    bounds = t.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) / n_files
    for k in range(n_files):
        a = lo + k * span
        b = hi if k == n_files - 1 else lo + (k + 1) * span
        cond = (F.col("ts") >= F.lit(a)) & (
            F.col("ts") <= F.lit(b) if k == n_files - 1 else F.col("ts") < F.lit(b)
        )
        t.where(cond).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"chunk={k:03d}")
        )


@pytest.fixture(scope="module")
def stream_dir(spark):
    path = os.path.join(TMP, "transcripts_stream")
    _write_ordered_stream(spark, path)
    yield path


def _stream_schema():
    from saber_spark.streaming.jobs import TRANSCRIPT_SCHEMA
    import pyspark.sql.types as T

    return T.StructType(TRANSCRIPT_SCHEMA.fields + [T.StructField("text_len", T.LongType())])


def _read_stream(spark, path, **kw):
    return read_transcript_stream(spark, f"{path}/chunk=*", schema=_stream_schema(), **kw)


def _run_to_memory(df, name, mode):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(TMP, f"ckpt_{name}"))
        .start()
    )
    q.processAllAvailable()
    return q


def _norm(pdf):
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_stream_batch_parity_complete_mode(spark, stream_dir):
    """Complete-mode streaming windowed agg == batch result exactly."""
    shutil.rmtree(os.path.join(TMP, "ckpt_par"), ignore_errors=True)
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=2)
    agg = streaming_windowed_aggregate(stream, WindowDef(RANGE, 3600), AGGS,
                                       keys=["role"], watermark="30 minutes")
    q = _run_to_memory(agg, "par", "complete")
    try:
        got = _norm(spark.sql("SELECT * FROM par").toPandas())
        batch = transcripts(spark, SF_SMOKE).withColumn(
            "text_len", F.length("text").cast("long"))
        want = _norm(windowed_aggregate(batch, WindowDef(RANGE, 3600), AGGS,
                                        keys=["role"]).toPandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        q.stop()


def test_stream_append_watermark_semantics(spark, stream_dir):
    """Append mode emits exactly the windows closed by the final watermark,
    with values identical to batch."""
    shutil.rmtree(os.path.join(TMP, "ckpt_app"), ignore_errors=True)
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=2)
    agg = streaming_windowed_aggregate(stream, WindowDef(RANGE, 3600), AGGS,
                                       keys=[], watermark="30 minutes")
    q = _run_to_memory(agg, "app", "append")
    try:
        wm = q.lastProgress["eventTime"]["watermark"]  # e.g. 2024-01-30T23:27:12.194Z
        wm_epoch = pd.Timestamp(wm).timestamp()
        got = _norm(spark.sql("SELECT * FROM app").toPandas())
        batch = transcripts(spark, SF_SMOKE).withColumn(
            "text_len", F.length("text").cast("long"))
        full = windowed_aggregate(batch, WindowDef(RANGE, 3600), AGGS).toPandas()
        cand_le = _norm(full[full.window_end <= wm_epoch])
        cand_lt = _norm(full[full.window_end < wm_epoch])
        ok = False
        for cand in (cand_le, cand_lt):
            if len(cand) == len(got):
                pd.testing.assert_frame_equal(got, cand, check_dtype=False)
                ok = True
                break
        assert ok, f"emitted {len(got)} rows; expected {len(cand_le)} (<=) or {len(cand_lt)} (<)"
        assert len(got) > 0
    finally:
        q.stop()


def test_exactly_once_sink_resume(spark, stream_dir):
    """Two-phase run with the same checkpoint: no dupes, no gaps; lineage
    recorded per batch; re-driven batch is idempotent."""
    out = os.path.join(TMP, "eo_out")
    ckpt = os.path.join(TMP, "eo_ckpt")
    staging = os.path.join(TMP, "eo_src")
    for p in (out, ckpt, staging):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(staging)
    chunks = sorted(os.listdir(stream_dir))
    # phase 1: first 3 chunks
    for c in chunks[:3]:
        shutil.copytree(os.path.join(stream_dir, c), os.path.join(staging, c))
    sink = ExactlyOnceParquetSink(out, ckpt)

    def run_phase():
        stream = _read_stream(spark, staging, max_files_per_trigger=1)
        proj = stream.select("conv_id", "turn_idx", "text_len")
        q = sink.start(proj, output_mode="append", availableNow=True)
        q.awaitTermination(120)
        q.stop()

    run_phase()
    n_phase1 = sink.read_committed(spark).count()
    assert n_phase1 > 0
    # phase 2: remaining chunks appear; resume from the same checkpoint
    for c in chunks[3:]:
        shutil.copytree(os.path.join(stream_dir, c), os.path.join(staging, c))
    run_phase()

    got = sink.read_committed(spark).select("conv_id", "turn_idx", "text_len")
    batch = transcripts(spark, SF_SMOKE).select(
        "conv_id", "turn_idx", F.length("text").cast("long").alias("text_len")
    )
    assert got.count() == batch.count()  # no dupes, no gaps
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0

    lineage = sink.lineage(spark).toPandas()
    assert lineage.n_rows.sum() == batch.count()
    assert lineage.batch_id.is_unique

    # idempotent re-drive: re-running a committed batch id is a no-op
    some_batch = int(lineage.batch_id.iloc[0])
    sink._foreach_batch(batch.limit(5), some_batch)
    assert sink.read_committed(spark).count() == batch.count()
    # crash between write and commit: marker missing -> re-drive overwrites
    os.remove(sink._commit_path(some_batch))
    sub = batch.limit(7)
    sink._foreach_batch(sub, some_batch)
    assert sink.is_committed(some_batch)


def test_sink_per_record_latency_percentiles(spark, stream_dir):
    """Commit markers carry per-record event-time→commit-time latency
    percentiles (p5/p25/p50/p75/p99 — LatencyMonitor.java:83-107 report
    shape), computed over each batch's rows, ordered and queryable
    through lineage()."""
    out = os.path.join(TMP, "lat_out")
    ckpt = os.path.join(TMP, "lat_ckpt")
    for p in (out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    sink = ExactlyOnceParquetSink(out, ckpt, event_ts_col="ts")
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=3)
    proj = stream.select("conv_id", "turn_idx", "ts", "text_len")
    q = sink.start(proj, output_mode="append", availableNow=True)
    q.awaitTermination(120)
    q.stop()
    lin = sink.lineage(spark).toPandas()
    assert len(lin) >= 2
    assert lin.p50_ms.notna().all()
    for _, r in lin.iterrows():
        assert r.p5_ms <= r.p25_ms <= r.p50_ms <= r.p75_ms <= r.p99_ms
    # replayed historical data: event→commit latency is large and positive
    assert (lin.p5_ms > 0).all()


def test_streaming_count_windows(spark, stream_dir):
    """Stateful ROW windows: completed windows == batch row-window agg
    restricted to full windows."""
    shutil.rmtree(os.path.join(TMP, "ckpt_cw"), ignore_errors=True)
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=2).select(
        "conv_id", "turn_idx", "text_len"
    )
    out = streaming_count_windows(stream, size=16, value_col="text_len")
    q = _run_to_memory(out, "cw", "append")
    try:
        got = _norm(spark.sql("SELECT conv_id, window_id, n_turns, sum_val FROM cw").toPandas())
        batch = transcripts(spark, SF_SMOKE).select(
            "conv_id", "turn_idx", F.length("text").cast("long").alias("text_len")
        )
        full = windowed_aggregate(
            batch,
            WindowDef(ROW, 16),
            [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_val")],
        ).toPandas()
        want = _norm(full[full.n_turns == 16])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got) > 0
    finally:
        q.stop()


def test_count_window_ttl_frees_silent_conversation(spark):
    """Event-time TTL: a conversation that goes silent mid-window must
    have its pending state expired once the watermark advances ttl past
    its last event (ResultAggregator.java:211-216 buffer reclamation
    analogue) — on a 10^12-turn stream, dead conversations must not leak
    state forever. A live conversation keeps flowing and emitting."""
    import datetime as dt

    from saber_spark.streaming.stateful import streaming_count_windows as scw
    import pyspark.sql.types as T

    base = dt.datetime(2024, 1, 1)
    tmp = os.path.join(TMP, "ttl_stream")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(os.path.join(TMP, "ckpt_ttlcw"), ignore_errors=True)
    os.makedirs(tmp)

    def rows(conv, turns, t0):
        return [
            (conv, i, 10 + i, base + dt.timedelta(seconds=t0 + i)) for i in turns
        ]

    # conv A: 10 turns then silence (partial window); conv B: keeps going
    chunks = [
        rows("A", range(0, 10), 0) + rows("B", range(0, 8), 0),
        rows("B", range(8, 16), 1000),   # B completes window 0 here
        rows("B", range(16, 21), 2000),  # watermark passes A.last_ts + ttl
    ]
    schema = "conv_id string, turn_idx int, text_len long, ts timestamp"
    for k, ch in enumerate(chunks):
        spark.createDataFrame(ch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, f"chunk={k:03d}"))
    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("text_len", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/chunk=*")
    )
    out = scw(stream, size=16, value_col="text_len", ttl_s=600)
    q = _run_to_memory(out, "ttlcw", "append")
    try:
        got = spark.sql("SELECT conv_id, window_id, n_turns FROM ttlcw").toPandas()
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    assert set(zip(got.conv_id, got.window_id)) == {("B", 0)}
    assert (got.n_turns == 16).all()
    # A's pending partials expired: only B's open-window state remains
    assert state_rows == 1, f"expected 1 live state row, found {state_rows}"


def test_count_window_gap_does_not_block_later_windows(spark):
    """Tumbling count windows: a window that never completes (missing
    turns) must not block later windows from emitting or being evicted —
    tumbling windows are disjoint, so completion is per-window."""
    import datetime as dt

    from saber_spark.streaming.stateful import streaming_count_windows as scw
    import pyspark.sql.types as T

    base = dt.datetime(2024, 1, 1)
    tmp = os.path.join(TMP, "gap_stream")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(os.path.join(TMP, "ckpt_gapcw"), ignore_errors=True)
    os.makedirs(tmp)
    # window 0 (turns 0-15) complete; window 1 (16-31) permanently partial
    # (only 20-23 ever arrive); window 2 (32-47) complete, split over chunks
    chunks = [
        [("A", i, 10 + i, base + dt.timedelta(seconds=i)) for i in range(0, 16)],
        [("A", i, 10 + i, base + dt.timedelta(seconds=100 + i)) for i in range(20, 24)]
        + [("A", i, 10 + i, base + dt.timedelta(seconds=100 + i)) for i in range(32, 40)],
        [("A", i, 10 + i, base + dt.timedelta(seconds=200 + i)) for i in range(40, 48)],
    ]
    schema = "conv_id string, turn_idx int, text_len long, ts timestamp"
    for k, ch in enumerate(chunks):
        spark.createDataFrame(ch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, f"chunk={k:03d}"))
    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("text_len", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/chunk=*")
    )
    out = scw(stream, size=16, value_col="text_len")
    q = _run_to_memory(out, "gapcw", "append")
    try:
        got = spark.sql(
            "SELECT window_id, n_turns FROM gapcw ORDER BY window_id"
        ).toPandas()
    finally:
        q.stop()
    assert got.window_id.tolist() == [0, 2]
    assert (got.n_turns == 16).all()


@pytest.mark.parametrize("lag", [3, None])
def test_sliding_count_window_poison_gap_lag_bound(spark, lag):
    """SLIDING count windows share panes, so eviction runs behind an
    all-complete frontier — and one missing turn stalls that frontier
    forever, pinning every later pane in state (round-3 advice).
    ``max_window_lag`` abandons windows stalled more than N windows
    behind the newest complete one. A/B over the same stream with a
    very-late arrival of the missing turn:

    - lag=3: the stalled windows' panes were evicted at the jump, so the
      late turn CANNOT resurrect them — windows 3,4 never emit (the
      documented trade), everything else does, state stays bounded.
    - lag=None (unbounded, the old behavior): the panes were retained,
      the late turn completes windows 3 and 4 — proving the bound is
      what does the abandoning."""
    import datetime as dt

    from saber_spark.streaming.stateful import streaming_count_windows as scw
    import pyspark.sql.types as T

    base = dt.datetime(2024, 1, 1)
    tag = f"poison_{lag}"
    tmp = os.path.join(TMP, f"{tag}_stream")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(os.path.join(TMP, f"ckpt_{tag}"), ignore_errors=True)
    os.makedirs(tmp)

    def rows(turns, t0):
        return [("A", i, 10 + i, base + dt.timedelta(seconds=t0 + i)) for i in turns]

    # size=4/slide=2: window w = turns [2w, 2w+4). Turn 9 is missing, so
    # windows 3 [6,10) and 4 [8,12) stall; 0..2 and 5..13 complete.
    chunks = [
        rows(range(0, 8), 0),
        rows([8], 100) + rows(range(10, 30), 100),
        rows([9], 300),  # the missing turn, very late
    ]
    schema = "conv_id string, turn_idx int, text_len long, ts timestamp"
    for k, ch in enumerate(chunks):
        spark.createDataFrame(ch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, f"chunk={k:03d}"))
    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("text_len", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/chunk=*")
    )
    out = scw(stream, size=4, slide=2, value_col="text_len", max_window_lag=lag)
    q = _run_to_memory(out, tag, "append")
    try:
        got = spark.sql(f"SELECT window_id, n_turns FROM {tag}").toPandas()
    finally:
        q.stop()
    emitted = set(got.window_id.tolist())
    if lag is None:
        assert emitted == set(range(0, 14)), emitted
    else:
        assert emitted == {0, 1, 2} | set(range(5, 14)), emitted
    assert (got.n_turns >= 4).all()


@pytest.mark.parametrize("lag", [3, None])
def test_sliding_count_window_recurring_gaps_still_bounded(spark, lag):
    """The lag bound must anchor to the newest PANE, not the newest
    complete window: with a gap recurring once per window span NO window
    ever completes, so a completion-anchored bound never fires and pane
    state grows forever. A/B via a very-late gap fill: with lag=3 the
    old panes were evicted (the fill resurrects nothing); with lag=None
    everything was retained and the fill completes windows 0 and 1."""
    import datetime as dt

    from saber_spark.streaming.stateful import streaming_count_windows as scw
    import pyspark.sql.types as T

    base = dt.datetime(2024, 1, 1)
    tag = f"recgap_{lag}"
    tmp = os.path.join(TMP, f"{tag}_stream")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(os.path.join(TMP, f"ckpt_{tag}"), ignore_errors=True)
    os.makedirs(tmp)

    # size=4/slide=2: window w = turns [2w, 2w+4). Dropping idx ≡ 3
    # (mod 4) poisons EVERY window (each spans 4 consecutive idxs).
    chunks = [
        [("A", i, 10 + i, base + dt.timedelta(seconds=i))
         for i in range(0, 40) if i % 4 != 3],
        [("A", 3, 13, base + dt.timedelta(seconds=300))],  # late gap fill
    ]
    schema = "conv_id string, turn_idx int, text_len long, ts timestamp"
    for k, ch in enumerate(chunks):
        spark.createDataFrame(ch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, f"chunk={k:03d}"))
    stream = (
        spark.readStream.schema(
            T.StructType(
                [
                    T.StructField("conv_id", T.StringType()),
                    T.StructField("turn_idx", T.IntegerType()),
                    T.StructField("text_len", T.LongType()),
                    T.StructField("ts", T.TimestampType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/chunk=*")
    )
    out = scw(stream, size=4, slide=2, value_col="text_len", max_window_lag=lag)
    q = _run_to_memory(out, tag, "append")
    try:
        got = spark.sql(f"SELECT window_id FROM {tag}").toPandas()
    finally:
        q.stop()
    emitted = set(got.window_id.tolist())
    if lag is None:
        assert emitted == {0, 1}, emitted
    else:
        assert emitted == set(), emitted


def test_streaming_pane_sliding_parity(spark, stream_dir):
    """The streaming pane operator (applyInPandasWithState subtract-on-
    evict) must emit exactly the windows the batch pane layer produces,
    restricted to window_end <= final watermark — and its state must stay
    bounded (panes evicted once their last window emits)."""
    from saber_spark.operators.panes import pane_windowed_aggregate
    from saber_spark.streaming.panes import streaming_pane_sliding_aggregate

    shutil.rmtree(os.path.join(TMP, "ckpt_spane"), ignore_errors=True)
    wd = WindowDef(RANGE, 3600, 600)
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=1)
    out = streaming_pane_sliding_aggregate(
        stream, wd, value_col="text_len", keys=("role",), watermark="0 seconds"
    )
    q = _run_to_memory(out, "spane", "append")
    try:
        wm = q.lastProgress["eventTime"]["watermark"]
        wm_epoch = pd.Timestamp(wm).timestamp()
        got = _norm(spark.sql(
            "SELECT window_start, window_end, role, n_rows, sum_val, min_val,"
            " max_val, avg_val FROM spane").toPandas())
        batch = transcripts(spark, SF_SMOKE).select(
            "role", "ts", F.length("text").cast("long").alias("text_len"))
        full = pane_windowed_aggregate(
            batch, wd,
            [AggSpec("cnt", "*", "n_rows"), AggSpec("sum", "text_len", "sum_val"),
             AggSpec("min", "text_len", "min_val"), AggSpec("max", "text_len", "max_val"),
             AggSpec("avg", "text_len", "avg_val")],
            keys=["role"], method="incremental",
        ).toPandas()
        want = _norm(full[full.window_end <= wm_epoch])
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # bounded state: pending panes per key <= panes/window + wm lag
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        n_keys = 3  # roles
        assert state_rows <= n_keys * (wd.num_panes + 4), (
            f"state holds {state_rows} rows — pane eviction is not bounding it"
        )
    finally:
        q.stop()


def test_stream_stream_join_parity(spark, stream_dir):
    """Watermarked stream-stream join == batch join (chronological input,
    interval-bounded state)."""
    shutil.rmtree(os.path.join(TMP, "ckpt_ssj"), ignore_errors=True)
    src = _read_stream(spark, stream_dir, max_files_per_trigger=2)
    a = src.where(F.col("role") == "assistant").select(
        "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts"))
    b = _read_stream(spark, stream_dir, max_files_per_trigger=2).where(
        F.col("role") == "tool").select(
        F.col("conv_id").alias("b_conv"), F.col("turn_idx").alias("b_turn"),
        F.col("ts").alias("b_ts"))
    joined = streaming_stream_stream_join(
        a, b.withColumnRenamed("b_conv", "conv_id"),
        key="conv_id", left_ts="a_ts", right_ts="b_ts",
        time_bound_s=3600, watermark="30 minutes",
    ).select(a["conv_id"].alias("conv_id"), "a_turn", "b_turn")
    q = _run_to_memory(joined, "ssj", "append")
    try:
        got = _norm(spark.sql("SELECT * FROM ssj").toPandas())
        t = transcripts(spark, SF_SMOKE)
        ba = t.where(F.col("role") == "assistant").select(
            "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts"))
        bb = t.where(F.col("role") == "tool").select(
            F.col("conv_id").alias("conv_id2"), F.col("turn_idx").alias("b_turn"),
            F.col("ts").alias("b_ts"))
        want = _norm(
            ba.join(
                bb,
                (ba.conv_id == bb.conv_id2)
                & (F.abs(ba.a_ts.cast("timestamp").cast("double")
                         - bb.b_ts.cast("timestamp").cast("double")) <= 3600),
            ).select("conv_id", "a_turn", "b_turn").toPandas()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got) > 0
    finally:
        q.stop()


def test_progress_collector_metrics(spark, stream_dir):
    """StreamingQueryListener metrics: per-micro-batch rows/sec + state
    rows land in a queryable DataFrame (PerformanceMonitor analogue)."""
    from saber_spark.streaming.jobs import streaming_windowed_aggregate
    from saber_spark.streaming.metrics import ProgressCollector

    shutil.rmtree(os.path.join(TMP, "ckpt_met"), ignore_errors=True)
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    try:
        stream = _read_stream(spark, stream_dir, max_files_per_trigger=2)
        agg = streaming_windowed_aggregate(stream, WindowDef(RANGE, 3600), AGGS,
                                           watermark="30 minutes")
        q = (
            agg.writeStream.outputMode("append").format("noop")
            .option("checkpointLocation", os.path.join(TMP, "ckpt_met"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        q.stop()
        # listener callbacks are async; give the bus a moment
        import time as _time

        for _ in range(20):
            if collector.rows:
                break
            _time.sleep(0.5)
        snapshot = collector.to_df(spark)  # one snapshot: listener is async
        mdf = snapshot.toPandas()
        assert len(mdf) > 0
        assert (mdf.input_rows.fillna(0) >= 0).all()
        assert mdf.batch_id.notna().any()
        # latency percentiles (LatencyMonitor.java:83-107 report shape)
        from saber_spark.streaming.metrics import latency_percentiles

        lat = latency_percentiles(snapshot).toPandas()
        assert lat.n_batches.iloc[0] == len(mdf)
        assert lat.p99.iloc[0] >= lat.p50.iloc[0] >= lat.p5.iloc[0]
    finally:
        spark.streams.removeListener(collector)


def test_lrb3_streamed_three_stateful_ops_matches_batch(spark):
    """The streamed LRB3 chain (windowed agg -> stream-stream join ->
    windowed agg, three stateful operators in ONE plan) must equal the
    batch lrb3_toll_assessment on every window the final watermark
    closed (window_start + 2W <= max tool-turn ts: the seg window AND
    the turn window must both have finalized)."""
    from pyspark.sql import functions as F

    from saber_spark.plans.saber_queries import lrb3_toll_assessment, transcripts
    from saber_spark.plans.streaming_queries import lrb3_toll_streamed
    from tests.conftest import SF_SMOKE

    w = 21600
    got = {
        (r.window_start, r.conv_id, r.n_turns, r.toll_total)
        for r in lrb3_toll_streamed(spark, SF_SMOKE).collect()
    }
    mx = (
        transcripts(spark, SF_SMOKE)
        .where(F.col("tool") != "")
        .agg(F.max(F.col("ts").cast("timestamp").cast("double")))
        .collect()[0][0]
    )
    want = {
        (r.window_start, r.conv_id, r.n_turns, r.toll_total)
        for r in lrb3_toll_assessment(spark, SF_SMOKE)
        .where(F.col("window_start") + w <= mx)
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_streaming_exact_dedup_drops_replicas(spark):
    """Replicas inside the watermark horizon are dropped: a stream
    unioned with itself (every row duplicated at the same event time)
    must produce EXACTLY the same output as the un-doubled stream, and
    no hash may repeat within the horizon. Duplicates farther apart than
    the watermark legitimately re-pass (state is horizon-bounded)."""
    import os
    import shutil

    from saber_spark.plans.streaming_queries import (
        _TMP,
        _stage_chunks,
        _stream_schema,
    )
    from saber_spark.streaming.jobs import read_transcript_stream, streaming_exact_dedup
    from tests.conftest import SF_SMOKE

    path = _stage_chunks(spark, SF_SMOKE, "dedup_stream")

    def src():
        return read_transcript_stream(
            spark, f"{path}/chunk=*", max_files_per_trigger=1,
            schema=_stream_schema(),
        )

    def run(stream, name):
        out = streaming_exact_dedup(stream, watermark="30 minutes")
        ckpt = os.path.join(_TMP, "driver_stream", f"ckpt_{name}")
        shutil.rmtree(ckpt, ignore_errors=True)
        q = (
            out.writeStream.outputMode("append").format("memory")
            .queryName(name).option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()
        return {
            (r.content_hash, r.ts)
            for r in spark.sql(f"SELECT content_hash, ts FROM {name}").collect()
        }

    single = run(src(), "dedup_stream_single")
    doubled = run(src().unionByName(src()), "dedup_stream_doubled")
    n_in = spark.read.schema(_stream_schema()).parquet(f"{path}/chunk=*").count()
    assert doubled == single, "doubling the stream must not change the output"
    assert 0 < len(single) < n_in  # real dedup happened (corpus has dups)


def test_count_windows_survive_duplicate_delivery(spark, tmp_path):
    """At-least-once upstream: one replayed turn overshoots its window's
    count (n_turns > size), which must still EMIT (completion is
    n >= size) — a stalled window would freeze the eviction frontier and
    strand every later pane of the conversation."""
    import os

    from pyspark.sql import functions as F

    from saber_spark.streaming.jobs import read_transcript_stream
    from saber_spark.streaming.stateful import streaming_count_windows

    src_dir = str(tmp_path / "dup_src")
    rows = [("c1", i, 10) for i in range(16)] + [("c1", 5, 10)]  # turn 5 twice
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text_len long"
    ).coalesce(1).write.parquet(os.path.join(src_dir, "chunk=000"))

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, text_len long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/chunk=*")
    )
    out = streaming_count_windows(stream, size=16, value_col="text_len")
    ckpt = str(tmp_path / "dup_ckpt")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("dup_windows").option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM dup_windows").collect()
    assert len(got) == 1
    assert got[0].n_turns == 17  # overshoot emitted, not stalled
    assert got[0].sum_val == 170


def test_count_windows_with_integer_key(spark, tmp_path):
    """The key parameter must drive the output schema (name AND type) —
    a hardcoded conv_id:string field broke any non-default key."""
    import os

    from saber_spark.streaming.stateful import streaming_count_windows

    src_dir = str(tmp_path / "ikey_src")
    rows = [(7, i, 5) for i in range(8)]
    spark.createDataFrame(
        rows, "user_id long, turn_idx int, text_len long"
    ).coalesce(1).write.parquet(os.path.join(src_dir, "chunk=000"))
    stream = (
        spark.readStream.schema("user_id long, turn_idx int, text_len long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/chunk=*")
    )
    out = streaming_count_windows(stream, size=4, key="user_id", value_col="text_len")
    ckpt = str(tmp_path / "ikey_ckpt")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("ikey_windows").option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM ikey_windows").collect()
    assert {r.user_id for r in got} == {7}
    assert {r.window_id for r in got} == {0, 1}


def test_count_windows_poison_turn_idx_is_bounded(spark, tmp_path):
    """One corrupt far-out turn_idx (10^12) must not inflate memory: the
    sparse pane fan-out costs O(#panes), never O(pane-id span). The
    healthy window still emits; the stray pane just sits in state."""
    import os

    from saber_spark.streaming.stateful import streaming_count_windows

    src_dir = str(tmp_path / "poison_src")
    rows = [("c1", i, 1) for i in range(16)] + [("c1", 10**12, 1)]
    spark.createDataFrame(
        rows, "conv_id string, turn_idx long, text_len long"
    ).coalesce(1).write.parquet(os.path.join(src_dir, "chunk=000"))
    stream = (
        spark.readStream.schema("conv_id string, turn_idx long, text_len long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/chunk=*")
    )
    out = streaming_count_windows(stream, size=16, value_col="text_len")
    ckpt = str(tmp_path / "poison_ckpt")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("poison_windows").option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()  # a dense grid here would try ~10^12 elements
    q.stop()
    got = spark.sql("SELECT * FROM poison_windows").collect()
    assert len(got) == 1 and got[0].window_id == 0


def test_stream_stream_left_outer_join_emits_evicted_nulls(spark, stream_dir):
    """Left-outer stream-stream join: matched rows equal the batch inner
    join; unmatched left rows emit null-extended once the watermark has
    provably passed their droppable point (a_ts + time_bound). Boundary
    rows (evictable only at exactly the final watermark) are asserted
    neither way — emission at the edge is a batch-timing detail."""
    shutil.rmtree(os.path.join(TMP, "ckpt_ssjo"), ignore_errors=True)
    bound, wm_delay = 3600, 1800
    a = _read_stream(spark, stream_dir, max_files_per_trigger=2).where(
        F.col("role") == "assistant").select(
        "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts"))
    b = _read_stream(spark, stream_dir, max_files_per_trigger=2).where(
        F.col("role") == "tool").select(
        F.col("conv_id").alias("conv_id"), F.col("turn_idx").alias("b_turn"),
        F.col("ts").alias("b_ts"))
    joined = streaming_stream_stream_join(
        a, b, key="conv_id", left_ts="a_ts", right_ts="b_ts",
        time_bound_s=bound, watermark=f"{wm_delay} seconds", how="left_outer",
    ).select(a["conv_id"].alias("conv_id"), "a_turn", "b_turn")
    q = _run_to_memory(joined, "ssjo", "append")
    try:
        got = spark.sql("SELECT * FROM ssjo").toPandas()
        inner_got = _norm(got[got["b_turn"].notna()].copy())
        null_got = {
            (r.conv_id, r.a_turn) for r in got[got["b_turn"].isna()].itertuples()
        }

        t = transcripts(spark, SF_SMOKE)
        ba = t.where(F.col("role") == "assistant").select(
            "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts"))
        bb = t.where(F.col("role") == "tool").select(
            F.col("conv_id").alias("conv_id2"), F.col("turn_idx").alias("b_turn"),
            F.col("ts").alias("b_ts"))
        cond = (ba.conv_id == bb.conv_id2) & (
            F.abs(ba.a_ts.cast("timestamp").cast("double")
                  - bb.b_ts.cast("timestamp").cast("double")) <= bound
        )
        want_inner = _norm(
            ba.join(bb, cond).select("conv_id", "a_turn", "b_turn").toPandas()
        )
        pd.testing.assert_frame_equal(
            inner_got, _norm(want_inner), check_dtype=False
        )

        # the global watermark is the MIN across both inputs, and each
        # input's watermark tracks only rows that survive its role
        # filter — so the tool side (sparser) usually sets it
        max_a = ba.agg(F.max(F.col("a_ts").cast("timestamp").cast("double"))).collect()[0][0]
        max_b = bb.agg(F.max(F.col("b_ts").cast("timestamp").cast("double"))).collect()[0][0]
        final_wm = min(max_a, max_b) - wm_delay
        unmatched = ba.join(bb, cond, "left_anti").select(
            "conv_id", "a_turn", F.col("a_ts").cast("timestamp").cast("double").alias("e")
        ).collect()
        must_emit = {(r.conv_id, r.a_turn) for r in unmatched if r.e + bound < final_wm - 60}
        must_not = {(r.conv_id, r.a_turn) for r in unmatched if r.e + bound > final_wm}
        matched_keys = {(r.conv_id, r.a_turn) for r in want_inner.itertuples()}
        assert must_emit, "fixture produced no evictable unmatched rows"
        assert must_emit <= null_got
        assert not (null_got & must_not)
        assert not (null_got & matched_keys), "outer null emitted for a matched row"
    finally:
        q.stop()


def test_stream_static_broadcast_enrichment(spark, stream_dir):
    """Stream-static join: the transcript stream enriched against a
    static dimension (per-tool stats computed in batch) must broadcast
    the static side — no shuffle, no state store — and match the batch
    join row-for-row. This is the standard dimension-enrichment pattern;
    stateless per micro-batch, so no watermark is involved."""
    shutil.rmtree(os.path.join(TMP, "ckpt_ssb"), ignore_errors=True)
    t = transcripts(spark, SF_SMOKE)
    dim = t.where(F.col("tool") != "").groupBy("tool").agg(
        F.count(F.lit(1)).alias("tool_uses"))
    src = _read_stream(spark, stream_dir, max_files_per_trigger=3).where(
        F.col("tool") != "")
    enriched = src.join(F.broadcast(dim), on="tool").select(
        "conv_id", "turn_idx", "tool", "tool_uses")
    # plan probe on the batch-equivalent: broadcast, not sort-merge
    bplan = t.where(F.col("tool") != "").join(F.broadcast(dim), on="tool")
    ptxt = bplan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in ptxt and "SortMergeJoin" not in ptxt
    q = _run_to_memory(enriched, "ssb", "append")
    try:
        got = _norm(spark.sql("SELECT * FROM ssb").toPandas())
        want = _norm(
            t.where(F.col("tool") != "").join(dim, on="tool")
            .select("conv_id", "turn_idx", "tool", "tool_uses").toPandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got) > 0
    finally:
        q.stop()


def test_streaming_ivf_topk_matches_batch(spark):
    """Streaming ANN enrichment == batch ivf_topk row-for-row: same
    codebook, same probe count, same rounding and tie-breaks. The stream
    carries 40 query embeddings in one event-time window plus a
    far-future flush row whose watermark advance closes that window
    (append mode emits a window only once the watermark passes it)."""
    from saber_spark.operators.similarity import ivf_topk
    from saber_spark.streaming.ann import streaming_ivf_topk

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = base.where(F.col("vec_id") % 13 == 0)  # 39 of 500

    path = os.path.join(TMP, "ann_stream")
    shutil.rmtree(path, ignore_errors=True)
    q_ts = queries.withColumn(
        "ts",
        F.expr("timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,vec_id)"),
    ).select("vec_id", "embedding", "ts")
    q_ts.coalesce(1).write.parquet(os.path.join(path, "chunk=000"))
    # flush row: its lone far-future window never closes (never emitted),
    # but its watermark advance closes the real one
    q_ts.limit(1).withColumn(
        "ts", F.expr("timestamp_ntz'2030-01-01 00:00:00'")
    ).coalesce(1).write.parquet(os.path.join(path, "chunk=001"))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/chunk=*")
    )
    out = streaming_ivf_topk(
        stream, base, k=5, n_probes=3, window_s=86400, watermark="0 seconds"
    )
    shutil.rmtree(os.path.join(TMP, "ckpt_ann"), ignore_errors=True)
    q = _run_to_memory(out, "ann", "append")
    try:
        got = _norm(
            spark.sql("SELECT query_id, nbr_id, cosine, rk FROM ann").toPandas()
        )
        want = _norm(
            ivf_topk(base, queries, k=5, n_probes=3)
            .select("query_id", "nbr_id", "cosine", "rk")
            .toPandas()
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    finally:
        q.stop()


def test_streaming_ann_state_bounded_to_k():
    """The (query, window) state is EXACTLY the running top-k: folding
    500 candidates (a hot probed cell, ≫ k) through merge_topk in
    several micro-batch-sized chunks never lets the stored arrays exceed
    k entries, and the survivors are the global top-k with the batch
    tie-break ((-cosine, nbr_id) lexicographic). This is the O(k) state
    bound: streaming_ivf_topk's processor stores merge_topk's output
    verbatim, so state bytes per group are k doubles + k ids regardless
    of probed-cell size."""
    from saber_spark.streaming.ann import merge_topk

    k = 5
    # 500 candidates incl. score ties (cosine collisions across ids)
    cands = [((i * 7919) % 100 / 100.0, i) for i in range(500)]
    want = sorted(((-c, i) for c, i in cands))[:k]

    negs, ids = [], []
    for lo in range(0, 500, 37):  # 14 uneven "micro-batches"
        chunk = cands[lo : lo + 37]
        negs, ids = merge_topk(
            negs, ids, [-c for c, _ in chunk], [i for _, i in chunk], k
        )
        assert len(negs) <= k and len(ids) <= k  # the bound, every batch
    assert list(zip(negs, ids)) == want


def test_streaming_windowed_sketches_parity(spark, stream_dir):
    """HLL register merge is order-independent: the streamed windowed
    approx-distinct equals the batch sketch on the same rows exactly,
    and the streamed quantiles stay within the sketch's rank-error
    bound of the exact batch percentiles."""
    from saber_spark.streaming.jobs import streaming_windowed_sketches

    shutil.rmtree(os.path.join(TMP, "ckpt_sk"), ignore_errors=True)
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=2)
    wd = WindowDef(RANGE, 3600)
    out = streaming_windowed_sketches(
        stream, wd, distinct_col="conv_id",
        quantile_col="text_len", probabilities=(0.5, 0.9),
        watermark="0 seconds",
    )
    q = _run_to_memory(out, "sk", "append")
    try:
        # arrays (quantiles) are unsortable/unhashable in pandas — key
        # the comparison on the window bounds instead of _norm
        got = (
            spark.sql("select * from sk")
            .toPandas()
            .sort_values(["window_start", "window_end"])
            .reset_index(drop=True)
        )
        batch = transcripts(spark, SF_SMOKE).withColumn(
            "text_len", F.length("text").cast("long")
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        want_df = (
            batch.groupBy(wd.range_window_col("ts").alias("window"))
            .agg(
                F.approx_count_distinct("conv_id", rsd=0.05).alias(
                    "approx_distinct"
                ),
                F.percentile_approx(
                    F.col("text_len").cast("double"),
                    F.array(F.lit(0.5), F.lit(0.9)),
                    F.lit(10_000),
                ).alias("exact_q"),
                F.count("*").alias("n"),
            )
            .select(
                F.col("window.start").cast("timestamp").cast("long")
                .alias("window_start"),
                F.col("window.end").cast("timestamp").cast("long")
                .alias("window_end"),
                "approx_distinct", "exact_q", "n",
            )
        )
        max_ts = batch.agg(
            F.max(F.col("ts").cast("timestamp").cast("long"))
        ).first()[0]
        want = (
            want_df.toPandas()
            .query("window_end <= @max_ts")  # last window never closes
            .sort_values(["window_start", "window_end"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want) > 0
        merged = got.merge(
            want, on=["window_start", "window_end"], suffixes=("", "_b")
        )
        assert len(merged) == len(want)
        # HLL: bit-for-bit equality with the batch sketch
        assert (
            merged["approx_distinct"] == merged["approx_distinct_b"]
        ).all()
        # quantiles: with accuracy=10000 and windows far smaller than
        # that, the GK summaries never compress, so the streamed merge
        # holds the same multiset as the batch sketch — identical picks
        for _, r in merged.iterrows():
            for qi in range(2):
                approx, exact = r["quantiles"][qi], r["exact_q"][qi]
                assert approx == exact, (r["window_start"], qi, approx, exact)
    finally:
        q.stop()


def test_streaming_shared_panes_parity(spark, stream_dir):
    """ONE shared pane ring per key serving three concurrent window
    queries must emit, per query, exactly what the batch shared plan
    produces restricted to window_end <= final watermark — and hold one
    state row per key TOTAL (not per query)."""
    from saber_spark.operators.panes import shared_pane_aggregate
    from saber_spark.streaming.panes import streaming_shared_pane_aggregate

    shutil.rmtree(os.path.join(TMP, "ckpt_shpane"), ignore_errors=True)
    qs = {
        "1h_by_10m": WindowDef(RANGE, 3600, 600),
        "30m_by_5m": WindowDef(RANGE, 1800, 300),
        "2h_tumbling": WindowDef(RANGE, 7200, 7200),
    }
    stream = _read_stream(spark, stream_dir, max_files_per_trigger=1)
    out = streaming_shared_pane_aggregate(
        stream, qs, value_col="text_len", keys=("role",), watermark="0 seconds"
    )
    q = _run_to_memory(out, "shpane", "append")
    try:
        wm = q.lastProgress["eventTime"]["watermark"]
        wm_epoch = pd.Timestamp(wm).timestamp()
        got = _norm(spark.sql(
            "SELECT query, window_start, window_end, role, n_rows, sum_val,"
            " min_val, max_val, avg_val FROM shpane").toPandas())
        batch = transcripts(spark, SF_SMOKE).select(
            "role", "ts", F.length("text").cast("long").alias("text_len"))
        full = shared_pane_aggregate(
            batch, qs,
            [AggSpec("cnt", "*", "n_rows"), AggSpec("sum", "text_len", "sum_val"),
             AggSpec("min", "text_len", "min_val"), AggSpec("max", "text_len", "max_val"),
             AggSpec("avg", "text_len", "avg_val")],
            keys=["role"],
        ).toPandas()
        want = _norm(full[full.window_end <= wm_epoch])
        assert len(got) > 0
        assert sorted(got["query"].unique()) == sorted(qs)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # the whole point: one pane ring per key TOTAL, not one per query
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state_rows <= 3 * 2, (  # 3 roles, generous factor
            f"state holds {state_rows} rows — the ring is not shared"
        )
    finally:
        q.stop()


def test_streaming_ivf_topk_emits_boundary_aligned_window(spark):
    """A window whose end EXACTLY equals the final watermark must still
    emit: event-time timeouts fire only when the watermark strictly
    exceeds the timestamp, so the processor's timeout must sit at
    end-1 ms (the declarative agg's emit condition is wm >= end)."""
    from saber_spark.streaming.ann import streaming_ivf_topk

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = os.path.join(TMP, "ann_boundary")
    shutil.rmtree(path, ignore_errors=True)
    # one query in window [00:00, 00:10); flush row lands EXACTLY on a
    # later window boundary so the final watermark == that boundary and
    # == an exact multiple of window_s past the first window's end
    q1 = base.where(F.col("vec_id") == 0).select(
        "vec_id", "embedding",
        F.expr("timestamp_ntz'2024-01-01 00:00:01'").alias("ts"))
    flush = base.where(F.col("vec_id") == 0).select(
        "vec_id", "embedding",
        F.expr("timestamp_ntz'2024-01-01 00:10:00'").alias("ts"))
    q1.coalesce(1).write.parquet(os.path.join(path, "chunk=000"))
    flush.coalesce(1).write.parquet(os.path.join(path, "chunk=001"))

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/chunk=*")
    )
    out = streaming_ivf_topk(
        stream, base, k=3, n_probes=2, window_s=600, watermark="0 seconds"
    )
    shutil.rmtree(os.path.join(TMP, "ckpt_annb"), ignore_errors=True)
    q = _run_to_memory(out, "annb", "append")
    try:
        got = spark.sql(
            "SELECT DISTINCT win.end FROM annb WHERE query_id = 0"
        ).toPandas()
        # final watermark is 00:10:00; window [00:00, 00:10) ends exactly
        # there and MUST have been emitted
        assert len(got) == 1, "boundary-aligned window was not emitted"
    finally:
        q.stop()
