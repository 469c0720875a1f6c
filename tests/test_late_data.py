"""Watermark late-data semantics: rows older than the watermark are
dropped once their window's state has been evicted (the north_star's
out-of-order handling — absent in the reference, which assumes ordered
input; SURVEY.md §1.3).

Observed Spark contract (documented here because it is subtle): a late
row arriving in the same micro-batch where its window is *first* emitted
still merges (state is live until end-of-batch eviction); a late row
arriving after eviction is dropped and counted in
numRowsDroppedByWatermark.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

from saber_spark.operators.aggregation import AggSpec
from saber_spark.operators.windows import RANGE, WindowDef
from saber_spark.streaming.jobs import (
    TRANSCRIPT_SCHEMA,
    read_transcript_stream,
    streaming_windowed_aggregate,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def _row(conv, idx, ts):
    return (conv, idx, "user", f"text {conv} {idx}", "", ts.to_pydatetime())


def test_late_rows_beyond_watermark_are_dropped(spark):
    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    h = pd.Timedelta(hours=1)
    chunks = [
        # window [00:00, 00:10): 3 rows; [00:10, 00:20): 1 row
        [_row("c1", 0, base + 1 * m), _row("c1", 1, base + 2 * m),
         _row("c2", 0, base + 3 * m), _row("c2", 1, base + 12 * m)],
        # advance watermark to 3h - 30min (early windows emit next batch)
        [_row("c1", 2, base + 3 * h)],
        # watermark holds; eviction of the early windows completes
        [_row("c1", 3, base + 3 * h + 1 * m)],
        # genuinely late: its window was emitted and evicted
        [_row("c2", 2, base + 5 * m)],
    ]
    path = os.path.join(TMP, "late_stream")
    ckpt = os.path.join(TMP, "ckpt_late")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    for k, rows in enumerate(chunks):
        spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(path, f"chunk={k:03d}")
        )

    stream = read_transcript_stream(spark, f"{path}/chunk=*", max_files_per_trigger=1)
    agg = streaming_windowed_aggregate(
        stream, WindowDef(RANGE, 600), [AggSpec("cnt", "*", "n_turns")],
        watermark="30 minutes",
    )
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName("late")
        .option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p.get("stateOperators", [])
    )
    q.stop()
    got = {r.window_start: r.n_turns for r in spark.sql("SELECT * FROM late").collect()}
    w0 = int(base.timestamp())
    assert got[w0] == 3, "late row must not be re-counted in the closed window"
    assert got[w0 + 600] == 1
    assert dropped == 1, "exactly the one late row is dropped by the watermark"
