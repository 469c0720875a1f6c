"""Tool-loop CEP detector (streaming/cep.py): streamed
transformWithStateInPandas output == hand-computed runs == batch twin,
including cross-batch run continuation and timer-driven finalization."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F
import pyspark.sql.types as T

from saber_spark.streaming.cep import (
    ToolLoopDetector,
    detect_tool_loops_stream,
    tool_loop_runs,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")

_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("role", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(epoch: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(epoch, dt.timezone.utc).replace(tzinfo=None)


# chunk 0: A starts a 5-tool run; C has only 2 tool turns; D's runs are
# broken by a user turn. chunk 1: A's run breaks (emit 5); B starts a
# 3-tool run. chunk 2: B's second run starts 1800s later (over-gap ->
# first B run emits on arrival); the far-future flush row advances the
# watermark so B's trailing run finalizes via the event-time timer.
_CHUNKS = [
    [
        ("convA", 0, "tool", 1000), ("convA", 1, "tool", 1010),
        ("convA", 2, "tool", 1020), ("convA", 3, "tool", 1030),
        ("convA", 4, "tool", 1040),
        ("convC", 0, "tool", 1000), ("convC", 1, "tool", 1100),
        ("convD", 0, "tool", 1000), ("convD", 1, "user", 1050),
        ("convD", 2, "tool", 1100),
    ],
    [
        ("convA", 5, "assistant", 1200),
        ("convB", 0, "tool", 2000), ("convB", 1, "tool", 2100),
        ("convB", 2, "tool", 2200),
    ],
    [
        ("convB", 3, "tool", 4000), ("convB", 4, "tool", 4100),
        ("convB", 5, "tool", 4200),
        ("convZ", 0, "assistant", 100000),
    ],
]

_EXPECTED = {
    ("convA", 1000, 1040, 5),
    ("convB", 2000, 2200, 3),
    ("convB", 4000, 4200, 3),
}


def _stage(spark, path: str) -> None:
    if os.path.exists(path):
        shutil.rmtree(path)
    for k, rows in enumerate(_CHUNKS):
        df = spark.createDataFrame(
            [(c, i, r, _t(e)) for c, i, r, e in rows], schema=_SCHEMA
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, f"chunk={k:03d}")
        )


def test_detector_guards():
    with pytest.raises(ValueError):
        ToolLoopDetector(n_min=0)
    with pytest.raises(ValueError):
        ToolLoopDetector(max_gap_s=0)


def test_batch_twin_matches_hand_computed(spark):
    rows = [r for chunk in _CHUNKS for r in chunk]
    df = spark.createDataFrame(
        [(c, i, r, _t(e)) for c, i, r, e in rows], schema=_SCHEMA
    )
    got = {
        (r.conv_id, r.run_start, r.run_end, r.n_tool_turns)
        for r in tool_loop_runs(df, n_min=3, max_gap_s=600).collect()
    }
    assert got == _EXPECTED


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    """Per-key stand-in for StatefulProcessorHandle: one value state,
    one timer slot (the detector arms at most one)."""

    def __init__(self):
        self._states = {}
        self.timer = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self._states.setdefault(name, _FakeValueState())

    def registerTimer(self, ms):
        self.timer = ms

    def deleteTimer(self, ms):
        if self.timer == ms:
            self.timer = None


def test_processor_logic_across_batches_and_timers():
    """Drive ToolLoopDetector exactly as the TWS runtime would — one
    handleInputRows call per (micro-batch, key), then expired-timer
    callbacks once the final watermark passes — and require the emitted
    set to equal the hand-computed runs. This covers cross-batch run
    continuation (convB), over-gap splits, non-tool breaks, below-n
    discards, and timer-driven trailing-run finalization, independent of
    the protobuf-gated Spark wiring."""
    per_key: dict = {}
    emitted: list = []

    def _proc_for(conv):
        if conv not in per_key:
            p = ToolLoopDetector(n_min=3, max_gap_s=600)
            h = _FakeHandle()
            p.init(h)
            per_key[conv] = (p, h)
        return per_key[conv]

    for chunk in _CHUNKS:
        by_key: dict = {}
        for c, i, r, e in chunk:
            by_key.setdefault(c, []).append((i, r, float(e)))
        for conv, rows in by_key.items():
            p, _h = _proc_for(conv)
            pdf = pd.DataFrame(rows, columns=["turn_idx", "role", "ts_s"])
            for out in p.handleInputRows((conv,), iter([pdf]), None):
                emitted.extend(out.to_dict("records"))

    final_wm_ms = (100000 - 10) * 1000  # watermark after the flush row
    for conv, (p, h) in per_key.items():
        if h.timer is not None and h.timer <= final_wm_ms:
            for out in p.handleExpiredTimer((conv,), None, None):
                emitted.extend(out.to_dict("records"))

    got = {
        (r["conv_id"], r["run_start"], r["run_end"], r["n_tool_turns"])
        for r in emitted
    }
    assert got == _EXPECTED
    # no run may emit twice (timer + break double-fire would show here)
    assert len(emitted) == len(_EXPECTED)
    # convC's 2-turn run must still be sitting in state (timer armed,
    # below n_min -> its timer fires and discards, emitting nothing)
    p, h = per_key["convC"]
    extra = [
        r for out in p.handleExpiredTimer(("convC",), None, None)
        for r in out.to_dict("records")
    ]
    assert extra == []


@pytest.mark.skipif(
    not __import__("saber_spark.streaming.cep", fromlist=["tws_available"]).tws_available(),
    reason="transformWithState needs google.protobuf on Python workers; "
    "not available in this container (module docstring documents the gate)",
)
def test_streamed_detector_matches_batch_twin(spark):
    path = os.path.join(TMP, "cep_stream")
    ckpt = os.path.join(TMP, "ckpt_cep")
    shutil.rmtree(ckpt, ignore_errors=True)
    _stage(spark, path)

    stream = spark.readStream.schema(_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{path}/chunk=*")
    out = detect_tool_loops_stream(
        stream, n_min=3, max_gap_s=600, watermark="10 seconds"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    try:
        got = {
            (r.conv_id, r.run_start, r.run_end, r.n_tool_turns)
            for r in spark.sql("SELECT * FROM cep").collect()
        }
        assert got == _EXPECTED
    finally:
        q.stop()


def test_streamed_path_raises_loudly_without_protobuf(spark):
    from saber_spark.streaming.cep import detect_tool_loops_stream, tws_available

    if tws_available():
        pytest.skip("protobuf present: gate inactive (e2e test runs instead)")
    path = os.path.join(TMP, "cep_stream")
    _stage(spark, path)
    stream = spark.readStream.schema(_SCHEMA).parquet(f"{path}/chunk=*")
    with pytest.raises(NotImplementedError):
        detect_tool_loops_stream(stream)
