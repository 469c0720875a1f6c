"""CEP-style sequence detection on Spark 4's arbitrary-state API
(`transformWithStateInPandas`): per-conversation tool-loop runs.

The pattern — N or more CONSECUTIVE tool turns, each within `max_gap_s`
of the previous — is the transcript analogue of the reference's CEP
pipelines (SURVEY.md §3.3, LRB accident chains): a sequence predicate
over a keyed, time-ordered stream, not expressible as a windowed
aggregate because the run boundary depends on the previous event's
attributes, not on a fixed grid.

Why transformWithState rather than applyInPandasWithState: runs need
(a) per-key mutable state that survives micro-batches, (b) an
EVENT-TIME timer so a trailing run finalizes when the watermark proves
no continuation can arrive (last_ts + max_gap has passed), and (c)
append-mode emission of completed runs only. The older API has no
timers — a silent conversation would strand its final run in state
forever. State per key is one fixed-width tuple plus one timer, so
state size is O(#active conversations) regardless of stream length.

Ordering contract: rows must arrive per-key in event-time order across
micro-batches (within a batch the processor sorts). That matches the
reference's in-order stream model; out-of-order input should be routed
through a watermark/sort stage first.

Batch twin: ``tool_loop_runs`` computes identical runs with a
gaps-and-islands window plan — the parity oracle for the streamed path.

Environment gate, now lifted in-process: transformWithState's
driver↔worker state protocol is protobuf-based and this container has
no ``google.protobuf`` (and the brief forbids installing packages).
``streaming/_miniproto.py`` implements the wire format from the public
spec and seeds ``sys.modules`` with a StateMessage_pb2 stand-in built
from the installed pyspark's own descriptor blob — pyspark's pb2
imports are all lazy, so the streamed path runs END TO END here
(tests/test_cep.py::test_streamed_detector_matches_batch_twin). On a
normal cluster image (protobuf ships with pyspark[connect]) the shim
steps aside and the real runtime is used. ``_miniproto.ensure()`` runs
at import of THIS module, which every worker executes while unpickling
the processor — before the first lazy pb2 import. If neither the real
runtime nor the shim can load, ``tws_available()`` is False and the
stream builders raise up front; the processor logic stays fully tested
batch-boundary by batch-boundary through a fake handle regardless.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.window import Window

if TYPE_CHECKING:  # pragma: no cover
    pass

__all__ = [
    "SequenceMatcher",
    "ToolLoopDetector",
    "detect_tool_loops_stream",
    "match_sequence_stream",
    "tool_loop_runs",
    "tws_available",
]


def tws_available() -> bool:
    """True when the transformWithState worker protocol can run here:
    either a real google.protobuf runtime, or the from-scratch
    wire-format shim (streaming/_miniproto.py) seeded into sys.modules.
    The ensure() below also ran at module import, so workers that
    unpickled a processor from this module are already provisioned."""
    from saber_spark.streaming import _miniproto

    return _miniproto.ensure()


# provision THIS process (driver or worker) at import time: workers
# import this module while unpickling the StatefulProcessor, which
# happens before pyspark's first lazy StateMessage_pb2 import
from saber_spark.streaming import _miniproto as _mp  # noqa: E402

_mp.ensure()

#: (conv_id, run_start, run_end, n_tool_turns) — epoch seconds, floored
OUTPUT_SCHEMA = (
    "conv_id STRING, run_start BIGINT, run_end BIGINT, n_tool_turns INT"
)

_STATE_SCHEMA = "run_len INT, run_start DOUBLE, last_ts DOUBLE, timer_ms BIGINT"


class ToolLoopDetector(StatefulProcessor):
    """Emit one row per maximal run of >= n_min consecutive tool turns
    with inter-turn gaps <= max_gap_s. Runs finalize when broken by a
    non-tool turn / an over-gap tool turn, or by the event-time timer
    once the watermark passes last_ts + max_gap_s."""

    def __init__(self, n_min: int = 3, max_gap_s: float = 600.0):
        if n_min < 1:
            raise ValueError("ToolLoopDetector: n_min must be >= 1")
        if max_gap_s <= 0:
            raise ValueError("ToolLoopDetector: max_gap_s must be > 0")
        self.n_min = n_min
        self.max_gap_s = float(max_gap_s)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._run = handle.getValueState("run", _STATE_SCHEMA)

    # -- helpers ----------------------------------------------------------
    def _emit_row(self, conv_id: str, start: float, end: float, n: int):
        return {
            "conv_id": conv_id,
            "run_start": int(start),
            "run_end": int(end),
            "n_tool_turns": int(n),
        }

    def _finalize(self, conv_id: str, state, out: list) -> None:
        if state is not None and state[0] >= self.n_min:
            out.append(self._emit_row(conv_id, state[1], state[2], state[0]))

    # -- API --------------------------------------------------------------
    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts_s", "turn_idx"], kind="mergesort")

        state = self._run.get() if self._run.exists() else None
        out: list = []
        for role, ts in zip(pdf["role"].to_numpy(), pdf["ts_s"].to_numpy()):
            ts = float(ts)
            if role == "tool":
                if state is not None and ts - state[2] <= self.max_gap_s:
                    state = (state[0] + 1, state[1], ts, state[3])
                else:
                    # over-gap tool turn: the old run is provably over
                    self._finalize(conv_id, state, out)
                    state = (1, ts, ts, None)
            else:
                self._finalize(conv_id, state, out)
                state = None

        # re-arm the one timer this key owns at last_ts + gap
        old_timer = None
        if self._run.exists():
            prev = self._run.get()
            old_timer = prev[3] if prev is not None else None
        if state is not None:
            new_timer = int((state[2] + self.max_gap_s) * 1000) + 1
            if old_timer is not None and old_timer != new_timer:
                self._handle.deleteTimer(old_timer)
            if old_timer != new_timer:
                self._handle.registerTimer(new_timer)
            self._run.update((state[0], state[1], state[2], new_timer))
        else:
            if old_timer is not None:
                self._handle.deleteTimer(old_timer)
            self._run.clear()

        if out:
            yield pd.DataFrame(out)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # watermark passed last_ts + gap: no row can extend the run
        out: list = []
        if self._run.exists():
            state = self._run.get()
            self._finalize(key[0], state, out)
            self._run.clear()
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


#: SequenceMatcher output — same convention as the batch operator
#: (operators/cep.py match_sequence): epoch seconds floored to long.
SEQ_OUTPUT_SCHEMA = (
    "conv_id STRING, start_turn INT, end_turn INT, "
    "start_ts BIGINT, end_ts BIGINT"
)

_SEQ_CTR_SCHEMA = "pos BIGINT, next_allowed BIGINT, timer_ms BIGINT"
_SEQ_BUF_SCHEMA = "bits BIGINT, us BIGINT, idx INT"


class SequenceMatcher(StatefulProcessor):
    """Streamed twin of ``operators/cep.py::match_sequence``: match an
    ``n_steps``-long pattern of per-row predicates — each step with an
    optional bounded quantifier ``repeats[j]=(lo,hi)``, greedy
    longest-match — against CONSECUTIVE rows of one conversation, in
    both MATCH_RECOGNIZE modes ('all' = overlapping anchors,
    'skip_past' = greedy non-overlapping, AFTER MATCH SKIP PAST LAST
    ROW).

    The plan evaluates every step predicate ONCE per row in Catalyst and
    packs the results into one ``_bits`` long (bit ``j`` = step ``j``
    holds), so the processor never re-evaluates predicates — it walks
    booleans. An anchor is DECIDED when its decision horizon passes:
    ``maxlen = Σ hi`` rows from the anchor have arrived (for unquantified
    patterns maxlen = n_steps, so a match still emits exactly when its
    last row arrives), at which point the greedy-first admissible
    expansion emits. Per-key state is a ring buffer of the trailing
    ``maxlen - 1`` rows plus two counters — O(pattern length) regardless
    of stream length. The ``ttl_s`` timer additionally FLUSHES the tail
    on silence: anchors still inside the horizon are decided against the
    rows that did arrive (exactly the batch semantics at end-of-data —
    shorter expansions may match, longer ones are refuted), then state
    is freed; with ``ttl_s >= within_s`` no admissible match can span
    the flushed gap. Quantified patterns on an UNBOUNDED stream should
    therefore set ``ttl_s`` — without it a conversation's trailing
    sub-horizon matches wait forever.

    KNOWN DIVERGENCE when ``within_us is None`` with ``ttl_s`` set:
    without a time bound, batch consecutiveness has no gap limit, so a
    match whose rows straddle a silence gap longer than ``ttl_s`` IS a
    batch match but can never emit here — the flush freed the buffer
    before the later rows arrived. This is the price of bounded state
    on an unbounded stream (the ``ttl_s >= within_s`` guard cannot
    apply with no ``within_s`` to compare against); parity with the
    batch operator is guaranteed only for matches whose inter-row gaps
    all stay under ``ttl_s``. Callers needing exact batch parity for
    time-unbounded patterns must set ``within_s`` (making the bound
    explicit) instead of relying on ttl alone.

    Ordering contract: same as ToolLoopDetector — rows arrive per key in
    event-time order across micro-batches; within a batch the processor
    sorts by (``us``, ``idx``).
    """

    def __init__(
        self,
        n_steps: int,
        *,
        within_us: int | None = None,
        skip_past: bool = False,
        ttl_s: float | None = None,
        repeats: list[tuple[int, int]] | None = None,
    ):
        import itertools

        if n_steps < 1:
            raise ValueError("SequenceMatcher: n_steps must be >= 1")
        if n_steps > 63:
            raise ValueError("SequenceMatcher: n_steps must fit a 64-bit mask")
        if within_us is not None and within_us <= 0:
            raise ValueError("SequenceMatcher: within_us must be > 0")
        if (
            ttl_s is not None
            and within_us is not None
            and ttl_s * 1_000_000 < within_us
        ):
            raise ValueError(
                "SequenceMatcher: ttl_s must be >= within_s — otherwise a "
                "still-in-bound partial match could be evicted mid-pattern"
            )
        repeats = repeats or [(1, 1)] * n_steps
        if len(repeats) != n_steps:
            raise ValueError("SequenceMatcher: len(repeats) must == n_steps")
        self.n_steps = n_steps
        self.within_us = within_us
        self.skip_past = skip_past
        self.ttl_s = ttl_s
        # validation + greedy-preference order (lexicographic desc) come
        # from the BATCH operator's _expansions_from_repeats so the
        # twins can never disagree on which expansion wins or on the
        # MAX_EXPANSIONS cap; precompiled to (total_len,
        # step-index-per-offset) plans the row loop walks
        from saber_spark.operators.cep import _expansions_from_repeats

        exps = _expansions_from_repeats(repeats, who="SequenceMatcher")
        self._plans = [
            (sum(e), tuple(j for j, r in enumerate(e) for _ in range(r)))
            for e in exps
        ]
        self.maxlen = max(t for t, _ in self._plans)

    def _match_at(self, buf: list) -> int | None:
        """Greedy-first admissible expansion length at anchor buf[0], or
        None. Admissibility = every offset's step bit set AND the span
        fits within_us; a longer shape failing either yields to the next
        (exactly the batch operator's CASE order)."""
        n = len(buf)
        for total, step_of in self._plans:
            if total > n:
                continue
            if (
                self.within_us is not None
                and buf[total - 1][1] - buf[0][1] > self.within_us
            ):
                continue
            if all((buf[o][0] >> s) & 1 for o, s in enumerate(step_of)):
                return total
        return None

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._ctr = handle.getValueState("ctr", _SEQ_CTR_SCHEMA)
        self._buf = handle.getListState("buf", _SEQ_BUF_SCHEMA)

    def _emit(
        self, conv_id, buf: list, total: int, out: list
    ) -> None:
        out.append(
            {
                "conv_id": conv_id,
                "start_turn": buf[0][2],
                "end_turn": buf[total - 1][2],
                "start_ts": buf[0][1] // 1_000_000,
                "end_ts": buf[total - 1][1] // 1_000_000,
            }
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        M = self.maxlen
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["us", "idx"], kind="mergesort")

        pos, next_allowed, old_timer = (
            self._ctr.get() if self._ctr.exists() else (0, 0, None)
        )
        buf: list = list(self._buf.get()) if self._ctr.exists() else []

        out: list = []
        last_us = None
        for idx, us, bits in zip(
            pdf["idx"].to_numpy(), pdf["us"].to_numpy(), pdf["bits"].to_numpy()
        ):
            pos += 1
            last_us = int(us)
            buf.append((int(bits), int(us), int(idx)))
            if len(buf) == M:
                # anchor buf[0] (stream position pos - M + 1) is fully
                # decided: its longest expansion's rows have all arrived
                a_pos = pos - M + 1
                total = self._match_at(buf)
                if total is not None and (
                    not self.skip_past or a_pos >= next_allowed
                ):
                    self._emit(conv_id, buf, total, out)
                    if self.skip_past:
                        next_allowed = a_pos + total
                buf.pop(0)

        new_timer = None
        if self.ttl_s is not None and last_us is not None:
            # armed from the last PROCESSED row (not the buffer, which is
            # empty for maxlen == 1): the timer both frees state and
            # flushes the tail anchors still inside the horizon
            new_timer = int(last_us // 1000 + self.ttl_s * 1000) + 1
            if old_timer is not None and old_timer != new_timer:
                self._handle.deleteTimer(old_timer)
            if old_timer != new_timer:
                self._handle.registerTimer(new_timer)
        self._ctr.update((pos, next_allowed, new_timer))
        self._buf.clear()
        if buf:
            self._buf.put(buf)

        if out:
            yield pd.DataFrame(out)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # conversation silent past ttl: decide the tail anchors against
        # the rows that arrived (end-of-data batch semantics — longer
        # expansions are refuted, shorter ones may still match; for an
        # unquantified pattern no expansion fits the <maxlen tail, so
        # this emits nothing and the flush is a pure state free), then
        # free the state. Resetting the skip_past frontier is sound:
        # with ttl >= within no admissible match can span the gap.
        conv_id = key[0]
        out: list = []
        if self._ctr.exists():
            pos, next_allowed, _t = self._ctr.get()
            buf = list(self._buf.get())
            while buf:
                a_pos = pos - len(buf) + 1
                total = self._match_at(buf)
                if total is not None and (
                    not self.skip_past or a_pos >= next_allowed
                ):
                    self._emit(conv_id, buf, total, out)
                    if self.skip_past:
                        next_allowed = a_pos + total
                buf.pop(0)
        self._ctr.clear()
        self._buf.clear()
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def match_sequence_stream(
    stream: DataFrame,
    steps,
    *,
    within_s: float | None = None,
    mode: str = "all",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    ttl_s: float | None = None,
) -> DataFrame:
    """Wire SequenceMatcher onto a transcript stream. ``steps`` is the
    batch operator's list of ``operators.cep.Step``; predicates compile
    to ONE Catalyst bit-pack projection (JVM-side), the keyed processor
    sees (idx, us, bits) only."""
    if mode not in ("all", "skip_past"):
        raise ValueError("match_sequence_stream: mode must be all|skip_past")
    repeats = [getattr(s, "repeat", (1, 1)) for s in steps]
    if any(r != (1, 1) for r in repeats) and ttl_s is None:
        raise ValueError(
            "match_sequence_stream: quantified steps need ttl_s — without "
            "the flush timer a conversation's trailing sub-horizon matches "
            "would wait forever on an unbounded stream (see SequenceMatcher)"
        )
    if not tws_available():
        raise NotImplementedError(
            "match_sequence_stream: transformWithState needs google.protobuf "
            "on the Python workers (see module docstring); the batch twin "
            "operators.cep.match_sequence is unaffected."
        )
    bits = None
    for j, s in enumerate(steps):
        term = F.when(F.coalesce(F.expr(s.predicate), F.lit(False)),
                      F.lit(1 << j)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    src = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("idx"),
            F.col(ts_col).alias("ts"),
            F.unix_micros(F.col(ts_col)).alias("us"),
            bits.cast("long").alias("bits"),
        )
    )
    within_us = None if within_s is None else int(round(within_s * 1_000_000))
    return src.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=SequenceMatcher(
            len(steps),
            within_us=within_us,
            skip_past=(mode == "skip_past"),
            ttl_s=ttl_s,
            repeats=repeats,
        ),
        outputStructType=SEQ_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def detect_tool_loops_stream(
    stream: DataFrame,
    *,
    n_min: int = 3,
    max_gap_s: float = 600.0,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Wire the detector onto a transcript stream: watermark → keyed
    transformWithStateInPandas in event-time mode, append output."""
    if not tws_available():
        raise NotImplementedError(
            "detect_tool_loops_stream: transformWithState needs "
            "google.protobuf on the Python workers and this environment "
            "does not provide it (see module docstring); the batch twin "
            "tool_loop_runs is unaffected."
        )
    src = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.col(ts_col).alias("ts"),
            F.col(ts_col).cast("double").alias("ts_s"),
        )
    )
    return src.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=ToolLoopDetector(n_min=n_min, max_gap_s=max_gap_s),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def tool_loop_runs(
    df: DataFrame,
    *,
    n_min: int = 3,
    max_gap_s: float = 600.0,
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin: gaps-and-islands over (conv_id, ts, turn_idx) order.
    A tool turn starts a new run when the previous turn was not a tool
    turn or arrived more than max_gap_s earlier. Same output schema as
    the streamed detector."""
    ts_s: Column = F.col(ts_col).cast("timestamp").cast("double")
    w = Window.partitionBy("conv_id").orderBy(F.col("_ts"), F.col("turn_idx"))
    marked = df.select(
        "conv_id", "turn_idx", "role", ts_s.alias("_ts")
    ).withColumn(
        "_new_run",
        (
            (F.col("role") == "tool")
            & (
                F.lag("role").over(w).isNull()
                | (F.lag("role").over(w) != "tool")
                | ((F.col("_ts") - F.lag("_ts").over(w)) > F.lit(max_gap_s))
            )
        ).cast("int"),
    )
    runs = marked.withColumn(
        "_run_id",
        F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).where(F.col("role") == "tool")
    return (
        runs.groupBy("conv_id", "_run_id")
        .agg(
            F.min("_ts").alias("_start"),
            F.max("_ts").alias("_end"),
            F.count(F.lit(1)).cast("int").alias("n_tool_turns"),
        )
        .where(F.col("n_tool_turns") >= n_min)
        .select(
            "conv_id",
            F.floor("_start").cast("long").alias("run_start"),
            F.floor("_end").cast("long").alias("run_end"),
            "n_tool_turns",
        )
    )
