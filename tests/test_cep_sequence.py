"""Declarative CEP sequence matching (operators/cep.py +
streaming/cep.py::SequenceMatcher): batch modes vs hand-computed matches
and vs a brute-force reference on synthesized transcripts; the streamed
processor driven batch-boundary by batch-boundary (fake handle, the TWS
wiring itself is protobuf-gated) must equal the batch operator in BOTH
match modes, including matches whose rows span micro-batches."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
import pyspark.sql.types as T
from pyspark.sql import functions as F

from saber_spark.operators.cep import Step, match_sequence
from saber_spark.streaming.cep import SequenceMatcher

_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.LongType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(epoch: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(epoch, dt.timezone.utc).replace(tzinfo=None)


# pattern: tool turn, then tool turn, then user turn — within 100 s.
_STEPS = [
    Step("a", "tool <> ''"),
    Step("b", "tool <> ''"),
    Step("c", "role = 'user'"),
]

# convA: rows 0-4 = tool,tool,tool,user @10s spacing -> anchors at idx 0
#   (t,t,t fails step c), idx 1 (t,t,user matches), idx 2 fails (t,user,?).
#   Then 5-9 repeats the motif twice back-to-back so skip_past must drop
#   an overlapping anchor.
# convB: a match whose within-bound fails (middle gap 200 s).
# convC: a match split across micro-batch boundaries (rows in chunks 0/1/2).
_CHUNKS = [
    [
        ("convA", 0, "x", "code", 1000),
        ("convA", 1, "x", "search", 1010),
        ("convA", 2, "x", "code", 1020),
        ("convA", 3, "user", "", 1030),
        ("convA", 4, "x", "browse", 1040),
        ("convA", 5, "x", "code", 1050),
        ("convA", 6, "user", "", 1060),
        ("convB", 0, "x", "code", 1000),
        ("convB", 1, "x", "code", 1200),
        ("convB", 2, "user", "", 1210),
        ("convC", 0, "x", "search", 5000),
    ],
    [
        ("convC", 1, "x", "code", 5010),
    ],
    [
        ("convC", 2, "user", "", 5020),
    ],
]

#: (conv, start_turn, end_turn, start_ts, end_ts) — hand-derived.
_ALL = {
    ("convA", 1, 3, 1010, 1030),
    ("convA", 4, 6, 1040, 1060),
    ("convC", 0, 2, 5000, 5020),
}
# here no two 'all' matches overlap except... convA anchors are at 1 and 4
# (distance 3 = L) so both survive skip_past too; overlap pruning is
# covered by the synthesized-corpus test below and the driver entry.
_SKIP = _ALL


def _df(spark):
    rows = [r for ch in _CHUNKS for r in ch]
    return spark.createDataFrame(
        [(c, i, r, tl, _t(e)) for c, i, r, tl, e in rows], schema=_SCHEMA
    )


def _rows(df) -> set:
    return {
        (r.conv_id, r.start_turn, r.end_turn, r.start_ts, r.end_ts)
        for r in df.collect()
    }


def test_match_sequence_all_hand_computed(spark):
    got = _rows(match_sequence(_df(spark), _STEPS, within_s=100, mode="all"))
    assert got == _ALL


def test_match_sequence_skip_past_hand_computed(spark):
    got = _rows(
        match_sequence(_df(spark), _STEPS, within_s=100, mode="skip_past")
    )
    assert got == _SKIP


def test_match_sequence_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        match_sequence(df, [], mode="all")
    with pytest.raises(ValueError):
        match_sequence(df, _STEPS, mode="bogus")
    with pytest.raises(ValueError):
        match_sequence(df, _STEPS, within_s=0)


def _brute_force(rows, steps_ok, L, within_s, skip_past):
    """Per-conv python reference: rows = [(idx, epoch, ok_vector)] sorted."""
    out, nxt = [], 0
    for i in range(len(rows) - L + 1):
        window = rows[i : i + L]
        if all(window[j][2][j] for j in range(L)) and (
            within_s is None or window[-1][1] - window[0][1] <= within_s
        ):
            if not skip_past or i >= nxt:
                out.append(
                    (window[0][0], window[-1][0], int(window[0][1]), int(window[-1][1]))
                )
                if skip_past:
                    nxt = i + L
    return out


@pytest.mark.parametrize("mode", ["all", "skip_past"])
def test_match_sequence_vs_brute_force_synth(spark, mode):
    """Synthesized skewed transcripts: operator output == per-conv python
    brute force, for a pattern whose anchors DO overlap (all three steps
    share a predicate class), in both modes."""
    from saber_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_turns=4000, n_convs=40, seed=7)
    steps = [
        Step("a", "tool <> ''"),
        Step("b", "tool <> ''"),
        Step("c", "tool <> ''"),
    ]
    got = _rows(match_sequence(t, steps, within_s=3600, mode=mode))

    pdf = (
        t.select(
            "conv_id",
            "turn_idx",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            (F.col("tool") != "").alias("ok"),
        )
        .toPandas()
        .sort_values(["conv_id", "us", "turn_idx"])
    )
    want = set()
    for conv, g in pdf.groupby("conv_id"):
        rows = [
            (int(i), u / 1e6, (o, o, o))
            for i, u, o in zip(g["turn_idx"], g["us"], g["ok"])
        ]
        for s_idx, e_idx, s_ts, e_ts in _brute_force(
            rows, None, 3, 3600, mode == "skip_past"
        ):
            want.add((conv, s_idx, e_idx, s_ts, e_ts))
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# quantified patterns (Kleene-range repeats, greedy longest-match)
# ---------------------------------------------------------------------------

# pattern: tool turn ×{1,2} then a user turn, within 100 s. Greedy must
# prefer the 2-run expansion; convB's anchor 0 is the within-fallback
# case (the (2,1) shape breaks the bound AND the (1,1) shape fails its
# predicate, so the anchor yields nothing).
_QSTEPS = [
    Step("a", "tool <> ''", repeat=(1, 2)),
    Step("b", "role = 'user'"),
]

_Q_ALL = {
    ("convA", 1, 3, 1010, 1030),
    ("convA", 2, 3, 1020, 1030),
    ("convA", 4, 6, 1040, 1060),
    ("convA", 5, 6, 1050, 1060),
    ("convB", 1, 2, 1200, 1210),
    ("convC", 0, 2, 5000, 5020),
    ("convC", 1, 2, 5010, 5020),
}
# skip_past walk per conv in anchor order, advancing by each kept
# match's own length: convA keeps (1,3) len3 then (4,6) len3; convC
# keeps (0,2) len3 which swallows the (1,2) overlap.
_Q_SKIP = {
    ("convA", 1, 3, 1010, 1030),
    ("convA", 4, 6, 1040, 1060),
    ("convB", 1, 2, 1200, 1210),
    ("convC", 0, 2, 5000, 5020),
}


def test_match_sequence_quantified_all_hand_computed(spark):
    got = _rows(match_sequence(_df(spark), _QSTEPS, within_s=100, mode="all"))
    assert got == _Q_ALL


def test_match_sequence_quantified_skip_past_hand_computed(spark):
    got = _rows(
        match_sequence(_df(spark), _QSTEPS, within_s=100, mode="skip_past")
    )
    assert got == _Q_SKIP


def _brute_force_quantified(rows, repeats, within_s, skip_past):
    """Greedy-quantifier python reference. rows = [(idx, epoch_s,
    ok_vector)] sorted; ok_vector[j] = row satisfies step j."""
    import itertools

    exps = sorted(
        itertools.product(*[range(lo, hi + 1) for lo, hi in repeats]),
        reverse=True,
    )
    out, nxt = [], 0
    for i in range(len(rows)):
        if skip_past and i < nxt:
            continue
        for e in exps:
            total = sum(e)
            if i + total > len(rows):
                continue
            off, ok = 0, True
            for j, r in enumerate(e):
                for _ in range(r):
                    ok = ok and rows[i + off][2][j]
                    off += 1
            if ok and (
                within_s is None
                or rows[i + total - 1][1] - rows[i][1] <= within_s
            ):
                out.append(
                    (
                        rows[i][0],
                        rows[i + total - 1][0],
                        int(rows[i][1]),
                        int(rows[i + total - 1][1]),
                    )
                )
                if skip_past:
                    nxt = i + total
                break
    return out


@pytest.mark.parametrize("mode", ["all", "skip_past"])
def test_match_sequence_quantified_vs_brute_force_synth(spark, mode):
    """Synthesized skewed transcripts vs the greedy python reference:
    a {1,3} run of tool turns then {1,2} non-tool turns."""
    from saber_spark.sources.transcripts import synthesize_transcripts

    t = synthesize_transcripts(spark, n_turns=4000, n_convs=40, seed=11)
    steps = [
        Step("a", "tool <> ''", repeat=(1, 3)),
        Step("b", "tool = ''", repeat=(1, 2)),
    ]
    got = _rows(match_sequence(t, steps, within_s=3600, mode=mode))

    pdf = (
        t.select(
            "conv_id",
            "turn_idx",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            (F.col("tool") != "").alias("ok"),
        )
        .toPandas()
        .sort_values(["conv_id", "us", "turn_idx"])
    )
    want = set()
    for conv, g in pdf.groupby("conv_id"):
        rows = [
            (int(i), u / 1e6, (o, not o))
            for i, u, o in zip(g["turn_idx"], g["us"], g["ok"])
        ]
        for s_idx, e_idx, s_ts, e_ts in _brute_force_quantified(
            rows, [(1, 3), (1, 2)], 3600, mode == "skip_past"
        ):
            want.add((conv, s_idx, e_idx, s_ts, e_ts))
    assert got == want
    assert len(got) > 0


def test_match_sequence_quantifier_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError):  # lo must be >= 1
        match_sequence(df, [Step("a", "TRUE", repeat=(0, 2))])
    with pytest.raises(ValueError):  # expansion blow-up must be loud
        match_sequence(
            df, [Step(str(j), "TRUE", repeat=(1, 4)) for j in range(5)]
        )
    from saber_spark.streaming.cep import match_sequence_stream

    with pytest.raises(ValueError, match="ttl_s"):
        # quantified steps on a stream need the flush timer (checked
        # before the protobuf environment gate)
        match_sequence_stream(
            df, [Step("a", "TRUE", repeat=(1, 2))], mode="all"
        )
    with pytest.raises(ValueError):  # expansion blow-up, streamed twin
        SequenceMatcher(5, repeats=[(1, 4)] * 5)
    with pytest.raises(ValueError):  # repeats length mismatch
        SequenceMatcher(2, repeats=[(1, 1)])


# ---------------------------------------------------------------------------
# streamed SequenceMatcher: fake-handle drive == batch operator
# ---------------------------------------------------------------------------


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


class _FakeListState:
    def __init__(self):
        self._v = []

    def get(self):
        return iter(list(self._v))

    def put(self, rows):
        self._v = [tuple(r) for r in rows]

    def clear(self):
        self._v = []


class _FakeHandle:
    def __init__(self):
        self._states = {}
        self.timer = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self._states.setdefault(name, _FakeValueState())

    def getListState(self, name, schema):
        return self._states.setdefault(name, _FakeListState())

    def registerTimer(self, ms):
        self.timer = ms

    def deleteTimer(self, ms):
        if self.timer == ms:
            self.timer = None


def _bits(role: str, tool: str) -> int:
    # mirrors match_sequence_stream's Catalyst bit-pack for _STEPS
    b = 0
    if tool != "":
        b |= 0b11  # steps 0 and 1 share `tool <> ''`
    if role == "user":
        b |= 0b100
    return b


def _drive(mode: str) -> set:
    per_key: dict = {}
    emitted: list = []

    def proc_for(conv):
        if conv not in per_key:
            p = SequenceMatcher(
                3,
                within_us=100 * 1_000_000,
                skip_past=(mode == "skip_past"),
                ttl_s=7200,
            )
            h = _FakeHandle()
            p.init(h)
            per_key[conv] = (p, h)
        return per_key[conv]

    for chunk in _CHUNKS:
        by_key: dict = {}
        for c, i, r, tl, e in chunk:
            by_key.setdefault(c, []).append((i, e * 1_000_000, _bits(r, tl)))
        for conv, rows in by_key.items():
            p, _h = proc_for(conv)
            pdf = pd.DataFrame(rows, columns=["idx", "us", "bits"])
            for out in p.handleInputRows((conv,), iter([pdf]), None):
                emitted.extend(out.to_dict("records"))
    return {
        (r["conv_id"], r["start_turn"], r["end_turn"], r["start_ts"], r["end_ts"])
        for r in emitted
    }


@pytest.mark.parametrize("mode", ["all", "skip_past"])
def test_sequence_matcher_equals_batch(spark, mode):
    """Cross-batch continuation (convC's match spans three micro-batches),
    within-bound rejection (convB), and both modes: the streamed processor
    must emit exactly the batch operator's rows."""
    want = _rows(match_sequence(_df(spark), _STEPS, within_s=100, mode=mode))
    assert _drive(mode) == want


def _bits_q(role: str, tool: str) -> int:
    # bit-pack for _QSTEPS: step 0 = tool turn, step 1 = user turn
    return (1 if tool != "" else 0) | (2 if role == "user" else 0)


def _drive_quantified(mode: str) -> set:
    """Fake-handle drive of the quantified matcher, including the ttl
    flush that decides tail anchors still inside the decision horizon."""
    per_key: dict = {}
    emitted: list = []

    def proc_for(conv):
        if conv not in per_key:
            p = SequenceMatcher(
                2,
                within_us=100 * 1_000_000,
                skip_past=(mode == "skip_past"),
                ttl_s=7200,
                repeats=[(1, 2), (1, 1)],
            )
            h = _FakeHandle()
            p.init(h)
            per_key[conv] = (p, h)
        return per_key[conv]

    for chunk in _CHUNKS:
        by_key: dict = {}
        for c, i, r, tl, e in chunk:
            by_key.setdefault(c, []).append((i, e * 1_000_000, _bits_q(r, tl)))
        for conv, rows in by_key.items():
            p, _h = proc_for(conv)
            pdf = pd.DataFrame(rows, columns=["idx", "us", "bits"])
            for out in p.handleInputRows((conv,), iter([pdf]), None):
                emitted.extend(out.to_dict("records"))
    for conv, (p, h) in per_key.items():  # silence: flush tail anchors
        for out in p.handleExpiredTimer((conv,), None, None):
            emitted.extend(out.to_dict("records"))
        assert not h._states["ctr"].exists()
    return {
        (r["conv_id"], r["start_turn"], r["end_turn"], r["start_ts"], r["end_ts"])
        for r in emitted
    }


@pytest.mark.parametrize("mode", ["all", "skip_past"])
def test_sequence_matcher_quantified_equals_batch(spark, mode):
    """Quantified streamed matcher == batch operator, cross-batch, both
    modes — the horizon decision path plus the tail flush (convA's last
    anchor and convB/convC's short matches only decide at flush)."""
    want = _rows(
        match_sequence(_df(spark), _QSTEPS, within_s=100, mode=mode)
    )
    assert _drive_quantified(mode) == want
    assert len(want) > 0


def test_sequence_matcher_ttl_frees_state():
    p = SequenceMatcher(3, within_us=10**8, ttl_s=3600)
    h = _FakeHandle()
    p.init(h)
    pdf = pd.DataFrame(
        [(0, 1_000_000_000, 3)], columns=["idx", "us", "bits"]
    )
    list(p.handleInputRows(("c",), iter([pdf]), None))
    assert h.timer is not None  # armed at last_us + ttl
    list(p.handleExpiredTimer(("c",), None, None))
    assert not h._states["ctr"].exists()
    assert list(h._states["buf"].get()) == []


def test_sequence_matcher_single_step_arms_ttl_and_emits():
    """maxlen == 1: every row decides immediately (buffer stays empty),
    but the ttl timer must still arm from the last processed row so the
    per-key counters of silent conversations are freed."""
    p = SequenceMatcher(1, ttl_s=3600)
    h = _FakeHandle()
    p.init(h)
    pdf = pd.DataFrame(
        [(0, 1_000_000_000, 1), (1, 2_000_000_000, 0), (2, 3_000_000_000, 1)],
        columns=["idx", "us", "bits"],
    )
    out = list(p.handleInputRows(("c",), iter([pdf]), None))
    got = {
        (r["start_turn"], r["end_turn"])
        for o in out
        for r in o.to_dict("records")
    }
    assert got == {(0, 0), (2, 2)}
    assert h.timer is not None  # armed despite the empty trailing buffer
    list(p.handleExpiredTimer(("c",), None, None))
    assert not h._states["ctr"].exists()


def test_sequence_matcher_guards():
    with pytest.raises(ValueError):
        SequenceMatcher(0)
    with pytest.raises(ValueError):
        SequenceMatcher(64)
    with pytest.raises(ValueError):
        SequenceMatcher(2, within_us=0)
    with pytest.raises(ValueError):
        # ttl shorter than the match bound could evict mid-pattern
        SequenceMatcher(2, within_us=10_000_000, ttl_s=5)


@pytest.mark.parametrize("mode", ["all", "skip_past"])
def test_match_sequence_stream_e2e(spark, mode, tmp_path):
    """The REAL transformWithStateInPandas execution (unlocked by the
    streaming/_miniproto.py wire-format shim — no google.protobuf in
    this container) must emit exactly the batch operator's matches,
    including convC's match whose three rows arrive in three separate
    micro-batches."""
    import os
    import shutil

    from saber_spark.streaming.cep import match_sequence_stream, tws_available

    if not tws_available():
        pytest.skip("transformWithState protocol unavailable (no protobuf, "
                    "shim failed to build)")

    path = str(tmp_path / "seq_stream")
    for k, chunk in enumerate(_CHUNKS):
        spark.createDataFrame(
            [(c, i, r, tl, _t(e)) for c, i, r, tl, e in chunk], schema=_SCHEMA
        ).coalesce(1).write.parquet(os.path.join(path, f"chunk={k:03d}"))

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/chunk=*")
    )
    out = match_sequence_stream(
        stream, _STEPS, within_s=100, mode=mode, watermark="30 minutes"
    )
    ckpt = str(tmp_path / "ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName(f"seq_{mode}").option("checkpointLocation", ckpt).start()
    )
    try:
        q.processAllAvailable()
        got = _rows(spark.sql(f"SELECT * FROM seq_{mode}"))
        assert got == (_ALL if mode == "all" else _SKIP)
    finally:
        q.stop()
