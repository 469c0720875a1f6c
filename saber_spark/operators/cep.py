"""Declarative CEP sequence matching over keyed, time-ordered streams.

``match_sequence`` is a MATCH_RECOGNIZE-style operator: a pattern is an
ordered list of :class:`Step` predicates, each with an optional bounded
quantifier ``repeat=(lo, hi)`` (the SQL ``{lo,hi}``); a match is a run
of CONSECUTIVE rows of one key (ordered by event time, then
``turn_idx``) partitioned into per-step runs of admissible lengths,
selected GREEDILY (longer runs preferred, earlier steps first — the
standard SQL quantifier semantics), with the whole match optionally
bounded to ``within_s`` seconds of event time. Two standard-SQL match
modes are supported:

- ``mode="all"``    — every anchor row that starts a match (SQL
  MATCH_RECOGNIZE ``ALL ROWS``-style overlapping semantics).
- ``mode="skip_past"`` — greedy, non-overlapping, in-order selection
  (SQL ``AFTER MATCH SKIP PAST LAST ROW`` default semantics).

This generalizes the hardcoded tool-loop run detector
(``saber_spark/streaming/cep.py``) into a reusable pattern operator —
the transcript analogue of the reference's multi-operator CEP pipelines
(SURVEY.md §3.3; reference LRB accident chains compose selections +
windowed aggregates into an event-sequence detector, e.g.
``LinearRoadBenchmark.java``'s accident→notify DAG).

100-TB design notes
-------------------
- Step predicates are evaluated ONCE per row as Catalyst expressions
  (JVM-side, codegen) before any window — the pattern walk sees only
  booleans, never re-evaluates predicates.
- ``mode="all"`` is pure Catalyst: one shuffle on the key (the window
  partition), ``L-1`` ``lead()`` columns over one shared window frame,
  then a filter. No Python at all. Quantified patterns compile to one
  CASE over the concrete expansions (bounded by ``MAX_EXPANSIONS``)
  over the same shared frame — still zero Python, and Catalyst
  evaluates each distinct ``lead()`` once.
- ``mode="skip_past"`` adds one ``applyInPandas`` pass over CANDIDATE
  matches only (the all-mode output, typically orders of magnitude
  smaller than the input); greedy selection is inherently sequential
  per key, so the per-key loop is irreducible — but it is O(#candidates
  of that key), Arrow-batched, and runs on already-filtered rows. State
  per key during selection is one integer (next admissible position).
- Both modes shuffle the input exactly once, on the key.

The DuckDB twins: ``all`` is the same ``lead()`` plan in ANSI SQL;
``skip_past`` is a recursive CTE that re-derives the greedy selection
(each recursion step picks the next candidate at position
``>= prev_pos + L`` via a LATERAL ``ORDER BY pos LIMIT 1``) — see
``sequence_match_oracle_ctes``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["Step", "match_sequence", "sequence_match_oracle_ctes"]


@dataclass(frozen=True)
class Step:
    """One pattern step: a name, a SQL boolean predicate over the input
    row's columns (evaluated as a Catalyst expression), and a bounded
    repeat range — ``repeat=(lo, hi)`` is the MATCH_RECOGNIZE quantifier
    ``{lo,hi}`` (default ``{1,1}``), matched GREEDILY (longer runs
    preferred, earlier steps first — standard SQL quantifier
    semantics)."""

    name: str
    predicate: str
    repeat: tuple[int, int] = (1, 1)


_MODES = ("all", "skip_past")

#: Bound on Π(hi-lo+1): quantified patterns compile to one Catalyst
#: CASE over the concrete expansions, so the product must stay small.
MAX_EXPANSIONS = 128


def _expansions_from_repeats(
    repeats: list[tuple[int, int]],
    names: list[str] | None = None,
    who: str = "match_sequence",
) -> list[tuple[int, ...]]:
    """Concrete per-step run lengths, sorted by greedy preference
    (lexicographic descending — maximize the first step's run, then the
    second's, ...). THE one expansion/validation implementation: the
    batch operator and the streamed SequenceMatcher both call it, so
    which expansion wins can never silently diverge between the twins."""
    import itertools

    for i, (lo, hi) in enumerate(repeats):
        if not (1 <= lo <= hi):
            label = names[i] if names else f"#{i}"
            raise ValueError(
                f"{who}: step {label!r} repeat must satisfy "
                f"1 <= lo <= hi, got {(lo, hi)}"
            )
    n = 1
    for lo, hi in repeats:
        n *= hi - lo + 1
    if n > MAX_EXPANSIONS:
        raise ValueError(
            f"{who}: quantifier ranges expand to {n} concrete "
            f"shapes (> {MAX_EXPANSIONS}) — tighten the repeat bounds"
        )
    exps = list(
        itertools.product(*[range(lo, hi + 1) for lo, hi in repeats])
    )
    exps.sort(reverse=True)
    return exps


def _expansions(steps: list[Step]) -> list[tuple[int, ...]]:
    return _expansions_from_repeats(
        [s.repeat for s in steps], [s.name for s in steps]
    )


def match_sequence(
    df: DataFrame,
    steps: list[Step],
    *,
    within_s: float | None = None,
    mode: str = "all",
    key: str = "conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Match ``steps`` against consecutive rows per ``key``.

    Output schema: ``(key, start_turn:int, end_turn:int,
    start_ts:long, end_ts:long)`` — epoch seconds floored, matching the
    tool-loop detector's output convention. Event-time arithmetic is
    integer microseconds end-to-end (``unix_micros``), so the
    ``within_s`` bound has no floating-point boundary ambiguity.
    """
    if not steps:
        raise ValueError("match_sequence: steps must be non-empty")
    if mode not in _MODES:
        raise ValueError(f"match_sequence: mode must be one of {_MODES}")
    if within_s is not None and within_s <= 0:
        raise ValueError("match_sequence: within_s must be > 0")
    L = len(steps)
    within_us = (
        None if within_s is None else int(round(within_s * 1_000_000))
    )

    ts = F.col(ts_col).cast("timestamp")
    pre = df.select(
        F.col(key),
        F.col(idx_col).cast("int").alias("_idx"),
        ts.alias("_ts"),
        F.unix_micros(ts).alias("_us"),
        *[
            F.coalesce(F.expr(s.predicate), F.lit(False)).alias(f"_s{j}")
            for j, s in enumerate(steps)
        ],
    )

    w = Window.partitionBy(key).orderBy("_ts", "_idx")

    if all(s.repeat == (1, 1) for s in steps):
        # fixed-length pattern: one conjunction, no expansion CASE
        ok = F.col("_s0")
        for j in range(1, L):
            ok = ok & F.coalesce(F.lead(f"_s{j}", j).over(w), F.lit(False))
        end_idx = F.lead("_idx", L - 1).over(w) if L > 1 else F.col("_idx")
        end_us = F.lead("_us", L - 1).over(w) if L > 1 else F.col("_us")
        cand = (
            pre.select(
                F.col(key),
                F.row_number().over(w).alias("_pos"),
                F.col("_idx").alias("start_turn"),
                end_idx.alias("end_turn"),
                F.col("_us").alias("_sus"),
                end_us.alias("_eus"),
                F.lit(L).alias("_len"),
                ok.alias("_ok"),
            )
            .where(F.col("_ok"))
            .drop("_ok")
        )
        if within_us is not None:
            cand = cand.where(
                F.col("_eus") - F.col("_sus") <= F.lit(within_us)
            )
    else:
        # quantified pattern: evaluate every concrete expansion's
        # conjunction over the SAME shared window frame (Catalyst
        # computes each lead() once), then pick the first match in
        # greedy order with one CASE. within_s is part of expansion
        # admissibility: a greedy-longer shape that breaks the time
        # bound yields to the next admissible one, so the operator
        # never drops a match a shorter shape would keep.
        def lead_s(j: int, o: int):
            c = F.col(f"_s{j}") if o == 0 else F.lead(f"_s{j}", o).over(w)
            return c if o == 0 else F.coalesce(c, F.lit(False))

        def lead_at(col: str, o: int):
            return F.col(col) if o == 0 else F.lead(col, o).over(w)

        pick = None
        for e in _expansions(steps):
            total = sum(e)
            ok = None
            off = 0
            for j, r in enumerate(e):
                for _ in range(r):
                    term = lead_s(j, off)
                    ok = term if ok is None else ok & term
                    off += 1
            eus = lead_at("_us", total - 1)
            if within_us is not None:
                ok = ok & (eus - F.col("_us") <= F.lit(within_us))
            m = F.struct(
                F.lit(total).alias("len"),
                lead_at("_idx", total - 1).alias("eidx"),
                eus.alias("eus"),
            )
            pick = F.when(ok, m) if pick is None else pick.when(ok, m)
        cand = (
            pre.select(
                F.col(key),
                F.row_number().over(w).alias("_pos"),
                F.col("_idx").alias("start_turn"),
                F.col("_us").alias("_sus"),
                pick.alias("_m"),
            )
            .where(F.col("_m").isNotNull())
            .select(
                F.col(key),
                F.col("_pos"),
                F.col("start_turn"),
                F.col("_m.eidx").alias("end_turn"),
                F.col("_sus"),
                F.col("_m.eus").alias("_eus"),
                F.col("_m.len").alias("_len"),
            )
        )

    if mode == "skip_past":
        cand = _greedy_skip_past(cand, key=key)

    return cand.select(
        F.col(key),
        F.col("start_turn"),
        F.col("end_turn"),
        F.expr("CAST(FLOOR(_sus / 1000000) AS BIGINT)").alias("start_ts"),
        F.expr("CAST(FLOOR(_eus / 1000000) AS BIGINT)").alias("end_ts"),
    )


def _greedy_skip_past(cand: DataFrame, *, key: str) -> DataFrame:
    """AFTER MATCH SKIP PAST LAST ROW selection: scan candidates of one
    key in position order, keeping a candidate iff it starts at or after
    the previous kept match's end + 1 (each candidate carries its own
    matched length ``_len`` — quantified patterns are variable-length).
    Runs over candidates only (the already-filtered all-mode output);
    the loop is per-candidate, not per-input-row."""
    # the key keeps whatever type it has upstream (conv_id is a string
    # here, but match_sequence allows any orderable key column)
    key_type = cand.schema[key].dataType.simpleString()
    schema = (
        f"{key} {key_type}, _pos int, start_turn int, end_turn int, "
        "_sus long, _eus long, _len int"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pos", kind="mergesort")
        keep = []
        nxt = -1
        for i, (pos, ln) in enumerate(
            zip(pdf["_pos"].to_numpy(), pdf["_len"].to_numpy())
        ):
            if pos >= nxt:
                keep.append(i)
                nxt = pos + ln
        return pdf.iloc[keep]

    return cand.groupBy(key).applyInPandas(pick, schema=schema)


def sequence_match_oracle_ctes(
    steps_sql: list[str],
    *,
    within_s: float | None,
    source: str = "transcripts",
    key: str = "conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    repeats: list[tuple[int, int]] | None = None,
    cte_prefix: str = "_cep",
) -> str:
    """DuckDB CTE block re-deriving both match modes in ANSI SQL:
    ``{p}_cand`` (mode='all') and ``{p}_sel`` (mode='skip_past', via a
    recursive CTE whose step picks the next candidate at ``_pos >=
    prev_pos + prev_len`` with LATERAL ... LIMIT 1). ``repeats`` mirrors
    the Steps' quantifier ranges: when given, each candidate's greedy
    match is re-derived with a CASE over the concrete expansions in
    greedy-preference order — the exact selection the Spark operator
    compiles. The caller must be inside a ``WITH RECURSIVE`` and SELECT
    from those CTEs. ``cte_prefix`` makes the block instantiable more
    than once in one statement."""
    L = len(steps_sql)
    p_ = cte_prefix
    # DuckDB (1.0) scopes WINDOW-clause names globally inside a WITH
    # RECURSIVE statement, so the window name must be prefix-unique for
    # the block to be instantiable twice in one query
    wn = f"{p_}_w"
    preds = ",\n           ".join(
        f"COALESCE(({p}), FALSE) AS _s{j}" for j, p in enumerate(steps_sql)
    )
    within_us = (
        None if within_s is None else int(round(within_s * 1_000_000))
    )

    def led(j: int, o: int) -> str:
        return "_s0" if (j == 0 and o == 0) else (
            f"COALESCE(lead(_s{j}, {o}) OVER {wn}, FALSE)"
            if o > 0
            else f"_s{j}"
        )

    if repeats is None or all(r == (1, 1) for r in repeats):
        ok = " AND ".join(led(j, j) for j in range(L))
        end_idx = f"lead(_idx, {L - 1}) OVER {wn}" if L > 1 else "_idx"
        end_us = f"lead(_us, {L - 1}) OVER {wn}" if L > 1 else "_us"
        within = (
            f" AND _eus - _sus <= {within_us}"
            if within_us is not None
            else ""
        )
        led_sql = f"""
{p_}_led AS (
    SELECT {key},
           row_number() OVER {wn} AS _pos,
           _idx AS start_turn,
           {end_idx} AS end_turn,
           _us AS _sus,
           {end_us} AS _eus,
           {L} AS _len,
           ({ok}) AS _ok
    FROM {p_}_pre WINDOW {wn} AS (PARTITION BY {key} ORDER BY _ts, _idx)
),
{p_}_cand AS (
    SELECT {key}, _pos, start_turn, end_turn, _sus, _eus, _len
    FROM {p_}_led WHERE _ok{within}
),"""
    else:
        steps = [
            Step(f"s{j}", sql, repeats[j]) for j, sql in enumerate(steps_sql)
        ]
        len_cases, idx_cases, us_cases = [], [], []
        for e in _expansions(steps):
            total = sum(e)
            terms, off = [], 0
            for j, r in enumerate(e):
                for _ in range(r):
                    terms.append(led(j, off))
                    off += 1
            eus = f"lead(_us, {total - 1}) OVER {wn}" if total > 1 else "_us"
            eidx = f"lead(_idx, {total - 1}) OVER {wn}" if total > 1 else "_idx"
            ok = " AND ".join(terms)
            if within_us is not None:
                ok += f" AND ({eus}) - _us <= {within_us}"
            len_cases.append(f"WHEN {ok} THEN {total}")
            idx_cases.append(f"WHEN {ok} THEN {eidx}")
            us_cases.append(f"WHEN {ok} THEN {eus}")
        nl = "\n                "
        led_sql = f"""
{p_}_led AS (
    SELECT {key},
           row_number() OVER {wn} AS _pos,
           _idx AS start_turn,
           CASE {nl.join(idx_cases)} END AS end_turn,
           _us AS _sus,
           CASE {nl.join(us_cases)} END AS _eus,
           CASE {nl.join(len_cases)} END AS _len
    FROM {p_}_pre WINDOW {wn} AS (PARTITION BY {key} ORDER BY _ts, _idx)
),
{p_}_cand AS (
    SELECT {key}, _pos, start_turn, end_turn, _sus, _eus, _len
    FROM {p_}_led WHERE _len IS NOT NULL
),"""

    return f"""
{p_}_pre AS (
    SELECT {key},
           CAST({idx_col} AS INTEGER) AS _idx,
           {ts_col} AS _ts,
           epoch_us({ts_col}) AS _us,
           {preds}
    FROM {source}
),{led_sql}
{p_}_sel AS (
    SELECT {key}, _pos, start_turn, end_turn, _sus, _eus, _len FROM (
        SELECT *, row_number() OVER (PARTITION BY {key} ORDER BY _pos) AS _rn
        FROM {p_}_cand
    ) WHERE _rn = 1
    UNION ALL
    SELECT n.{key}, n._pos, n.start_turn, n.end_turn, n._sus, n._eus, n._len
    FROM {p_}_sel s, LATERAL (
        SELECT c.{key}, c._pos, c.start_turn, c.end_turn, c._sus, c._eus,
               c._len
        FROM {p_}_cand c
        WHERE c.{key} = s.{key} AND c._pos >= s._pos + s._len
        ORDER BY c._pos LIMIT 1
    ) n
)"""
