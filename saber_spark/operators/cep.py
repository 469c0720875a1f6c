"""Declarative CEP sequence matching over keyed, time-ordered streams.

``match_sequence`` is a MATCH_RECOGNIZE-style operator: a pattern is an
ordered list of :class:`Step` predicates; a match is ``L`` CONSECUTIVE
rows of one key (ordered by event time, then ``turn_idx``) where row
``j`` satisfies step ``j``'s predicate, with the whole match optionally
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
  then a filter. No Python at all.
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
    """One pattern step: a name and a SQL boolean predicate over the
    input row's columns (evaluated as a Catalyst expression)."""

    name: str
    predicate: str


_MODES = ("all", "skip_past")


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
            ok.alias("_ok"),
        )
        .where(F.col("_ok"))
        .drop("_ok")
    )
    if within_s is not None:
        within_us = int(round(within_s * 1_000_000))
        cand = cand.where(F.col("_eus") - F.col("_sus") <= F.lit(within_us))

    if mode == "skip_past":
        cand = _greedy_skip_past(cand, key=key, length=L)

    return cand.select(
        F.col(key),
        F.col("start_turn"),
        F.col("end_turn"),
        F.expr("CAST(FLOOR(_sus / 1000000) AS BIGINT)").alias("start_ts"),
        F.expr("CAST(FLOOR(_eus / 1000000) AS BIGINT)").alias("end_ts"),
    )


def _greedy_skip_past(cand: DataFrame, *, key: str, length: int) -> DataFrame:
    """AFTER MATCH SKIP PAST LAST ROW selection: scan candidates of one
    key in position order, keeping a candidate iff it starts at or after
    the previous kept match's end + 1. Runs over candidates only (the
    already-filtered all-mode output); the loop is per-candidate, not
    per-input-row."""
    # the key keeps whatever type it has upstream (conv_id is a string
    # here, but match_sequence allows any orderable key column)
    key_type = cand.schema[key].dataType.simpleString()
    schema = (
        f"{key} {key_type}, _pos int, start_turn int, end_turn int, "
        "_sus long, _eus long"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pos", kind="mergesort")
        keep = []
        nxt = -1
        for i, pos in enumerate(pdf["_pos"].to_numpy()):
            if pos >= nxt:
                keep.append(i)
                nxt = pos + length
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
) -> str:
    """DuckDB CTE block re-deriving both match modes in ANSI SQL:
    ``_cep_cand`` (mode='all') and ``_cep_sel`` (mode='skip_past', via a
    recursive CTE whose step picks the next candidate at ``_pos >=
    prev + L`` with LATERAL ... LIMIT 1). The caller must be inside a
    ``WITH RECURSIVE`` and SELECT from those CTEs."""
    L = len(steps_sql)
    preds = ",\n           ".join(
        f"COALESCE(({p}), FALSE) AS _s{j}" for j, p in enumerate(steps_sql)
    )
    ok = " AND ".join(
        f"_s0" if j == 0 else f"COALESCE(lead(_s{j}, {j}) OVER w, FALSE)"
        for j in range(L)
    )
    end_idx = f"lead(_idx, {L - 1}) OVER w" if L > 1 else "_idx"
    end_us = f"lead(_us, {L - 1}) OVER w" if L > 1 else "_us"
    within = (
        f" AND _eus - _sus <= {int(round(within_s * 1_000_000))}"
        if within_s is not None
        else ""
    )
    return f"""
_cep_pre AS (
    SELECT {key},
           CAST({idx_col} AS INTEGER) AS _idx,
           {ts_col} AS _ts,
           epoch_us({ts_col}) AS _us,
           {preds}
    FROM {source}
),
_cep_led AS (
    SELECT {key},
           row_number() OVER w AS _pos,
           _idx AS start_turn,
           {end_idx} AS end_turn,
           _us AS _sus,
           {end_us} AS _eus,
           ({ok}) AS _ok
    FROM _cep_pre WINDOW w AS (PARTITION BY {key} ORDER BY _ts, _idx)
),
_cep_cand AS (
    SELECT {key}, _pos, start_turn, end_turn, _sus, _eus
    FROM _cep_led WHERE _ok{within}
),
_cep_sel AS (
    SELECT {key}, _pos, start_turn, end_turn, _sus, _eus FROM (
        SELECT *, row_number() OVER (PARTITION BY {key} ORDER BY _pos) AS _rn
        FROM _cep_cand
    ) WHERE _rn = 1
    UNION ALL
    SELECT n.{key}, n._pos, n.start_turn, n.end_turn, n._sus, n._eus
    FROM _cep_sel s, LATERAL (
        SELECT c.{key}, c._pos, c.start_turn, c.end_turn, c._sus, c._eus
        FROM _cep_cand c
        WHERE c.{key} = s.{key} AND c._pos >= s._pos + {L}
        ORDER BY c._pos LIMIT 1
    ) n
)"""
