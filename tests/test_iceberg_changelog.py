"""Row-level CDC changelog over the from-scratch Iceberg format
(sources/iceberg_format.py::IcebergTable.changes) — the analogue of
Iceberg's create_changelog_view. The load-bearing property: for ANY
history (appends, MoR + COW deletes, merges, compactions) the changelog
applied to the from-snapshot reconstructs the to-snapshot exactly, and
each deleted row is announced exactly once.
"""

from __future__ import annotations

import os
import shutil
from collections import Counter

import pytest
from pyspark.sql import functions as F

from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "iceberg_cdc",
)

DATA_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _fresh(name: str) -> str:
    path = os.path.join(TMP, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _turns(spark, offset=0, n=4):
    return (
        transcripts(spark, SF_SMOKE)
        .where((F.col("turn_idx") >= offset) & (F.col("turn_idx") < offset + n))
        .select(*DATA_COLS)
    )


def _multiset(df) -> Counter:
    return Counter(tuple(r) for r in df.select(*DATA_COLS).collect())


def _apply(base: Counter, chg) -> Counter:
    """Replay a changelog DataFrame onto a multiset of rows."""
    out = Counter(base)
    for r in chg.collect():
        key = tuple(r[c] for c in DATA_COLS)
        if r["_change_type"] == "insert":
            out[key] += 1
        else:
            out[key] -= 1
            assert out[key] >= 0, f"delete of a row never inserted: {key}"
    return +out  # drop zero counts


def test_changelog_append_only_is_all_inserts(spark):
    loc = _fresh("appends")
    a, b = _turns(spark, 0), _turns(spark, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.append(b)
    chg = t.changes(spark)
    assert chg.where(F.col("_change_type") != "insert").count() == 0
    assert _apply(Counter(), chg) == _multiset(t.scan(spark))
    # the two commits are distinguishable and ordered
    ords = [
        r["_change_ordinal"]
        for r in chg.select("_change_ordinal").distinct().collect()
    ]
    assert sorted(ords) == [0, 1]
    sids = {
        r["_commit_snapshot_id"]
        for r in chg.select("_commit_snapshot_id").distinct().collect()
    }
    assert sids == {s["snapshot-id"] for s in t.snapshots()}


def test_changelog_mor_delete_emits_exactly_deleted_rows(spark):
    loc = _fresh("mor")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    before = _multiset(t.scan(spark))
    snap1 = t.current_snapshot_id()
    t.delete_where(spark, [("turn_idx", "=", 2)], mode="merge-on-read")
    chg = t.changes(spark, from_snapshot_id=snap1)
    recs = chg.collect()
    assert all(r["_change_type"] == "delete" for r in recs)
    assert all(r["turn_idx"] == 2 for r in recs)
    expected_gone = {k for k in before if k[1] == 2}
    assert {tuple(r[c] for c in DATA_COLS) for r in recs} == expected_gone
    assert _apply(before, chg) == _multiset(t.scan(spark))


def test_changelog_replace_emits_nothing(spark):
    loc = _fresh("compact")
    t = IcebergTable.create(loc, _turns(spark, 0))
    for off in (0, 4, 8):
        t.append(_turns(spark, off))
    snap = t.current_snapshot_id()
    t.rewrite_data_files(spark)
    assert t.current_snapshot_id() != snap  # compaction did commit
    assert t.changes(spark, from_snapshot_id=snap).count() == 0


def test_changelog_trimmed_delete_file_not_reannounced(spark):
    """A later COW rewrite TRIMS an older position-delete file to a new
    path; the trimmed carry restates old positions and must not surface
    as fresh delete events."""
    loc = _fresh("trim")
    a, b = _turns(spark, 0), _turns(spark, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)  # file(s) A
    t.append(b)  # file(s) B
    # one MoR delete hitting BOTH files (turn 2 lives in A, turn 5 in B)
    t.delete_where(spark, [("turn_idx", ">=", 2)], mode="merge-on-read")
    t.delete_where(spark, [("turn_idx", "<=", 1)], mode="merge-on-read")
    mid = t.current_snapshot_id()
    mid_rows = _multiset(t.scan(spark))
    # COW delete removes every remaining A-side row -> A rewritten away,
    # surviving delete entries trimmed onto fresh paths
    t.delete_where(spark, [("turn_idx", "<", 4)], mode="copy-on-write")
    chg = t.changes(spark, from_snapshot_id=mid)
    assert chg.where(F.col("_change_type") == "insert").count() == 0
    gone = {k for k in mid_rows if k[1] < 4}
    deleted = {
        tuple(r[c] for c in DATA_COLS)
        for r in chg.where(F.col("_change_type") == "delete").collect()
    }
    assert deleted == gone
    assert _apply(mid_rows, chg) == _multiset(t.scan(spark))


def test_changelog_reconstructs_through_mixed_history(spark):
    """append → MoR delete → merge upsert → compaction → COW delete:
    replaying changes(from, to) over scan(from) reproduces scan(to) for
    every (from, to) snapshot pair, and no delete is double-announced."""
    loc = _fresh("mixed")
    a = _turns(spark, 0, n=6)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.delete_where(spark, [("turn_idx", "=", 3)], mode="merge-on-read")
    upsert = _turns(spark, 4, n=4).withColumn(
        "text", F.concat(F.lit("edited: "), F.col("text"))
    )
    t.merge_into(spark, upsert, ["conv_id", "turn_idx"])
    t.rewrite_data_files(spark)
    t.delete_where(spark, [("turn_idx", "<=", 1)], mode="copy-on-write")
    snaps = [None] + [s["snapshot-id"] for s in t.snapshots()]
    states = {
        sid: _multiset(t.scan(spark, snapshot_id=sid)) if sid else Counter()
        for sid in snaps
    }
    for i, frm in enumerate(snaps):
        for to in snaps[i + 1 :]:
            chg = t.changes(spark, from_snapshot_id=frm, to_snapshot_id=to)
            assert _apply(states[frm], chg) == states[to], (frm, to)


def test_changelog_empty_range_and_schema_guard(spark):
    loc = _fresh("guards")
    t = IcebergTable.create(loc, _turns(spark, 0))
    t.append(_turns(spark, 0))
    cur = t.current_snapshot_id()
    empty = t.changes(spark, from_snapshot_id=cur)
    assert empty.count() == 0
    assert empty.columns == DATA_COLS + [
        "_change_type",
        "_change_ordinal",
        "_commit_snapshot_id",
    ]
    t.add_column("_change_type", "string")
    with pytest.raises(ValueError, match="_change_type"):
        t.changes(spark)
