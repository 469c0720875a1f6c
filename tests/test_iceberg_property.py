"""Model-based property test of the from-scratch Iceberg table format.

Hypothesis drives random sequences of table operations (append /
delete_where / merge_into / rewrite_data_files / expire+orphan-cleanup)
against a plain multiset model of the table's rows; after EVERY
operation the snapshot-isolated scan must equal the model exactly, and
at the end a randomly chosen historical snapshot must still read its
recorded contents (time travel is content-addressed, so maintenance
ops must never corrupt it).

This is the table-format analogue of the pane-layer geometry property
test: the commit protocol's visible-state machine, explored rather than
enumerated.
"""

from __future__ import annotations

import os
import shutil
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from saber_spark.sources.iceberg_format import IcebergTable

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "iceberg_prop",
)

SCHEMA = "id int, grp string, val bigint"
GROUPS = ["a", "b", "c"]

# op grammar: each op is a (kind, arg) pair
_append = st.tuples(
    st.just("append"),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=6),
)
_delete = st.tuples(st.just("delete"), st.sampled_from(GROUPS))
_delete_mor = st.tuples(st.just("delete_mor"), st.sampled_from(GROUPS))
_merge = st.tuples(
    st.just("merge"),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=4),
)
_upsert = st.tuples(  # merge-on-read row-delta (equality deletes)
    st.just("upsert"),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=4),
)
_compact = st.tuples(st.just("compact"), st.none())
_expire = st.tuples(st.just("expire"), st.none())

OPS = st.lists(
    st.one_of(
        _append, _delete, _delete_mor, _merge, _upsert, _compact, _expire
    ),
    min_size=3,
    max_size=7,
)


def _row(i: int, tag: int):
    return (i, GROUPS[i % len(GROUPS)], i * 100 + tag)


def _scan_counter(spark, table, **kw) -> Counter:
    return Counter(
        (r["id"], r["grp"], r["val"]) for r in table.scan(spark, **kw).collect()
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS, data=st.data())
def test_table_state_machine_matches_model(spark, ops, data):
    shutil.rmtree(TMP, ignore_errors=True)
    table = IcebergTable.create(
        TMP, spark.createDataFrame([], SCHEMA).schema
    )
    model: Counter = Counter()
    history: list[tuple[int, Counter]] = []
    tag = 0

    for kind, arg in ops:
        tag += 1
        if kind == "append":
            rows = [_row(i, tag) for i in arg]
            table.append(spark.createDataFrame(rows, SCHEMA))
            model.update(rows)
        elif kind in ("delete", "delete_mor"):
            table.delete_where(
                spark,
                [("grp", "=", arg)],
                mode="merge-on-read" if kind == "delete_mor" else "copy-on-write",
            )
            model = Counter(
                {t: n for t, n in model.items() if t[1] != arg}
            )
        elif kind in ("merge", "upsert"):
            rows = [_row(i, tag) for i in set(arg)]
            src = spark.createDataFrame(rows, SCHEMA)
            if kind == "merge":
                table.merge_into(spark, src, ["id"])
            else:  # same semantics, merge-on-read row-delta
                table.upsert_by_key(spark, src, ["id"])
            ids = {r[0] for r in rows}
            model = Counter({t: n for t, n in model.items() if t[0] not in ids})
            model.update(rows)
        elif kind == "compact":
            table.rewrite_data_files(
                spark, target_file_size_bytes=256 * 1024 * 1024, min_input_files=2
            )
        elif kind == "expire":
            table.expire_snapshots(keep_last=1)
            table.remove_orphan_files()
            history.clear()  # expired snapshots are gone by design
        assert _scan_counter(spark, table) == model, f"after {kind}({arg})"
        history.append((table.current_snapshot_id(), Counter(model)))

    # time travel: one random retained snapshot still reads its contents
    if history:
        snap_id, snap_model = data.draw(st.sampled_from(history))
        assert _scan_counter(spark, table, snapshot_id=snap_id) == snap_model

    # CDC: the changelog between a random retained snapshot pair replays
    # the earlier state into the later one exactly — inserts add, deletes
    # subtract, never below zero (each delete announced exactly once)
    if len(history) >= 2:
        ia = data.draw(st.integers(0, len(history) - 2))
        ib = data.draw(st.integers(ia + 1, len(history) - 1))
        (s_from, m_from), (s_to, m_to) = history[ia], history[ib]
        folded = Counter(m_from)
        for r in table.changes(
            spark, from_snapshot_id=s_from, to_snapshot_id=s_to
        ).collect():
            key = (r["id"], r["grp"], r["val"])
            if r["_change_type"] == "insert":
                folded[key] += 1
            else:
                folded[key] -= 1
                assert folded[key] >= 0, f"over-announced delete: {key}"
        assert +folded == m_to, f"changelog replay {s_from}->{s_to}"
