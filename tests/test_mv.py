"""Incremental materialized-view maintenance through the CDC stream
(streaming/mv.py): the MV must equal the batch aggregate over the
source table's CURRENT snapshot after any history — appends, MoR
delete, MERGE upsert, compaction — and replayed batches must fold
exactly once."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.streaming.jobs import read_iceberg_changelog_stream
from saber_spark.streaming.mv import WindowedAggregateMV
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "mv"
)
WINDOW_S = 3600


def _fresh(name: str) -> str:
    path = os.path.join(TMP, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _batch_truth(spark, src: IcebergTable):
    """The aggregate the MV must equal: over the CURRENT snapshot."""
    return (
        src.scan(spark)
        .groupBy(
            (
                F.floor(F.col("ts").cast("timestamp").cast("long") / WINDOW_S)
                * WINDOW_S
            ).cast("long").alias("window_start")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.length("text")).cast("long").alias("sum_val"),
        )
    )


def _mv_rows(spark, mv: IcebergTable):
    return {
        (r["window_start"], r["n_rows"], r["sum_val"])
        for r in mv.scan(spark).collect()
    }


def _truth_rows(spark, src):
    return {
        (r["window_start"], r["n_rows"], r["sum_val"])
        for r in _batch_truth(spark, src).collect()
    }


@pytest.mark.parametrize("fold_mode", ["overwrite", "merge"])
def test_mv_follows_source_through_mixed_history(spark, fold_mode):
    src_loc, mv_loc, ckpt = (
        _fresh(f"src_{fold_mode}"),
        _fresh(f"mv_table_{fold_mode}"),
        _fresh(f"ckpt_{fold_mode}"),
    )
    t = transcripts(spark, SF_SMOKE).where(F.col("turn_idx") < 6)
    src = IcebergTable.create(src_loc, t)
    src.append(t.where(F.col("turn_idx") < 3))
    mv_table = IcebergTable.create(
        mv_loc, T._parse_datatype_string(WindowedAggregateMV.SCHEMA)
    )
    mv = WindowedAggregateMV(
        mv_table, "mv_test", WINDOW_S, value_col="_vlen",
        fold_mode=fold_mode,
    )
    stream = read_iceberg_changelog_stream(spark, src_loc).withColumn(
        "_vlen", F.length("text")
    )
    q = mv.start(stream, ckpt)
    try:
        q.processAllAvailable()
        assert _mv_rows(spark, mv_table) == _truth_rows(spark, src)

        # source keeps moving: append, MoR delete, MERGE upsert, compact
        src.append(t.where(F.col("turn_idx") >= 3))
        q.processAllAvailable()
        assert _mv_rows(spark, mv_table) == _truth_rows(spark, src)

        src.delete_where(spark, [("tool", "=", "code")], mode="merge-on-read")
        q.processAllAvailable()
        assert _mv_rows(spark, mv_table) == _truth_rows(spark, src)

        upsert = t.where(F.col("turn_idx") == 1).withColumn(
            "text", F.concat(F.lit("edited longer text: "), F.col("text"))
        )
        src.merge_into(spark, upsert, ["conv_id", "turn_idx"])
        src.rewrite_data_files(spark)
        q.processAllAvailable()
        assert _mv_rows(spark, mv_table) == _truth_rows(spark, src)
    finally:
        q.stop()

    # offline commit + restart from the same checkpoint: the missed
    # snapshot folds once, replays fold zero times (commit-tag dedup)
    src.delete_where(spark, [("turn_idx", "=", 5)], mode="merge-on-read")
    q2 = mv.start(
        read_iceberg_changelog_stream(spark, src_loc).withColumn(
            "_vlen", F.length("text")
        ),
        ckpt,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _mv_rows(spark, mv_table) == _truth_rows(spark, src)


@pytest.mark.parametrize("fold_mode", ["overwrite", "merge"])
def test_mv_replayed_batch_folds_exactly_once(spark, fold_mode):
    src_loc, mv_loc = (
        _fresh(f"replay_src_{fold_mode}"), _fresh(f"replay_mv_{fold_mode}")
    )
    t = transcripts(spark, SF_SMOKE).where(F.col("turn_idx") < 2)
    src = IcebergTable.create(src_loc, t)
    src.append(t)
    mv_table = IcebergTable.create(
        mv_loc, T._parse_datatype_string(WindowedAggregateMV.SCHEMA)
    )
    mv = WindowedAggregateMV(
        mv_table, "mv_replay", WINDOW_S, value_col="_vlen",
        fold_mode=fold_mode,
    )
    batch = src.changes(spark).withColumn("_vlen", F.length("text"))
    mv._fold(batch, 0)
    want = _mv_rows(spark, mv_table)
    assert want == _truth_rows(spark, src)
    mv._fold(batch, 0)  # foreachBatch replay after a crash: same batch_id
    assert _mv_rows(spark, mv_table) == want


@pytest.mark.parametrize("fold_mode", ["overwrite", "merge"])
def test_mv_with_group_keys(spark, fold_mode):
    """Keyed MV: per-(window, tool) counts stay exact through a MoR
    delete that removes one tool's rows entirely from some windows —
    on the merge fold path, the zero-row deletes and the upserts land
    in the same atomic snapshot (merge_into delete_condition)."""
    src_loc, mv_loc, ckpt = (
        _fresh(f"key_src_{fold_mode}"),
        _fresh(f"key_mv_{fold_mode}"),
        _fresh(f"key_ckpt_{fold_mode}"),
    )
    t = transcripts(spark, SF_SMOKE).where(F.col("turn_idx") < 6)
    src = IcebergTable.create(src_loc, t)
    src.append(t)
    mv_table = IcebergTable.create(
        mv_loc,
        T._parse_datatype_string(WindowedAggregateMV.schema_ddl("tool STRING")),
    )
    mv = WindowedAggregateMV(
        mv_table, "mv_keys", WINDOW_S, value_col="_vlen", keys=("tool",),
        fold_mode=fold_mode,
    )

    def truth():
        return {
            (r["window_start"], r["tool"], r["n_rows"], r["sum_val"])
            for r in src.scan(spark)
            .groupBy(
                (
                    F.floor(
                        F.col("ts").cast("timestamp").cast("long") / WINDOW_S
                    )
                    * WINDOW_S
                ).cast("long").alias("window_start"),
                "tool",
            )
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(F.length("text")).cast("long").alias("sum_val"),
            )
            .collect()
        }

    def mv_rows():
        return {
            (r["window_start"], r["tool"], r["n_rows"], r["sum_val"])
            for r in mv_table.scan(spark).collect()
        }

    q = mv.start(
        read_iceberg_changelog_stream(spark, src_loc).withColumn(
            "_vlen", F.length("text")
        ),
        ckpt,
    )
    try:
        q.processAllAvailable()
        assert mv_rows() == truth()
        src.delete_where(spark, [("tool", "=", "code")], mode="merge-on-read")
        q.processAllAvailable()
        got = mv_rows()
        assert got == truth()
        assert not any(r[1] == "code" for r in got)  # folded to zero, gone
    finally:
        q.stop()


def test_mv_merge_path_carries_untouched_files(spark):
    """The merge fold's write cost is O(files overlapping the touched
    windows), not O(MV): an MV whose windows live in separate files
    keeps every file outside the batch's window_start range
    byte-identical (same live file path) across a fold, while the
    touched window's file is rewritten. This is the at-scale property
    that picks merge over overwrite past merge_threshold_rows."""
    import datetime as dt

    mv_loc = _fresh("prune_mv")
    mv_table = IcebergTable.create(
        mv_loc, T._parse_datatype_string(WindowedAggregateMV.SCHEMA)
    )
    # two far-apart windows, committed as SEPARATE files (two appends)
    far = 1_000_000 * WINDOW_S
    mv_table.append(spark.createDataFrame(
        [(0, WINDOW_S, 5, 50)], WindowedAggregateMV.SCHEMA).coalesce(1))
    mv_table.append(spark.createDataFrame(
        [(far, far + WINDOW_S, 7, 70)], WindowedAggregateMV.SCHEMA).coalesce(1))
    before = {d["file_path"] for d in mv_table.files()}
    assert len(before) == 2

    mv = WindowedAggregateMV(
        mv_table, "mv_prune", WINDOW_S, value_col="_vlen", fold_mode="merge"
    )
    batch = spark.createDataFrame(
        [("insert", dt.datetime(1970, 1, 1, 0, 10), 3)],
        "_change_type STRING, ts TIMESTAMP, _vlen INT",
    )  # touches window_start=0 only
    mv._fold(batch, 0)

    after = {d["file_path"] for d in mv_table.files()}
    untouched = [p for p in before if p in after]
    assert len(untouched) == 1  # the far window's file carried untouched
    got = _mv_rows(spark, mv_table)
    assert got == {(0, 6, 53), (far, 7, 70)}
