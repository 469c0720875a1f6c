"""The from-scratch Iceberg table format (sources/iceberg_format.py) and
the exactly-once streaming sink on top of it (streaming/iceberg_sink.py):
commit protocol, optimistic-concurrency retry, snapshot isolation / time
travel, manifest pruning, incremental scans, schema evolution, orphan
reclamation, and end-to-end stream → snapshot-per-batch → read-back
parity with idempotent re-drive.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from saber_spark.sources.iceberg_format import (
    CommitConflict,
    IcebergTable,
)
from saber_spark.streaming.iceberg_sink import ExactlyOnceIcebergSink
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "iceberg"
)


def _fresh(name: str) -> str:
    path = os.path.join(TMP, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _turns(spark, offset=0):
    """A deterministic slice of the sf0.001 transcripts (no limit() —
    its row choice is plan-dependent)."""
    return (
        transcripts(spark, SF_SMOKE)
        .where((F.col("turn_idx") >= offset) & (F.col("turn_idx") < offset + 4))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def _key_set(df):
    return {
        (r["conv_id"], r["turn_idx"])
        for r in df.select("conv_id", "turn_idx").collect()
    }


# -- table format ------------------------------------------------------------


def test_create_append_scan_roundtrip(spark):
    loc = _fresh("roundtrip")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    back = IcebergTable.load(loc).scan(spark)
    assert back.count() == src.count()
    assert _key_set(back) == _key_set(src)
    # per-turn text equality under stable ordering (the north_rule invariant)
    a = back.orderBy("conv_id", "turn_idx").select("text").collect()
    b = src.orderBy("conv_id", "turn_idx").select("text").collect()
    assert a == b


def test_snapshot_isolation_and_time_travel(spark):
    loc = _fresh("timetravel")
    first = _turns(spark, offset=0)
    second = _turns(spark, offset=4)
    t = IcebergTable.create(loc, first)
    t.append(first)
    snap1 = t.current_snapshot_id()
    ts1 = t.history()[-1]["timestamp-ms"]
    t.append(second)
    assert t.scan(spark).count() == first.count() + second.count()
    # pinned old snapshot still reads exactly the old rows
    assert _key_set(t.scan(spark, snapshot_id=snap1)) == _key_set(first)
    # timestamp time travel resolves through the snapshot-log
    assert t.scan(spark, as_of_ms=ts1).count() == first.count()
    # lineage: second snapshot's parent is the first
    snaps = t.snapshots()
    assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
    assert snaps[1]["sequence-number"] == snaps[0]["sequence-number"] + 1


def test_commit_conflict_detected_and_retried(spark):
    loc = _fresh("conflict")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    other = IcebergTable.load(loc)

    # a writer holding a stale base version must NOT be able to publish
    stale = t._read_metadata()
    other.append(_turns(spark, offset=4))
    with pytest.raises(CommitConflict):
        t._publish_version(stale, stale["__version"])

    # the commit loop absorbs the conflict: interleave a competing commit
    # into t's first publish attempt, then let the retry land
    real_publish = IcebergTable._publish_version
    state = {"raced": False}

    def racy_publish(self, meta, expected_version):
        if not state["raced"]:
            state["raced"] = True
            other.append(_turns(spark, offset=8))  # takes expected_version+1
        return real_publish(self, meta, expected_version)

    IcebergTable._publish_version = racy_publish
    try:
        t.append(_turns(spark, offset=12))
    finally:
        IcebergTable._publish_version = real_publish
    assert state["raced"]
    # all four appends present — the retried append lost no competitor rows
    ops = [s["summary"]["operation"] for s in t.snapshots()]
    assert ops == ["append"] * 4
    expect = sum(
        _turns(spark, offset=o).count() for o in (0, 4, 8, 12)
    )
    assert t.scan(spark).count() == expect


def test_partition_and_bounds_pruning(spark):
    loc = _fresh("pruning")
    src = _turns(spark)
    t = IcebergTable.create(
        loc, src, partition_by=[("role", "identity"), ("ts", "hour")]
    )
    t.append(src)
    all_files = t.files()
    user_files = t.files(filters=[("role", "=", "user")])
    assert 0 < len(user_files) < len(all_files)
    # identity-partition value is recorded per file
    assert all(d["partition"]["role"] == "user" for d in user_files)
    # bounds pruning on a non-partition column: turn_idx ∈ [0, 4)
    none_left = t.files(filters=[("turn_idx", ">", 1_000_000)])
    assert none_left == []
    # pruned scan row-parity with a full-scan filter
    pruned = t.scan(spark, filters=[("role", "=", "user")])
    full = t.scan(spark).where(F.col("role") == "user")
    assert _key_set(pruned) == _key_set(full)


def test_incremental_scan_reads_only_new_rows(spark):
    loc = _fresh("incremental")
    first = _turns(spark, offset=0)
    second = _turns(spark, offset=4)
    t = IcebergTable.create(loc, first)
    t.append(first)
    snap1 = t.current_snapshot_id()
    t.append(second)
    inc = t.incremental(spark, from_snapshot_id=snap1)
    assert _key_set(inc) == _key_set(second)
    # from the beginning (snapshot -1 / None) = everything appended
    assert t.incremental(spark, from_snapshot_id=-1).count() == (
        first.count() + second.count()
    )


def test_schema_evolution_add_column(spark):
    loc = _fresh("evolve")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.add_column("quality", "double")
    back = t.scan(spark)
    assert "quality" in back.columns
    # pre-evolution files read the new column as null
    assert back.where(F.col("quality").isNotNull()).count() == 0
    meta = t._read_metadata()
    assert meta["last-column-id"] == len(src.columns) + 1
    assert meta["current-schema-id"] == 1


def test_crash_before_commit_invisible_then_reclaimed(spark):
    loc = _fresh("orphans")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    n = t.scan(spark).count()
    # simulate a writer dying after data-file write, before the snapshot
    # commit: files land in data/ but no manifest references them
    orphan_entries = t._write_data_files(_turns(spark, offset=4), t._read_metadata())
    assert len(orphan_entries) > 0
    assert t.scan(spark).count() == n  # readers never see them
    removed = t.remove_orphan_files(older_than_s=0)  # no writer in flight
    assert {e["file_path"] for e in orphan_entries} == set(removed)
    assert t.scan(spark).count() == n


def test_overwrite_and_expire_snapshots(spark):
    loc = _fresh("expire")
    first = _turns(spark, offset=0)
    second = _turns(spark, offset=4)
    t = IcebergTable.create(loc, first)
    t.append(first)
    t.overwrite(second)
    assert _key_set(t.scan(spark)) == _key_set(second)
    t.expire_snapshots(keep_last=1)
    assert len(t.snapshots()) == 1
    removed = t.remove_orphan_files(older_than_s=0)  # first append orphaned
    assert len(removed) > 0
    assert _key_set(t.scan(spark)) == _key_set(second)


def test_delete_where_copy_on_write(spark):
    loc = _fresh("delete")
    src = _turns(spark)
    t = IcebergTable.create(loc, src, partition_by=[("role", "identity")])
    t.append(src)
    n_user = src.where(F.col("role") == "user").count()
    files_before = {d["file_path"] for d in t.files()}
    t.delete_where(spark, [("role", "=", "user")])
    back = t.scan(spark)
    assert back.where(F.col("role") == "user").count() == 0
    assert back.count() == src.count() - n_user
    # copy-on-write touched ONLY files that could contain matches:
    # non-user partition files are carried byte-identical
    files_after = {d["file_path"] for d in t.files()}
    untouched = {
        d["file_path"]
        for d in t.files(snapshot_id=t.snapshots()[-2]["snapshot-id"])
        if d["partition"].get("role") not in (None, "user")
    }
    assert untouched <= files_after and untouched <= files_before
    s = t.snapshots()[-1]["summary"]
    assert s["operation"] == "delete" and int(s["deleted-records"]) > 0
    # time travel still reads the pre-delete rows
    pre = t.scan(spark, snapshot_id=t.snapshots()[-2]["snapshot-id"])
    assert pre.where(F.col("role") == "user").count() == n_user


def test_merge_into_upsert(spark):
    loc = _fresh("merge")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    # updates: rewrite text of 2 existing turns; inserts: 2 brand-new keys
    updates = (
        src.where((F.col("turn_idx") == 0))
        .withColumn("text", F.lit("REDACTED"))
    )
    inserts = src.where(F.col("turn_idx") == 1).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_new"))
    )
    n_upd, n_ins = updates.count(), inserts.count()
    t.merge_into(spark, updates.unionByName(inserts), ["conv_id", "turn_idx"])
    back = t.scan(spark)
    assert back.count() == src.count() + n_ins
    assert back.where(F.col("text") == "REDACTED").count() == n_upd
    # unmatched rows untouched
    assert _key_set(back) == _key_set(src) | _key_set(inserts)
    assert t.snapshots()[-1]["summary"]["operation"] == "overwrite"


def test_rewrite_data_files_compaction(spark):
    loc = _fresh("compact")
    t = IcebergTable.create(loc, _turns(spark))
    for off in (0, 4, 8, 12):  # 4 small-file appends, several files each
        t.append(_turns(spark, offset=off))
    before = t.files()
    rows_before = t.scan(spark).count()
    inc_base = t.current_snapshot_id()
    assert t.rewrite_data_files(spark, min_input_files=2) is not None
    after = t.files()
    assert len(after) < len(before)
    # content identical, snapshot op is replace, incremental skips it
    assert t.scan(spark).count() == rows_before
    assert _key_set(t.scan(spark)) == _key_set(
        t.scan(spark, snapshot_id=t.snapshots()[-2]["snapshot-id"])
    )
    assert t.snapshots()[-1]["summary"]["operation"] == "replace"
    assert t.incremental(spark, from_snapshot_id=inc_base).count() == 0
    # compacted-away files become orphans after expiry
    t.expire_snapshots(keep_last=1)
    assert len(t.remove_orphan_files(older_than_s=0)) > 0
    assert t.scan(spark).count() == rows_before


def test_rewrite_validation_failure_on_concurrent_rewrite(spark):
    from saber_spark.sources.iceberg_format import ValidationFailed

    loc = _fresh("validate")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    # two writers plan a copy-on-write over the same input files; the
    # second to commit must fail validation, not silently resurrect rows
    other = IcebergTable.load(loc)
    other.delete_where(spark, [("turn_idx", "=", 0)])
    with pytest.raises(ValidationFailed):
        t._rewrite_commit(
            [], {d["file_path"] for d in t.files(snapshot_id=t.snapshots()[0]["snapshot-id"])}
            - {d["file_path"] for d in other.files()},
            "delete",
        )


# -- exactly-once streaming sink ------------------------------------------------


@pytest.fixture(scope="module")
def ice_stream_dir(spark):
    from tests.test_streaming import _write_ordered_stream

    path = os.path.join(TMP, "stream_src")
    _write_ordered_stream(spark, path)
    yield path


def _ysb_stream(spark, path):
    from saber_spark.operators.aggregation import AggSpec
    from saber_spark.operators.windows import RANGE, WindowDef
    from saber_spark.streaming.jobs import (
        read_transcript_stream,
        streaming_windowed_aggregate,
    )
    from tests.test_streaming import _stream_schema

    stream = read_transcript_stream(
        spark, f"{path}/chunk=*", max_files_per_trigger=1, schema=_stream_schema()
    )
    return streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant"),
        WindowDef(RANGE, 600),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
        watermark="0 seconds",
    )


def test_iceberg_sink_end_to_end_exactly_once(spark, ice_stream_dir):
    loc = _fresh("sink_table")
    ckpt = _fresh("sink_ckpt")
    agg = _ysb_stream(spark, ice_stream_dir)
    table = IcebergTable.create(loc, agg)
    sink = ExactlyOnceIcebergSink(
        table, ckpt, "ysb_ice", event_ts_col="window_end"
    )
    q = sink.start(agg, output_mode="append")
    q.processAllAvailable()
    q.stop()

    # parity: committed table == append-mode emission (windows whose end
    # cleared the final watermark), one snapshot per non-empty batch
    got = sink.read_committed(spark)
    lineage = sink.lineage(spark).collect()
    assert len(lineage) == len(table.snapshots()) > 1
    assert sum(r["n_rows"] for r in lineage) == got.count() > 0
    # every batch latency-stamped and chained to its parent
    assert all(r["p50_ms"] is not None for r in lineage if r["n_rows"])
    assert all(
        b["parent_snapshot_id"] == a["snapshot_id"]
        for a, b in zip(lineage, lineage[1:])
    )

    # idempotent re-drive: re-running a committed batch adds NO snapshot
    n_snaps = len(table.snapshots())
    batch0 = sink.read_committed(spark).limit(5)
    sink._foreach_batch(batch0, lineage[0]["batch_id"])
    assert len(table.snapshots()) == n_snaps
    assert sink.read_committed(spark).count() == got.count()

    # restart with the same checkpoint: no new input → no new snapshots,
    # no duplicated rows (resume-safe)
    agg2 = _ysb_stream(spark, ice_stream_dir)
    q2 = ExactlyOnceIcebergSink(
        table, ckpt, "ysb_ice", event_ts_col="window_end"
    ).start(agg2, output_mode="append")
    q2.processAllAvailable()
    q2.stop()
    assert sink.read_committed(spark).count() == got.count()


def test_iceberg_merge_sink_update_mode(spark, ice_stream_dir):
    """Update-mode stream + MERGE-keyed sink: every re-emission of a
    window upserts its row, so the final table equals the batch aggregate
    over ALL windows (open ones included) — the late-data-correcting
    production shape of SURVEY.md §7 Phase 4."""
    from saber_spark.operators.aggregation import AggSpec, windowed_aggregate
    from saber_spark.operators.windows import RANGE, WindowDef

    loc = _fresh("merge_sink")
    ckpt = _fresh("merge_sink_ckpt")
    agg = _ysb_stream(spark, ice_stream_dir)
    table = IcebergTable.create(loc, agg)
    sink = ExactlyOnceIcebergSink(
        table, ckpt, "ysb_merge", coalesce=1,
        merge_keys=["window_start", "window_end"],
    )
    q = sink.start(agg, output_mode="update")
    q.processAllAvailable()
    q.stop()

    t = transcripts(spark, SF_SMOKE).withColumn(
        "text_len", F.length("text").cast("long")
    )
    batch = windowed_aggregate(
        t.where(F.col("role") == "assistant"),
        WindowDef(RANGE, 600),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
    )
    got = {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in sink.read_committed(spark).collect()
    }
    want = {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0
    # exactly one row per window despite multi-batch re-emission
    n_windows = sink.read_committed(spark).select("window_start").distinct().count()
    assert sink.read_committed(spark).count() == n_windows
    # idempotent re-drive of a committed merge batch: no new snapshot
    n_snaps = len(table.snapshots())
    batch_ids = sorted(
        int(s["summary"]["saber.batch-id"])
        for s in table.snapshots()
        if "saber.batch-id" in s["summary"]
    )
    sink._foreach_batch(sink.read_committed(spark), batch_ids[0])
    assert len(table.snapshots()) == n_snaps


def test_add_files_zero_copy_import(spark):
    """add_files commits existing parquet files without rewriting them:
    scan sees the rows, the files stay at their external paths, and
    orphan cleanup never touches them."""
    import glob

    loc = _fresh("addfiles")
    ext = _fresh("addfiles_ext")
    src = _turns(spark)
    src.coalesce(2).write.parquet(ext)
    paths = sorted(glob.glob(os.path.join(ext, "*.parquet")))
    assert len(paths) >= 1

    t = IcebergTable.create(loc, src.schema)
    t.add_files(paths)
    assert _key_set(t.scan(spark)) == _key_set(src)
    # zero-copy: no data files materialized under the table itself
    assert t.remove_orphan_files(older_than_s=0) == []
    assert all(os.path.exists(p) for p in paths)
    assert _key_set(t.scan(spark)) == _key_set(src)
    # incremental/streaming sees the imported snapshot as an append
    assert sorted(t.appended_file_paths(0, 10**9)) == paths

    part = IcebergTable.create(
        _fresh("addfiles_part"), src.schema, partition_by=[("role", "identity")]
    )
    with pytest.raises(ValueError):
        part.add_files(paths)


def test_iceberg_sink_matches_batch_oracle(spark, ice_stream_dir):
    """Value-level parity: the sunk result equals the batch windowed
    aggregate restricted to windows closed by the final watermark."""
    from saber_spark.operators.aggregation import AggSpec, windowed_aggregate
    from saber_spark.operators.windows import RANGE, WindowDef

    loc = _fresh("sink_parity")
    ckpt = _fresh("sink_parity_ckpt")
    agg = _ysb_stream(spark, ice_stream_dir)
    table = IcebergTable.create(loc, agg)
    sink = ExactlyOnceIcebergSink(table, ckpt, "ysb_ice_parity")
    q = sink.start(agg, output_mode="append")
    q.processAllAvailable()
    q.stop()

    t = transcripts(spark, SF_SMOKE).withColumn(
        "text_len", F.length("text").cast("long")
    )
    assistant = t.where(F.col("role") == "assistant")
    wm = assistant.agg(
        F.max(F.col("ts").cast("timestamp").cast("long"))
    ).collect()[0][0]
    batch = windowed_aggregate(
        assistant,
        WindowDef(RANGE, 600),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
    ).where(F.col("window_end") <= wm)

    got = {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in sink.read_committed(spark).collect()
    }
    want = {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in batch.collect()
    }
    assert got == want and len(got) > 0


# -- review regressions (r3) --------------------------------------------------


def test_orphan_cleanup_spares_recent_files(spark):
    """remove_orphan_files must never delete files younger than the age
    cutoff: a concurrent writer may have written its data files but not
    yet published the snapshot."""
    loc = _fresh("orphan_age")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    # simulate a crash-before-commit leftover (fresh mtime)
    stray = os.path.join(t.data_dir, "inflight.parquet")
    with open(stray, "wb") as f:
        f.write(b"PAR1")
    assert t.remove_orphan_files() == []  # default 3-day cutoff spares it
    removed = t.remove_orphan_files(older_than_s=0)
    assert stray in removed and not os.path.exists(stray)


def test_identity_partition_value_with_special_chars(spark):
    """Identity partition values containing characters Spark Hive-escapes
    in directory names (':', '=') must round-trip raw into the manifest,
    or equality pruning silently drops the matching files."""
    loc = _fresh("part_escape")
    src = _turns(spark).withColumn(
        "tag", F.concat(F.lit("k=v:"), F.col("role"))
    )
    t = IcebergTable.create(loc, src, partition_by=[("tag", "identity")])
    t.append(src)
    hits = t.files(filters=[("tag", "=", "k=v:user")])
    assert len(hits) > 0
    assert all(d["partition"]["tag"].startswith("k=v:") for d in hits)
    # and the pruned scan still returns the right rows
    got = t.scan(spark).where(F.col("tag") == "k=v:user")
    assert got.count() == src.where(F.col("tag") == "k=v:user").count()


def test_merge_into_empty_source_is_identity(spark):
    """MERGE with an empty source must not rewrite any file (it used to
    copy-on-write the ENTIRE table — a full rewrite per idle trigger)."""
    loc = _fresh("merge_empty")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    snaps_before = len(t.snapshots())
    files_before = sorted(d["file_path"] for d in t.files())
    t.merge_into(spark, src.where(F.lit(False)), ["conv_id", "turn_idx"])
    assert len(t.snapshots()) == snaps_before  # no new snapshot
    assert sorted(d["file_path"] for d in t.files()) == files_before


# -- merge-on-read (spec v2 position deletes) ---------------------------------


def test_delete_where_merge_on_read(spark):
    """MoR delete: no data file is touched — a position-delete file is
    committed instead, the scan folds it in, and time travel still reads
    the pre-delete rows."""
    loc = _fresh("mor_delete")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    n_user = src.where(F.col("role") == "user").count()
    files_before = {d["file_path"] for d in t.files()}
    pre_snap = t.current_snapshot_id()
    t.delete_where(spark, [("role", "=", "user")], mode="merge-on-read")
    # every data file carried byte-identical; one content=1 entry added
    assert {d["file_path"] for d in t.files()} == files_before
    dels = t.delete_files()
    assert len(dels) == 1 and dels[0]["content"] == 1
    assert dels[0]["referenced_data_files"], "delete entry must name targets"
    back = t.scan(spark)
    assert back.where(F.col("role") == "user").count() == 0
    assert back.count() == src.count() - n_user
    s = t.snapshots()[-1]["summary"]
    assert s["operation"] == "delete"
    assert s["saber.delete-mode"] == "merge-on-read"
    pre = t.scan(spark, snapshot_id=pre_snap)
    assert pre.where(F.col("role") == "user").count() == n_user


def test_mor_delete_then_datasource_read(spark):
    """The planner-integrated Python DataSource must fold position
    deletes executor-side (per-partition referenced delete files)."""
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    loc = _fresh("mor_dsv2")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.delete_where(spark, [("role", "=", "tool")], mode="merge-on-read")
    back = spark.read.format("saber_iceberg").option("location", loc).load()
    assert back.where(F.col("role") == "tool").count() == 0
    assert _key_set(back) == _key_set(src.where(F.col("role") != "tool"))


def test_mor_repeated_deletes_and_cow_no_resurrection(spark):
    """Two MoR deletes stack disjointly; a copy-on-write operation on a
    table with live position deletes must apply them while rewriting
    (no resurrected rows) and drop/trim the obsolete delete entries."""
    loc = _fresh("mor_stack")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.delete_where(spark, [("role", "=", "user")], mode="merge-on-read")
    t.delete_where(spark, [("role", "=", "tool")], mode="merge-on-read")
    want = _key_set(src.where(F.col("role") == "assistant"))
    assert _key_set(t.scan(spark)) == want
    # a COW delete now rewrites every remaining file (predicate matches
    # all assistants of turn 0): deleted rows must NOT come back
    t.delete_where(spark, [("turn_idx", "=", 0)], mode="copy-on-write")
    back = t.scan(spark)
    assert back.where(F.col("role") != "assistant").count() == 0
    assert _key_set(back) == {k for k in want if k[1] != 0}
    # all delete entries referencing rewritten files were dropped/trimmed:
    # the remaining delete files may only reference live data files
    live = {d["file_path"] for d in t.files()}
    for d in t.delete_files():
        assert set(d["referenced_data_files"]) <= live


def test_compaction_folds_position_deletes(spark):
    """rewrite_data_files must fold MoR deletes: referenced data files
    are rewritten with deletes applied, the delete entries disappear,
    and the scan is unchanged."""
    loc = _fresh("mor_fold")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.delete_where(spark, [("role", "=", "user")], mode="merge-on-read")
    want = _key_set(t.scan(spark))
    assert t.delete_files(), "precondition: a live delete file exists"
    res = t.rewrite_data_files(spark)
    assert res is not None
    assert t.delete_files() == [], "compaction must fold deletes away"
    assert _key_set(t.scan(spark)) == want
    assert t.snapshots()[-1]["summary"]["operation"] == "replace"


def test_mor_delete_blocks_incremental_tailing(spark):
    """A 'delete' snapshot in an incremental range must raise (append-only
    stream-source contract) — MoR commits are 'delete' operations."""
    loc = _fresh("mor_incr")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    snap1 = t.current_snapshot_id()
    t.delete_where(spark, [("role", "=", "user")], mode="merge-on-read")
    with pytest.raises(ValueError, match="append"):
        t.incremental(spark, snap1)


def test_pruning_normalizes_timestamp_separator():
    """Round-3 advice: manifests written before the space-separator change
    carry 'T'-separated bounds; mixed-format lexicographic compares must
    not wrongly prune (' ' < 'T' made same-date files look disjoint)."""
    from saber_spark.sources.iceberg_format import _pruned

    legacy = {
        "partition": {},
        "lower_bounds": {"ts": "2024-01-01T06:00:00"},
        "upper_bounds": {"ts": "2024-01-01T18:00:00"},
    }
    # literal in space form INSIDE the file's range: must NOT prune even
    # though "2024-01-01 12:00:00" < "2024-01-01T06:00:00" lexicographically
    assert not _pruned(legacy, [("ts", "=", "2024-01-01 12:00:00")], {})
    assert not _pruned(legacy, [("ts", ">", "2024-01-01 10:00:00")], {})
    # genuinely out of range still prunes, in either format
    assert _pruned(legacy, [("ts", "=", "2024-01-02 00:00:00")], {})
    assert _pruned(legacy, [("ts", "<", "2024-01-01T05:00:00")], {})
    # non-timestamp strings are untouched (a text column containing 'T')
    txt = {
        "partition": {},
        "lower_bounds": {"s": "Tan"},
        "upper_bounds": {"s": "Tz"},
    }
    assert _pruned(txt, [("s", "=", "Aardvark")], {})
    assert not _pruned(txt, [("s", "=", "Toast")], {})
    # normalization must be all-or-nothing across (lo, hi, val): a string
    # column MIXING timestamp-shaped and other values must compare raw —
    # per-value rewriting is not monotonic (hi' < lo here) and wrongly
    # pruned a file containing the matching row
    mixed = {
        "partition": {},
        "lower_bounds": {"s": "2024-01-01 50"},
        "upper_bounds": {"s": "2024-01-01T10:00:00"},
    }
    assert not _pruned(mixed, [("s", "=", "2024-01-01 50")], {})


def test_mor_delete_rewrite_race_validations(spark):
    """Both orders of the MoR-delete / rewrite race must fail loudly
    instead of silently resurrecting or losing rows:

    (a) a rewrite whose input files gained a merge-on-read delete AFTER
        the rewrite read them must raise ValidationFailed (its rewritten
        rows predate the delete — dropping the delete entry would
        resurrect rows);
    (b) a merge-on-read delete whose referenced data files were
        rewritten between its read and its commit must raise
        ValidationFailed (its positions point into dead files — a
        silent commit would lose the delete)."""
    from pyspark.sql import functions as F2
    from saber_spark.sources.iceberg_format import ValidationFailed

    # (a) rewrite-then-delete-lands-first
    loc = _fresh("mor_race_a")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    data_paths = {d["file_path"] for d in t.files()}
    # "rewrite" reads now (no deletes exist yet) ...
    keep = t._read_paths(spark, t._read_metadata(), sorted(data_paths)).where(
        F2.col("role") != "user"
    )
    new_files = t._write_data_files(keep, t._read_metadata())
    # ... a MoR delete lands while the rewrite is in flight
    t.delete_where(spark, [("role", "=", "tool")], mode="merge-on-read")
    with pytest.raises(ValidationFailed, match="merge-on-read delete"):
        t._rewrite_commit(new_files, data_paths, "delete",
                          known_delete_paths=set())
    # re-planned against fresh state (deletes now known + applied): commits
    meta = t._read_metadata()
    known = {p for p, d in t._live_files(meta).items()
             if d.get("content", 0) == 1}
    keep2 = t._read_paths(spark, meta, sorted(data_paths)).where(
        F2.col("role") != "user"
    )
    t._rewrite_commit(t._write_data_files(keep2, meta), data_paths, "delete",
                      known_delete_paths=known)
    back = t.scan(spark)
    assert back.where(F2.col("role") == "user").count() == 0
    assert back.where(F2.col("role") == "tool").count() == 0, (
        "the concurrent MoR delete must survive the re-planned rewrite"
    )

    # (b) delete computed, then its target files rewritten before commit
    loc = _fresh("mor_race_b")
    t2 = IcebergTable.create(loc, src)
    t2.append(src)
    meta2 = t2._read_metadata()
    paths2 = sorted(d["file_path"] for d in t2.files())
    pred = F2.expr("role == 'user'")
    entries = t2._write_position_deletes(spark, meta2, paths2, pred)
    assert entries
    # a concurrent COPY-ON-WRITE delete rewrites every file our pending
    # MoR delete references (its bounds admit a match in each)
    t2.delete_where(spark, [("role", "=", "tool")], mode="copy-on-write")
    refs = {p for e in entries for p in e.get("referenced_data_files", [])}
    assert refs - {d["file_path"] for d in t2.files()}, (
        "precondition: the referenced files must actually be gone"
    )

    def _validate(base):
        live_data = {p for p, d in t2._live_files(base).items()
                     if d.get("content", 0) == 0}
        gone = refs - live_data
        if gone:
            raise ValidationFailed(f"targets rewritten: {sorted(gone)[:3]}")

    with pytest.raises(ValidationFailed, match="rewritten"):
        t2._snapshot_commit(entries, "delete",
                            {"saber.delete-mode": "merge-on-read"},
                            validate=_validate)
    # the delete never committed: rows intact, re-running it works
    assert t2.scan(spark).where(F2.col("role") == "user").count() > 0
    t2.delete_where(spark, [("role", "=", "user")], mode="merge-on-read")
    assert t2.scan(spark).where(F2.col("role") == "user").count() == 0


# -- field-id schema evolution: rename / drop --------------------------------


def test_rename_column_preserves_values_across_writer_schemas(spark):
    """Rename is a metadata-only commit (spec §Schema Evolution): files
    written under the OLD name must keep serving their values through
    the field-id-resolving scan — a name-based read would null them."""
    loc = _fresh("rename_vals")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.rename_column("text", "body")
    b = _turns(spark, 4).withColumnRenamed("text", "body")
    t.append(b)
    got = t.scan(spark)
    assert "body" in got.columns and "text" not in got.columns
    # pre-rename rows still carry their text under the new name
    want = {
        (r["conv_id"], r["turn_idx"], r["text"]) for r in a.collect()
    } | {(r["conv_id"], r["turn_idx"], r["body"]) for r in b.collect()}
    assert {
        (r["conv_id"], r["turn_idx"], r["body"]) for r in got.collect()
    } == want
    assert got.where(F.col("body").isNull()).count() == 0


def test_drop_then_add_column_distinct_field_ids(spark):
    """Dropping a column then adding one with the SAME name must not
    resurrect the old values: the new field has a new id, so old files
    read null for it (the dropped bytes stay invisible)."""
    loc = _fresh("drop_add")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.drop_column("tool")
    assert "tool" not in t.scan(spark).columns
    t.add_column("tool", "string")
    got = t.scan(spark)
    assert "tool" in got.columns
    assert got.where(F.col("tool").isNotNull()).count() == 0
    assert _key_set(got) == _key_set(a)


def test_add_files_after_rename_stamps_current_schema(spark):
    """Files imported via add_files match the CURRENT schema by
    contract, so their manifest entries must carry the current
    schema-id: a later rename would otherwise resolve them through
    schema 0 and silently null the renamed column."""
    import glob

    loc = _fresh("addfiles_evolved")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.rename_column("text", "body")  # schema 1 is now current
    ext = _fresh("addfiles_evolved_ext")
    b = _turns(spark, 0).withColumnRenamed("text", "body")
    b.coalesce(1).write.parquet(ext)
    t.add_files(sorted(glob.glob(os.path.join(ext, "*.parquet"))))
    got = t.scan(spark)
    assert _key_set(got) == _key_set(b)
    assert got.where(F.col("body").isNull()).count() == 0


def test_rename_chain_bounds_resolve_by_field_id(spark):
    """Rename chain reusing a name (text->body, then tool->text): files
    written pre-chain carry bounds keyed by the ORIGINAL 'text' field.
    A filter on the current 'text' (the former tool field) must consult
    the old 'tool' bounds, not the stale same-named ones — name-keyed
    lookup would wrongly prune files whose original-text bounds exclude
    the literal and silently drop matching rows."""
    loc = _fresh("rename_chain")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    tool_val = (
        a.where(F.col("tool") != "").orderBy("tool").collect()[0]["tool"]
    )
    want = {
        (r["conv_id"], r["turn_idx"])
        for r in a.where(F.col("tool") == tool_val).collect()
    }
    assert want, "fixture must contain at least one non-empty tool"
    t.rename_column("text", "body")
    t.rename_column("tool", "text")
    got = t.scan(spark, filters=[("text", "=", tool_val)])
    assert _key_set(got) == want
    # files() agrees: at least one file admits the literal
    assert t.files(filters=[("text", "=", tool_val)])


def test_mor_delete_predicate_on_renamed_column(spark):
    """A merge-on-read DELETE whose predicate names the CURRENT (post-
    rename) column must still hit rows in files written pre-rename —
    the position-delete pass resolves columns by field id per writer
    schema."""
    loc = _fresh("rename_mor")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    victim = a.orderBy("conv_id", "turn_idx").collect()[0]
    t.rename_column("text", "body")
    t.delete_where(
        spark, [("body", "=", victim["text"])], mode="merge-on-read"
    )
    got = t.scan(spark)
    assert (victim["conv_id"], victim["turn_idx"]) not in _key_set(got)
    assert got.count() == a.count() - 1


def test_rename_refusals_and_drop_guards(spark):
    loc = _fresh("rename_guards")
    src = _turns(spark)
    t = IcebergTable.create(loc, src, partition_by=[("role", "identity")])
    t.append(src)
    with pytest.raises(ValueError, match="partition source"):
        t.rename_column("role", "speaker")
    with pytest.raises(ValueError, match="partition source"):
        t.drop_column("role")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("text", "tool")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")
    # rename/drop are commits: time travel still reads the old snapshot
    t.rename_column("text", "body")
    assert "body" in t.scan(spark).columns


def test_datasource_read_after_rename(spark):
    """The planner-integrated saber_iceberg source must apply the same
    field-id rename resolution executor-side (Arrow reader)."""
    loc = _fresh("rename_dsv2")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.rename_column("text", "body")
    b = _turns(spark, 4).withColumnRenamed("text", "body")
    t.append(b)
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    got = spark.read.format("saber_iceberg").option("location", loc).load()
    assert "body" in got.columns
    assert got.where(F.col("body").isNull()).count() == 0
    assert got.count() == a.count() + b.count()


def test_datasource_read_after_drop_then_readd(spark):
    """Drop a column, add a new one with the SAME name: the new field id
    is absent from old files' writer schemas, so the Arrow reader must
    null-fill it there — a name-based read would resurrect the dropped
    bytes (field-id resolution, spec §Schema Evolution)."""
    loc = _fresh("drop_add_dsv2")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.drop_column("tool")
    t.add_column("tool", "string")
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    got = spark.read.format("saber_iceberg").option("location", loc).load()
    assert "tool" in got.columns
    # every pre-evolution row reads null for the re-added field
    assert got.where(F.col("tool").isNotNull()).count() == 0
    assert got.count() == a.count()


def test_rewrite_sorted_clusters_tightens_bounds_and_folds_deletes(spark):
    """Sort-order rewrite (clustering): before it, every file straddles
    the whole turn_idx domain so a narrow range predicate prunes nothing;
    after it, ranges are disjoint per file, so the same predicate skips
    most files. Content is byte-identical (same multiset of rows, minus
    MoR-deleted ones, which must NOT resurrect), the sort order lands in
    table metadata, and incremental consumers skip the replace snapshot."""
    loc = _fresh("sorted_rewrite")
    src = transcripts(spark, SF_SMOKE).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    t = IcebergTable.create(loc, src)
    # append in conv-hash chunks: each file spans ~all turn_idx values
    for i in range(4):
        t.append(src.where(F.crc32(F.col("conv_id")) % 4 == i).repartition(2))
    # a merge-on-read delete that the rewrite must fold in
    t.delete_where(spark, [("role", "=", "tool")], mode="merge-on-read")
    assert t.delete_files() != []
    snap_before = t.current_snapshot_id()
    expected = _key_set(t.scan(spark))

    narrow = [("turn_idx", ">=", 6), ("turn_idx", "<=", 7)]
    files_before = t.files(filters=narrow)
    assert len(files_before) == len(t.files())  # layout defeats pruning

    total = sum(d["file_size_in_bytes"] for d in t.files())
    t.rewrite_sorted(spark, by=["turn_idx"], target_file_size_bytes=max(1, total // 6))

    files_all = t.files()
    files_after = t.files(filters=narrow)
    assert len(files_all) >= 4  # actually split into ranges
    assert len(files_after) < len(files_all)  # pruning now bites
    # row parity: clustering rewrites bytes, never rows
    assert _key_set(t.scan(spark)) == expected
    # MoR-deleted rows stay deleted and the delete files folded away
    assert t.scan(spark).where(F.col("role") == "tool").count() == 0
    assert t.delete_files() == []
    # the sort order is recorded in table metadata (spec §Sort Orders)
    meta = t._read_metadata()
    oid = meta["default-sort-order-id"]
    order = next(o for o in meta["sort-orders"] if o["order-id"] == oid)
    tid = {f["name"]: f["id"] for f in t._schema_fields(meta)}["turn_idx"]
    assert [f["source-id"] for f in order["fields"]] == [tid]
    # pruned scan row-parity with a full-scan filter on the sorted column
    pruned = t.scan(spark, filters=narrow)
    full = t.scan(spark).where(F.col("turn_idx").between(6, 7))
    assert _key_set(pruned) == _key_set(full)
    # incremental tailing from before the rewrite sees no re-emitted rows
    assert t.incremental(spark, from_snapshot_id=snap_before).count() == 0


def test_timestamp_columns_carry_manifest_bounds(spark):
    """Timestamps must be written as INT64 micros, not legacy INT96 —
    INT96 parquet columns carry NO min/max statistics, which silently
    disables both row-group pruning and Iceberg manifest ts-range
    skipping (the hottest predicate shape for a time-series engine).
    Guards the session-level outputTimestampType setting."""
    loc = _fresh("ts_bounds")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    for d in t.files():
        assert "ts" in d["lower_bounds"], "ts bounds missing: INT96 regression"
        assert d["lower_bounds"]["ts"] <= d["upper_bounds"]["ts"]
    # and the bounds actually prune: a range beyond the data keeps nothing
    assert t.files(filters=[("ts", ">", "2999-01-01 00:00:00")]) == []


def test_rewrite_zorder_multicolumn_pruning(spark):
    """Z-order clustering prunes range predicates on BOTH z-columns,
    where a linear sort only tightens bounds on its leading column.
    Synthetic independent (x, y) grid so the contrast is deterministic."""
    import math

    grid = spark.range(4096).select(
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    loc_lin = _fresh("zorder_lin")
    t_lin = IcebergTable.create(loc_lin, grid)
    t_lin.append(grid)
    t_lin.rewrite_sorted(spark, ["x"], target_file_size_bytes=1024)

    loc_z = _fresh("zorder_z")
    t_z = IcebergTable.create(loc_z, grid)
    t_z.append(grid)
    snap_before = t_z.current_snapshot_id()
    assert t_z.rewrite_zorder(
        spark, ["x", "y"], bits=6, target_file_size_bytes=1024
    ) is not None

    # rows untouched: replace snapshot, changelog + incremental skip it
    assert t_z.snapshots()[-1]["summary"]["operation"] == "replace"
    assert t_z.incremental(spark, from_snapshot_id=snap_before).count() == 0
    assert t_z.changes(spark, from_snapshot_id=snap_before).count() == 0
    got = {
        (r["x"], r["y"], r["payload"]) for r in t_z.scan(spark).collect()
    }
    want = {(r["x"], r["y"], r["payload"]) for r in grid.collect()}
    assert got == want

    n_lin, n_z = len(t_lin.files()), len(t_z.files())
    assert min(n_lin, n_z) >= 8, "need real file counts for a pruning test"
    y_pred = [("y", ">=", 10), ("y", "<=", 12)]
    x_pred = [("x", ">=", 10), ("x", "<=", 12)]
    # leading-column pruning: both layouts prune x well
    assert len(t_z.files(filters=x_pred)) < n_z
    assert len(t_lin.files(filters=x_pred)) < n_lin
    # second-dimension pruning: only the z-order layout can prove
    # absence on y — the x-sorted layout's y bounds straddle everything
    frac_lin = len(t_lin.files(filters=y_pred)) / n_lin
    frac_z = len(t_z.files(filters=y_pred)) / n_z
    assert frac_lin > 0.9, f"x-sorted layout unexpectedly pruned y ({frac_lin})"
    assert frac_z < 0.6, f"z-order failed to prune y ({frac_z} of files kept)"
    # pruned scan still returns exactly the matching rows
    kept = t_z.scan(spark, filters=y_pred)
    assert kept.count() == grid.where("y between 10 and 12").count()


def test_rewrite_zorder_guards(spark):
    grid = spark.range(16).select(
        F.col("id").alias("x"), (F.col("id") * 2).alias("y")
    )
    loc = _fresh("zorder_guards")
    t = IcebergTable.create(loc, grid)
    t.append(grid)
    with pytest.raises(ValueError, match=">= 2 columns"):
        t.rewrite_zorder(spark, ["x"])
    with pytest.raises(ValueError, match="bits"):
        t.rewrite_zorder(spark, ["x", "y"], bits=0)
    with pytest.raises(ValueError, match="not in the current schema"):
        t.rewrite_zorder(spark, ["x", "zzz"])


def test_partition_evolution_per_file_spec_pruning(spark):
    """After update_partition_spec, old files keep pruning under the
    spec that wrote them, new files under the new spec, and scans stay
    exact across the boundary."""
    loc = _fresh("spec_evolution")
    a, b = _turns(spark, 0), _turns(spark, 4)
    t = IcebergTable.create(loc, a, partition_by=[("role", "identity")])
    t.append(a)
    old_files = t.files()
    assert all(int(d.get("spec-id", 0)) == 0 for d in old_files)
    # identity pruning works on the original spec
    n_user_old = len(t.files(filters=[("role", "=", "user")]))
    assert 0 < n_user_old < len(old_files)

    t.update_partition_spec([("tool", "identity")])
    t.append(b)
    all_files = t.files()
    new_files = [d for d in all_files if int(d.get("spec-id", 0)) == 1]
    assert new_files and len(all_files) > len(old_files)
    assert all("tool" in d["partition"] for d in new_files)

    # a role predicate still prunes the OLD files by partition value;
    # NEW files are judged only by column bounds (conservative)
    kept = t.files(filters=[("role", "=", "user")])
    old_kept = [d for d in kept if int(d.get("spec-id", 0)) == 0]
    assert len(old_kept) == n_user_old
    # scan correctness across mixed specs
    full = t.scan(spark)
    assert full.count() == a.count() + b.count()
    assert (
        t.scan(spark, filters=[("role", "=", "user")]).count()
        == full.where(F.col("role") == "user").count()
    )

    # compaction migrates everything to the current default spec
    t.rewrite_data_files(spark, min_input_files=2)
    assert all(int(d.get("spec-id", 0)) == 1 for d in t.files())
    assert t.scan(spark).count() == a.count() + b.count()


def test_partition_evolution_spec_and_field_id_reuse(spark):
    loc = _fresh("spec_reuse")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a, partition_by=[("role", "identity")])
    t.update_partition_spec([("tool", "identity")])
    t.update_partition_spec([("role", "identity")])  # back: no new spec
    meta = t._read_metadata()
    assert len(meta["partition-specs"]) == 2
    assert meta["default-spec-id"] == 0
    t.update_partition_spec([("role", "identity"), ("tool", "identity")])
    meta = t._read_metadata()
    both = next(s for s in meta["partition-specs"] if s["spec-id"] == 2)
    fids = {f["source-name"]: f["field-id"] for f in both["fields"]}
    assert fids == {"role": 1000, "tool": 1001}  # ids stable across specs
    with pytest.raises(ValueError, match="not in the current schema"):
        t.update_partition_spec([("nope", "identity")])
    # a column referenced by ANY historical spec refuses to drop
    t.update_partition_spec([])
    with pytest.raises(ValueError, match="partition source"):
        t.drop_column("tool")


# -- named refs: tags and branches (spec §Refs) --------------------------------


def test_tags_pin_snapshots_and_survive_expiry(spark):
    loc = _fresh("refs_tags")
    a, b, c = _turns(spark, 0), _turns(spark, 4), _turns(spark, 8)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.create_tag("training-run-1")
    t.append(b)
    t.append(c)
    # every read path takes the ref name as a snapshot id
    assert _key_set(t.scan(spark, snapshot_id="training-run-1")) == _key_set(a)
    assert {d["file_path"] for d in t.files(snapshot_id="training-run-1")} <= {
        d["file_path"] for d in t.files()
    }
    # expiry retains the pinned snapshot but drops unpinned history
    t.expire_snapshots(keep_last=1)
    remaining = {s["snapshot-id"] for s in t.snapshots()}
    assert t.refs()["training-run-1"]["snapshot-id"] in remaining
    assert len(remaining) == 2  # pinned + current tail
    assert _key_set(t.scan(spark, snapshot_id="training-run-1")) == _key_set(a)
    # dropping the ref releases it for the next expiry
    t.drop_ref("training-run-1")
    t.expire_snapshots(keep_last=1)
    assert len(t.snapshots()) == 1
    assert _key_set(t.scan(spark)) == _key_set(a) | _key_set(b) | _key_set(c)


def test_branch_moves_and_tag_is_immutable(spark):
    loc = _fresh("refs_branch")
    a, b = _turns(spark, 0), _turns(spark, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.create_branch("audit")
    t.create_tag("v1")
    t.append(b)
    assert _key_set(t.scan(spark, snapshot_id="audit")) == _key_set(a)
    t.create_branch("audit")  # advance the branch head to current
    assert _key_set(t.scan(spark, snapshot_id="audit")) == _key_set(a) | _key_set(b)
    with pytest.raises(ValueError, match="immutable"):
        t.create_tag("v1")
    with pytest.raises(ValueError, match="unknown ref"):
        t.scan(spark, snapshot_id="nope")
    with pytest.raises(ValueError, match="invalid ref name"):
        t.create_tag("latest")


def test_zorder_review_guards_and_date_column(spark):
    grid = spark.range(256).select(
        F.col("id").alias("x"),
        (F.col("id") % 16).alias("y"),
        (F.col("id") % 4).alias("z"),
        (F.col("id") % 3).alias("w"),
        F.date_add(F.lit("2024-01-01").cast("date"),
                   (F.col("id") % 30).cast("int")).alias("d"),
    )
    loc = _fresh("zorder_review")
    t = IcebergTable.create(loc, grid)
    t.append(grid)
    with pytest.raises(ValueError, match="63 interleaved bit"):
        t.rewrite_zorder(spark, ["x", "y", "z", "w"], bits=16)
    # DATE z-columns route through the timestamp cast (was a crash)
    assert t.rewrite_zorder(spark, ["d", "x"], bits=4) is not None
    assert t.scan(spark).count() == 256


def test_ref_name_and_type_guards(spark):
    loc = _fresh("refs_guards2")
    g = spark.range(4).select(F.col("id").alias("x"))
    t = IcebergTable.create(loc, g)
    t.append(g)
    with pytest.raises(ValueError, match="invalid ref name"):
        t.create_tag("20240101")  # digit-only: ambiguous with an id
    t.create_branch("audit")
    with pytest.raises(ValueError, match="cannot replace"):
        t.create_tag("audit")  # a tag must not freeze a branch pointer
    # the branch still advances afterwards
    t.append(g)
    t.create_branch("audit")
    assert t.refs()["audit"]["type"] == "branch"


def test_immutable_json_cache(tmp_path):
    """The manifest cache returns the SAME parsed object for an
    unchanged file (identity — no re-read, no re-parse) and misses when
    the file changes (size or mtime), so a hypothetically rewritten
    manifest can never be served stale."""
    import json as _json
    import os as _os

    from saber_spark.sources.iceberg_format import (
        _json_cache, _read_json_immutable,
    )

    p = str(tmp_path / "m.json")
    with open(p, "w") as f:
        _json.dump([{"status": 1}], f)
    a = _read_json_immutable(p)
    b = _read_json_immutable(p)
    assert a is b and a == [{"status": 1}]

    # same size, newer mtime -> miss (stat key changes)
    st = _os.stat(p)
    _os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    c = _read_json_immutable(p)
    assert c is not a and c == a

    # rewritten content -> fresh parse with the new content
    with open(p, "w") as f:
        _json.dump([{"status": 2}], f)
    d = _read_json_immutable(p)
    assert d == [{"status": 2}]
    assert any(k[0] == p for k in _json_cache)


# -- manifest-list column summaries (manifest-level planning skip) ------------


def _manifest_reads(monkeypatch):
    """Patch the JSON reader to record manifest reads; returns the list."""
    import saber_spark.sources.iceberg_format as fmt

    reads: list[str] = []
    orig = fmt._read_json_immutable

    def counting(path):
        if path.endswith(".manifest.json"):
            reads.append(path)
        return orig(path)

    monkeypatch.setattr(fmt, "_read_json_immutable", counting)
    return reads


def test_manifest_summary_skips_unread_manifests(spark, monkeypatch):
    """Each append's manifest-list entry carries aggregated column
    bounds; a selective filter must (a) return exactly the files the
    per-file pruning path returns and (b) read only the manifests whose
    summary can match — cold planning scales with MATCHING manifests,
    not live manifests."""
    import saber_spark.sources.iceberg_format as fmt

    loc = _fresh("mlist_summary")
    t = IcebergTable.create(loc, _turns(spark))
    for off in (0, 4, 8, 12):  # disjoint turn_idx ranges, 4 manifests
        t.append(_turns(spark, offset=off))

    flt = [("turn_idx", ">=", 9), ("turn_idx", "<=", 10)]
    # parity: same files as a run with manifest-level pruning disabled
    monkeypatch.setattr(fmt, "_manifest_pruned", lambda *a: False)
    want = {d["file_path"] for d in t.files(filters=flt)}
    monkeypatch.undo()

    reads = _manifest_reads(monkeypatch)
    fmt._json_cache.clear()
    got = t.files(filters=flt)
    assert {d["file_path"] for d in got} == want and want
    # only the offset=8 append's manifest matches [9, 10]
    assert len(reads) == 1

    # an unfiltered listing still reads everything
    fmt._json_cache.clear()
    reads.clear()
    listed = t.files()
    assert len(listed) == len({d["file_path"] for d in listed})
    assert len(reads) == 4

    # the delete-aware scan path applies the same skip (all four
    # manifests are recorded delete-free), and the rows come back right
    fmt._json_cache.clear()
    reads.clear()
    rows = t.scan(spark, filters=flt)
    assert rows.count() > 0
    assert {r["turn_idx"] for r in rows.collect()} == {9, 10}
    assert len(reads) == 1


def test_manifest_summary_backcompat_and_rename(spark, monkeypatch):
    """Manifest-list entries written BEFORE summaries existed (no
    'bounds' key) are always read, and summaries written before a
    column rename keep pruning correctly afterwards (bound keys are
    writer-time names, resolved through the same field-id name maps as
    per-file pruning)."""
    import json

    import saber_spark.sources.iceberg_format as fmt

    loc = _fresh("mlist_backcompat")
    t = IcebergTable.create(loc, _turns(spark))
    t.append(_turns(spark, offset=0))
    t.append(_turns(spark, offset=4))

    # simulate a pre-summary table: strip bounds from the CURRENT
    # snapshot's manifest list (the one planning reads)
    meta = t._read_metadata()
    mlist = meta["snapshots"][-1]["manifest-list"]
    with open(mlist) as f:
        raw = json.load(f)
    entries = [
        {k: v for k, v in m.items() if k not in ("bounds", "bounds_schema_id")}
        for m in raw
    ]
    with open(mlist, "w") as f:
        json.dump(entries, f)
    fmt._json_cache.clear()

    flt = [("turn_idx", ">=", 5)]
    reads = _manifest_reads(monkeypatch)
    got = {d["file_path"] for d in t.files(filters=flt)}
    monkeypatch.undo()
    # with no summaries every manifest is read (cannot skip), and the
    # results match the per-file pruning ground truth
    assert len(reads) == len(entries) == 2
    monkeypatch.setattr(fmt, "_manifest_pruned", lambda *a: False)
    assert got == {d["file_path"] for d in t.files(filters=flt)}
    monkeypatch.undo()

    # rename: summaries are keyed by the writer-time name ('turn_idx');
    # filtering on the NEW name must neither crash nor wrongly prune.
    # The offset=8 append writes a summarized manifest pre-rename and
    # carries the stripped entries forward as-is (mixed list: summarized
    # and summary-less entries coexist).
    t.append(_turns(spark, offset=8))
    t.rename_column("turn_idx", "idx")
    fmt._json_cache.clear()
    after = {d["file_path"] for d in t.files(filters=[("idx", ">=", 5)])}
    monkeypatch.setattr(fmt, "_manifest_pruned", lambda *a: False)
    assert after == {d["file_path"] for d in t.files(filters=[("idx", ">=", 5)])}
    monkeypatch.undo()
    assert got < after  # the new files joined the match set


def test_manifest_summary_survives_mor_and_rewrite(spark):
    """Delete-file manifests never carry data bounds (nothing to prove,
    always read), and the consolidated manifest a rewrite produces
    re-aggregates bounds over carried + new files, so post-compaction
    filters stay exact."""
    loc = _fresh("mlist_mor")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.append(_turns(spark, offset=4))
    up = spark.createDataFrame(
        src.where(F.col("turn_idx") == 1).limit(3).collect(), src.schema
    )
    t.upsert_by_key(spark, up, ["conv_id", "turn_idx"])
    want = _key_set(
        t.scan(spark).where((F.col("turn_idx") >= 4) & (F.col("turn_idx") < 8))
    )
    got = _key_set(
        t.scan(spark, filters=[("turn_idx", ">=", 4), ("turn_idx", "<", 8)])
    )
    assert got == want and want
    t.rewrite_data_files(spark)
    assert (
        _key_set(
            t.scan(spark, filters=[("turn_idx", ">=", 4), ("turn_idx", "<", 8)])
        )
        == want
    )


def test_manifest_summary_normalizes_mixed_ts_separators():
    """A manifest mixing pre-r3 'T'-separated and space-separated
    timestamp bounds must aggregate the TEMPORALLY true min/max
    (' ' < 'T' lexicographically, so raw min/max would pick a later
    space-form bound over an earlier T-form one) — otherwise
    _manifest_pruned skips manifests that hold matching rows."""
    from saber_spark.sources.iceberg_format import (
        _manifest_pruned,
        _manifest_summary,
    )

    entries = [
        {  # pre-r3 writer: 'T' separator, temporally EARLIER
            "content": 0,
            "schema-id": 0,
            "lower_bounds": {"ts": "2024-01-05T06:00:00"},
            "upper_bounds": {"ts": "2024-01-05T07:00:00"},
        },
        {  # post-r3 writer: space separator, temporally later
            "content": 0,
            "schema-id": 0,
            "lower_bounds": {"ts": "2024-01-05 12:00:00"},
            "upper_bounds": {"ts": "2024-01-05 13:00:00"},
        },
    ]
    summary = _manifest_summary(entries)
    assert summary["bounds"]["ts"] == [
        "2024-01-05 06:00:00",
        "2024-01-05 13:00:00",
    ]
    mentry = {**summary}
    # rows in [06:00, 07:00] DO match ts < 10:00 — must NOT prune
    assert not _manifest_pruned(
        mentry, [("ts", "<", "2024-01-05 10:00:00")], None
    )
    # and a filter provably outside both files still prunes
    assert _manifest_pruned(
        mentry, [("ts", "<", "2024-01-05 05:00:00")], None
    )


def test_identity_partition_prune_bool_and_numeric_literals():
    """Partition values are written via Spark's string cast ('true',
    '5'); pruning with Python literals True / 5.0 must compare in the
    value domain — str(True)='True' and str(5.0)='5.0' would wrongly
    prune EVERY matching file."""
    from saber_spark.sources.iceberg_format import _pruned

    spec = {"flag": {"name": "flag", "transform": "identity"},
            "n": {"name": "n", "transform": "identity"}}
    f_true = {"partition": {"flag": "true"}, "schema-id": 0,
              "lower_bounds": {}, "upper_bounds": {}}
    f_n5 = {"partition": {"n": "5"}, "schema-id": 0,
            "lower_bounds": {}, "upper_bounds": {}}
    assert not _pruned(f_true, [("flag", "=", True)], spec)
    assert _pruned(f_true, [("flag", "=", False)], spec)
    assert not _pruned(f_n5, [("n", "=", 5.0)], spec)
    assert not _pruned(f_n5, [("n", "=", 5)], spec)
    assert _pruned(f_n5, [("n", "=", 6)], spec)


def test_incremental_range_with_expired_snapshot_raises(spark):
    """A reader checkpointed before snapshots that expire_snapshots
    later removes must FAIL on its next batch, not silently skip the
    expired appends (their rows are unrecoverable from the range)."""
    loc = _fresh("expire_gap")
    t = IcebergTable.create(loc, _turns(spark))
    t.append(_turns(spark, 0))   # seq 1
    t.append(_turns(spark, 4))   # seq 2
    t.append(_turns(spark, 8))   # seq 3
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        t.appended_files(1, 3)


def test_incremental_resolves_renamed_columns_by_field_id(spark):
    """incremental() must agree with scan() on files written before a
    rename — a name-keyed parquet read under the current schema would
    silently null the renamed column for pre-rename files."""
    loc = _fresh("incr_rename")
    a = _turns(spark, 0)
    t = IcebergTable.create(loc, a)
    s0 = t.append(a)["current-snapshot-id"]
    t.rename_column("text", "body")
    got = t.incremental(spark, None)  # all appends
    assert got.where(F.col("body").isNull()).count() == 0
    assert {r["body"] for r in got.collect()} == {
        r["text"] for r in a.collect()
    }
    assert t.incremental(spark, s0).count() == 0  # nothing after s0
