"""Equality-delete files (spec v2 content=2) and the merge-on-read
upsert built on them (sources/iceberg_format.py::delete_by_equality /
upsert_by_key): value-level DELETE semantics with data-sequence
ordering (later-appended rows with matching keys survive), null-safe
tuple matching, one-snapshot atomic upserts equal to copy-on-write
MERGE, compaction folding, and the loud guards on paths that do not
fold equality deletes yet."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "iceberg_eq",
)

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _fresh(name: str) -> str:
    path = os.path.join(TMP, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _turns(spark, lo=0, hi=4):
    return (
        transcripts(spark, SF_SMOKE)
        .where((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
        .select(*COLS)
    )


def _keys(df):
    return {
        (r["conv_id"], r["turn_idx"])
        for r in df.select("conv_id", "turn_idx").collect()
    }


def test_equality_delete_respects_data_sequence(spark):
    loc = _fresh("eq_seq")
    a = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    # delete by VALUE: every (conv_id, turn_idx=1) tuple
    dels = a.where(F.col("turn_idx") == 1).select("conv_id", "turn_idx")
    t.delete_by_equality(spark, dels)
    got = t.scan(spark)
    assert _keys(got) == _keys(a.where(F.col("turn_idx") != 1))
    # a LATER append of rows with the SAME keys is untouched — the
    # delete applies only to strictly lower data sequences
    t.append(a.where(F.col("turn_idx") == 1))
    assert _keys(t.scan(spark)) == _keys(a)
    assert t.scan(spark).count() == a.count()
    # the older copies stay dead: no duplicates for the re-added keys
    assert (
        t.scan(spark).groupBy("conv_id", "turn_idx").count()
        .where(F.col("count") > 1).count() == 0
    )
    assert len(t.equality_delete_files()) == 1


def test_equality_delete_is_null_safe(spark):
    loc = _fresh("eq_null")
    rows = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id long, grp string"
    )
    t = IcebergTable.create(loc, rows)
    t.append(rows)
    t.delete_by_equality(
        spark, spark.createDataFrame([(None,)], "grp string"), ["grp"]
    )
    left = {r["id"] for r in t.scan(spark).collect()}
    assert left == {1, 3}  # null tuples match null rows (eqNullSafe)


def test_upsert_by_key_equals_cow_merge(spark):
    base = _turns(spark, 0, 6)
    edit1 = _turns(spark, 2, 4).withColumn(
        "text", F.concat(F.lit("edit1: "), F.col("text"))
    )
    edit2 = _turns(spark, 3, 5).withColumn(
        "text", F.concat(F.lit("edit2: "), F.col("text"))
    )

    cow_loc, mor_loc = _fresh("ups_cow"), _fresh("ups_mor")
    cow = IcebergTable.create(cow_loc, base)
    cow.append(base)
    mor = IcebergTable.create(mor_loc, base)
    mor.append(base)
    for up in (edit1, edit2):  # repeated upserts, overlapping keys
        cow.merge_into(spark, up, ["conv_id", "turn_idx"])
        mor.upsert_by_key(spark, up, ["conv_id", "turn_idx"])
        a = {tuple(r) for r in cow.scan(spark).select(*COLS).collect()}
        b = {tuple(r) for r in mor.scan(spark).select(*COLS).collect()}
        assert a == b
        assert mor.scan(spark).count() == cow.scan(spark).count()
    # the MoR path never rewrote a data file: one snapshot per upsert,
    # all original files still live
    assert len(mor.equality_delete_files()) == 2
    # atomic: each upsert is ONE snapshot
    assert len(mor.snapshots()) == 3  # append + 2 upserts


def test_compaction_folds_equality_deletes(spark):
    loc = _fresh("eq_fold")
    a = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    up = a.where(F.col("turn_idx") == 2).withColumn(
        "text", F.concat(F.lit("edited: "), F.col("text"))
    )
    t.upsert_by_key(spark, up, ["conv_id", "turn_idx"])
    before = {tuple(r) for r in t.scan(spark).select(*COLS).collect()}
    assert t.equality_delete_files()
    t.rewrite_data_files(spark, min_input_files=1)
    assert t.equality_delete_files() == []  # applied and retired
    assert {tuple(r) for r in t.scan(spark).select(*COLS).collect()} == before
    # with the deletes folded, the per-file Arrow DataSource reads again
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    ds = (
        spark.read.format("saber_iceberg").option("location", loc).load()
    )
    assert {tuple(r) for r in ds.select(*COLS).collect()} == before


def test_equality_delete_survives_rename_by_field_id(spark):
    loc = _fresh("eq_rename")
    a = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.delete_by_equality(
        spark, spark.createDataFrame([("code",)], "tool string"), ["tool"]
    )
    want = _keys(a.where(F.coalesce(F.col("tool"), F.lit("")) != "code"))
    assert _keys(t.scan(spark)) == want
    t.rename_column("tool", "tool_name")  # delete resolves by field id
    assert _keys(t.scan(spark)) == want
    with pytest.raises(ValueError, match="equality-delete"):
        t.drop_column("tool_name")


def test_equality_delete_changelog_and_guards(spark):
    loc = _fresh("eq_guards")
    a = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    snap = t.current_snapshot_id()
    t.delete_by_equality(
        spark, spark.createDataFrame([("user",)], "role string"), ["role"]
    )
    # the CDC read RESOLVES equality deletes: exactly the matched rows
    # announce as delete events
    chg = t.changes(spark, from_snapshot_id=snap)
    recs = chg.collect()
    assert recs and all(r["_change_type"] == "delete" for r in recs)
    assert {(r["conv_id"], r["turn_idx"]) for r in recs} == _keys(
        a.where(F.col("role") == "user")
    )
    # a no-op (zero-tuple) equality delete commits nothing
    n_snaps = len(t.snapshots())
    t.delete_by_equality(
        spark,
        spark.createDataFrame([("zzz",)], "role string").where(F.lit(False)),
        ["role"],
    )
    assert len(t.snapshots()) == n_snaps
    # the per-file Arrow batch reader still refuses (scan() is the MoR view)
    from saber_spark.sources.iceberg_datasource import register_iceberg_source

    register_iceberg_source(spark)
    with pytest.raises(Exception, match="equality-delete"):
        spark.read.format("saber_iceberg").option("location", loc).load().collect()
    with pytest.raises(ValueError, match="not in the\n?.*schema|not in the current schema"):
        t.delete_by_equality(
            spark, spark.createDataFrame([(1,)], "nope int"), ["nope"]
        )


def test_mor_merge_sink_matches_cow_sink(spark):
    """merge_mode='mor': the update-mode sink lands each batch as one
    row-delta snapshot (new rows + equality-delete of their keys) and
    the committed view equals the COW MERGE sink's — at O(batch) write
    cost per trigger, with compaction folding the tuples away."""
    import os as _os

    from saber_spark.operators.aggregation import AggSpec
    from saber_spark.operators.windows import RANGE, WindowDef
    from saber_spark.streaming.iceberg_sink import ExactlyOnceIcebergSink
    from saber_spark.streaming.jobs import (
        read_transcript_stream,
        streaming_windowed_aggregate,
    )
    import pyspark.sql.types as T
    from saber_spark.streaming.jobs import TRANSCRIPT_SCHEMA

    # stage a chunked stream dir (reuse the test_streaming layout)
    src = _fresh("mor_sink_src")
    t = transcripts(spark, SF_SMOKE).withColumn(
        "text_len", F.length("text").cast("long")
    )
    for k in range(4):
        t.where(F.crc32(F.col("conv_id")) % 4 == k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(src, f"chunk={k:03d}"))
    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField("text_len", T.LongType())]
    )

    def agg_stream():
        stream = read_transcript_stream(
            spark, f"{src}/chunk=*", max_files_per_trigger=1, schema=schema
        )
        return streaming_windowed_aggregate(
            stream.where(F.col("role") == "assistant"),
            WindowDef(RANGE, 600),
            [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
            watermark="0 seconds",
        )

    out = {}
    for mode in ("cow", "mor"):
        loc, ckpt = _fresh(f"mor_sink_{mode}"), _fresh(f"mor_sink_ck_{mode}")
        agg = agg_stream()
        table = IcebergTable.create(loc, agg)
        sink = ExactlyOnceIcebergSink(
            table, ckpt, f"ysb_{mode}", coalesce=1,
            merge_keys=["window_start", "window_end"], merge_mode=mode,
        )
        q = sink.start(agg, output_mode="update")
        q.processAllAvailable()
        q.stop()
        out[mode] = (
            table,
            {
                (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
                for r in sink.read_committed(spark).collect()
            },
        )
    assert out["cow"][1] == out["mor"][1] and len(out["mor"][1]) > 0
    mor_table = out["mor"][0]
    # exactly one row per key despite per-batch re-emission
    assert (
        mor_table.scan(spark).groupBy("window_start", "window_end").count()
        .where(F.col("count") > 1).count() == 0
    )
    assert mor_table.equality_delete_files()  # row-delta commits happened
    before = out["mor"][1]
    mor_table.rewrite_data_files(spark, min_input_files=1)
    assert mor_table.equality_delete_files() == []
    assert {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in mor_table.scan(spark).collect()
    } == before


def test_changelog_stream_resolves_equality_deletes(spark):
    """The mode='changelog' stream announces equality-delete history
    identically to batch changes(): upserts and value deletes resolve to
    row events, rows dead by value never re-announce, and the MV stays
    reconstructable."""
    from saber_spark.streaming.jobs import read_iceberg_changelog_stream

    loc, ckpt, out = (
        _fresh("eq_cdc_src"), _fresh("eq_cdc_ckpt"), _fresh("eq_cdc_out"),
    )
    a = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    t.delete_by_equality(
        spark, spark.createDataFrame([("code",)], "tool string"), ["tool"]
    )
    up = a.where(F.col("turn_idx") == 1).withColumn(
        "text", F.concat(F.lit("edited: "), F.col("text"))
    )
    t.upsert_by_key(spark, up, ["conv_id", "turn_idx"])
    t.delete_where(spark, [("turn_idx", "=", 3)], mode="merge-on-read")

    q = (
        read_iceberg_changelog_stream(spark, loc)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def events(df):
        return sorted(
            (
                r["conv_id"], r["turn_idx"], r["text"],
                r["_change_type"], r["_commit_snapshot_id"],
            )
            for r in df.select(
                "conv_id", "turn_idx", "text",
                "_change_type", "_commit_snapshot_id",
            ).collect()
        )

    got = events(spark.read.parquet(out))
    want = events(t.changes(spark))
    assert got == want and len(got) > 0
    # replaying the stream's events reconstructs the current snapshot
    from collections import Counter

    folded: Counter = Counter()
    for r in spark.read.parquet(out).collect():
        key = (r["conv_id"], r["turn_idx"], r["text"])
        if r["_change_type"] == "insert":
            folded[key] += 1
        else:
            folded[key] -= 1
            assert folded[key] >= 0, key
    now = Counter(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in t.scan(spark).select("conv_id", "turn_idx", "text").collect()
    )
    assert +folded == now


def test_compact_if_needed_thresholds(spark):
    """The auto-compaction trigger is a no-op (None, metadata-only check)
    while accumulated delete entries sit under BOTH thresholds, fires a
    real rewrite_data_files once the delete-file count exceeds
    max_delete_files, and afterwards the deletes are retired so the next
    check is a no-op again — the read-amplification bound for MoR
    upsert loops."""
    loc = _fresh("eq_trigger")
    a = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, a)
    t.append(a)
    # three MoR upserts = three accumulated equality-delete files
    for i in range(3):
        up = a.where(F.col("turn_idx") == i).withColumn(
            "text", F.concat(F.lit(f"edit{i}: "), F.col("text"))
        )
        t.upsert_by_key(spark, up, ["conv_id", "turn_idx"])
    want = {tuple(r) for r in t.scan(spark).select(*COLS).collect()}
    assert len(t.equality_delete_files()) == 3

    # under both thresholds: no-op, deletes still accumulated
    assert t.compact_if_needed(spark, max_delete_files=8) is None
    assert len(t.equality_delete_files()) == 3

    # delete-file threshold exceeded: compacts, retires the deletes
    assert t.compact_if_needed(
        spark, max_delete_files=2, min_input_files=1
    ) is not None
    assert t.equality_delete_files() == []
    assert {tuple(r) for r in t.scan(spark).select(*COLS).collect()} == want

    # post-compaction: under thresholds again — the steady state is free
    assert t.compact_if_needed(spark, max_delete_files=2) is None

    # row-count threshold path: 0 rows allowed -> any delete tuple fires
    up = a.where(F.col("turn_idx") == 3).withColumn(
        "text", F.concat(F.lit("edit3: "), F.col("text"))
    )
    t.upsert_by_key(spark, up, ["conv_id", "turn_idx"])
    assert t.compact_if_needed(
        spark, max_delete_files=10**6, max_delete_rows=0, min_input_files=1
    ) is not None
    assert t.equality_delete_files() == []


def test_mor_sink_auto_compact_bounds_delete_accumulation(spark):
    """The sink's auto_compact policy keeps MoR read amplification
    bounded WHILE streaming: with max_delete_files=1 every second batch
    trips the trigger, so the 4-batch run ends with zero live equality
    deletes (batch 2 and batch 4 each compact away the accumulated
    pair) and the committed view equals the batch aggregate. Chunks are
    CHRONOLOGICAL (unlike the hash-chunked re-emission test above):
    time-ordered arrival means earlier batches' data files stay older
    than later deletes, so the tuples genuinely accumulate until the
    trigger fires — the steady-state shape of a MoR upsert stream."""
    import os as _os

    from saber_spark.operators.aggregation import AggSpec
    from saber_spark.operators.windows import RANGE, WindowDef
    from saber_spark.streaming.iceberg_sink import ExactlyOnceIcebergSink
    from saber_spark.streaming.jobs import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        streaming_windowed_aggregate,
    )
    import pyspark.sql.types as T

    src = _fresh("mor_ac_src")
    t = transcripts(spark, SF_SMOKE).withColumn(
        "text_len", F.length("text").cast("long")
    )
    lo, hi = t.select(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    for k in range(4):
        cond = F.col("ts") >= F.lit(lo + k * span)
        if k < 3:
            cond = cond & (F.col("ts") < F.lit(lo + (k + 1) * span))
        t.where(cond).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(src, f"chunk={k:03d}")
        )
    schema = T.StructType(
        TRANSCRIPT_SCHEMA.fields + [T.StructField("text_len", T.LongType())]
    )

    stream = read_transcript_stream(
        spark, f"{src}/chunk=*", max_files_per_trigger=1, schema=schema
    )
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant"),
        WindowDef(RANGE, 600),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
        watermark="0 seconds",
    )
    loc, ckpt = _fresh("mor_ac_table"), _fresh("mor_ac_ck")
    table = IcebergTable.create(loc, agg)
    sink = ExactlyOnceIcebergSink(
        table, ckpt, "ysb_mor_ac", coalesce=1,
        merge_keys=["window_start", "window_end"], merge_mode="mor",
        auto_compact={"max_delete_files": 1, "min_input_files": 1},
    )
    q = sink.start(agg, output_mode="update")
    q.processAllAvailable()
    q.stop()

    assert table.equality_delete_files() == []  # compacted in-stream
    got = {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in sink.read_committed(spark).collect()
    }
    want = {
        (r["window_start"], r["window_end"], r["n_turns"], r["sum_len"])
        for r in t.where(F.col("role") == "assistant")
        .groupBy(
            F.window(F.col("ts").cast("timestamp"), "600 seconds").alias("w")
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("text_len").alias("sum_len"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            F.col("w.end").cast("long").alias("window_end"),
            "n_turns", "sum_len",
        )
        .collect()
    }
    assert got == want and len(got) > 0
