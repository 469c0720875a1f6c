"""The ``saber_iceberg`` Python Data Source (sources/iceberg_datasource.py):
batch reads through Spark's planner with manifest-level filter pushdown,
and the snapshot-range streaming source — incremental micro-batches,
exactly-once restart from checkpoint, and the rate-limit knob.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from saber_spark.sources.iceberg_datasource import (
    IcebergBatchReader,
    IcebergDataSource,
    register_iceberg_source,
)
from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.plans.saber_queries import transcripts
from tests.conftest import SF_SMOKE

TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "iceberg_ds",
)


def _fresh(name: str) -> str:
    path = os.path.join(TMP, name)
    shutil.rmtree(path, ignore_errors=True)
    return path


def _turns(spark, lo=0, hi=4):
    return (
        transcripts(spark, SF_SMOKE)
        .where((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def _keys(df):
    return {
        (r["conv_id"], r["turn_idx"])
        for r in df.select("conv_id", "turn_idx").collect()
    }


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_iceberg_source(spark)


def _read(spark, loc, **opts):
    r = spark.read.format("saber_iceberg").option("location", loc)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


# -- batch reads -------------------------------------------------------------


def test_batch_read_matches_scan(spark):
    loc = _fresh("batch")
    src = _turns(spark)
    t = IcebergTable.create(loc, src, partition_by=[("role", "identity")])
    t.append(src)
    got = _read(spark, loc)
    assert got.schema == t.scan(spark).schema
    assert _keys(got) == _keys(src)
    # values survive the arrow round trip (timestamps included)
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in src.collect()}
    assert a == b


def test_batch_read_time_travel_option(spark):
    loc = _fresh("travel")
    first = _turns(spark, 0, 2)
    t = IcebergTable.create(loc, first)
    t.append(first)
    pinned = t.current_snapshot_id()
    t.append(_turns(spark, 2, 4))
    assert _keys(_read(spark, loc)) == _keys(_turns(spark, 0, 4))
    assert _keys(_read(spark, loc, **{"snapshot-id": pinned})) == _keys(first)
    # named refs resolve through the same option
    t.create_tag("v1", pinned)
    assert _keys(_read(spark, loc, **{"snapshot-id": "v1"})) == _keys(first)


def test_batch_filter_pushdown_prunes_files(spark):
    """A role = 'user' predicate must (a) return correct rows through the
    planner and (b) schedule only the matching partition's files."""
    loc = _fresh("pushdown")
    src = _turns(spark)
    t = IcebergTable.create(loc, src, partition_by=[("role", "identity")])
    t.append(src)

    got = _read(spark, loc).where(F.col("role") == "user")
    want = src.where(F.col("role") == "user")
    assert _keys(got) == _keys(want)

    # unit-level: the reader's partitions() honors the pushed filter
    reader = IcebergBatchReader(loc, {}, src.schema)
    residual = list(reader.pushFilters([EqualTo(("role",), "user")]))
    assert len(residual) == 1  # stays residual (superset guarantee)
    pruned = len(reader.partitions())
    total = len(IcebergBatchReader(loc, {}, src.schema).partitions())
    assert 0 < pruned < total

    # column-bounds pruning on an unpartitioned column
    reader2 = IcebergBatchReader(loc, {}, src.schema)
    list(reader2.pushFilters([GreaterThan(("turn_idx",), 10_000)]))
    assert len(reader2.partitions()) == 0  # bounds prove no file matches


# -- streaming reads ---------------------------------------------------------


def _start_tail(spark, loc, ckpt, name):
    return (
        spark.readStream.format("saber_iceberg")
        .option("location", loc)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_stream_incremental_and_restart_exactly_once(spark):
    loc = _fresh("stream")
    ckpt = _fresh("stream_ckpt")
    out = _fresh("stream_out")
    first = _turns(spark, 0, 2)
    t = IcebergTable.create(loc, first)
    t.append(first)

    def tail():
        # parquet sink: checkpoint-recoverable (memory sink is not), and
        # any wrongly replayed snapshot would surface as duplicate rows
        return (
            spark.readStream.format("saber_iceberg")
            .option("location", loc)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = tail()
    q.processAllAvailable()
    assert _keys(spark.read.parquet(out)) == _keys(first)

    # rows land incrementally while the stream runs
    t.append(_turns(spark, 2, 3))
    q.processAllAvailable()
    assert _keys(spark.read.parquet(out)) == _keys(_turns(spark, 0, 3))
    q.stop()

    # offline append, then restart from the same checkpoint: only the
    # unseen snapshot is read — nothing duplicated, nothing lost
    t.append(_turns(spark, 3, 4))
    q2 = tail()
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out)
    assert _keys(got) == _keys(_turns(spark, 0, 4))
    assert got.count() == _turns(spark, 0, 4).count()  # no duplicates


def test_stream_ignores_compaction_snapshots(spark):
    """rewrite_data_files must be invisible to a tail — only *append*
    snapshots carry new rows (replace would double-read everything)."""
    loc = _fresh("stream_compact")
    src = _turns(spark, 0, 2)
    t = IcebergTable.create(loc, src)
    for lo in (0, 1):
        t.append(_turns(spark, lo, lo + 1))

    name = f"ice_nc_{uuid.uuid4().hex[:8]}"
    q = _start_tail(spark, loc, _fresh("nc_ckpt"), name)
    q.processAllAvailable()
    n0 = spark.table(name).count()
    t.rewrite_data_files(spark, min_input_files=2)
    q.processAllAvailable()
    assert spark.table(name).count() == n0
    q.stop()
    assert n0 == src.count()


def test_stream_starting_offsets_latest_skips_history(spark):
    """starting-offsets=latest: a fresh tail sees only snapshots
    committed after it started."""
    loc = _fresh("stream_latest")
    t = IcebergTable.create(loc, _turns(spark))
    t.append(_turns(spark, 0, 2))  # history the tail must skip

    name = f"ice_latest_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("saber_iceberg")
        .option("location", loc)
        .option("starting-offsets", "latest")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", _fresh("latest_ckpt"))
        .start()
    )
    q.processAllAvailable()
    assert spark.table(name).count() == 0
    t.append(_turns(spark, 2, 3))
    q.processAllAvailable()
    q.stop()
    assert _keys(spark.table(name)) == _keys(_turns(spark, 2, 3))


# -- review regressions (r3) --------------------------------------------------


def test_batch_read_fully_pruned_returns_zero_rows(spark):
    """partitions() == [] makes pyspark call read(None): an empty table
    and a fully-pruned planner read must both return 0 rows, not crash."""
    loc = _fresh("empty_read")
    src = _turns(spark)
    IcebergTable.create(loc, src)  # created, never appended
    assert _read(spark, loc).count() == 0

    loc2 = _fresh("pruned_read")
    t = IcebergTable.create(loc2, src)
    t.append(src)
    got = _read(spark, loc2).where(F.col("turn_idx") > 10_000)
    assert got.count() == 0  # bounds prune EVERY file; filter is pushed


def test_batch_read_schema_evolved_table(spark):
    """Files written before add_column must read back with nulls through
    the planner-integrated source, like IcebergTable.scan does."""
    loc = _fresh("evolve_read")
    src = _turns(spark, 0, 2)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.add_column("quality", "double")
    got = _read(spark, loc)
    assert "quality" in got.columns
    rows = got.select("quality").distinct().collect()
    assert [r["quality"] for r in rows] == [None]
    assert _keys(got) == _keys(src)


def test_stream_raises_on_overwrite_snapshot(spark):
    """A MERGE/overwrite snapshot inside a streamed range must fail
    loudly (real Iceberg incremental-scan semantics), never be silently
    skipped — a silent skip is silent data loss."""
    loc = _fresh("stream_overwrite")
    src = _turns(spark, 0, 2)
    t = IcebergTable.create(loc, src)
    t.append(src)
    t.merge_into(spark, _turns(spark, 1, 3), ["conv_id", "turn_idx"])
    with pytest.raises(ValueError, match="not 'append'"):
        t.appended_file_paths(0, 10**9)


def _cdc_events(df):
    return {
        (r["conv_id"], r["turn_idx"], r["_change_type"], r["_commit_snapshot_id"])
        for r in df.select(
            "conv_id", "turn_idx", "_change_type", "_commit_snapshot_id"
        ).collect()
    }


def test_changelog_stream_matches_batch_changes(spark):
    """mode='changelog': the streamed CDC events over a mixed history
    (appends, MoR delete, COW delete, merge, compaction) equal the batch
    IcebergTable.changes() over the same snapshot range — including
    incremental arrival while the stream runs and exactly-once restart
    from the checkpoint."""
    from saber_spark.streaming.jobs import read_iceberg_changelog_stream

    loc = _fresh("cdc_stream")
    ckpt = _fresh("cdc_ckpt")
    out = _fresh("cdc_out")
    first = _turns(spark, 0, 4)
    t = IcebergTable.create(loc, first)
    t.append(first)
    t.delete_where(spark, [("turn_idx", "=", 2)], mode="merge-on-read")

    def tail():
        return (
            read_iceberg_changelog_stream(spark, loc)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = tail()
    q.processAllAvailable()
    got = _cdc_events(spark.read.parquet(out))
    assert got == _cdc_events(t.changes(spark))
    inserts = {g for g in got if g[2] == "insert"}
    deletes = {g for g in got if g[2] == "delete"}
    assert len(inserts) == first.count()
    assert deletes and all(g[1] == 2 for g in deletes)

    # more history lands while the stream runs: COW delete + merge +
    # compaction (compaction must emit nothing)
    t.delete_where(spark, [("turn_idx", "<=", 0)], mode="copy-on-write")
    upsert = _turns(spark, 3, 4).withColumn(
        "text", F.concat(F.lit("edited: "), F.col("text"))
    )
    t.merge_into(spark, upsert, ["conv_id", "turn_idx"])
    t.rewrite_data_files(spark)
    q.processAllAvailable()
    q.stop()
    got = _cdc_events(spark.read.parquet(out))
    assert got == _cdc_events(t.changes(spark))

    # offline append + restart from checkpoint: only the unseen snapshot
    # streams — nothing duplicated, nothing lost (exactly-once)
    more = _turns(spark, 4, 5)
    t.append(more)
    q2 = tail()
    q2.processAllAvailable()
    q2.stop()
    final = spark.read.parquet(out)
    assert _cdc_events(final) == _cdc_events(t.changes(spark))
    assert final.count() == t.changes(spark).count()  # multiset, no dups


def test_changelog_mode_guards(spark):
    loc = _fresh("cdc_guards")
    first = _turns(spark, 0, 2)
    t = IcebergTable.create(loc, first)
    t.append(first)
    register_iceberg_source(spark)
    with pytest.raises(Exception, match="changelog"):
        spark.read.format("saber_iceberg").option("location", loc).option(
            "mode", "changelog"
        ).load().collect()
    with pytest.raises(Exception, match="unknown mode"):
        spark.read.format("saber_iceberg").option("location", loc).option(
            "mode", "zzz"
        ).load().collect()


def test_pushdown_after_rename_chain_resolves_by_field_id(spark):
    """Rename chain reusing a name (text->body, then tool->text): the
    DataSource's pruning — manifest-level AND per-file — must translate
    the pushed filter on the CURRENT 'text' (the former tool field) to
    the writer-time 'tool' bounds. A name-keyed lookup collides with the
    stale original-text bounds and silently drops matching files."""
    loc = _fresh("ds_rename_chain")
    src = _turns(spark)
    t = IcebergTable.create(loc, src)
    t.append(src)
    tool_val = (
        src.where(F.col("tool") != "").orderBy("tool").collect()[0]["tool"]
    )
    want = {
        (r["conv_id"], r["turn_idx"])
        for r in src.where(F.col("tool") == tool_val).collect()
    }
    assert want
    t.rename_column("text", "body")
    t.rename_column("tool", "text")
    got = _read(spark, loc).where(F.col("text") == tool_val)
    assert _keys(got) == want
