"""Measure what the CDC read paths cost relative to full scans: on a
2M-turn Iceberg transcript table, (a) batch ``changes()`` over a
targeted merge-on-read delete, (b) draining the same history through
the ``mode='changelog'`` stream, vs (c) the full snapshot scan a
consumer would otherwise re-read. The point at 100 TB: CDC cost is
proportional to the CHANGED files (here one position-delete resolution
+ the appended files), never to table size.

Curated numbers live in BENCH/ICEBERG.md §9.
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from saber_spark.session import get_spark
from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.sources.transcripts import synthesize_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOC = os.path.join(REPO, ".tmp", "iceberg_cdc_bench")
OUT = os.path.join(REPO, ".tmp", "iceberg_cdc_bench_out")
CKPT = os.path.join(REPO, ".tmp", "iceberg_cdc_bench_ckpt")


def main() -> None:
    spark = get_spark(
        "iceberg_cdc_bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    for d in (LOC, OUT, CKPT):
        shutil.rmtree(d, ignore_errors=True)
    src = synthesize_transcripts(
        spark, n_turns=2_000_000, n_convs=20_000, seed=13, partitions=32
    ).localCheckpoint()
    table = IcebergTable.create(LOC, src)
    for i in range(8):  # 8 append snapshots, conv-hash chunked
        table.append(src.where(F.crc32(F.col("conv_id")) % 8 == i).repartition(4))
    base_snap = table.current_snapshot_id()

    # targeted MoR delete: one conversation's turns (~100 rows of 2M)
    t0 = time.perf_counter()
    table.delete_where(
        spark, [("conv_id", "=", "conv-7")], mode="merge-on-read"
    )
    mor_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_full = table.scan(spark).count()
    full_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_cdc = table.changes(spark, from_snapshot_id=base_snap).count()
    cdc_sec = round(time.perf_counter() - t0, 3)
    print(
        {
            "rows": n_full,
            "mor_delete_sec": mor_sec,
            "full_scan_sec": full_sec,
            "batch_changes_rows": n_cdc,
            "batch_changes_sec": cdc_sec,
        },
        flush=True,
    )

    # changelog stream: drain the ENTIRE history (8 appends + delete)
    from saber_spark.streaming.jobs import read_iceberg_changelog_stream

    t0 = time.perf_counter()
    q = (
        read_iceberg_changelog_stream(spark, LOC)
        .writeStream.format("parquet")
        .option("path", OUT)
        .option("checkpointLocation", CKPT)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_sec = round(time.perf_counter() - t0, 3)
    got = spark.read.parquet(OUT)
    n_ins = got.where(F.col("_change_type") == "insert").count()
    n_del = got.where(F.col("_change_type") == "delete").count()
    print(
        {
            "stream_drain_sec": stream_sec,
            "stream_inserts": n_ins,
            "stream_deletes": n_del,
            "events_per_sec": int((n_ins + n_del) / stream_sec),
        },
        flush=True,
    )
    assert n_del == n_cdc, "stream deletes must equal batch changes()"


if __name__ == "__main__":
    main()
