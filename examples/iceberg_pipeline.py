"""End-to-end Iceberg pipeline on the from-scratch table format — the
full life of a transcripts table, runnable in this sandbox (no jars):

    python examples/iceberg_pipeline.py [--sf-dir /root/testdata/sf0.001]

1. batch-ingest the transcripts into a role-partitioned Iceberg table
   (three chronological appends = three snapshots);
2. stream FROM that table (saber_iceberg streaming source) through the
   YSB windowed aggregate INTO a second table via the exactly-once
   snapshot-per-batch sink — the full north-rule loop;
3. tail the results table with incremental scans (snapshot-range reads —
   what a downstream consumer polls);
4. GDPR-style targeted delete (copy-on-write, only matching files
   rewritten) and a MERGE upsert correction;
5. compact small files and expire old snapshots, then show time travel
   still works for the retained history.

The jar-backed production twin of this script is submit_job.py; this one
exercises `sources/iceberg_format.py` directly.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from saber_spark.operators.aggregation import AggSpec
from saber_spark.operators.windows import RANGE, WindowDef
from saber_spark.plans.saber_queries import transcripts
from saber_spark.session import get_spark
from saber_spark.sources.iceberg_format import IcebergTable
from saber_spark.streaming.iceberg_sink import ExactlyOnceIcebergSink
from saber_spark.streaming.jobs import (
    read_iceberg_stream,
    streaming_windowed_aggregate,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--workdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp", "iceberg_pipeline"))
    args = ap.parse_args()
    shutil.rmtree(args.workdir, ignore_errors=True)
    spark = get_spark(app_name="iceberg_pipeline", cpus=8, shuffle_partitions=8)

    # 1. batch ingest, partitioned by role, in chronological thirds
    #    (each append = one snapshot = one micro-batch for the tail below)
    turns = transcripts(spark, args.sf_dir)
    raw = IcebergTable.create(
        os.path.join(args.workdir, "transcripts"), turns,
        partition_by=[("role", "identity")])
    lo, hi = turns.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    for k in range(3):
        cond = F.col("ts") >= F.lit(lo + k * span)
        if k < 2:
            cond &= F.col("ts") < F.lit(lo + (k + 1) * span)
        raw.append(turns.where(cond))
    print(f"[ingest] {raw.scan(spark).count():,} turns, "
          f"{len(raw.files())} files, {len(raw.snapshots())} snapshots")

    # 2. stream FROM the Iceberg table -> exactly-once sink (the full
    #    loop: each ingest snapshot replays as a micro-batch through the
    #    saber_iceberg streaming source)
    stream = read_iceberg_stream(
        spark, os.path.join(args.workdir, "transcripts"))
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant")
        .withColumn("text_len", F.length("text").cast("long")),
        WindowDef(RANGE, 600),
        [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")],
        watermark="0 seconds")
    results = IcebergTable.create(os.path.join(args.workdir, "ysb_results"), agg)
    sink = ExactlyOnceIcebergSink(
        results, os.path.join(args.workdir, "ckpt"), "ysb",
        event_ts_col="window_end", coalesce=1)
    q = sink.start(agg, output_mode="append")
    q.processAllAvailable()
    q.stop()
    lineage = sink.lineage(spark)
    print(f"[stream] {results.scan(spark).count():,} windows over "
          f"{lineage.count()} exactly-once snapshots; p50 commit latency "
          f"{lineage.agg(F.min('p50_ms')).collect()[0][0]:.0f} ms (replay)")

    # 3. incremental tail: what arrived after the 2nd snapshot
    snaps = results.snapshots()
    since = snaps[0]["snapshot-id"]
    inc = results.incremental(spark, from_snapshot_id=since)
    print(f"[tail] {inc.count():,} new result rows after snapshot {since}")

    # 4. targeted delete + MERGE correction on the raw table
    victim = turns.select("conv_id").first()["conv_id"]
    raw.delete_where(spark, [("conv_id", "=", victim)])
    print(f"[delete] conv {victim!r} purged; "
          f"{raw.scan(spark).count():,} turns remain "
          f"(snapshot op={raw.snapshots()[-1]['summary']['operation']})")
    correction = (turns.where(F.col("turn_idx") == 0).limit(1)
                  .withColumn("text", F.lit("[corrected]")))
    raw.merge_into(spark, correction, ["conv_id", "turn_idx"])
    print(f"[merge] corrected rows: "
          f"{raw.scan(spark).where(F.col('text') == '[corrected]').count()}")

    # 5. maintenance: compact, expire, prove time travel on retained history
    pre_files = len(results.files())
    results.rewrite_data_files(spark, min_input_files=2)
    kept = results.current_snapshot_id()
    results.expire_snapshots(keep_last=2)
    orphans = results.remove_orphan_files(older_than_s=0)  # demo table, no writer in flight
    print(f"[maintain] results table {pre_files} -> {len(results.files())} "
          f"files; {len(orphans)} orphan files reclaimed; time travel to "
          f"{kept}: {results.scan(spark, snapshot_id=kept).count():,} rows")


if __name__ == "__main__":
    main()
