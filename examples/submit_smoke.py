"""Packaged-deployment smoke job — the north_rule's delivery shape.

Run exactly the way a cluster job ships (BASELINE.json: "runs via
spark-submit --py-files on multi-executor clusters"):

    cd /tmp && zip -r saber_spark.zip saber_spark/   # from the repo root
    spark-submit --master local[4] --py-files saber_spark.zip \
        examples/submit_smoke.py --sf-dir /root/testdata/sf0.001 \
        --work-dir /tmp/smoke

Unlike ``submit_job.py`` (the production template, which needs the real
Iceberg connector jars), this job is fully runnable in this container:
it imports ``saber_spark`` ONLY from ``--py-files`` (no sys.path
patching — ``tests/test_submit.py`` asserts the package resolved from
the zip), stages a chronological transcript file stream, runs the YSB
windowed aggregate with a watermark through the exactly-once sink, and
then SELF-VERIFIES: every committed streamed row must equal the batch
twin's value for the same (window, conv_id). It prints one
``SUBMIT_SMOKE {json}`` line for the harness.

Reference analogue: Saber's benchmark binaries are launched as one JVM
process per query (reference ``scheduling/W1.java`` main); the Spark
deployment unit is this script + the zipped package.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--work-dir", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports AFTER getOrCreate: --py-files lands on the driver's
    # sys.path via spark-submit's PYTHONPATH; nothing here touches
    # sys.path, so a missing zip fails loudly instead of silently
    # importing the repo checkout.
    import saber_spark
    from saber_spark.operators.aggregation import AggSpec, windowed_aggregate
    from saber_spark.operators.windows import RANGE, WindowDef
    from saber_spark.sources.transcripts import derive_transcripts
    from saber_spark.streaming.jobs import streaming_windowed_aggregate
    from saber_spark.streaming.sink import ExactlyOnceParquetSink

    events = spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
    turns = derive_transcripts(events)
    ysb_input = turns.where(F.col("role") == "assistant").select(
        "conv_id", "ts", F.length("text").alias("text_len")
    )
    wd = WindowDef(RANGE, 600)
    aggs = [AggSpec("cnt", "*", "n_turns"), AggSpec("sum", "text_len", "sum_len")]

    stage = os.path.join(args.work_dir, "stage")
    turns.repartition(4).write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema(turns.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stage)
    )
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant").select(
            "conv_id", "ts", F.length("text").alias("text_len")
        ),
        wd,
        aggs,
        keys=("conv_id",),
        watermark="0 seconds",
    )
    sink = ExactlyOnceParquetSink(
        os.path.join(args.work_dir, "out"), os.path.join(args.work_dir, "ckpt")
    )
    q = sink.start(agg, output_mode="append", availableNow=True)
    q.awaitTermination()

    # self-verify: append-mode emits only watermark-closed windows; each
    # emitted row must match the batch twin exactly (the north_rule's
    # output-parity invariant, checked inside the deployed job itself)
    committed = sink.read_committed(spark).select(
        "window_start", "conv_id", "n_turns", "sum_len"
    )
    batch = windowed_aggregate(ysb_input, wd, aggs, keys=("conv_id",)).select(
        "window_start", "conv_id", "n_turns", "sum_len"
    )
    mismatches = committed.exceptAll(batch).count()
    row = committed.agg(
        F.count("*").alias("rows"), F.sum("sum_len").alias("sum_len_total")
    ).collect()[0]
    print(
        "SUBMIT_SMOKE "
        + json.dumps(
            {
                "rows": row["rows"],
                "sum_len_total": int(row["sum_len_total"] or 0),
                "mismatches": mismatches,
                "pkg": saber_spark.__file__,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
