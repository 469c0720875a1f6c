"""Example cluster job — the deployment shape of the engine.

    zip -r saber_spark.zip saber_spark/
    spark-submit --master <cluster> --py-files saber_spark.zip \
        --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.0 \
        examples/submit_job.py --table saber.transcripts --out saber.ysb_out

Reads the transcript Iceberg table as a stream, runs the YSB windowed
aggregate with a watermark, and writes through the exactly-once MERGE
sink. On N vs 4N executors the same script is the scaling experiment.
"""

from __future__ import annotations

import argparse
import os
import sys

# local runs (no --py-files): make the repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from saber_spark.operators.aggregation import AggSpec
from saber_spark.operators.windows import RANGE, WindowDef
from saber_spark.sources.iceberg import merge_upsert_batch, read_transcript_table_stream
from saber_spark.streaming.jobs import streaming_windowed_aggregate
from saber_spark.streaming.metrics import ProgressCollector


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()  # configs come from submit
    collector = ProgressCollector()
    spark.streams.addListener(collector)

    stream = read_transcript_table_stream(spark, args.table)
    agg = streaming_windowed_aggregate(
        stream.where(F.col("role") == "assistant").select(
            "conv_id", "ts", F.length("text").alias("text_len")
        ),
        WindowDef(RANGE, 600),
        [
            AggSpec("cnt", "*", "n_turns"),
            AggSpec("sum", "text_len", "sum_len"),
            AggSpec("avg", "text_len", "avg_len"),
        ],
        watermark="30 minutes",
    )

    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", args.checkpoint)
        .foreachBatch(
            lambda df, _bid: merge_upsert_batch(
                spark, df, args.out, keys=["window_start"]
            )
        )
        .start()
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
