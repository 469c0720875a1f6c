"""Streaming metrics — replaces the reference's PerformanceMonitor.

Reference prints ``[MON] ... MB/s`` lines per second
(PerformanceMonitor.java:142-170) and keeps a per-(processor, query)
throughput matrix (QueryThroughputMonitor.java:33-79). Here a
StreamingQueryListener collects per-micro-batch progress (rows/sec,
batch duration, state-store metrics) into a queryable DataFrame; sink
lineage (sink.py) covers the per-partition commit log.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    def __init__(self) -> None:
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.rows.append(
            {
                "query_id": p.get("id"),
                "batch_id": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "rows_per_sec": p.get("processedRowsPerSecond"),
                "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
                "state_rows": sum(
                    s.get("numRowsTotal", 0) for s in p.get("stateOperators", [])
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def to_df(self, spark: SparkSession) -> DataFrame:
        if not self.rows:
            return spark.createDataFrame(
                [],
                "query_id string, batch_id long, input_rows long, "
                "rows_per_sec double, batch_duration_ms long, "
                "watermark string, state_rows long",
            )
        return spark.createDataFrame(self.rows)


def latency_percentiles(progress_df: DataFrame) -> DataFrame:
    """p5/p25/p50/p75/p99 of micro-batch durations — the reference's
    latency report shape (LatencyMonitor.java:83-107), computed over the
    ProgressCollector table instead of per-tuple timestamps."""
    from pyspark.sql import functions as F

    return progress_df.agg(
        *[
            F.percentile_approx("batch_duration_ms", p / 100.0, 10000).alias(f"p{p}")
            for p in (5, 25, 50, 75, 99)
        ],
        F.count(F.lit(1)).alias("n_batches"),
    )
