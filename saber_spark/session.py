"""SparkSession factory.

Replaces the reference engine's hand-rolled runtime configuration
(worker-thread pinning, circular-buffer sizing, GPU pipeline depth —
reference ``SystemConf.java:22-44``, ``QueryApplication.java:87-134``)
with declarative Spark configs: AQE for runtime re-planning, Arrow for
vectorized Python exchange, shuffle partitions sized to cores.

On a real cluster the same module is used via ``spark-submit --py-files``;
only master/memory differ (driven by env / submit args, never hardcoded).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that matter at 100 TB scale and are harmless at test scale.
SCALE_CONFS: dict[str, str] = {
    # AQE: runtime coalescing, skew-join splitting, join-strategy re-plan.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / toPandas hop (the only Python hot path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Streaming state: RocksDB scales past JVM-heap state stores.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # Broadcast threshold: dimension tables up to 64 MB go broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Scans: full 128 MB splits so a 100 TB read makes ~800k tasks, not 8M.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # INT64 micros, not the legacy INT96: INT96 timestamp columns get NO
    # parquet min/max statistics, which silently disables every layer of
    # ts-range file skipping (parquet row-group pruning AND the Iceberg
    # manifest bounds) — fatal for a time-series engine whose hottest
    # predicate is a ts range.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Python Data Source v2 pushdown (the saber_iceberg source prunes
    # data files from manifest stats in pushFilters).
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
}


def get_spark(
    app_name: str = "saber_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` controls local parallelism (``local[cpus]``); defaults to the
    ``SPARK_GRAFT_CPUS`` env var, then ``local[*]``. Never set on a real
    cluster — there ``--master`` wins because an existing session is reused.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(env) if env else 0
    master = f"local[{cpus}]" if cpus else "local[*]"

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(SCALE_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    elif cpus:
        confs["spark.sql.shuffle.partitions"] = str(max(cpus, 8))
    confs.setdefault("spark.driver.memory", os.environ.get("SABER_SPARK_DRIVER_MEM", "8g"))
    confs.setdefault("spark.ui.enabled", "false")
    if extra:
        confs.update(extra)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
