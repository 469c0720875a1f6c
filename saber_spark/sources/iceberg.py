"""Iceberg connector — gated (jars absent in the v1 sandbox image).

The deployment target (BASELINE.json) is Iceberg tables of transcripts.
This module carries the exact configuration and the MERGE-based
exactly-once sink used on a real cluster; the sandbox exercises the same
code paths through the parquet file source/sink instead
(streaming/jobs.py, streaming/sink.py), which have identical micro-batch
and commit semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: configs a production session needs (spark-submit --packages
#: org.apache.iceberg:iceberg-spark-runtime-...)
ICEBERG_CONFS = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.saber": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.saber.type": "hadoop",
    # .config("spark.sql.catalog.saber.warehouse", <path>) at submit time
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_transcript_table_stream(
    spark: SparkSession, table: str, from_timestamp_ms: int | None = None
) -> DataFrame:
    """Incremental Iceberg scan as a stream (snapshot-append based)."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jars not on the classpath; use the parquet "
            "file source (streaming/jobs.py) in the sandbox"
        )
    reader = spark.readStream.format("iceberg")
    if from_timestamp_ms is not None:
        reader = reader.option("stream-from-timestamp", str(from_timestamp_ms))
    return reader.load(table)


def merge_upsert_batch(
    spark: SparkSession, df: DataFrame, table: str, keys: list[str]
) -> None:
    """Idempotent MERGE of one micro-batch into an Iceberg table, keyed on
    the window/key columns — the production twin of
    ExactlyOnceParquetSink._foreach_batch (same call shape; swap sinks to
    deploy). MERGE makes re-driven batches upsert rather than duplicate.
    """
    if not iceberg_available(spark):
        raise NotImplementedError("Iceberg runtime jars not on the classpath")
    view = "saber_merge_src"
    df.createOrReplaceTempView(view)
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    spark.sql(
        f"MERGE INTO {table} t USING {view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
