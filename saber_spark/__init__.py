"""saber_spark — a from-scratch PySpark-native streaming analytics engine.

Re-expresses the query and data-processing capabilities of the reference
engine (lsds/Saber, SIGMOD'16 — window-based hybrid stream processing) as
idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for unbounded input, Arrow-batched pandas UDFs for the few
operators Spark lacks natively (pane-incremental sliding aggregation,
count-based windows). No per-row Python runs anywhere in the hot path.

Layout
------
- ``session``     SparkSession factory tuned for the target scale.
- ``sources``     parquet/stream loaders, deterministic transcript derivation
                  and synthesis, Iceberg connector (gated).
- ``operators``   selection/projection/aggregation/windows/panes/joins plus
                  training-data-pipeline operators (dedup, similarity, text).
- ``streaming``   watermarked streaming jobs, exactly-once sink, metrics.
- ``plans``       Saber's benchmark query shapes (YSB, cluster-monitoring,
                  smart-grid, Linear-Road-style CEP) over transcripts.
"""

__version__ = "0.1.0"
