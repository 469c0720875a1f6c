"""Selection (filter) operator.

Reference ``cql/operators/cpu/Selection.java:15-49`` scans each batch and
byte-copies qualifying tuples; the GPU twin uses flag + prefix-sum +
compact (``clib/templates/Selection.cl:77-131``). On Spark this is just
``df.where(pred)`` — Tungsten vectorizes the scan and Catalyst pushes the
predicate into the parquet reader, so qualifying-row materialization never
happens at all for pruned row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def selection(df: DataFrame, predicate: Column) -> DataFrame:
    return df.where(predicate)
