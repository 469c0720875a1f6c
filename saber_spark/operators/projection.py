"""Projection (map) operator + deep arithmetic expressions.

Reference ``cql/operators/cpu/Projection.java:18-63`` evaluates an
expression list per tuple into a new byte layout; workload W1 stresses it
with a 100-deep nested float expression ``3*x/2`` repeated (reference
``scheduling/W1.java:143-148``). On Spark: ``df.select`` — Catalyst
constant-folds and codegens the whole expression tree into one pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def projection(df: DataFrame, exprs: Sequence[Column | str]) -> DataFrame:
    return df.select(*exprs)


def deep_arithmetic(col: str | Column, depth: int) -> Column:
    """W1's nested expression: x -> 3*x/2 applied ``depth`` times.

    Stays a single codegen'd expression regardless of depth — the Spark
    analogue of the reference JIT-compiling the expression into a kernel.
    """
    c = F.col(col) if isinstance(col, str) else col
    for _ in range(depth):
        c = c * F.lit(3.0) / F.lit(2.0)
    return c
