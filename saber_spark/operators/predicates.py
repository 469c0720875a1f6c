"""Predicate trees — the reference's complete comparison/boolean surface.

Reference: 6 comparison ops (=, !=, <, >=, >, <=) on int/float columns
(``IntComparisonPredicate.java:9-15``) combined by n-ary AND/OR
(``ANDPredicate.java:14-19``, ``ORPredicate.java``). Here predicates are
plain Catalyst ``Column`` expressions — fully codegen'd and pushed down to
the parquet scan, which the reference (scan-everything byte buffers) could
never do.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
}


def cmp(col: str | Column, op: str, value) -> Column:
    """One comparison predicate (reference's 1-stream form)."""
    if op not in _OPS:
        raise KeyError(f"unknown comparison {op!r}; known: {sorted(_OPS)}")
    c = F.col(col) if isinstance(col, str) else col
    # a Column value is the reference's 2-stream predicate form — use it as-is
    v = value if isinstance(value, Column) else F.lit(value)
    return _OPS[op](c, v)


def and_(*predicates: Column) -> Column:
    """n-ary conjunction (reference ANDPredicate.java:14-19)."""
    return reduce(lambda a, b: a & b, predicates)


def or_(*predicates: Column) -> Column:
    """n-ary disjunction (reference ORPredicate.java)."""
    return reduce(lambda a, b: a | b, predicates)


def wide_or(col: str, op: str, values: Sequence) -> Column:
    """Reference workload W3's 500-predicate OR (scheduling/W3.java:227-267).

    For '=' the idiomatic Spark form is ``isin`` (hash-set lookup, not a
    500-branch boolean chain).
    """
    if op == "=":
        return F.col(col).isin(list(values))
    return or_(*[cmp(col, op, v) for v in values])
