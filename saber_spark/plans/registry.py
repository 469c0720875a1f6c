"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 registers here; the driver
contract (``__spark_entry__.py``) re-exports both maps. Builders take
``(spark, sf_dir)`` and return a DataFrame whose column names match the
oracle's aliases exactly (the correctness harness sorts columns by name
before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: queries intentionally registered without a DuckDB oracle (non-SQL-
#: expressible: stateful streaming, iterative); driver runs rows-only check.
NO_ORACLE_OK: set[str] = set()


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise KeyError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # oracle parity requires UTC session time — enforce even when
            # the caller built its own SparkSession with a different TZ
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            NO_ORACLE_OK.add(name)
        return fn

    return deco
