"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``saber_spark`` package; this module only
re-exports the query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from saber_spark.plans import registry as _registry  # noqa: E402
import saber_spark.plans.saber_queries  # noqa: E402,F401  (registers queries)

import saber_spark.plans.relational_queries  # noqa: E402,F401
import saber_spark.plans.streaming_queries  # noqa: E402,F401

try:  # registered lazily as modules land; keep entry importable regardless
    import saber_spark.plans.pipeline_queries  # noqa: E402,F401
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (YSB-style filter→project→windowed agg) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _registry.QUERIES["ysb_windowed_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys ⊆ queries())."""
    return dict(_registry.ORACLES)
