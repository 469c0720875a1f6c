"""Correctness: every registered query matches its DuckDB oracle at sf0.01.

This is the same check the driver runs (CORRECTNESS_r{N}.json), executed
locally so regressions are caught before commit.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle import assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"window_start", "window_end", "n_turns", "sum_len", "avg_len"}


def test_every_query_has_oracle_or_is_flagged():
    missing = set(_QUERIES) - set(_ORACLES)
    # non-SQL-expressible ops may omit oracles, but must be documented
    from saber_spark.plans.registry import NO_ORACLE_OK

    assert missing <= NO_ORACLE_OK, f"queries without oracle or waiver: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = _QUERIES[name](spark, SF_ORACLE)
    assert_matches_oracle(df, duck, _ORACLES[name])
