"""Oracle coverage for builders rotated OUT of the 50-entry driver
registry (round-4 rotation). The driver's CORRECTNESS artifact caps at 50
entries, so near-duplicate shapes rotate through slots across rounds —
but every rotated-out builder keeps the SAME value-level DuckDB check
here, run by pytest instead of the driver.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import assert_matches_oracle


def _builder(module: str, name: str):
    import importlib

    return getattr(importlib.import_module(f"saber_spark.plans.{module}"), name)


@pytest.mark.parametrize(
    ("module", "name", "oracle_name"),
    [
        # r4: slot went to late_data_accounting
        ("saber_queries", "theta_join_row_window", "_THETA_ROW_ORACLE"),
        # r4: slot went to lrb3_toll_streamed (the sunk variant subsumes it)
        ("streaming_queries", "ysb_windowed_agg_streamed", "_YSB_ORACLE"),
        # r4: slot went to cep_match_strategies
        ("relational_queries", "scalar_function_surface", "_SCALAR_ORACLE"),
    ],
)
def test_rotated_out_builder_matches_oracle(spark, duck, module, name, oracle_name):
    import importlib

    oracle = getattr(
        importlib.import_module(f"saber_spark.plans.{module}"), oracle_name
    )
    df = _builder(module, name)(spark, SF_ORACLE)
    assert_matches_oracle(df, duck, oracle)
