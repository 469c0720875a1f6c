"""Oracle coverage for builders rotated OUT of the 50-entry driver
registry. The driver's CORRECTNESS artifact caps at 50 entries, so
near-duplicate shapes rotate through slots across rounds — but every
rotated-out builder keeps the SAME value-level DuckDB check here, run by
pytest instead of the driver.

Round-5 rotation: theta_join_row_window and scalar_function_surface went
BACK into the registry (each is the sole driver row for its SURVEY §2
arm); sg3_outlier_count (shape covered by sg1/sg2) and
w2_projection_reduction (covered by w1 + row_window_aggs) rotated out to
make room; ysb_windowed_agg_streamed stays here (subsumed by the
full-loop ysb_windowed_agg_sunk driver row).
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
        # r4: slot went to lrb3_toll_streamed (the sunk variant subsumes it)
        ("streaming_queries", "ysb_windowed_agg_streamed", "_YSB_ORACLE"),
        # r5: slot went back to theta_join_row_window
        ("saber_queries", "sg3_outlier_count", "_SG3_ORACLE"),
        # r5: slot went back to scalar_function_surface
        ("saber_queries", "w2_projection_reduction", "_W2_ORACLE"),
        # r5 (cont.): slot went to dedup_substring_spans; keyless pane
        # path still driver-checked through cm1_pane_strategies
        ("saber_queries", "sg1_global_sliding_avg", "_SG1_ORACLE"),
        # r5 (cont.): slot went to shared_window_queries; the lead()-
        # window surface stays driver-checked through cep_match_strategies
        ("saber_queries", "turn_latency_analytics", "_LATENCY_ORACLE"),
    ],
)
def test_rotated_out_builder_matches_oracle(spark, duck, module, name, oracle_name):
    import importlib

    oracle = getattr(
        importlib.import_module(f"saber_spark.plans.{module}"), oracle_name
    )
    df = _builder(module, name)(spark, SF_ORACLE)
    assert_matches_oracle(df, duck, oracle)
