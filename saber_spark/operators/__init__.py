from saber_spark.operators.windows import WindowDef
from saber_spark.operators.aggregation import AGG_FNS, AggSpec, windowed_aggregate

__all__ = ["WindowDef", "AGG_FNS", "AggSpec", "windowed_aggregate"]
