from flink_exercise_spark.functions.scalars import (
    floor_avg,
    win_start,
)
from flink_exercise_spark.functions.vectors import (
    cosine_expr,
    dot_expr,
    l2_norm_expr,
)

__all__ = ["floor_avg", "win_start", "dot_expr", "l2_norm_expr", "cosine_expr"]
