from flink_exercise_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    formatted_plan,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
]
