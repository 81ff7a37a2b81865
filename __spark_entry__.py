"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's central query registry
(flink_exercise_spark/registry.py): the set of queries the driver
verifies and the set the engine ships are one and the same. Each
registry entry carries the Spark callable and (where SQL-expressible)
the DuckDB oracle string; entries without an oracle get the driver's
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_exercise_spark import registry
from flink_exercise_spark.operators.aggregates import top_host_per_window
from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference Q1, StreamingJob.scala:91-92): top
    client per 31-day event-time window, on the sf0.001 fixtures."""
    events = load_table(prep(spark), "/root/testdata/sf0.001", "events")
    return top_host_per_window(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracles()
