"""flink_exercise_spark — a PySpark-native analytics engine.

Re-implements (Spark-first, not a port) the query semantics of the
reference repo Miroka96/flink-exercise — a single-file Flink 1.7
DataStream job (src/main/scala/org/myorg/quickstart/StreamingJob.scala)
that runs three event-time windowed queries over the NASA Aug-1995 HTTP
log — and extends it with relational coverage and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
    session.py    SparkSession factory with scale-oriented defaults
    sources/      parquet star-schema loader + Common-Log-Format parser
    functions/    scalar/vector expression helpers (JVM-side, no UDFs)
    operators/    batch DataFrame->DataFrame operators by category
    streaming/    Structured Streaming variants of the reference queries
    registry.py   query registry: name -> (spark_fn, oracle_sql)
"""

from flink_exercise_spark.session import get_spark
from flink_exercise_spark.sources.tables import TABLES, load_table

__all__ = ["get_spark", "load_table", "TABLES"]

__version__ = "0.1.0"
