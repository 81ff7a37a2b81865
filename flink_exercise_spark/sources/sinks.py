"""Output sinks — S3/S4 generalized.

The reference's only sink is a labeled stdout print
(StreamingJob.scala:92,96,107 — covered by the CLI's labeled ``show``
and console streams). A usable engine also persists results; these are
thin, opinionated writers that encode the layout rules that matter at
100 TB:

- parquet is the default interchange format (columnar, statistics,
  splittable); csv/json exist for export boundaries only.
- ``partition_by`` produces hive-style directory partitioning — the
  mechanism behind partition pruning on later reads.
- writers coalesce explicitly when asked (single-file exports), never
  implicitly — a silent coalesce(1) is how 100 TB jobs lose their
  parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_json(
    df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC writer — the second columnar interchange format Spark ships
    natively (stripe-level statistics and predicate pushdown like
    parquet; the format Hive-centric estates standardize on). Same
    layout rules as write_parquet: hive partitioning via partition_by,
    no implicit coalesce."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_back(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    reader = spark.read
    if fmt == "csv":
        return reader.option("header", "true").option(
            "inferSchema", "true"
        ).csv(path)
    return getattr(reader, fmt)(path)
