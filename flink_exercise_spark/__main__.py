"""CLI entry point — the reference's user surface, reproduced.

The reference job (StreamingJob.scala:71-110) is invoked with
``--cores N --path <logfile>`` and prints three labeled result streams.
Equivalent here:

    python -m flink_exercise_spark --path access.log [--cores 4]
        [--streaming] [--window "31 days"]

Parity mapping: S2 CLI parameters (ParameterTool, StreamingJob.scala:
73-75), S3 labeled print sinks (:92,96,107 — same labels), S5
parallelism control (:74,83), S4 execute (:109 — implicit in actions /
query.start). ``--streaming`` runs the same queries through Structured
Streaming with an availableNow trigger and console sink.
"""

from __future__ import annotations

import argparse
import sys


LABELS = {
    # exact sink labels from StreamingJob.scala:92,96,107
    "q1": "Client with most requests",
    "q2": "Number of unique clients",
    "q3": "Average Response size",
}


def batch_queries(logs, window: str = "31 days"):
    """The three reference queries over parsed valid log lines, batch
    form — exposed for plan tests and reuse; ``main`` prints these.

    Q1 goes through the library's two-pass HashAggregate arg-max, not
    ``max_by(host, struct(...))``: the struct-ordered aggregate plans
    as a SortAggregate (string agg buffers can't hash-aggregate) —
    exactly the trap aggregates.top_host_per_window_any_key documents
    and avoids.
    """
    from pyspark.sql import functions as F

    from flink_exercise_spark.functions.scalars import floor_avg, win_start
    from flink_exercise_spark.operators.aggregates import (
        top_host_per_window_any_key,
    )

    q1 = top_host_per_window_any_key(
        logs, key="host", window=window
    ).withColumnRenamed("top_user", "top_client")
    q2 = logs.groupBy(win_start("ts", window)).agg(
        F.countDistinct("host").alias("n_unique_clients")
    )
    q3 = logs.groupBy(win_start("ts", window)).agg(
        floor_avg("reply_bytes").alias("avg_reply_bytes")
    )
    return q1, q2, q3


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="flink_exercise_spark",
        description="NASA Homepage Log Analysis — PySpark engine",
    )
    ap.add_argument("--path", default="NASA_access_log_Aug95",
                    help="Common-Log-Format file (reference default name)")
    ap.add_argument("--cores", type=int, default=4,
                    help="parallelism (reference --cores default 4)")
    ap.add_argument("--window", default="31 days",
                    help="tumbling event-time window size")
    ap.add_argument("--streaming", action="store_true",
                    help="run via Structured Streaming (console sink)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from flink_exercise_spark.functions.scalars import floor_avg, win_start
    from flink_exercise_spark.session import get_spark
    from flink_exercise_spark.sources.clf import parse_clf, valid_lines

    spark = get_spark(
        app_name="NASA Homepage Log Analysis",
        master=f"local[{args.cores}]",
        conf={"spark.sql.shuffle.partitions": str(args.cores)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    try:
        if args.streaming:
            # The streaming file source monitors a directory; accept a
            # single-file path by watching its parent with a glob.
            import os

            if os.path.isfile(args.path):
                raw = (
                    spark.readStream.option(
                        "pathGlobFilter", os.path.basename(args.path)
                    ).text(os.path.dirname(os.path.abspath(args.path)))
                )
            else:
                raw = spark.readStream.text(args.path)
        else:
            raw = spark.read.text(args.path)
        logs = valid_lines(parse_clf(raw))

        if args.streaming:
            # Streaming arg-max needs a second stateful agg; emit the
            # per-host counts in update mode (the reference's running-
            # aggregate emission) and finals for q2/q3 in complete
            # mode. Exact distinct aggregation is a batch-only plan;
            # streaming uses the HLL sketch (Spark's documented
            # streaming substitute).
            counts = logs.groupBy(
                win_start("ts", args.window), F.col("host")
            ).agg(F.count(F.lit(1)).alias("n_requests"))
            q2 = logs.groupBy(win_start("ts", args.window)).agg(
                F.approx_count_distinct("host").alias("n_unique_clients")
            )
            q3 = logs.groupBy(win_start("ts", args.window)).agg(
                floor_avg("reply_bytes").alias("avg_reply_bytes")
            )
            queries = [
                counts.writeStream.queryName(LABELS["q1"])
                .outputMode("update").format("console")
                .trigger(availableNow=True).start(),
                q2.writeStream.queryName(LABELS["q2"])
                .outputMode("complete").format("console")
                .trigger(availableNow=True).start(),
                q3.writeStream.queryName(LABELS["q3"])
                .outputMode("complete").format("console")
                .trigger(availableNow=True).start(),
            ]
            for q in queries:
                q.awaitTermination()
        else:
            q1, q2, q3 = batch_queries(logs, args.window)
            for label, df in (
                (LABELS["q1"], q1),
                (LABELS["q2"], q2),
                (LABELS["q3"], q3),
            ):
                print(f"=== {label}")
                df.orderBy("window_start").show(truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
