"""Common-Log-Format ingestion — SURVEY.md §2.2 (P1–P5).

The reference parses the NASA Aug-1995 access log with a 13-group regex
inside a per-record Scala function (StreamingJob.scala:112-138, pattern
at :69), emitting a sentinel record (empty host) for non-matching lines
(:135) — a permissive-parse + corrupt-record-filter scheme.

Spark-first form: one ``select`` of ``regexp_extract`` expressions over
the raw text column — Catalyst folds all groups into a single projection
evaluated once per row inside whole-stage codegen, so the "13 extracts"
cost one regex match, with no UDF and no Python. The invalid channel is
the same predicate inverted (P5, StreamingJob.scala:145-147).

Timestamp semantics: the reference has a seconds-vs-milliseconds bug
(StreamingJob.scala:125-126; ``new Date(toEpochSecond(...))`` feeds
SECONDS into a MILLISECONDS constructor) that happens not to affect its
single-window output. We implement the intended semantics — a correct
``to_timestamp`` with explicit zone offset (SURVEY.md §1.4 records the
behavior-over-bug decision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common Log Format with explicit zone offset; group numbers:
#  1 host, 2 day, 3 month, 4 year, 5 hour, 6 minute, 7 second,
#  8 tz offset, 9 method, 10 resource, 11 http version, 12 status,
#  13 bytes ('-' when absent).
# Reference pattern at StreamingJob.scala:69 (ours also accepts '+'
# offsets and HTTP/1.1, per the public CLF spec).
CLF_PATTERN = (
    r'^(\S+) - - \[(\d{2})/(\w{3})/(\d{4}):(\d{2}):(\d{2}):(\d{2})'
    r' ([+-]\d{4})\] "(\w{1,6}) ([^ "]+) *(HTTP/V?\d\.\d) *" '
    r"(\d{3}) (\d{1,9}|-)$"
)

TIMESTAMP_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"


def _g(raw: str | Column, group: int) -> Column:
    c = F.col(raw) if isinstance(raw, str) else raw
    return F.regexp_extract(c, CLF_PATTERN, group)


def parse_clf(raw: DataFrame, column: str = "value") -> DataFrame:
    """P1+P2+P3 — raw text lines -> typed LogLine records.

    Non-matching lines keep ``host = ''`` (regexp_extract returns the
    empty string on no-match), the reference's sentinel convention.
    NULL-able ``reply_bytes``: ``'-'`` -> NULL via try_cast (P3).
    """
    ts_text = F.concat_ws(
        " ",
        F.concat_ws(
            "/",
            _g(column, 2),
            _g(column, 3),
            F.concat(_g(column, 4), F.lit(":"), _g(column, 5)),
        ),
        _g(column, 8),
    )
    # Rebuild 'dd/MMM/yyyy:HH:mm:ss Z' exactly as captured.
    ts_text = F.concat(
        _g(column, 2), F.lit("/"), _g(column, 3), F.lit("/"),
        _g(column, 4), F.lit(":"), _g(column, 5), F.lit(":"),
        _g(column, 6), F.lit(":"), _g(column, 7), F.lit(" "), _g(column, 8),
    )
    return raw.select(
        F.col(column).alias("raw"),
        _g(column, 1).alias("host"),
        _g(column, 2).try_cast("int").alias("day"),
        _g(column, 3).alias("month"),
        _g(column, 4).try_cast("int").alias("year"),
        _g(column, 5).try_cast("int").alias("hour"),
        _g(column, 6).try_cast("int").alias("minute"),
        _g(column, 7).try_cast("int").alias("second"),
        _g(column, 8).alias("timezone"),
        F.try_to_timestamp(ts_text, F.lit(TIMESTAMP_FORMAT)).alias("ts"),
        _g(column, 9).alias("http_method"),
        _g(column, 10).alias("resource"),
        _g(column, 11).alias("http_version"),
        _g(column, 12).try_cast("int").alias("http_reply_code"),
        F.nullif(_g(column, 13), F.lit("-")).try_cast("int").alias(
            "reply_bytes"
        ),
    )


def valid_lines(parsed: DataFrame) -> DataFrame:
    """P4 — keep successfully parsed records
    (StreamingJob.scala:141-143)."""
    return parsed.filter(F.col("host") != "")


def invalid_lines(parsed: DataFrame) -> DataFrame:
    """P5 — corrupt-record channel, projected back to the raw line
    (StreamingJob.scala:145-147; dead code in the reference — a live
    operator here)."""
    return parsed.filter(F.col("host") == "").select("raw")


def read_clf(spark, path: str) -> DataFrame:
    """S1 — text source -> parsed, valid records only."""
    return valid_lines(parse_clf(spark.read.text(path)))


def events_as_clf_lines(events: DataFrame) -> DataFrame:
    """Render the events fixture as CLF text lines (test vehicle: the
    fixtures ship no raw log file, so we manufacture one; the driver's
    oracle then checks the parse+aggregate round trip against the
    original columns)."""
    line = F.format_string(
        'user%d - - [%s] "GET /page/%d HTTP/1.0" 200 %d',
        F.col("user_id"),
        F.concat(
            F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000")
        ),
        F.pmod(F.col("event_id"), F.lit(100)),
        F.floor("value").cast("int"),
    )
    return events.select(line.alias("value"))


def _register_roundtrip() -> None:
    from flink_exercise_spark.registry import register
    from flink_exercise_spark.session import prep
    from flink_exercise_spark.sources.tables import load_table

    @register(
        "clf_parse_roundtrip",
        # Oracle computes straight on events: host = 'user'||user_id,
        # bytes = floor(value); windows truncate ts to whole seconds
        # (CLF carries second precision), which cannot move an event
        # across an integer-second window boundary.
        oracle="""
        SELECT 'user' || CAST(user_id AS VARCHAR) AS host,
               count(*) AS n_requests,
               CAST(sum(CAST(floor(value) AS INT)) AS BIGINT) AS total_bytes
        FROM events GROUP BY 1
        """,
        doc="CLF regex parser P1-P4 under the oracle gate: render events "
            "as log lines, parse back, aggregate per host",
        tags=("clf", "source", "events"),
    )
    def q_clf_roundtrip(spark, sf_dir):
        events = load_table(prep(spark), sf_dir, "events")
        parsed = valid_lines(parse_clf(events_as_clf_lines(events)))
        return parsed.groupBy("host").agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum("reply_bytes").alias("total_bytes"),
        )


_register_roundtrip()
