"""Golden-file tests for the Common-Log-Format parser (P1-P5), per
SURVEY.md §5.2 item 3 — covers the text-ingestion path the parquet
oracle can't reach. Expected values hand-computed from the lines."""

from __future__ import annotations

import datetime as dt

import pytest

from flink_exercise_spark.sources.clf import (
    invalid_lines,
    parse_clf,
    valid_lines,
)

GOLDEN_LINES = [
    # valid, with bytes (FIXTURES.md §1)
    'ppp-mia-30.shadow.net - - [01/Aug/1995:00:00:27 -0400] "GET /history/ HTTP/1.0" 200 1502',
    # valid, 304 with 0 bytes
    'burger.letters.com - - [01/Aug/1995:00:00:12 -0400] "GET /shuttle/countdown/video/livevideo.gif HTTP/1.0" 304 0',
    # valid, '-' bytes -> NULL (P3) and the HTTP/V1.0 variant
    'pm13.j51.com - - [01/Aug/1995:00:05:29 -0400] "GET /images/cgi-bin HTTP/V1.0" 404 -',
    # valid, positive zone offset (beyond-reference coverage)
    'host.example.org - - [15/Aug/1995:13:30:00 +0200] "POST /cgi-bin/form HTTP/1.0" 200 99',
    # malformed -> corrupt channel (P5)
    "this line does not parse at all",
]


@pytest.fixture(scope="module")
def parsed(spark):
    raw = spark.createDataFrame([(l,) for l in GOLDEN_LINES], ["value"])
    return parse_clf(raw).collect(), valid_lines(
        parse_clf(raw)
    ).collect(), invalid_lines(parse_clf(raw)).collect()


def test_valid_invalid_split(parsed):
    _, valid, invalid = parsed
    assert len(valid) == 4
    assert len(invalid) == 1
    assert invalid[0]["raw"] == GOLDEN_LINES[4]


def test_first_line_fields(parsed):
    rows, _, _ = parsed
    r = rows[0]
    assert r["host"] == "ppp-mia-30.shadow.net"
    assert (r["day"], r["month"], r["year"]) == (1, "Aug", 1995)
    assert (r["hour"], r["minute"], r["second"]) == (0, 0, 27)
    assert r["timezone"] == "-0400"
    assert r["http_method"] == "GET"
    assert r["resource"] == "/history/"
    assert r["http_version"] == "HTTP/1.0"
    assert r["http_reply_code"] == 200
    assert r["reply_bytes"] == 1502


def test_timestamp_intended_semantics(parsed):
    """The reference's seconds-vs-millis bug (StreamingJob.scala:125-126)
    is NOT replicated: 01/Aug/1995:00:00:27 -0400 == 04:00:27 UTC."""
    rows, _, _ = parsed
    assert rows[0]["ts"] == dt.datetime(1995, 8, 1, 4, 0, 27)
    # positive offset: 13:30 +0200 == 11:30 UTC
    assert rows[3]["ts"] == dt.datetime(1995, 8, 15, 11, 30, 0)


def test_dash_bytes_null(parsed):
    rows, _, _ = parsed
    assert rows[2]["reply_bytes"] is None
    assert rows[2]["http_version"] == "HTTP/V1.0"


def test_malformed_sentinel(parsed):
    rows, _, _ = parsed
    bad = rows[4]
    assert bad["host"] == ""
    assert bad["ts"] is None
    assert bad["reply_bytes"] is None


def test_reference_q3_semantics_on_golden(spark):
    """floor-avg with NULL-as-0 over the golden log: (1502+0+0+99)/4
    = 400.25 -> 400 (the 404's NULL counts as 0 in both sum and
    denominator, StreamingJob.scala:97)."""
    from pyspark.sql import functions as F

    from flink_exercise_spark.functions.scalars import floor_avg

    raw = spark.createDataFrame([(l,) for l in GOLDEN_LINES], ["value"])
    v = valid_lines(parse_clf(raw))
    got = v.groupBy().agg(floor_avg("reply_bytes").alias("a")).collect()
    assert got[0]["a"] == 400
    # and the idiomatic AVG differs (NULL excluded): (1502+0+99)/3
    idiomatic = v.groupBy().agg(F.floor(F.avg("reply_bytes")).alias("a")).collect()
    assert idiomatic[0]["a"] == 533
