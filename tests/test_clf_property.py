"""Property-based CLF parser tests (hypothesis): any structurally valid
log line round-trips through the regex into exactly its source fields;
any line the grammar didn't produce lands in one channel, never both.
"""

from __future__ import annotations

import datetime as dt

import pytest

# slow (r12 suite-trim): hypothesis property fuzzes over the parser;
# the default loop keeps the hand-computed golden log (test_clf.py)
# and the oracle-parity rows for clf_parse_roundtrip/clf_golden_log
pytestmark = pytest.mark.slow
from hypothesis import given, settings, strategies as st

from flink_exercise_spark.sources.clf import (
    invalid_lines,
    parse_clf,
    valid_lines,
)

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

host_st = st.from_regex(r"[a-z][a-z0-9.\-]{0,30}", fullmatch=True)
path_st = st.from_regex(r"/[A-Za-z0-9_./\-]{0,40}", fullmatch=True)
method_st = st.sampled_from(["GET", "POST", "HEAD", "PUT"])
bytes_st = st.one_of(st.just("-"), st.integers(0, 999_999_999).map(str))
tz_st = st.sampled_from(["-0400", "+0000", "+0230", "-1100"])


@st.composite
def clf_line(draw):
    host = draw(host_st)
    day = draw(st.integers(1, 28))
    month = draw(st.sampled_from(MONTHS))
    year = draw(st.integers(1990, 2030))
    h, m, s = (draw(st.integers(0, 23)), draw(st.integers(0, 59)),
               draw(st.integers(0, 59)))
    tz = draw(tz_st)
    method = draw(method_st)
    path = draw(path_st)
    ver = draw(st.sampled_from(["HTTP/1.0", "HTTP/V1.0", "HTTP/1.1"]))
    code = draw(st.integers(100, 599))
    nbytes = draw(bytes_st)
    line = (
        f"{host} - - [{day:02d}/{month}/{year}:{h:02d}:{m:02d}:{s:02d} {tz}] "
        f'"{method} {path} {ver}" {code} {nbytes}'
    )
    fields = dict(host=host, day=day, month=month, year=year, hour=h,
                  minute=m, second=s, timezone=tz, method=method,
                  path=path, code=code,
                  nbytes=None if nbytes == "-" else int(nbytes))
    return line, fields


@settings(max_examples=30, deadline=None)
@given(clf_line())
def test_valid_lines_roundtrip(spark, case):
    line, f = case
    rows = parse_clf(
        spark.createDataFrame([(line,)], ["value"])
    ).collect()
    r = rows[0]
    assert r["host"] == f["host"]
    assert (r["day"], r["month"], r["year"]) == (f["day"], f["month"], f["year"])
    assert (r["hour"], r["minute"], r["second"]) == (f["hour"], f["minute"], f["second"])
    assert r["timezone"] == f["timezone"]
    assert r["http_method"] == f["method"]
    assert r["resource"] == f["path"]
    assert r["http_reply_code"] == f["code"]
    assert r["reply_bytes"] == f["nbytes"]
    # intended timestamp semantics: local clock fields + offset = UTC ts
    off_sign = 1 if f["timezone"][0] == "+" else -1
    off = off_sign * (int(f["timezone"][1:3]) * 3600 + int(f["timezone"][3:5]) * 60)
    local = dt.datetime(f["year"], MONTHS.index(f["month"]) + 1, f["day"],
                        f["hour"], f["minute"], f["second"])
    assert r["ts"] == local - dt.timedelta(seconds=off)


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
def test_arbitrary_text_single_channel(spark, text):
    # newlines can't occur in a text-source line
    text = text.replace("\n", " ").replace("\r", " ")
    parsed = parse_clf(spark.createDataFrame([(text,)], ["value"]))
    nv = valid_lines(parsed).count()
    ni = invalid_lines(parsed).count()
    assert nv + ni == 1  # exactly one channel, never both/neither


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
def test_valid_predicate_agrees_with_parse_sentinel(spark, text):
    """The r3 invariant the scan-pushable filter rests on: the raw-line
    predicate (rlike + separator-free) must agree with the parse-level
    sentinel (host == '') on EVERY line — including control characters
    and near-miss formats — else a row could be kept with an empty host
    or dropped with a parsed one."""
    text = text.replace("\n", " ").replace("\r", " ")
    parsed = parse_clf(spark.createDataFrame([(text,)], ["value"]))
    row = parsed.collect()[0]
    kept = valid_lines(parsed).count() == 1
    assert kept == (row["host"] != ""), (text, row["host"], kept)


@settings(max_examples=10, deadline=None)
@given(st.text(alphabet=st.sampled_from("\x01\x02ab "), max_size=30))
def test_valid_predicate_agrees_on_separator_chars(spark, text):
    """Adversarial corner: lines built from the parser's own internal
    separator/sentinel control characters must still fall in exactly
    one channel with predicate/parse agreement."""
    parsed = parse_clf(spark.createDataFrame([(text,)], ["value"]))
    row = parsed.collect()[0]
    kept = valid_lines(parsed).count() == 1
    assert kept == (row["host"] != ""), (repr(text), row["host"], kept)
