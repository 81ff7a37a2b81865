"""Edge-case tests for the as-of join operator (the >= boundary and
no-match paths verified against DuckDB ASOF semantics in /verify)."""

from __future__ import annotations

import datetime as dt

from flink_exercise_spark.operators.asof import asof_join


def test_asof_boundaries(spark):
    t = dt.datetime(2024, 1, 5, 12, 0, 0)
    views = spark.createDataFrame(
        [(1, t, 100)], "user_id long, ts timestamp, event_id long"
    )
    purchases = spark.createDataFrame(
        [
            (1, t, 200),                               # same instant
            (1, dt.datetime(2024, 1, 5, 11, 0), 201),  # before any view
            (2, t, 202),                               # keyless user
        ],
        "user_id long, ts timestamp, event_id long",
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_event_id"])
        for r in asof_join(
            purchases, views, on="user_id", carry=("event_id",)
        ).collect()
    }
    # inclusive >=: an exactly-simultaneous right row matches (right
    # rows sort before left rows at equal ts — edits to asof_join's
    # ordering break this first)
    assert got[200] == (t, 100)
    assert got[201] == (None, None)
    assert got[202] == (None, None)


def test_asof_picks_latest_not_first(spark):
    views = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 10),
            (1, dt.datetime(2024, 1, 3), 11),
            (1, dt.datetime(2024, 1, 9), 12),  # after the purchase
        ],
        "user_id long, ts timestamp, event_id long",
    )
    purchases = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    r = asof_join(purchases, views, on="user_id", carry=("event_id",)).collect()[0]
    assert r["asof_event_id"] == 11  # latest <=, not first, not future
