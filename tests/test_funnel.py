"""Funnel conversion: crafted strict-ordering semantics, lag math,
same-timestamp non-advance, and a pandas differential on the fixture."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_exercise_spark.operators.funnel import (
    FUNNEL_STEPS,
    funnel_summary,
    funnel_user_steps,
)
from tests.conftest import SF_SMOKE


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime.fromtimestamp(ts)) for u, t, ts in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_strict_ordering_advances_only_after(spark):
    ev = _ev(
        spark,
        [
            # u1: full funnel in order
            (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
            # u2: click BEFORE first view -> does not advance
            (2, "click", 50), (2, "view", 100),
            # u3: purchase before click -> stops at click stage
            (3, "view", 10), (3, "purchase", 20), (3, "click", 30),
            # u4: view only
            (4, "view", 10),
        ],
    )
    got = {r["stage"]: r["n_users"] for r in funnel_summary(ev).collect()}
    assert got == {
        "view": 4,
        "click_after_view": 2,       # u1, u3
        "purchase_after_click": 1,   # u1 only (u3's purchase predates click)
    }


def test_same_timestamp_does_not_advance(spark):
    ev = _ev(spark, [(1, "view", 100), (1, "click", 100)])
    got = {r["stage"]: r["n_users"] for r in funnel_summary(ev).collect()}
    assert got["click_after_view"] == 0


def test_first_qualifying_event_wins_and_lag_math(spark):
    ev = _ev(
        spark,
        [
            (1, "view", 100), (1, "view", 50),     # first view = 50
            (1, "click", 80),                       # after 50 -> t1 = 80
            (1, "click", 500),
            (1, "purchase", 90),                    # after 80 -> t2 = 90
        ],
    )
    rows = {r["stage"]: r for r in funnel_summary(ev).collect()}
    assert rows["click_after_view"]["avg_lag_sec"] == 30.0
    assert rows["purchase_after_click"]["avg_lag_sec"] == 10.0


def test_empty_stage_rows_still_emitted(spark):
    ev = _ev(spark, [(1, "view", 100)])
    rows = {r["stage"]: r for r in funnel_summary(ev).collect()}
    assert rows["purchase_after_click"]["n_users"] == 0
    assert rows["purchase_after_click"]["avg_lag_sec"] is None


def test_fixture_matches_pandas_reference(spark):
    import pandas as pd

    from flink_exercise_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    got = {r["stage"]: r for r in funnel_summary(ev).collect()}

    pdf = ev.select("user_id", "event_type", "ts").toPandas()
    pdf = pdf[pdf["user_id"].notna()]
    t0 = (
        pdf[pdf["event_type"] == "view"].groupby("user_id")["ts"].min()
    )
    lags1, lags2 = [], []
    t1 = {}
    for u, first_view in t0.items():
        mine = pdf[(pdf["user_id"] == u) & (pdf["event_type"] == "click")]
        after = mine[mine["ts"] > first_view]["ts"]
        if len(after):
            t1[u] = after.min()
            lags1.append((t1[u] - first_view).total_seconds())
    t2 = {}
    for u, first_click in t1.items():
        mine = pdf[(pdf["user_id"] == u) & (pdf["event_type"] == "purchase")]
        after = mine[mine["ts"] > first_click]["ts"]
        if len(after):
            t2[u] = after.min()
            lags2.append((t2[u] - first_click).total_seconds())

    assert got["view"]["n_users"] == len(t0)
    assert got["click_after_view"]["n_users"] == len(t1)
    assert got["purchase_after_click"]["n_users"] == len(t2)
    if lags1:
        assert got["click_after_view"]["avg_lag_sec"] == round(
            sum(lags1) / len(lags1), 2
        )
    if lags2:
        assert got["purchase_after_click"]["avg_lag_sec"] == round(
            sum(lags2) / len(lags2), 2
        )


def test_plan_no_sort_no_cartesian(spark):
    from flink_exercise_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    plan = (
        funnel_summary(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # no per-user sort window anywhere
