"""Behavioral tests for the time-series pattern search: a planted ramp
must win, flat windows must be excluded, and the plan must be the
TakeOrdered top-k over folded columns (no UDF, no full sort)."""

from __future__ import annotations

import datetime as dt

from flink_exercise_spark.operators.timeseries import (
    PATTERN_LEN,
    RAMP,
    pattern_search,
    znorm,
)


def _events(spark, series: dict[int, list[float]]):
    rows = []
    for uid, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (uid * 1000 + i, dt.datetime(2024, 1, 1, 0, 0, i), uid,
                 "view", float(v), "{}")
            )
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_planted_ramp_wins(spark):
    noise = [5.0, 2.0, 7.0, 1.0, 6.0, 3.0, 8.0, 2.5, 4.0, 5.5]
    ramp = [float(i) for i in range(PATTERN_LEN)]
    ev = _events(spark, {
        1: noise,                       # unstructured
        2: [9.0, 9.5] + ramp + [0.0],   # ramp planted at offset 3
        3: [4.0] * 12,                  # flat: zero variance, excluded
    })
    got = pattern_search(ev, k=3).collect()
    assert (got[0]["user_id"], got[0]["offset"]) == (2, 3)
    assert got[0]["match_score"] == 1.0  # exact ramp = perfect corr
    assert all(r["user_id"] != 3 for r in got)


def test_short_series_dropped(spark):
    ev = _events(spark, {7: [1.0, 2.0, 3.0]})  # shorter than PATTERN_LEN
    assert pattern_search(ev).count() == 0


def test_znorm_rejects_constant():
    import pytest

    with pytest.raises(ValueError):
        znorm([2.0, 2.0, 2.0])
    assert abs(sum(RAMP)) < 1e-12  # zero mean
    assert abs(sum(p * p for p in RAMP) - 1.0) < 1e-12  # unit norm


def test_plan_takeordered_no_udf(spark):
    from flink_exercise_spark.plans.inspect import formatted_plan

    ev = _events(spark, {1: [float(i % 5) for i in range(20)]})
    plan = formatted_plan(pattern_search(ev))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vectorized_kernel_equals_declarative(spark):
    """The numpy escape-hatch kernel must reproduce the oracle-checked
    Column-fold scoring bit-for-bit at 6 rounded digits — full result
    set, not just top-k (compare with k large enough to keep all)."""
    from flink_exercise_spark.operators.timeseries import (
        pattern_search_vectorized,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    a = {tuple(r) for r in pattern_search(ev, k=10**6).collect()}
    b = {tuple(r) for r in pattern_search_vectorized(ev, k=10**6).collect()}
    assert a == b and len(a) > 100


def test_bucketed_equals_declarative_on_fixture(spark):
    """The (key, day)-bucketed scale form must be bit-equal to the
    full-series form over the real fixture — the fixture's event times
    span many days at minute granularity, so thousands of windows
    straddle day boundaries here."""
    from flink_exercise_spark.operators.timeseries import (
        pattern_search_bucketed,
    )
    from flink_exercise_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    a = {tuple(r) for r in pattern_search(ev, k=10**6).collect()}
    b = {tuple(r) for r in pattern_search_bucketed(ev, k=10**6).collect()}
    assert a == b and len(a) > 100


def _events_at(spark, uid: int, stamps_vals):
    rows = [
        (uid * 10000 + i, ts, uid, "view", float(v), "{}")
        for i, (ts, v) in enumerate(stamps_vals)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_bucketed_day_boundary_window(spark):
    """A window that STARTS in one day-bucket and ends in the next must
    score identically to the full-series form, at the same global
    offset — the L−1 overlap contract."""
    from flink_exercise_spark.operators.timeseries import (
        pattern_search_bucketed,
    )

    # 12 events: 6 late on Jan 1, 6 early on Jan 2 — with L=8, every
    # valid window (offsets 1..5) straddles midnight.
    stamps = [dt.datetime(2024, 1, 1, 23, m) for m in range(54, 60)] + [
        dt.datetime(2024, 1, 2, 0, m) for m in range(0, 6)
    ]
    vals = [3.0, 1.0, 0.0, 1.5, 2.0, 3.5, 4.0, 5.5, 6.0, 7.5, 2.0, 1.0]
    ev = _events_at(spark, 5, list(zip(stamps, vals)))
    a = sorted(map(tuple, pattern_search(ev, k=10**6).collect()))
    b = sorted(map(tuple, pattern_search_bucketed(ev, k=10**6).collect()))
    assert a == b
    assert {r[1] for r in b} == {1, 2, 3, 4, 5}  # all straddlers scored


def test_bucketed_plan_single_window_exec_no_cartesian(spark):
    """The bucketed form's plan contract: the two bucket-level window
    functions (offset base + overlap) share ONE Window exec (same
    partitioning/ordering — one sort over the tiny bucket relation,
    not two), and nothing in the plan is a cartesian product."""
    from flink_exercise_spark.operators.timeseries import (
        pattern_search_bucketed,
    )
    from flink_exercise_spark.plans.inspect import formatted_plan

    import re

    ev = _events(spark, {1: [float(i % 5) for i in range(20)]})
    plan = formatted_plan(pattern_search_bucketed(ev))
    # Formatted plans list operators as "(N) Window ..." headers.
    n_window = len(re.findall(r"\(\d+\) Window\b", plan))
    assert n_window == 1, f"expected 1 Window exec, plan has {n_window}"
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no full sort


def test_bucketed_sparse_bucket_multi_day_straddle(spark):
    """A day-bucket with fewer than L events: windows starting before
    it need values from MORE than two buckets — the replication must
    reach every bucket within the preceding L−1 events, not just the
    adjacent one."""
    from flink_exercise_spark.operators.timeseries import (
        pattern_search_bucketed,
    )

    stamps = (
        [dt.datetime(2024, 1, 1, 23, m) for m in range(55, 60)]  # 5 events
        + [dt.datetime(2024, 1, 2, 12, 0), dt.datetime(2024, 1, 2, 12, 1)]
        + [dt.datetime(2024, 1, 3, 0, m) for m in range(0, 5)]   # 5 events
    )
    vals = [float(v) for v in (1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 8)]
    ev = _events_at(spark, 9, list(zip(stamps, vals)))
    a = sorted(map(tuple, pattern_search(ev, k=10**6).collect()))
    b = sorted(map(tuple, pattern_search_bucketed(ev, k=10**6).collect()))
    assert a == b
    # Window at offset 3 spans Jan 1 (3 values), Jan 2 (2), Jan 3 (3).
    assert any(r[1] == 3 for r in b)


def test_bucketed_null_key_excluded_pre_epoch_ok(spark):
    """The bucketed form's documented domain (ADVICE r5): NULL-key
    rows are excluded (not crashed on), and pre-epoch timestamps
    bucket via floor division — scores for a pre-epoch series match
    the declarative form exactly."""
    from flink_exercise_spark.operators.timeseries import (
        pattern_search_bucketed,
    )

    ramp = [float(i) for i in range(PATTERN_LEN)]
    rows = []
    # Pre-epoch series for user 1 (1969), straddling a day boundary.
    t0 = dt.datetime(1969, 12, 30, 23, 59, 55)
    for i, v in enumerate(ramp + [3.0, 1.0]):
        rows.append((i, t0 + dt.timedelta(seconds=i), 1, "view", v, "{}"))
    # NULL-key rows: a full scoreable series that must NOT appear.
    for i, v in enumerate(ramp):
        rows.append(
            (100 + i, dt.datetime(2024, 1, 1, 0, 0, i), None, "view", v, "{}")
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = pattern_search_bucketed(ev, bucket_secs=86400).collect()
    assert got, "pre-epoch series produced no scores"
    assert all(r["user_id"] == 1 for r in got)
    exp = [
        (r["user_id"], r["offset"], r["match_score"])
        for r in pattern_search(ev.filter("user_id IS NOT NULL")).collect()
    ]
    assert [(r["user_id"], r["offset"], r["match_score"]) for r in got] == exp
