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
