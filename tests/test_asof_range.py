"""Range join (keyless band self-join) tests: hand-computed counts on
crafted timestamps (band boundaries inclusive, multi-bin straddle,
zero-neighbor rows kept), naive-predicate equivalence on the fixture,
and the plan contract — the bin rewrite must hash-join, while the
direct band predicate demonstrably nested-loops."""

from __future__ import annotations

import datetime as dt
import itertools

from pyspark.sql import functions as F

from flink_exercise_spark.operators.asof import range_join_counts
from flink_exercise_spark.plans.inspect import formatted_plan
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _events(spark, stamps):
    rows = [
        (i, ts, 1, "view", 0.0, "{}") for i, ts in enumerate(stamps)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_hand_computed_counts(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    stamps = [
        t0,                                       # 0
        t0 + dt.timedelta(seconds=60),            # 1: exactly at band
        t0 + dt.timedelta(seconds=61),            # 2: just outside 0's
        t0 + dt.timedelta(seconds=1000),          # 3: isolated
        t0 + dt.timedelta(seconds=1001),          # 4: pairs with 3
    ]
    got = {
        r["event_id"]: r["n_concurrent"]
        for r in range_join_counts(_events(spark, stamps)).collect()
    }
    # 0 sees 1 (<=60s inclusive); 1 sees 0 and 2; 2 sees 1;
    # 3 and 4 see each other; every event has a row.
    assert got == {0: 1, 1: 2, 2: 1, 3: 1, 4: 1}


def test_band_straddles_bins_microsecond_exact(spark):
    """Events 60s apart but in different 60s bins (offset from the bin
    edge) must still pair — the probe-side bin fan-out covers them —
    and a 60.000001s gap must not."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 30)  # mid-bin
    stamps = [
        t0,                                                   # bin 0
        t0 + dt.timedelta(seconds=60),                        # bin 1
        t0 + dt.timedelta(seconds=120) - dt.timedelta(microseconds=1),
        # ^ bin 2: 59.999999s after event 1 -> pairs across bins
        t0 + dt.timedelta(seconds=180, microseconds=1),       # bin 3:
        # 60.000002s after event 2 -> one microsecond outside the band
    ]
    got = {
        r["event_id"]: r["n_concurrent"]
        for r in range_join_counts(_events(spark, stamps)).collect()
    }
    assert got == {0: 1, 1: 2, 2: 1, 3: 0}


def test_matches_naive_on_fixture(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {
        r["event_id"]: r["n_concurrent"]
        for r in range_join_counts(ev).collect()
    }
    rows = ev.select("event_id", F.unix_micros("ts").alias("us")).collect()
    naive = {r["event_id"]: 0 for r in rows}
    for a, b in itertools.combinations(rows, 2):
        if abs(a["us"] - b["us"]) <= 60_000_000:
            naive[a["event_id"]] += 1
            naive[b["event_id"]] += 1
    assert got == naive
    assert sum(naive.values()) > 0  # fixture actually exercises pairing


def test_hot_bin_cap_and_audit(spark):
    """A burst bin above the cap is dropped from the BUILD side (its
    members produce no pairs as neighbors), surfaces in the audit
    channel, and every event still gets an output row."""
    from flink_exercise_spark.operators.asof import range_join_hot_bins

    t0 = dt.datetime(2024, 6, 1, 0, 0, 30)
    burst = [t0 + dt.timedelta(microseconds=i) for i in range(20)]
    lonely = [t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=1, seconds=10)]
    ev = _events(spark, burst + lonely)
    capped = {
        r["event_id"]: r["n_concurrent"]
        for r in range_join_counts(ev, bin_cap=10).collect()
    }
    # Burst events (ids 0..19) lose their 19 neighbors; the lonely
    # pair (ids 20, 21) still pairs normally.
    assert all(capped[i] == 0 for i in range(20))
    assert capped[20] == 1 and capped[21] == 1
    assert len(capped) == 22
    hot = range_join_hot_bins(ev, cap=10).collect()
    assert len(hot) == 1 and hot[0]["n_events"] == 20
    # Uncapped form keeps the burst pairs.
    full = {
        r["event_id"]: r["n_concurrent"]
        for r in range_join_counts(ev, bin_cap=None).collect()
    }
    assert all(full[i] == 19 for i in range(20))


def test_plan_bin_rewrite_hash_joins_not_nested_loop(spark):
    ev = _events(spark, [dt.datetime(2024, 1, 1)])
    plan = formatted_plan(range_join_counts(ev))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # The rewrite's whole point, demonstrated: the direct band
    # predicate HAS no equi-key, so Catalyst can only nested-loop it
    # (CartesianProduct or BroadcastNestedLoopJoin depending on size
    # estimates — both compare every pair).
    base = ev.select("event_id", F.unix_micros("ts").alias("us"))
    naive = base.alias("l").join(
        base.alias("r"),
        F.abs(F.col("r.us") - F.col("l.us")) <= 60_000_000,
    )
    naive_plan = formatted_plan(naive)
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    )


def test_hot_bin_error_mode_raises_loudly(spark):
    """on_hot_bins='error' (the registered query's mode, since its
    oracle is uncapped): a burst bin above the cap must raise an
    actionable error from inside the plan, not silently undercount;
    with no hot bin the mode is a no-op and matches drop mode."""
    import pytest

    t0 = dt.datetime(2024, 6, 1, 0, 0, 30)
    burst = [t0 + dt.timedelta(microseconds=i) for i in range(20)]
    ev = _events(spark, burst)
    hot = range_join_counts(ev, bin_cap=10, on_hot_bins="error")
    with pytest.raises(Exception, match="bin_cap=10"):
        hot.collect()
    calm = {
        r["event_id"]: r["n_concurrent"]
        for r in range_join_counts(
            ev, bin_cap=100, on_hot_bins="error"
        ).collect()
    }
    assert all(calm[i] == 19 for i in range(20))
    with pytest.raises(ValueError, match="drop|error"):
        range_join_counts(ev, on_hot_bins="explode")
