"""Heavy-hitters sketch (operators/sketches.py): the Misra-Gries
candidate pass + exact recount, pinned against pandas value_counts and
exercised through both the sketch path and the guard fallback."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.sketches import (
    HH_TOPK,
    heavy_hitters,
    mg_partition_summaries,
)
from tests.conftest import SF_SMOKE


def _exact_topk(pdf: pd.DataFrame, key: str, k: int) -> list[tuple]:
    vc = (
        pdf[key]
        .dropna()
        .value_counts()
        .rename_axis(key)
        .reset_index(name="n")
        .sort_values(["n", key], ascending=[False, True])
        .head(k)
    )
    total = pdf[key].notna().sum()
    return [
        (int(r[0]), int(r[1]), round(r[1] / total, 6))
        for r in vc.itertuples(index=False)
    ]


def test_heavy_hitters_fixture_exact(spark):
    events = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    pdf = pd.read_parquet(os.path.join(SF_SMOKE, "events.parquet"))
    got = [
        (r.user_id, r.n, r.share)
        for r in heavy_hitters(events, "user_id", HH_TOPK).collect()
    ]
    assert got == _exact_topk(pdf, "user_id", HH_TOPK)


def test_heavy_hitters_sketch_path_under_capacity_pressure(spark):
    """capacity far below the distinct count on a skewed (Zipf-ish)
    column: the MG decrement actually fires, the guard holds, and the
    recount still returns the exact top-k."""
    rows = []
    # 8 heavy keys (200 - 60 occurrences), 3000 singletons
    for i, c in enumerate([200, 180, 150, 120, 100, 80, 70, 60]):
        rows += [(i,)] * c
    rows += [(1000 + j,) for j in range(3000)]
    df = spark.createDataFrame(rows, "user_id long").repartition(4)
    got = [
        (r.user_id, r.n) for r in heavy_hitters(df, "user_id", 5, 64).collect()
    ]
    assert got == [(0, 200), (1, 180), (2, 150), (3, 120), (4, 100)]


def test_heavy_hitters_flat_data_falls_back_exact(spark):
    """Adversarially flat distribution with a tiny capacity: the
    soundness guard fails, the fallback aggregate runs, the answer is
    still exact (deterministic key tie-break)."""
    rows = [(j % 50,) for j in range(500)]  # all keys count 10
    df = spark.createDataFrame(rows, "user_id long").repartition(4)
    got = [
        (r.user_id, r.n) for r in heavy_hitters(df, "user_id", 3, 4).collect()
    ]
    assert got == [(0, 10), (1, 10), (2, 10)]


def test_heavy_hitters_nulls_excluded_and_share(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "user_id long"
    )
    out = heavy_hitters(df, "user_id", 10).collect()
    assert [(r.user_id, r.n, r.share) for r in out] == [
        (1, 2, round(2 / 3, 6)),
        (2, 1, round(1 / 3, 6)),
    ]


def test_mg_summaries_bounded_and_accounted(spark):
    """Summary rows per partition <= capacity + 1; the accounting row
    carries the partition row total; lower bounds undercount by at
    most the partition's decrement."""
    rows = [(j % 100,) for j in range(1000)]
    df = spark.createDataFrame(rows, "user_id long").coalesce(1)
    out = mg_partition_summaries(df, "user_id", capacity=16).toPandas()
    acct = out[out["user_id"].isna()]
    keys = out[out["user_id"].notna()]
    assert len(acct) == 1  # one partition
    assert len(keys) <= 16
    assert int(acct["cnt"].iloc[0]) == 1000
    dec = int(acct["err"].iloc[0])
    assert dec > 0  # capacity pressure actually decremented
    # every kept count is a lower bound within [true - dec, true]
    for r in keys.itertuples():
        true = 10  # uniform: 1000 rows over 100 keys
        assert true - dec <= r.cnt <= true


def test_mg_summaries_no_pressure_is_exact(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "user_id long").coalesce(1)
    out = mg_partition_summaries(df, "user_id", capacity=16).toPandas()
    keys = out[out["user_id"].notna()].set_index("user_id")["cnt"]
    assert keys.to_dict() == {1: 2, 2: 1}
    acct = out[out["user_id"].isna()]
    assert int(acct["err"].iloc[0]) == 0


def test_heavy_hitters_fewer_keys_than_k(spark):
    df = spark.createDataFrame([(7,), (7,), (9,)], "user_id long")
    out = [(r.user_id, r.n) for r in heavy_hitters(df, "user_id", 10).collect()]
    assert out == [(7, 2), (9, 1)]


def test_heavy_hitters_recount_is_broadcast_semi(spark):
    """Scale contract in the plan: pass 2 recounts candidates via a
    broadcast LEFT-SEMI join (the corpus side never shuffles on the
    key for the recount), and pass 1's summary relation is an Arrow
    kernel (MapInPandas), not a full-key aggregate."""
    events = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    plan = heavy_hitters(events, "user_id", HH_TOPK)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
