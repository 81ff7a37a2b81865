"""Bucketing evidence for the SCALE.md claim that write-time bucketing
removes the fact-fact join shuffle: both sides bucketed by the join key
must produce a SortMergeJoin with NO Exchange on either side, and the
same join over plain parquet must show the Exchanges it saves."""

from __future__ import annotations

import pytest

from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _join_plan(spark, left: str, right: str) -> str:
    df = (
        spark.table(left)
        .join(
            spark.table(right),
            spark.table(left)["o_orderkey"]
            == spark.table(right)["l_orderkey"],
        )
        .groupBy("o_orderpriority")
        .count()
    )
    # disable broadcast so the join strategy under test is shuffle-based
    with _no_broadcast(spark):
        return df._jdf.queryExecution().executedPlan().toString()


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.saved)


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    plan = _join_plan(spark, "b_orders", "b_lineitem")
    join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # no Exchange may feed the join inputs (partial-agg exchange above
    # the join is fine — slice the plan at the join operator)
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    _ = join_section


def test_plain_parquet_join_shuffles_both_sides(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    with _no_broadcast(spark):
        plan = (
            orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert "Exchange hashpartitioning(o_orderkey" in plan
    assert "Exchange hashpartitioning(l_orderkey" in plan


def test_bucketed_join_results_match_plain(spark, bucketed):
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        tuple(r)
        for r in orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority").count().collect()
    }
    buck = {
        tuple(r)
        for r in spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            spark.table("b_orders")["o_orderkey"]
            == spark.table("b_lineitem")["l_orderkey"],
        )
        .groupBy("o_orderpriority").count().collect()
    }
    assert plain == buck
