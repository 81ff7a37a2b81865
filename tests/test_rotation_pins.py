"""Independent semantics pins for the rotation-eligible registry
entries — one per CURRENTLY-DEMOTED query (see
tests/test_registry_order.py for the authoritative demoted set), with
one exception: range_join_concurrent_events is pinned by its
quadratic-reference differential fuzz in test_custom_op_fuzz.py
instead of a pandas pin here.

These queries periodically rotate out of the driver's bounded
verification window (registry._ordered); while demoted, their only
hash check is the local DuckDB parity test, whose environment can
diverge from the driver's. These tests pin the SEMANTICS against an
independent pandas/python computation of the raw parquet — no DuckDB,
no oracle SQL — so a parity-environment drift can't silently mask a
regression in a demoted entry.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(os.path.join(SF_SMOKE, "events.parquet"))


def _run(spark, name):
    from flink_exercise_spark import registry

    return registry.specs()[name].fn(spark, SF_SMOKE).toPandas()


def test_a2_count_events_pin(spark, events_pdf):
    out = _run(spark, "a2_count_events")
    assert len(out) == 1
    assert out["n_events"].iloc[0] == len(events_pdf)
    assert out["n_unique_users"].iloc[0] == events_pdf["user_id"].nunique()


def test_events_type_stats_pin(spark, events_pdf):
    out = _run(spark, "events_type_stats").set_index("event_type")
    grp = events_pdf.groupby("event_type")["value"]
    assert set(out.index) == set(grp.groups)
    for etype, vals in grp:
        row = out.loc[etype]
        assert row["n_events"] == len(vals)
        assert row["avg_value"] == round(vals.mean(), 4)
        assert row["min_value"] == round(vals.min(), 2)
        assert row["max_value"] == round(vals.max(), 2)
        # Spark `percentile` = exact linear interpolation = numpy default.
        for col, q in (("p50", 50), ("p90", 90), ("p99", 99)):
            assert row[col] == pytest.approx(
                round(float(np.percentile(vals, q)), 4), abs=1e-4
            )


def test_a1_running_counts_analytic_pin(spark, events_pdf):
    out = _run(spark, "a1_running_counts_analytic")
    # One output row per input row.
    assert len(out) == len(events_pdf)
    ordered = events_pdf.sort_values(["user_id", "ts", "event_id"])
    expect_count = ordered.groupby("user_id").cumcount() + 1
    expect_value = ordered.groupby("user_id")["value"].cumsum().round(2)
    got = out.set_index("event_id")
    assert (
        got.loc[ordered["event_id"], "running_count"].to_numpy()
        == expect_count.to_numpy()
    ).all()
    np.testing.assert_allclose(
        got.loc[ordered["event_id"], "running_value"].to_numpy(),
        expect_value.to_numpy(),
        atol=1e-6,
    )


def test_events_json_props_pin(spark, events_pdf):
    out = _run(spark, "events_json_props").set_index("event_type")
    ks = events_pdf["props"].map(
        lambda p: json.loads(p).get("k") if p else None
    )
    df = events_pdf.assign(k=ks)
    for etype, sub in df.groupby("event_type"):
        present = sub["k"].dropna()
        row = out.loc[etype]
        assert row["n_with_k"] == len(present)
        assert row["max_k"] == present.max()
        assert row["avg_k"] == pytest.approx(
            round(float(present.mean()), 4), abs=1e-4
        )


def test_intersect_except_custkeys_pin(spark):
    out = _run(spark, "intersect_except_custkeys")
    cust = pd.read_parquet(os.path.join(SF_SMOKE, "customer.parquet"))
    orders = pd.read_parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    building = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    ordered = set(orders["o_custkey"])
    got_both = set(out.loc[out["side"] == "both", "c_custkey"])
    got_only = set(out.loc[out["side"] == "only_building", "c_custkey"])
    assert got_both == building & ordered
    assert got_only == building - ordered
    # Set semantics: no duplicate rows within a side.
    assert len(out) == len(got_both) + len(got_only)


def test_sim_label_centroid_norms_pin(spark):
    out = _run(spark, "sim_label_centroid_norms").set_index("label")
    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    for label, sub in emb.groupby("label"):
        mat = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
        centroid = mat.mean(axis=0)
        row = out.loc[label]
        assert row["n_dims"] == mat.shape[1]
        assert row["centroid_norm"] == pytest.approx(
            round(float(np.sqrt((centroid**2).sum())), 4), abs=1e-4
        )


def test_skew_salted_distinct_count_pin(spark, events_pdf):
    out = _run(spark, "skew_salted_distinct_count").set_index("event_type")
    grp = events_pdf.groupby("event_type")["user_id"]
    assert set(out.index) == set(grp.groups)
    for etype, vals in grp:
        assert out.loc[etype, "n_distinct"] == vals.nunique()


def test_hypertable_rollup_events_pin(spark, events_pdf):
    out = _run(spark, "hypertable_rollup_events")
    # Timedelta division, not .astype("int64") // 1e9: the parquet
    # loads as datetime64[us] under pandas 2 / pyarrow, so the int64
    # view is unit-dependent.
    epoch = pd.Timestamp(0)
    one_s = pd.Timedelta(seconds=1)
    hours = (events_pdf["ts"].dt.floor("h") - epoch) // one_s
    days = (events_pdf["ts"].dt.floor("D") - epoch) // one_s
    vals = events_pdf["value"]
    # total grain (grain=3): one row, full corpus
    total = out[out["grain"] == 3]
    assert len(total) == 1
    assert total["n_events"].iloc[0] == len(events_pdf)
    assert total["sum_value"].iloc[0] == pytest.approx(
        round(vals.sum(), 2), abs=1e-2
    )
    # day grain (grain=1): one row per distinct day
    day = out[out["grain"] == 1].set_index("day_start")
    assert set(day.index) == set(days.unique())
    for d, grp in vals.groupby(days):
        assert day.loc[d, "n_events"] == len(grp)
        assert day.loc[d, "sum_value"] == pytest.approx(
            round(grp.sum(), 2), abs=1e-2
        )
    # hour grain (grain=0): per (day, hour), count check
    hour = out[out["grain"] == 0]
    assert len(hour) == hours.nunique()
    assert hour["n_events"].sum() == len(events_pdf)


def test_t4_sliding_window_counts_pin(spark, events_pdf):
    epoch = pd.Timestamp(0)
    one_s = pd.Timedelta(seconds=1)
    day = (events_pdf["ts"].dt.floor("D") - epoch) // one_s
    out = _run(spark, "t4_sliding_window_counts").set_index("window_start")
    # enumerate each event's 7 window memberships (7d size, 1d slide)
    rows = {}
    for d, uid in zip(day, events_pdf["user_id"]):
        for k in range(7):
            rows.setdefault(d - k * 86400, []).append(uid)
    assert set(out.index) == set(rows)
    for w, uids in rows.items():
        assert out.loc[w, "n_events"] == len(uids)
        assert out.loc[w, "n_users"] == len(set(uids))


@pytest.fixture(scope="module")
def _tpch(request):
    def load(name):
        return pd.read_parquet(os.path.join(SF_SMOKE, f"{name}.parquet"))
    return load


def test_tpch_q1_pricing_summary_pin(spark, _tpch):
    li = _tpch("lineitem")
    li = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")]
    out = _run(spark, "tpch_q1_pricing_summary").set_index(
        ["l_returnflag", "l_linestatus"]
    )
    disc = li["l_extendedprice"] * (1 - li["l_discount"])
    charge = disc * (1 + li["l_tax"])
    g = li.assign(_dp=disc, _ch=charge).groupby(
        ["l_returnflag", "l_linestatus"]
    )
    assert set(out.index) == set(g.groups)
    for key, sub in g:
        row = out.loc[key]
        assert row["sum_qty"] == pytest.approx(
            round(sub["l_quantity"].sum(), 2), abs=1e-2)
        assert row["sum_disc_price"] == pytest.approx(
            round(sub["_dp"].sum(), 2), abs=1e-2)
        assert row["sum_charge"] == pytest.approx(
            round(sub["_ch"].sum(), 2), abs=1e-2)
        assert row["avg_disc"] == pytest.approx(
            round(sub["l_discount"].mean(), 4), abs=1e-4)
        assert row["count_order"] == len(sub)


def test_tpch_q6_forecast_revenue_pin(spark, _tpch):
    li = _tpch("lineitem")
    sel = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
        & (li["l_discount"] >= 0.03)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    out = _run(spark, "tpch_q6_forecast_revenue")
    assert len(out) == 1
    assert out["n_lines"].iloc[0] == len(sel)
    assert out["revenue"].iloc[0] == pytest.approx(
        round((sel["l_extendedprice"] * sel["l_discount"]).sum(), 2),
        abs=1e-2,
    )


def test_tpch_q14_promo_revenue_pin(spark, _tpch):
    li = _tpch("lineitem")
    li = li[
        (li["l_shipdate"] >= pd.Timestamp("1997-09-01"))
        & (li["l_shipdate"] < pd.Timestamp("1997-10-01"))
    ]
    j = li.merge(
        _tpch("part"), left_on="l_partkey", right_on="p_partkey"
    )
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    promo = rev.where(j["p_type"] == "PROMO", 0.0)
    out = _run(spark, "tpch_q14_promo_revenue")
    assert len(out) == 1
    assert out["n_lines"].iloc[0] == len(j)
    assert out["promo_revenue_pct"].iloc[0] == pytest.approx(
        round(100.0 * promo.sum() / rev.sum(), 4), abs=1e-4
    )


def test_tpch_q3_shipping_priority_pin(spark, _tpch):
    cust = _tpch("customer")
    cust = cust[cust["c_mktsegment"] == "BUILDING"]
    orders = _tpch("orders")
    orders = orders[orders["o_orderdate"] < pd.Timestamp("1998-03-15")]
    li = _tpch("lineitem")
    li = li[li["l_shipdate"] > pd.Timestamp("1998-03-15")]
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    j = j.assign(_rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    g = (
        j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])["_rev"]
        .sum()
        .round(2)
        .reset_index(name="revenue")
    )
    g["orderdate"] = g["o_orderdate"].dt.strftime("%Y-%m-%d")
    g = g.sort_values(
        ["revenue", "orderdate", "l_orderkey"],
        ascending=[False, True, True],
    ).head(10)
    out = _run(spark, "tpch_q3_shipping_priority")
    exp = list(
        zip(g["l_orderkey"], g["revenue"], g["orderdate"],
            g["o_orderpriority"])
    )
    got = list(
        zip(out["l_orderkey"], out["revenue"], out["orderdate"],
            out["o_orderpriority"])
    )
    assert len(got) == len(exp)
    for (gk, gr, gd, gp), (ek, er, ed, ep) in zip(got, exp):
        assert (gk, gd, gp) == (ek, ed, ep)
        assert gr == pytest.approx(er, abs=1e-2)


def test_tpch_q5_local_supplier_volume_pin(spark, _tpch):
    orders = _tpch("orders")
    orders = orders[
        (orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
        & (orders["o_orderdate"] < pd.Timestamp("1998-01-01"))
    ]
    j = (
        _tpch("lineitem")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(_tpch("customer"), left_on="o_custkey",
               right_on="c_custkey")
        .merge(_tpch("supplier"), left_on="l_suppkey",
               right_on="s_suppkey")
    )
    j = j[j["c_nationkey"] == j["s_nationkey"]]
    j = j.merge(_tpch("nation"), left_on="s_nationkey",
                right_on="n_nationkey")
    region = _tpch("region")
    asia = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
    j = j[j["n_regionkey"].isin(asia)]
    exp = (
        (j["l_extendedprice"] * (1 - j["l_discount"]))
        .groupby(j["n_name"]).sum().round(2)
    )
    out = _run(spark, "tpch_q5_local_supplier_volume").set_index("n_name")
    assert set(out.index) == set(exp.index)
    for n, v in exp.items():
        assert out.loc[n, "revenue"] == pytest.approx(v, abs=1e-2)


def test_join_semi_anti_customers_pin(spark, _tpch):
    cust = _tpch("customer")
    ordered = set(_tpch("orders")["o_custkey"])
    out = _run(spark, "join_semi_anti_customers")
    with_o = set(out.loc[out["side"] == "with_orders", "c_custkey"])
    without = set(out.loc[out["side"] == "without_orders", "c_custkey"])
    all_keys = set(cust["c_custkey"])
    assert with_o == all_keys & ordered
    assert without == all_keys - ordered
    assert len(out) == len(cust)      # exactly one row per customer
