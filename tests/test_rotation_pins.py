"""Independent semantics pins for the rotation-eligible registry
entries — one per CURRENTLY-DEMOTED query (see
tests/test_registry_order.py for the authoritative demoted set), with
two exceptions: range_join_concurrent_events is pinned by its
quadratic-reference differential fuzz in test_custom_op_fuzz.py, and
clf_golden_log's oracle is hand-computed VALUES constants (the parity
run itself compares against fixed literals). Pins are kept after an
entry rotates back into the driver window — they remain independent
checks, and the entry will be demoted again in a later round.

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


# ---------------------------------------------------------------------------
# Round-7 rotation pins (entries demoted for r7; driver-green in r6)
# ---------------------------------------------------------------------------

_WIN = 31 * 86400


def _win_start(ts: pd.Series) -> pd.Series:
    epoch = pd.Timestamp(0)
    one_s = pd.Timedelta(seconds=1)
    secs = (ts - epoch) // one_s
    return (secs // _WIN) * _WIN


def test_a1_requests_per_host_pin(spark, events_pdf):
    out = _run(spark, "a1_requests_per_host").set_index("user_id")
    counts = events_pdf.groupby("user_id").size()
    assert set(out.index) == set(counts.index)
    for uid, n in counts.items():
        assert out.loc[uid, "n_requests"] == n


def test_a3_first_event_per_host_pin(spark, events_pdf):
    out = _run(spark, "a3_first_event_per_host").set_index("user_id")
    firsts = events_pdf.loc[
        events_pdf.groupby("user_id")["event_id"].idxmin()
    ].set_index("user_id")
    assert set(out.index) == set(firsts.index)
    for uid, row in firsts.iterrows():
        assert out.loc[uid, "first_event_id"] == row["event_id"]
        assert out.loc[uid, "first_event_type"] == row["event_type"]


def test_a6_top3_hosts_per_window_pin(spark, events_pdf):
    out = _run(spark, "a6_top3_hosts_per_window")
    win = _win_start(events_pdf["ts"])
    counts = (
        events_pdf.assign(window_start=win)
        .groupby(["window_start", "user_id"])
        .size()
        .reset_index(name="n")
    )
    expect = []
    for w, sub in counts.groupby("window_start"):
        top = sub.sort_values(
            ["n", "user_id"], ascending=[False, False]
        ).head(3)
        expect += [
            (w, uid, n, rank + 1)
            for rank, (uid, n) in enumerate(zip(top["user_id"], top["n"]))
        ]
    got = set(
        zip(out["window_start"], out["user_id"], out["n_requests"],
            out["rank"])
    )
    assert got == set(expect)


def test_ref_q1_top_host_str_pin(spark, events_pdf):
    out = _run(spark, "ref_q1_top_host_str").set_index("window_start")
    win = _win_start(events_pdf["ts"])
    hosts = "user" + events_pdf["user_id"].astype(str)
    counts = (
        pd.DataFrame({"w": win, "host": hosts})
        .groupby(["w", "host"])
        .size()
        .reset_index(name="n")
    )
    assert set(out.index) == set(counts["w"].unique())
    for w, sub in counts.groupby("w"):
        nmax = sub["n"].max()
        # tie-break: lexicographically greatest host at the max count
        winner = sub.loc[sub["n"] == nmax, "host"].max()
        assert out.loc[w, "top_user"] == winner
        assert out.loc[w, "n_requests"] == nmax


def test_ref_q2_cumulative_distinct_pin(spark, events_pdf):
    out = _run(spark, "ref_q2_cumulative_distinct").set_index("window_start")
    first_ts = events_pdf.groupby("user_id")["ts"].min()
    new_per_win = _win_start(first_ts).value_counts()
    event_wins = sorted(_win_start(events_pdf["ts"]).unique())
    assert set(out.index) == set(event_wins)
    cum = 0
    for w in event_wins:
        cum += int(new_per_win.get(w, 0))
        assert out.loc[w, "n_unique_clients_cumulative"] == cum


def test_t4_session_windows_pin(spark, events_pdf):
    out = _run(spark, "t4_session_windows")
    gap = pd.Timedelta(minutes=30)
    epoch = pd.Timestamp(0)
    one_s = pd.Timedelta(seconds=1)
    expect = []
    for uid, sub in events_pdf.sort_values("ts").groupby("user_id"):
        brk = (sub["ts"].diff().isna()) | (sub["ts"].diff() >= gap)
        sid = brk.cumsum()
        for _, sess in sub.groupby(sid):
            expect.append(
                (
                    uid,
                    (sess["ts"].min() - epoch) // one_s,
                    len(sess),
                    round(sess["value"].sum(), 2),
                )
            )
    got = list(
        zip(out["user_id"], out["session_start"], out["n_events"],
            out["sum_value"])
    )
    assert len(got) == len(expect)
    for (gu, gs, gn, gv), (eu, es, en, ev) in zip(
        sorted(got), sorted(expect)
    ):
        assert (gu, gs, gn) == (eu, es, en)
        assert gv == pytest.approx(ev, abs=1e-2)


def test_asof_purchase_attribution_pin(spark, events_pdf):
    """Differential vs a direct per-purchase scan of the user's views
    (<= semantics, latest wins) — no merge_asof, no DuckDB."""
    out = _run(spark, "asof_purchase_attribution").set_index("event_id")
    epoch = pd.Timestamp(0)
    one_s = pd.Timedelta(seconds=1)
    purchases = events_pdf[events_pdf["event_type"] == "purchase"]
    views = events_pdf[events_pdf["event_type"] == "view"]
    assert len(out) == len(purchases)
    for _, p in purchases.iterrows():
        row = out.loc[p["event_id"]]
        assert row["user_id"] == p["user_id"]
        assert row["purchase_ts"] == (p["ts"] - epoch) // one_s
        cand = views[
            (views["user_id"] == p["user_id"]) & (views["ts"] <= p["ts"])
        ]
        if cand.empty:
            assert pd.isna(row["prior_view_ts"])
            assert pd.isna(row["view_event_id"])
        else:
            latest_ts = cand["ts"].max()
            assert row["prior_view_ts"] == (latest_ts - epoch) // one_s
            assert (
                row["view_event_id"]
                in set(cand.loc[cand["ts"] == latest_ts, "event_id"])
            )


def test_join_outer_order_counts_pin(spark, _tpch):
    cust = _tpch("customer")
    orders = _tpch("orders")
    out = _run(spark, "join_outer_order_counts").set_index("c_custkey")
    assert set(out.index) == set(cust["c_custkey"])
    g = orders.groupby("o_custkey")
    n_orders = g.size()
    spend = g["o_totalprice"].sum().round(2)
    for ck in cust["c_custkey"]:
        assert out.loc[ck, "n_orders"] == int(n_orders.get(ck, 0))
        assert out.loc[ck, "total_spend"] == pytest.approx(
            float(spend.get(ck, 0.0)), abs=1e-2
        )


def test_cube_orders_status_priority_pin(spark, _tpch):
    orders = _tpch("orders")
    out = _run(spark, "cube_orders_status_priority")
    got = {
        (s if pd.notna(s) else None, p if pd.notna(p) else None): (n, a)
        for s, p, n, a in zip(
            out["o_orderstatus"], out["o_orderpriority"],
            out["n_orders"], out["avg_price"],
        )
    }
    expect = {}
    for keys in (
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderstatus"],
        ["o_orderpriority"],
        [],
    ):
        if keys:
            for k, sub in orders.groupby(keys):
                k = k if isinstance(k, tuple) else (k,)
                full = (
                    (k[0], None) if keys == ["o_orderstatus"]
                    else (None, k[0]) if keys == ["o_orderpriority"]
                    else k
                )
                expect[full] = (len(sub), round(sub["o_totalprice"].mean(), 4))
        else:
            expect[(None, None)] = (
                len(orders), round(orders["o_totalprice"].mean(), 4)
            )
    assert set(got) == set(expect)
    for k, (en, ea) in expect.items():
        gn, ga = got[k]
        assert gn == en
        assert ga == pytest.approx(ea, abs=1e-4)


def test_grouping_sets_lineitem_pin(spark, _tpch):
    li = _tpch("lineitem")
    out = _run(spark, "grouping_sets_lineitem")
    got = {
        (f if pd.notna(f) else None, s if pd.notna(s) else None): (n, q)
        for f, s, n, q in zip(
            out["l_returnflag"], out["l_linestatus"],
            out["n_lines"], out["sum_qty"],
        )
    }
    expect = {}
    for (f, s), sub in li.groupby(["l_returnflag", "l_linestatus"]):
        expect[(f, s)] = (len(sub), round(sub["l_quantity"].sum(), 2))
    for f, sub in li.groupby("l_returnflag"):
        expect[(f, None)] = (len(sub), round(sub["l_quantity"].sum(), 2))
    for s, sub in li.groupby("l_linestatus"):
        expect[(None, s)] = (len(sub), round(sub["l_quantity"].sum(), 2))
    expect[(None, None)] = (len(li), round(li["l_quantity"].sum(), 2))
    assert set(got) == set(expect)
    for k, (en, eq) in expect.items():
        gn, gq = got[k]
        assert gn == en
        assert gq == pytest.approx(eq, abs=1e-2)


def test_sort_limit_top_orders_pin(spark, _tpch):
    orders = _tpch("orders")
    top = orders.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(10)
    out = _run(spark, "sort_limit_top_orders")
    assert list(out["o_orderkey"]) == list(top["o_orderkey"])
    for g, e in zip(out["totalprice"], top["o_totalprice"]):
        assert g == pytest.approx(round(e, 2), abs=1e-2)
    assert list(out["o_orderpriority"]) == list(top["o_orderpriority"])


def test_union_orders_and_purchases_pin(spark, _tpch, events_pdf):
    orders = _tpch("orders")
    big = orders[orders["o_totalprice"] > 400000]
    purch = events_pdf[events_pdf["event_type"] == "purchase"]
    out = _run(spark, "union_orders_and_purchases")
    got = set(zip(out["src"], out["id"], out["amount"].round(2)))
    expect = set(
        zip(["order"] * len(big), big["o_orderkey"],
            big["o_totalprice"].round(2))
    ) | set(
        zip(["event"] * len(purch), purch["event_id"],
            purch["value"].round(2))
    )
    assert got == expect


def test_scalar_functions_showcase_pin(spark, _tpch):
    orders = _tpch("orders")
    sel = orders[orders["o_orderkey"] < 100]
    out = _run(spark, "scalar_functions_showcase").set_index("o_orderkey")
    assert set(out.index) == set(sel["o_orderkey"])
    import math

    for _, r in sel.iterrows():
        row = out.loc[r["o_orderkey"]]
        assert row["pri_code"] == r["o_orderpriority"][:8].upper()
        assert row["status_len"] == len(r["o_orderstatus"])
        assert row["order_year"] == r["o_orderdate"].year
        assert row["order_month"] == r["o_orderdate"].month
        assert row["sqrt_price"] == pytest.approx(
            round(math.sqrt(r["o_totalprice"]), 4), abs=1e-4
        )
        assert row["key_mod"] == r["o_orderkey"] % 7
        assert (
            row["status_pri"]
            == f"{r['o_orderstatus']}-{r['o_orderpriority']}"
        )


def test_mm_binary_metadata_pin(spark):
    import hashlib

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "mm_binary_metadata").set_index("doc_id")
    assert set(out.index) == set(docs["doc_id"])
    for _, r in docs.iterrows():
        row = out.loc[r["doc_id"]]
        payload = r["text"].encode("utf-8")
        assert row["n_bytes"] == len(payload)
        assert row["content_hash"] == hashlib.md5(payload).hexdigest()


def test_mm_decode_features_pin(spark):
    import hashlib

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "mm_decode_features").set_index("doc_id")
    ref = docs[docs["text"].str.len() > 0]
    assert set(out.index) == set(ref["doc_id"])
    for _, r in ref.iterrows():
        payload = r["text"].encode("utf-8")
        hx = hashlib.md5(payload).hexdigest()
        row = out.loc[r["doc_id"]]
        assert row["n_bytes"] == len(payload)
        assert row["format"] == "fake/raw"
        assert row["width"] == 64 + int(hx[0:2], 16) % 192
        assert row["height"] == 64 + int(hx[2:4], 16) % 192
        assert row["mean_luma"] == round(int(hx[4:6], 16) / 255.0, 6)


def test_mm_resize_thumbs_pin(spark):
    import hashlib
    import math

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "mm_resize_thumbs").set_index("doc_id")
    ref = docs[docs["text"].str.len() > 0]
    assert set(out.index) == set(ref["doc_id"])
    for _, r in ref.iterrows():
        hx = hashlib.md5(r["text"].encode("utf-8")).hexdigest()
        w = 64 + int(hx[0:2], 16) % 192
        h = 64 + int(hx[2:4], 16) % 192
        scale = 64.0 / max(w, h)
        row = out.loc[r["doc_id"]]
        assert row["width"] == max(1, math.trunc(w * scale))
        assert row["height"] == max(1, math.trunc(h * scale))
        assert row["thumb_hex"] == hx
        assert row["thumb_bytes"] == 16


def test_dedup_minhash_signatures_pin(spark):
    import hashlib
    import re as _re

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "dedup_minhash_signatures").set_index("doc_id")
    want = {}
    for _, r in docs.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        words = [w for w in _re.split(r"\s+", t.strip()) if w]
        sh = {
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
        if not sh:
            continue
        want[int(r["doc_id"])] = [
            min(
                hashlib.md5(f"{i}|{s}".encode("utf-8")).hexdigest()
                for s in sh
            )
            for i in range(8)
        ]
    assert set(out.index) == set(want)
    for d, hs in want.items():
        row = out.loc[d]
        for i in range(8):
            assert row[f"h{i}"] == hs[i], (d, i)


def test_sim_knn_lsh_bucketed_pin(spark):
    import numpy as np

    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    out = _run(spark, "sim_knn_lsh_bucketed")
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for _, r in emb.iterrows()
    }
    bucket = {
        v: sum(1 << i for i in range(8) if vec[i] >= 0)
        for v, vec in vecs.items()
    }
    want = []
    for q in range(10):
        scored = []
        qv = vecs[q]
        qn = float(np.sqrt((qv * qv).sum()))
        for c, cv in vecs.items():
            if c < 10 or bucket[c] != bucket[q]:
                continue
            cos = round(
                float((qv * cv).sum())
                / (qn * float(np.sqrt((cv * cv).sum()))),
                6,
            )
            scored.append((-cos, c))
        scored.sort()
        for i, (nc, c) in enumerate(scored[:3]):
            want.append((q, c, -nc, i + 1))
    want_df = (
        pd.DataFrame(
            want, columns=["query_id", "neighbor_id", "cosine", "rank"]
        )
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want_df) > 0
    for c in ["query_id", "neighbor_id", "cosine", "rank"]:
        assert (got[c].to_numpy() == want_df[c].to_numpy()).all(), c


def test_dedup_band_pairs_pin(spark):
    import hashlib
    import re as _re
    from itertools import combinations

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"])
        for _, r in _run(spark, "dedup_minhash_band_pairs").iterrows()
    }
    buckets = {}
    for _, r in docs.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        words = [w for w in _re.split(r"\s+", t.strip()) if w]
        sh = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if not sh:
            continue
        hs = [
            min(
                hashlib.md5(f"{i}|{s}".encode("utf-8")).hexdigest()
                for s in sh
            )
            for i in range(8)
        ]
        for b in range(4):
            band = hashlib.md5(
                f"{hs[2 * b]}|{hs[2 * b + 1]}".encode("utf-8")
            ).hexdigest()
            buckets.setdefault((b, band), []).append(int(r["doc_id"]))
    want = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            want.add((a, b))
    assert got == want and len(want) > 0


def test_dedup_exact_map_pin(spark):
    import hashlib

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "dedup_exact_map").set_index("text_hash")
    ref = (
        docs.assign(
            text_hash=docs["text"].map(
                lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
            )
        )
        .groupby("text_hash")["doc_id"]
        .agg(canonical_doc_id="min", n_copies="count")
    )
    assert len(out) == len(ref)
    for h, r in ref.iterrows():
        row = out.loc[h]
        assert row["canonical_doc_id"] == r["canonical_doc_id"]
        assert row["n_copies"] == r["n_copies"]


def test_pipeline_hash_split_pin(spark):
    import hashlib

    from flink_exercise_spark.operators.pipeline import (
        MIX_DEFAULT,
        MIX_RATES,
        MIX_RESOLUTION,
        MIX_SALT,
        SPLIT_PCT,
    )

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    b = docs.assign(
        split=docs["doc_id"].map(
            lambda d: "train"
            if h(str(d)) % 100 < SPLIT_PCT["train"]
            else ("val" if h(str(d)) % 100 < SPLIT_PCT["val"] else "test")
        ),
        keep=docs.apply(
            lambda r: h(MIX_SALT + str(r["doc_id"])) % MIX_RESOLUTION
            < MIX_RATES.get(r["lang"], MIX_DEFAULT),
            axis=1,
        ),
    )
    ref = b.groupby(["split", "lang"]).apply(
        lambda g: pd.Series(
            {
                "n_docs": len(g),
                "total_chars": g["n_chars"].sum(),
                "n_sampled": int(g["keep"].sum()),
                "sampled_chars": g.loc[g["keep"], "n_chars"].sum(),
            }
        ),
        include_groups=False,
    )
    out = _run(spark, "pipeline_hash_split").set_index(["split", "lang"])
    assert len(out) == len(ref)
    for key, r in ref.iterrows():
        row = out.loc[key]
        for c in ("n_docs", "total_chars", "n_sampled", "sampled_chars"):
            assert row[c] == r[c], (key, c)


def test_mm_frame_sample_pin(spark):
    """hashlib/arithmetic reference of the stub prober: frame count
    from md5's first byte, stride-16 sampling, integer-exact
    timestamps at 24 fps, per-frame md5 content hash."""
    import hashlib

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        payload = text.encode("utf-8")
        if not payload:
            continue
        n_frames = 8 + hashlib.md5(payload).digest()[0] % 120
        for fi in range(0, n_frames, 16):
            want[(doc_id, fi)] = (
                fi * 1000 // 24,
                hashlib.md5(payload + b":" + str(fi).encode()).hexdigest(),
            )
    out = _run(spark, "mm_frame_sample")
    got = {
        (r.doc_id, r.frame_idx): (r.ts_ms, r.frame_hash)
        for r in out.itertuples()
    }
    assert got == want


def test_mm_audio_energy_pin(spark):
    """hashlib/arithmetic reference of the stub audio prober: rate and
    window count from md5 bytes, integer-exact window timestamps,
    md5-derived energy stand-in."""
    import hashlib

    RATES = (8000, 16000, 22050, 44100, 48000)
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        payload = text.encode("utf-8")
        if not payload:
            continue
        h = hashlib.md5(payload).digest()
        rate, n_windows = RATES[h[0] % 5], 1 + h[1]
        for wi in range(n_windows):
            e = int(
                hashlib.md5(
                    payload + b":" + str(wi).encode()
                ).hexdigest()[:4],
                16,
            ) / 65535.0
            want[(doc_id, wi)] = (wi * 1024 * 1000 // rate, round(e, 6), rate)
    out = _run(spark, "mm_audio_energy")
    got = {
        (r.doc_id, r.window_idx): (r.ts_ms, r.energy, r.sample_rate)
        for r in out.itertuples()
    }
    assert got == want


# Round-7 rotation pins, fourth wave (demoted this session;
# driver-green in r6): sim_knn_brute_force, dedup_jaccard_pairs,
# text_fingerprints.


def test_sim_knn_brute_force_pin(spark):
    from flink_exercise_spark.operators.similarity import N_QUERIES, TOP_K

    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    M = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    qmask = ids < N_QUERIES
    Q, C = M[qmask], M[~qmask]
    qids, cids = ids[qmask], ids[~qmask]
    norms_q = np.sqrt((Q * Q).sum(axis=1))
    norms_c = np.sqrt((C * C).sum(axis=1))
    cos = (Q @ C.T) / np.outer(norms_q, norms_c)

    out = _run(spark, "sim_knn_brute_force")
    assert len(out) == qmask.sum() * TOP_K
    for qi, qid in enumerate(qids):
        order = sorted(
            range(len(cids)), key=lambda j: (-np.round(cos[qi, j], 6), cids[j])
        )[:TOP_K]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert got["neighbor_id"].tolist() == [int(cids[j]) for j in order]
        assert np.allclose(
            got["cosine"].to_numpy(),
            np.round([cos[qi, j] for j in order], 6),
            atol=2e-6,
        )


def test_dedup_jaccard_pairs_pin(spark):
    import itertools
    import re

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    sh: dict[int, set] = {}
    lang: dict[int, str] = {}
    for r in docs.itertuples():
        t = re.split(r"\s+", r.text.strip()) if r.text is not None else []
        sh[r.doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
        lang[r.doc_id] = r.lang
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        if lang[a] != lang[b] or not sh[a] or not sh[b]:
            continue
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 4)
        if j >= 0.2:
            want[(a, b)] = j
    out = _run(spark, "dedup_jaccard_pairs")
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 4) for r in out.itertuples()
    }
    assert got == want


def test_text_fingerprints_pin(spark):
    import hashlib
    import re

    from flink_exercise_spark.operators.text import (
        BPE_TOKEN_PATTERN,
        EMAIL_PATTERN,
        IPV4_PATTERN,
        URL_PATTERN,
    )

    def md5(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "text_fingerprints").set_index("doc_id")
    assert set(out.index) == set(docs["doc_id"])
    for r in docs.itertuples():
        row = out.loc[r.doc_id]
        text = r.text
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        toks = re.split(r"\s+", text.strip())
        scrubbed = re.sub(
            IPV4_PATTERN,
            "<IP>",
            re.sub(
                EMAIL_PATTERN,
                "<EMAIL>",
                re.sub(URL_PATTERN, "<URL>", text),
            ),
        )
        assert row["norm_fp"] == md5(norm)
        assert row["bag_fp"] == md5(" ".join(sorted(set(toks))))
        assert row["n_bpe_tokens"] == len(re.findall(BPE_TOKEN_PATTERN, text))
        assert row["n_urls"] == len(re.findall(URL_PATTERN, text))
        assert row["n_emails"] == len(re.findall(EMAIL_PATTERN, text))
        assert row["n_ipv4"] == len(re.findall(IPV4_PATTERN, text))
        assert row["scrubbed_fp"] == md5(scrubbed)


# --- r8 rotation pins --------------------------------------------------------


def _round_half_up(x: float, digits: int) -> float:
    """Spark/DuckDB ROUND (HALF_UP, away from zero) — python's built-in
    round() is banker's and can differ exactly on .5 boundaries."""
    import math

    scale = 10**digits
    return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale


def test_ts_pattern_search_pin(spark, events_pdf):
    """Numpy reference: per-user (ts, value)-sorted series, L=8 sliding
    windows, z-normalized correlation vs the upward RAMP, top-20 by
    (score desc, user_id, offset) — the registered bucketed kernel is
    bit-equal to this declarative semantics (test_timeseries.py)."""
    from flink_exercise_spark.operators.timeseries import (
        PATTERN_LEN,
        RAMP,
        TOP_K,
    )

    rows = []
    ordered = events_pdf.sort_values(["user_id", "ts", "value"])
    for uid, sub in ordered.groupby("user_id"):
        vals = sub["value"].to_numpy(np.float64)
        n = len(vals)
        for off in range(1, n - PATTERN_LEN + 2):  # 1-based offsets
            w = vals[off - 1 : off - 1 + PATTERN_LEN]
            # sequential folds, mirroring the Column aggregate() order
            s = 0.0
            for x in w:
                s = s + x
            m = s / float(PATTERN_LEN)
            ss = 0.0
            for x in w:
                ss = ss + (x - m) * (x - m)
            if ss <= 0:
                continue
            dot = 0.0
            for x, p in zip(w, RAMP):
                dot = dot + (x - m) * p
            rows.append(
                (uid, off, _round_half_up(dot / np.sqrt(ss), 6))
            )
    rows.sort(key=lambda t: (-t[2], t[0], t[1]))
    want = rows[:TOP_K]
    got = [
        (r.user_id, r.offset, r.match_score)
        for r in _run(spark, "ts_pattern_search").itertuples()
    ]
    assert len(got) == TOP_K
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    np.testing.assert_allclose(
        [g[2] for g in got], [w[2] for w in want], atol=2e-6
    )


def test_text_vocab_topk_pin(spark):
    """Counter reference for the tokenizer-induction statistics: word
    top-k (count + doc freq) unioned with weighted adjacent char-pair
    counts over the vocabulary."""
    import re
    from collections import Counter

    from flink_exercise_spark.operators.tokenizer import (
        PAIR_TOP_K,
        VOCAB_TOP_K,
    )

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    word_n: Counter = Counter()
    word_docs: dict[str, set] = {}
    for r in docs.itertuples():
        if r.text is None:
            continue
        toks = [w for w in re.split(r"\s+", r.text.strip()) if w]
        word_n.update(toks)
        for w in set(toks):
            word_docs.setdefault(w, set()).add(r.doc_id)
    topw = sorted(word_n.items(), key=lambda kv: (-kv[1], kv[0]))[
        :VOCAB_TOP_K
    ]
    pair_n: Counter = Counter()
    for w, n in word_n.items():
        for i in range(len(w) - 1):
            pair_n[w[i : i + 2]] += n
    topp = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[
        :PAIR_TOP_K
    ]
    want = [
        ("word", w, n, len(word_docs[w])) for w, n in topw
    ] + [("char_pair", p, n, None) for p, n in topp]
    out = _run(spark, "text_vocab_topk")
    got = [
        (
            r.kind,
            r.item,
            int(r.n),
            None if pd.isna(r.doc_freq) else int(r.doc_freq),
        )
        for r in out.itertuples()
    ]
    assert sorted(got, key=str) == sorted(want, key=str)


def test_text_token_rarity_pin(spark):
    """Dict reference: rarity = mean floored inverse corpus token
    frequency, integer-exact by construction."""
    import re
    from collections import Counter

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    doc_toks = {}
    vocab: Counter = Counter()
    for r in docs.itertuples():
        if r.text is None:
            continue
        toks = [w for w in re.split(r"\s+", r.text.strip()) if w]
        if toks:
            doc_toks[r.doc_id] = toks
            vocab.update(toks)
    n_total = sum(vocab.values())
    out = _run(spark, "text_token_rarity").set_index("doc_id")
    assert set(out.index) == set(doc_toks)
    for d, toks in doc_toks.items():
        row = out.loc[d]
        assert row["n_tokens"] == len(toks)
        s = sum(n_total // vocab[t] for t in toks)
        assert row["rarity"] == pytest.approx(
            _round_half_up(s / len(toks), 4), abs=1e-4
        )


def test_dedup_semantic_prune_pin(spark):
    """Numpy reference of the full SemDeDup pipeline on the fixture:
    nearest-centroid assignment over the deterministic 8-cell default
    codebook (max rounded cosine, ties to the lower cell id), then
    within-cell pair-domination — drop v iff an earlier-(cent_cos,
    vec_id)-ranked u has round-6 cosine >= threshold."""
    from flink_exercise_spark.operators.similarity import (
        SEMDEDUP_TARGET_CELL,
        SEMDEDUP_TAU,
    )

    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    ids = emb["vec_id"].to_numpy(np.int64)
    M = np.array(emb["embedding"].tolist(), dtype=np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    n_cells = max(8, -(-len(ids) // SEMDEDUP_TARGET_CELL))
    cent_rows = np.flatnonzero(ids < n_cells)
    cent_ids = ids[cent_rows]
    cos = np.round(
        (M @ M[cent_rows].T) / np.outer(norms, norms[cent_rows]), 6
    )
    micro = np.round(cos * 1e6).astype(np.int64)
    # packed argmax, mirroring _assign_cells: highest micro-cosine,
    # ties to the LOWER cell id (larger complement field)
    pack = micro * (1 << 20) + ((1 << 20) - 1 - cent_ids.astype(np.int64))
    best = pack.argmax(axis=1)
    cell = cent_ids[best]
    cent_cos = micro[np.arange(len(ids)), best] / 1e6
    keep = {}
    for c in np.unique(cell):
        rows = np.flatnonzero(cell == c)
        rank = rows[np.lexsort((ids[rows], cent_cos[rows]))]
        G = np.round(
            (M[rank] @ M[rank].T) / np.outer(norms[rank], norms[rank]), 6
        )
        dominated = np.tril(G >= SEMDEDUP_TAU, k=-1).any(axis=1)
        for r, d in zip(rank, dominated):
            keep[int(ids[r])] = (int(c), float(cent_cos[r]), not d)
    out = _run(spark, "dedup_semantic_prune").set_index("vec_id")
    assert set(out.index) == set(keep)
    for v, (c, cc, k) in keep.items():
        row = out.loc[v]
        assert int(row["cell_id"]) == c, v
        assert bool(row["keep"]) == k, v
        assert row["cent_cos"] == pytest.approx(cc, abs=2e-6)


def test_dedup_cluster_keep_best_pin(spark):
    """Pure-python (hashlib + union-find) reference of the full
    keep-best pipeline: MinHash signatures -> 4x2 band buckets ->
    candidate pairs -> exact shingle-Jaccard verify (>= 0.2) ->
    connected components -> canonical = max n_chars then min doc_id."""
    import hashlib
    import re
    from itertools import combinations

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    sh = {}
    quality = {}
    for r in docs.itertuples():
        quality[int(r.doc_id)] = (
            -1 if pd.isna(r.n_chars) else int(r.n_chars)
        )
        if r.text is None:
            continue
        words = [w for w in re.split(r"\s+", r.text.strip()) if w]
        s = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if s:
            sh[int(r.doc_id)] = s
    buckets: dict = {}
    for d, s in sh.items():
        hs = [
            min(
                hashlib.md5(f"{i}|{g}".encode("utf-8")).hexdigest()
                for g in s
            )
            for i in range(8)
        ]
        for b in range(4):
            band = hashlib.md5(
                f"{hs[2 * b]}|{hs[2 * b + 1]}".encode("utf-8")
            ).hexdigest()
            buckets.setdefault((b, band), []).append(d)
    cands = set()
    for members in buckets.values():
        cands.update(combinations(sorted(members), 2))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    verified = set()
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        union = len(sh[a]) + len(sh[b]) - inter
        if _round_half_up(inter / union, 4) >= 0.2:
            verified.add((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list] = {}
    for d in {x for p in verified for x in p}:
        members.setdefault(find(d), []).append(d)
    want = {}
    for ms in members.values():
        cid = min(ms)
        canon = min(ms, key=lambda d: (-quality[d], d))
        for d in ms:
            want[d] = (cid, canon, d == canon)
    out = _run(spark, "dedup_cluster_keep_best").set_index("doc_id")
    assert set(out.index) == set(want) and len(want) > 0
    for d, (cid, canon, k) in want.items():
        row = out.loc[d]
        assert int(row["cluster_id"]) == cid, d
        assert int(row["canonical_doc_id"]) == canon, d
        assert bool(row["keep"]) == k, d


def test_sim_embedding_near_dup_pairs_pin(spark):
    """Numpy reference: sign-bucket (first 8 dims) blocking, exact
    cosine on bucket-equal pairs (vec_a < vec_b), keep round-6 cosine
    >= 0.35."""
    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], np.float64)
        for _, r in emb.iterrows()
    }
    bucket = {
        v: sum(1 << i for i in range(8) if vec[i] >= 0)
        for v, vec in vecs.items()
    }
    norms = {v: float(np.sqrt((x * x).sum())) for v, x in vecs.items()}
    want = {}
    ids = sorted(vecs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            if bucket[a] != bucket[b]:
                continue
            cos = round(
                float(vecs[a] @ vecs[b]) / (norms[a] * norms[b]), 6
            )
            if cos >= 0.35:
                want[(a, b)] = cos
    out = _run(spark, "sim_embedding_near_dup_pairs")
    got = {(r.vec_a, r.vec_b): r.cosine for r in out.itertuples()}
    assert set(got) == set(want) and len(want) > 0
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-6), k


def test_dedup_line_boilerplate_pin(spark):
    """Pure-python reference of line_dedup on the fixture: trimmed
    non-blank lines, a line is boilerplate when its exact content
    appears in >= 2 DISTINCT documents, survivors rejoin in order;
    documents with zero non-blank lines pass through verbatim."""
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))

    def doc_lines(t):
        if t is None or (isinstance(t, float) and pd.isna(t)):
            return []
        return [s for s in (ln.strip(" ") for ln in t.split("\n")) if s]

    per_doc = {
        int(r["doc_id"]): doc_lines(r["text"])
        for _, r in docs.iterrows()
    }
    n_docs_per_line: dict[str, set[int]] = {}
    for d, lines in per_doc.items():
        for ln in set(lines):
            n_docs_per_line.setdefault(ln, set()).add(d)
    boiler = {ln for ln, ds in n_docs_per_line.items() if len(ds) >= 2}
    # The fixture corpus is single-line with unique texts, so the
    # registered query is a pass-through there (exactly what the
    # driver's oracle checks too); the boiler-dropping arm is pinned
    # below on a crafted corpus through the same library function.

    want = {}
    texts = {int(r["doc_id"]): r["text"] for _, r in docs.iterrows()}
    for d, lines in per_doc.items():
        if not lines:
            want[d] = (texts[d], 0, 0)
            continue
        kept = [ln for ln in lines if ln not in boiler]
        want[d] = ("\n".join(kept), len(kept), len(lines) - len(kept))

    out = _run(spark, "dedup_line_boilerplate").set_index("doc_id")
    assert len(out) == len(want)
    for d, (text, n_kept, n_drop) in want.items():
        row = out.loc[d]
        got_text = row["text"]
        if text is None or (isinstance(text, float) and pd.isna(text)):
            assert got_text is None or pd.isna(got_text), d
        else:
            assert got_text == text, d
        assert row["n_lines_kept"] == n_kept, d
        assert row["n_lines_dropped"] == n_drop, d

    # Crafted corpus through the same library function, same python
    # reference: the boiler line drops, unique body lines survive in
    # order, the all-boiler doc ends up empty.
    from flink_exercise_spark.operators.dedup import line_dedup

    crafted = {
        1: "cookie banner\nunique body one\nfooter",
        2: "cookie banner\nunique body two\nfooter",
        3: "footer",
        4: "only unique content here",
    }
    cboiler = {"cookie banner", "footer"}
    cwant = {}
    for d, t in crafted.items():
        lines = [s for s in (x.strip(" ") for x in t.split("\n")) if s]
        kept = [ln for ln in lines if ln not in cboiler]
        cwant[d] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    cdf = spark.createDataFrame(
        [(d, t) for d, t in crafted.items()], "doc_id long, text string"
    )
    cout = line_dedup(cdf).toPandas().set_index("doc_id")
    for d, (text, n_kept, n_drop) in cwant.items():
        row = cout.loc[d]
        assert row["text"] == text, d
        assert row["n_lines_kept"] == n_kept, d
        assert row["n_lines_dropped"] == n_drop, d


def test_dedup_exact_substring_pin(spark):
    """Pure-python reference of substring_dedup (Lee et al.
    ExactSubstr, keep-first) on the fixture: whitespace-split token
    positions, k=10 grams, any gram occurring >= 2 times corpus-wide
    keeps only its min-packed-(doc_id,pos) occurrence; every token
    position covered by a non-canonical occurrence is removed and the
    text rebuilt from the survivors in order."""
    import re

    from flink_exercise_spark.operators.dedup import SUBSTR_K, _POS_PACK

    k = SUBSTR_K
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))

    toks = {}
    for _, r in docs.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            toks[int(r["doc_id"])] = None
        else:
            toks[int(r["doc_id"])] = re.split(r"\s+", t.strip(" "))

    # corpus-wide gram occurrence index (raw gram text as the key —
    # equality on the md5 digest the operator shuffles is equality on
    # the text up to collisions)
    occ: dict[str, list[int]] = {}
    for d in sorted(toks):
        t = toks[d]
        if t is None or len(t) < k:
            continue
        for pos in range(1, len(t) - k + 2):  # 1-based
            gram = " ".join(t[pos - 1 : pos - 1 + k])
            occ.setdefault(gram, []).append(d * _POS_PACK + pos)
    dup = {g: min(ps) for g, ps in occ.items() if len(ps) >= 2}
    assert dup, "fixture should contain duplicated k-gram runs"

    want = {}
    for d, t in toks.items():
        if t is None:
            want[d] = (None, 0, 0, 0)
            continue
        removed_starts = []
        if len(t) >= k:
            for pos in range(1, len(t) - k + 2):
                gram = " ".join(t[pos - 1 : pos - 1 + k])
                cmin = dup.get(gram)
                if cmin is not None and d * _POS_PACK + pos != cmin:
                    removed_starts.append(pos)
        covered = set()
        for p in removed_starts:
            covered.update(range(p, p + k))
        kept = [j for j in range(1, len(t) + 1) if j not in covered]
        want[d] = (
            " ".join(t[j - 1] for j in kept),
            len(t),
            len(kept),
            len(t) - len(kept),
        )

    out = _run(spark, "dedup_exact_substring").set_index("doc_id")
    assert len(out) == len(want)
    for d, (text, n_tok, n_kept, n_drop) in want.items():
        row = out.loc[d]
        got_text = row["text"]
        if text is None:
            assert got_text is None or pd.isna(got_text), d
        else:
            assert got_text == text, d
        assert row["n_tokens"] == n_tok, d
        assert row["n_tokens_kept"] == n_kept, d
        assert row["n_tokens_dropped"] == n_drop, d


# --- r10 rotation pins ---------------------------------------------------


def _round4(x: float) -> float:
    """Spark round(double, 4): BigDecimal.valueOf (shortest decimal
    repr) + HALF_UP — Decimal(repr(x)), NOT Decimal(x) (the exact
    binary expansion flips boundary cases)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _java_tokens(text: str) -> list[str]:
    """split(trim(text), '\\s+') — Java \\s is ASCII whitespace."""
    import re

    return re.split(r"\s+", text.strip(), flags=re.ASCII)


def test_text_stats_pin(spark):
    """Every column of the registered text_stats projection recomputed
    in pure python over the raw parquet (Java regex semantics mirrored
    with re.ASCII; clf fold left-assoc in array order, as Spark's
    F.aggregate folds)."""
    import hashlib
    import re

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "text_stats").set_index("doc_id")
    assert len(out) == len(docs)
    K = 64  # CLF_BUCKETS
    stop = {"the", "and", "of", "to", "a", "in", "is"}
    for _, d in docs.iterrows():
        text, row = d["text"], out.loc[d["doc_id"]]
        toks = _java_tokens(text)
        n_tok = len(toks)
        assert row["n_chars_calc"] == len(text)
        assert row["n_tokens"] == n_tok
        assert row["n_distinct_tokens"] == len(set(toks))
        tok_chars = len(re.sub(r"\s", "", text.strip(), flags=re.ASCII))
        assert row["avg_token_len"] == _round4(tok_chars / n_tok)
        n_stop = sum(1 for t in toks if t in stop)
        assert row["stopword_ratio"] == _round4(n_stop / n_tok)
        n_punct = len(text) - len(
            re.sub(r"[^\w\s]", "", text, flags=re.ASCII)
        )
        assert row["punct_ratio"] == _round4(n_punct / len(text))
        assert row["lexical_diversity"] == _round4(len(set(toks)) / n_tok)
        lines = [ln.strip() for ln in text.split("\n")]
        lines = [ln for ln in lines if ln != ""]
        want_dup = (
            _round4(1 - len(set(lines)) / len(lines)) if lines else 0.0
        )
        assert row["dup_line_ratio"] == want_dup
        bg = [" ".join(toks[i : i + 2]) for i in range(n_tok - 1)]
        want_bg = (
            _round4(max(bg.count(g) for g in set(bg)) / len(bg))
            if bg
            else 0.0
        )
        assert row["top_bigram_ratio"] == want_bg
        acc = 0.0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % K
            acc = acc + ((b * 37) % 21 - 10) / 10.0
        raw = acc / n_tok
        assert row["clf_score"] == _round4(0.5 + 0.5 * raw / (1.0 + abs(raw)))


def test_text_language_id_pin(spark):
    """Marker-score language ID + broadcast language-profile enrich,
    recomputed in pandas/python over the raw parquet."""
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    out = _run(spark, "text_language_id").set_index("doc_id")
    assert len(out) == len(docs)
    markers = {
        "en": ("the", "and", "of", "to", "a", "in", "is"),
        "es": ("el", "la", "de", "que", "y", "los"),
        "de": ("der", "die", "und", "das", "ist", "ein"),
        "fr": ("le", "la", "et", "les", "des", "une"),
    }
    prof = docs.groupby("lang").agg(
        lang_n_docs=("doc_id", "size"),
        lang_avg_chars=("n_chars", "mean"),
        lang_n_sources=("source", "nunique"),
    )
    for _, d in docs.iterrows():
        row = out.loc[d["doc_id"]]
        toks = _java_tokens(d["text"])
        scores = {
            lang: sum(1 for t in toks if t in ms)
            for lang, ms in markers.items()
        }
        best = max(scores.values())
        for lang in markers:
            assert row[f"score_{lang}"] == scores[lang]
        want = (
            "unknown"
            if best == 0
            else next(l for l in markers if scores[l] == best)
        )
        assert row["predicted_lang"] == want
        assert row["labeled_lang"] == d["lang"]
        p = prof.loc[d["lang"]]
        assert row["lang_n_docs"] == p["lang_n_docs"]
        # int n_chars sum is exact in float64; one division, one round.
        assert row["lang_avg_chars"] == _round4(float(p["lang_avg_chars"]))
        assert row["lang_n_sources"] == p["lang_n_sources"]


# --- r11 rotation pins (pre-paid for the r12 demotion wave) ------------------


def test_sim_knn_ivf_pin(spark):
    """Numpy third implementation of the whole deterministic IVF
    pipeline: centroids = corpus vectors 10..17 (cell_id = vec_id-10),
    packed-argmax assignment on round-6 cosine (ties to the lowest
    cell), 2-probe query ranking, exact scoring in probed cells,
    top-3 by (cosine desc, id asc)."""
    from flink_exercise_spark.operators.similarity import (
        N_CELLS,
        N_PROBE,
        N_QUERIES,
    )

    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    vecs = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for _, r in emb.iterrows()
    }
    norms = {v: float(np.sqrt((x * x).sum())) for v, x in vecs.items()}

    def cos6(a, b):
        return _round_half_up(
            float((vecs[a] * vecs[b]).sum()) / (norms[a] * norms[b]), 6
        )

    cents = {c: N_QUERIES + c for c in range(N_CELLS)}
    corpus = [v for v in vecs if v >= N_QUERIES]
    assigned = {}
    for v in corpus:
        best = min(
            ((-cos6(v, cents[c]), c) for c in range(N_CELLS))
        )
        assigned[v] = best[1]
    want = []
    for q in range(N_QUERIES):
        probe = sorted(
            range(N_CELLS), key=lambda c: (-cos6(q, cents[c]), c)
        )[:N_PROBE]
        scored = sorted(
            (-cos6(q, v), v)
            for v in corpus
            if assigned[v] in probe
        )[:3]
        for i, (nc, v) in enumerate(scored):
            want.append((q, v, -nc, i + 1))
    got = (
        _run(spark, "sim_knn_ivf")
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for i, (q, v, c, rk) in enumerate(
        sorted(want, key=lambda t: (t[0], t[3]))
    ):
        row = got.iloc[i]
        assert (row["query_id"], row["neighbor_id"], row["rank"]) == (
            q, v, rk,
        )
        assert abs(row["cosine"] - c) < 2e-6


def _ref_verified_pairs(docs: pd.DataFrame) -> dict[tuple, float]:
    """Pure-python LSH-gated exact verification: distinct word
    3-gram shingles, 8-perm md5 minhash, 4x2 banding, candidate pairs
    from band-bucket collisions, exact Jaccard >= 0.2 at 4 dp."""
    import hashlib
    import re as _re
    from itertools import combinations

    sh = {}
    for _, r in docs.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        words = [w for w in _re.split(r"\s+", t.strip()) if w]
        s = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if s:
            sh[int(r["doc_id"])] = s
    buckets = {}
    for d, s in sh.items():
        hs = [
            min(
                hashlib.md5(f"{i}|{x}".encode("utf-8")).hexdigest()
                for x in s
            )
            for i in range(8)
        ]
        for b in range(4):
            band = hashlib.md5(
                f"{hs[2 * b]}|{hs[2 * b + 1]}".encode("utf-8")
            ).hexdigest()
            buckets.setdefault((b, band), []).append(d)
    cands = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            cands.add((a, b))
    verified = {}
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = _round_half_up(
            inter / (len(sh[a]) + len(sh[b]) - inter), 4
        )
        if j >= 0.2:
            verified[(a, b)] = j
    return verified


def test_dedup_lsh_verified_pairs_pin(spark):
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    want = _ref_verified_pairs(docs)
    out = _run(spark, "dedup_lsh_verified_pairs")
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): r["jaccard"]
        for _, r in out.iterrows()
    }
    assert set(got) == set(want) and len(want) > 0
    for k, j in want.items():
        assert abs(got[k] - j) < 2e-4, k


def test_dedup_near_dup_clusters_pin(spark):
    """Union-find over the independently re-derived verified pairs:
    cluster_id = min reachable doc_id; docs in no pair are absent."""
    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    pairs = list(_ref_verified_pairs(docs))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}
    out = _run(spark, "dedup_near_dup_clusters")
    got = {
        int(r["doc_id"]): int(r["cluster_id"]) for _, r in out.iterrows()
    }
    assert got == want and len(want) > 0


def test_dedup_simhash_near_pairs_pin(spark):
    """Pure-python full-pipeline reference: per-token ±1 bit rows from
    md5 (bit b of the row = bit b of the big-endian int over the first
    8 digest bytes), per-doc sign-packed 64-bit SimHash, 16-bit chunk
    banding with the BUCKET_CAP cut, exact Hamming <= 8."""
    import hashlib
    from itertools import combinations

    from flink_exercise_spark.operators.dedup import BUCKET_CAP

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))

    def simhash(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        sums = [0] * 64
        for t in toks:
            d = int.from_bytes(
                hashlib.md5(t.encode()).digest()[:8], "big"
            )
            for b in range(64):
                sums[b] += 1 if (d >> b) & 1 else -1
        v = sum(1 << b for b in range(64) if sums[b] > 0)
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = {}
    for _, r in docs.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        sigs[int(r["doc_id"])] = simhash(t)
    buckets: dict[tuple, list] = {}
    for d, s in sigs.items():
        u = s % (1 << 64)
        for i in range(4):
            buckets.setdefault(
                (i, (u >> (16 * i)) & 0xFFFF), []
            ).append(d)
    want = set()
    for members in buckets.values():
        if len(members) > BUCKET_CAP:
            continue  # hot-chunk cut
        for a, b in combinations(sorted(members), 2):
            h = bin(
                (sigs[a] % (1 << 64)) ^ (sigs[b] % (1 << 64))
            ).count("1")
            if h <= 8:
                want.add((a, b, h))
    out = _run(spark, "dedup_simhash_near_pairs")
    got = {
        (int(r["doc_a"]), int(r["doc_b"]), int(r["hamming"]))
        for _, r in out.iterrows()
    }
    assert got == want and len(want) > 0


def test_pipeline_llm_data_prep_pin(spark):
    """Pure-python reference of the whole prep composition: whitespace
    tokens, quality features (HALF_UP 4-dp ratios), marker-score
    language id with first-lang tie precedence, md5 exact dedup
    (min doc_id canonical), per-language aggregate."""
    import hashlib
    import re as _re

    from flink_exercise_spark.operators.pipeline import (
        MIN_LEXICAL_DIVERSITY,
        MIN_STOPWORD_RATIO,
        MIN_TOKENS,
    )
    from flink_exercise_spark.operators.text import (
        LANG_MARKERS,
        STOPWORDS,
    )

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    kept = {}
    for _, r in docs.iterrows():
        t = r["text"]
        if t is None or (isinstance(t, float) and pd.isna(t)):
            continue
        toks = _re.split(r"\s+", t.strip())
        n = len(toks)
        ld = _round_half_up(len(set(toks)) / n, 4)
        sr = _round_half_up(
            sum(1 for x in toks if x in STOPWORDS) / n, 4
        )
        scores = {
            lang: sum(1 for x in toks if x in markers)
            for lang, markers in LANG_MARKERS.items()
        }
        best = max(scores.values())
        if best == 0:
            lang = "unknown"
        else:
            lang = next(
                lg for lg in LANG_MARKERS if scores[lg] == best
            )
        if (
            n >= MIN_TOKENS
            and ld >= MIN_LEXICAL_DIVERSITY
            and sr >= MIN_STOPWORD_RATIO
            and lang != "unknown"
        ):
            kept[int(r["doc_id"])] = (
                hashlib.md5(t.encode("utf-8")).hexdigest(), n, ld, sr,
                lang,
            )
    canon = {}
    for d, (h, *_rest) in kept.items():
        canon[h] = min(canon.get(h, d), d)
    dedup = {d: v for d, v in kept.items() if canon[v[0]] == d}
    want = {}
    for _, (h, n, ld, sr, lang) in dedup.items():
        agg = want.setdefault(lang, [0, 0, 0.0, 0.0])
        agg[0] += 1
        agg[1] += n
        agg[2] += ld
        agg[3] += sr
    out = _run(spark, "pipeline_llm_data_prep")
    assert set(out["predicted_lang"]) == set(want)
    for _, r in out.iterrows():
        a = want[r["predicted_lang"]]
        assert r["n_docs"] == a[0]
        assert r["total_tokens"] == a[1]
        assert abs(r["avg_lexical_diversity"] - _round_half_up(a[2] / a[0], 4)) < 2e-4
        assert abs(r["avg_stopword_ratio"] - _round_half_up(a[3] / a[0], 4)) < 2e-4


def test_pipeline_decontaminate_fuzzy_pin(spark):
    """Pure-python re-derivation of the REGISTERED fuzzy
    decontamination run (r13 pre-pay for a future demotion): hashlib
    md5 split buckets, 3-gram shingle sets, the 8-perm md5 minhash +
    4x2 banding candidate gate, exact Jaccard — no DuckDB, no Spark
    expressions."""
    import hashlib

    docs = pd.read_parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    texts = dict(zip(docs["doc_id"], docs["text"]))

    def bucket(doc_id) -> int:
        return (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            % 100
        )

    def shingles(t) -> set:
        toks = (t or "").strip().split()
        return {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        }

    def bands(sh: set) -> set:
        sig = [
            min(
                hashlib.md5(f"{i}|{s}".encode()).hexdigest()
                for s in sh
            )
            for i in range(8)
        ]
        return {
            (
                b,
                hashlib.md5(
                    f"{sig[2 * b]}|{sig[2 * b + 1]}".encode()
                ).hexdigest(),
            )
            for b in range(4)
        }

    tr = {d: shingles(t) for d, t in texts.items() if bucket(d) < 90}
    ev = {d: shingles(t) for d, t in texts.items() if bucket(d) >= 90}
    tr_bands = {d: bands(sh) for d, sh in tr.items() if sh}
    ev_bands = {d: bands(sh) for d, sh in ev.items() if sh}
    want = {}
    for d, db in tr_bands.items():
        for e, eb in ev_bands.items():
            if db & eb:
                inter = len(tr[d] & ev[e])
                j = round(inter / (len(tr[d]) + len(ev[e]) - inter), 4)
                if j >= 0.5:
                    want[(d, e)] = j
    out = _run(spark, "pipeline_decontaminate_fuzzy")
    got = {
        (r.doc_id, r.eval_id): r.jaccard for r in out.itertuples()
    }
    assert got == want
    assert len(got) > 0  # the fixture's cross-split near-dups surface


def test_mm_image_decontaminate_pin_is_own_file():
    """mm_image_decontaminate's independent pin lives in its own file
    (tests/test_image_dedup.py::
    test_decontaminate_registered_query_matches_frozen_values — a
    pure-python pHash re-derivation of the frozen VALUES oracle, the
    mm_image_phash_pairs convention); this marker test documents the
    citation so the rotation ledger's pre-pay claim is greppable."""
    import tests.test_image_dedup as t

    assert hasattr(
        t, "test_decontaminate_registered_query_matches_frozen_values"
    )
