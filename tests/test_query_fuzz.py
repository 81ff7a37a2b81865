"""Differential query fuzzing: randomly composed filter+aggregate
queries over lineitem, executed on Spark and DuckDB from one seeded
grammar, compared exactly. Catches expression-semantics divergence
(cast rules, NULL handling, date comparisons, rounding) that fixed
queries never sample.

Seeded => deterministic: failures reproduce by case index.
"""

from __future__ import annotations

import math
import random

import pytest

from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE
from tests.oracle import register_duck_views

N_CASES = 30

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
GROUP_COLS = ["l_returnflag", "l_linestatus"]
CMP = ["<", "<=", ">", ">=", "="]


def _gen_case(rng: random.Random) -> tuple[str, str]:
    """Return (where_sql, agg_sql) fragments valid in both dialects."""
    preds = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.random()
        if kind < 0.5:
            col = rng.choice(NUMERIC_COLS)
            op = rng.choice(CMP)
            if col == "l_quantity":
                val = rng.randint(1, 50)
            elif col == "l_extendedprice":
                val = rng.randint(1000, 90000)
            else:
                val = round(rng.uniform(0.0, 0.1), 3)
            preds.append(f"{col} {op} {val}")
        elif kind < 0.8:
            y = rng.randint(1995, 2001)
            m = rng.randint(1, 12)
            op = rng.choice(["<", ">="])
            preds.append(f"l_shipdate {op} TIMESTAMP '{y}-{m:02d}-01'")
        else:
            flag = rng.choice(["A", "N", "R"])
            preds.append(f"l_returnflag = '{flag}'")
    conj = rng.choice([" AND ", " OR "])
    where = conj.join(preds)

    col = rng.choice(NUMERIC_COLS)
    aggs = [
        "count(*) AS n",
        f"round(sum({col}), 2) AS s",
        f"round(avg({col}), 4) AS a",
        f"round(min({col}), 4) AS mn",
        f"round(max({col}), 4) AS mx",
    ]
    return where, ", ".join(rng.sample(aggs, rng.randint(2, 4)))


def _cases():
    rng = random.Random(20260813)
    return [_gen_case(rng) for _ in range(N_CASES)]


@pytest.mark.parametrize("idx", range(N_CASES))
def test_fuzzed_query_parity(spark, duck, idx):
    where, aggs = _cases()[idx]
    group = random.Random(idx).choice([None, "l_returnflag",
                                       "l_returnflag, l_linestatus"])
    sql = f"SELECT {aggs} FROM lineitem WHERE {where}"
    if group:
        sql = f"SELECT {group}, {aggs} FROM lineitem WHERE {where} GROUP BY {group}"

    prep(spark)
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("lineitem")
    register_duck_views(duck, SF_SMOKE)

    s = spark.sql(sql).toPandas()
    d = duck.execute(sql).df()
    assert sorted(s.columns) == sorted(d.columns), sql
    assert len(s) == len(d), f"{sql}\nspark={len(s)} duck={len(d)}"
    sc = sorted(s.columns)
    s2 = s[sc].sort_values(sc, ignore_index=True)
    d2 = d[sc].sort_values(sc, ignore_index=True)
    for c in sc:
        for i, (a, b) in enumerate(zip(s2[c], d2[c])):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                ok = math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
            else:
                ok = str(a) == str(b)
            assert ok, f"{sql}\ncol {c} row {i}: spark={a!r} duck={b!r}"
