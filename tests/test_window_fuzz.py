"""Differential fuzzing of EVENT-TIME WINDOW semantics — the engine's
core domain. Randomly composed (window size, aggregate set, group key,
filter) cases over `events`, executed through Spark's `window()` and
DuckDB's epoch-floor arithmetic from one seeded grammar, compared
exactly. Samples the window-alignment / rounding / NULL space the
fixed reference queries never reach (odd window sizes, sub-day
windows, per-type keys).

Spark tumbling windows are Unix-epoch-aligned for any second-granular
duration, which is exactly `floor(epoch(ts)/W)*W` — the invariant the
whole oracle suite rests on; this fuzzer stress-tests it across ~20
window sizes instead of one.

Float comparison note: the curated oracles round to fixed digits and
hash-compare, betting sum-order differences sit far below the rounded
digit. This fuzzer PROVED that bet probabilistic — its first run found
a window slice whose avg lands exactly on a 4dp rounding boundary
(52.91875), rounding to 52.9187 on Spark and 52.9188 on DuckDB purely
from summation order. So here float aggregates are compared RAW with
rel_tol=1e-9 (double summation of ~60k values accumulates ~1e-11
relative error), which checks the semantics without betting on
boundary luck. The curated oracles keep rounding because the external
driver needs bit-equal hashes — their specific values were verified
off-boundary.
"""

from __future__ import annotations

import math
import random

import pytest

from flink_exercise_spark.session import prep
from flink_exercise_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE
from tests.oracle import register_duck_views

N_CASES = 20

# window sizes in seconds: sub-hour through multi-week, deliberately
# including "ugly" non-round sizes
WINDOW_SECS = [
    900, 3600, 5400, 7200, 10800, 86400, 90000, 172800, 604800,
    1209600, 2678400, 777600, 129600, 43200, 21600, 3000, 4444,
    100000, 250000, 1000000,
]


def _gen_case(rng: random.Random) -> dict:
    w = rng.choice(WINDOW_SECS)
    aggs = rng.sample(
        [
            ("count(*)", "n"),
            ("sum(coalesce(value, 0))", "sv"),
            ("avg(value)", "av"),
            ("min(value)", "mnv"),
            ("max(value)", "mxv"),
            ("count(DISTINCT user_id)", "du"),
            ("CAST(floor(sum(coalesce(value,0)) / count(*)) AS BIGINT)", "fa"),
        ],
        rng.randint(2, 4),
    )
    key = rng.choice([None, "event_type"])
    pred = rng.choice(
        [None, "value >= 50", "value < 25.5", "event_type <> 'view'"]
    )
    return {"w": w, "aggs": aggs, "key": key, "pred": pred}


def _cases():
    rng = random.Random(31337)
    return [_gen_case(rng) for _ in range(N_CASES)]


@pytest.mark.parametrize("idx", range(N_CASES))
def test_fuzzed_window_parity(spark, duck, idx):
    c = _cases()[idx]
    w = c["w"]
    win = f"CAST(floor(epoch(ts)/{w})*{w} AS BIGINT)"
    spark_win = f"CAST(unix_timestamp(window(ts, '{w} seconds').start) AS BIGINT)"
    agg_sql = ", ".join(f"{e} AS {a}" for e, a in c["aggs"])
    keys_d = ["window_start"] + ([c["key"]] if c["key"] else [])
    where = f" WHERE {c['pred']}" if c["pred"] else ""

    duck_sql = (
        f"SELECT {win} AS window_start"
        + (f", {c['key']}" if c["key"] else "")
        + f", {agg_sql} FROM events{where} GROUP BY "
        + ", ".join(keys_d)
    )
    spark_sql = (
        f"SELECT {spark_win} AS window_start"
        + (f", {c['key']}" if c["key"] else "")
        + f", {agg_sql} FROM events{where} GROUP BY "
        + spark_win
        + (f", {c['key']}" if c["key"] else "")
    )

    prep(spark)
    load_table(spark, SF_SMOKE, "events").createOrReplaceTempView("events")
    register_duck_views(duck, SF_SMOKE)

    s = spark.sql(spark_sql).toPandas()
    d = duck.execute(duck_sql).df()
    assert sorted(s.columns) == sorted(d.columns), spark_sql
    assert len(s) == len(d), (
        f"w={w}\n{spark_sql}\nspark={len(s)} duck={len(d)}"
    )
    sc = sorted(s.columns)
    # Sort rows by the EXACT group keys only: letting float aggregate
    # columns participate in the sort could mis-align rows whose float
    # values differ by cross-engine summation error.
    s2 = s[sc].sort_values(keys_d, ignore_index=True)
    d2 = d[sc].sort_values(keys_d, ignore_index=True)
    for col in sc:
        for i, (a, b) in enumerate(zip(s2[col], d2[col])):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                ok = math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
            else:
                ok = str(a) == str(b)
            assert ok, (
                f"w={w} col {col} row {i}: spark={a!r} duck={b!r}\n"
                f"{spark_sql}"
            )
