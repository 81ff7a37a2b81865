"""Exact-quantile profiling: crafted-rank correctness, duplicate
handling, quantile_disc-semantics differential fuzz, and the
histogram-compression plan shape."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from flink_exercise_spark.operators.profiling import (
    PROFILE_QS,
    exact_quantiles,
    source_quantile_profile,
)
from tests.conftest import SF_SMOKE


def _ref_quantile(values: list[int], q: float) -> int:
    """Independent rank reference: ceil(q*n) on the sorted multiset,
    floored at rank 1 (probed DuckDB quantile_disc semantics)."""
    s = sorted(values)
    rank = max(1, math.ceil(q * len(s)))
    return s[rank - 1]


def test_crafted_ranks(spark):
    rows = [("g", v) for v in [10, 20, 30, 40]]
    df = spark.createDataFrame(rows, "g string, v long")
    out = exact_quantiles(df, ["g"], "v", (0.25, 0.5, 0.75, 1.0)).collect()[0]
    assert (out["n"], out["p25"], out["p50"], out["p75"], out["p100"]) == (
        4, 10, 20, 30, 40,
    )


def test_duplicates_count_by_multiplicity(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", 1), ("g", 1), ("g", 9)], "g string, v long"
    )
    out = exact_quantiles(df, ["g"], "v", (0.5, 0.9)).collect()[0]
    assert out["p50"] == 1 and out["p90"] == 9


def test_nulls_excluded_and_groups_independent(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", 7)], "g string, v long"
    )
    got = {
        r["g"]: (r["n"], r["p50"]) for r in
        exact_quantiles(df, ["g"], "v", (0.5,)).collect()
    }
    assert got == {"a": (2, 1), "b": (1, 7)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_matches_rank_reference_and_duckdb(spark, duck, seed):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(50))
        for _ in range(rng.randrange(1, 400))
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r for r in exact_quantiles(df, ["g"], "v", PROFILE_QS).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        assert out[g]["n"] == len(vals)
        for q in PROFILE_QS:
            col = f"p{int(round(q * 100))}"
            assert out[g][col] == _ref_quantile(vals, q), (g, q)
            got_duck = duck.execute(
                "SELECT quantile_disc(v, ?) FROM (SELECT unnest(?) AS v)",
                [q, vals],
            ).fetchone()[0]
            assert out[g][col] == got_duck, (g, q)


def test_profile_plan_shape(spark):
    """The scale contract: ONE corpus-side shuffle into the histogram
    (hash partial+final), ONE Window over histogram-sized data, no
    SortAggregate, no cartesian."""
    from flink_exercise_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        source_quantile_profile(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    # Exactly two hash exchanges: corpus -> histogram (keyed by
    # (group, v)) and histogram -> window/final-agg (keyed by group).
    # The quantile aggregate itself rides the window's partitioning —
    # a third exchange would mean the co-partitioning broke.
    assert plan.count("Exchange hashpartitioning") == 2
    # Both window frames (running + total) share ONE sort.
    assert plan.count("Sort [") == 1


def test_profile_on_fixture_matches_reference(spark):
    import pandas as pd
    import re

    docs_pd = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    from flink_exercise_spark.sources.tables import load_table

    out = source_quantile_profile(load_table(spark, SF_SMOKE, "documents"))
    got = {
        (r["source"], r["metric"]): (r["n"], r["p50"], r["p90"])
        for r in out.collect()
    }
    for src, grp in docs_pd.groupby("source"):
        chars = grp["n_chars"].dropna().astype(int).tolist()
        toks = [
            len(re.split(r"\s+", t.strip()))
            for t in grp["text"]
            if t is not None
        ]
        assert got[(src, "n_chars")] == (
            len(chars),
            _ref_quantile(chars, 0.5),
            _ref_quantile(chars, 0.9),
        )
        assert got[(src, "n_tok")] == (
            len(toks),
            _ref_quantile(toks, 0.5),
            _ref_quantile(toks, 0.9),
        )
