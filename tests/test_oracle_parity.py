"""Every SQL-expressible registry query must hash-match its DuckDB
oracle — the local mirror of the driver's CORRECTNESS gate, run at
sf0.001 (fast) for all queries. Mark a handful as sf0.01 to catch
scale-sensitive divergence (FP rounding, tie-breaks) early.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle import register_duck_views, run_pair


def _oracle_names():
    from flink_exercise_spark import registry

    return sorted(n for n, s in registry.specs().items() if s.oracle)


@pytest.mark.parametrize("name", _oracle_names())
def test_parity_smoke(spark, duck, name):
    register_duck_views(duck, SF_SMOKE)
    run_pair(spark, duck, SF_SMOKE, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", _oracle_names())
def test_parity_sf001(spark, duck, name):
    register_duck_views(duck, SF_CORRECT)
    run_pair(spark, duck, SF_CORRECT, name)


def _demoted_names():
    from flink_exercise_spark import registry

    return sorted(
        n for n, s in registry.specs().items() if s.oracle and s.priority > 0
    )


@pytest.mark.parametrize("name", _demoted_names())
def test_parity_demoted(spark, duck, name):
    """Entries rotated out of the driver's verification window this
    round (priority>0) are hash-verified at the driver's own scale
    (sf0.01) in the default suite — NOT behind the slow marker — so a
    rotation never leaves a query checked only at smoke scale."""
    register_duck_views(duck, SF_CORRECT)
    run_pair(spark, duck, SF_CORRECT, name)


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a DataFrame."""
    from flink_exercise_spark import registry

    for name, spec in registry.specs().items():
        if spec.oracle is None:
            df = spec.fn(spark, SF_SMOKE)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"window_start", "top_user", "n_requests"}


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
