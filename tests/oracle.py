"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, and
values order-insensitively (columns sorted by name, rows sorted by all
columns) — the same shape as the driver's value-hash check, but with a
readable diff on failure.
"""

from __future__ import annotations

import math
import os

import pandas as pd

from flink_exercise_spark.sources.tables import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'"
        )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        # Arrow/pandas dtype unification: ints may come back as int32 vs
        # int64 across engines; decimals as Decimal objects.
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype == object:
            try:
                out[c] = pd.to_numeric(out[c])
            except (ValueError, TypeError):
                pass
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(spark_df, duck_df, name: str = "", float_tol: float = 1e-9) -> None:
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_df)
    assert list(s.columns) == list(d.columns), (
        f"{name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}"
    )
    assert len(s) == len(d), f"{name}: row count spark={len(s)} duck={len(d)}"
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None or (math.isnan(a) and math.isnan(b)):
                    if (a is None) == (b is None):
                        continue
                ok = (
                    a is not None
                    and b is not None
                    and math.isclose(a, b, rel_tol=float_tol, abs_tol=float_tol)
                )
            else:
                ok = a == b
            assert ok, f"{name}: col {c} row {i}: spark={a!r} duck={b!r}"


def run_pair(spark, con, sf_dir: str, name: str):
    from flink_exercise_spark import registry

    spec = registry.specs()[name]
    spark_df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None, f"{name} has no oracle"
    duck_df = con.execute(spec.oracle).df()
    compare(spark_df, duck_df, name=name)
