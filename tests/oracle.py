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
import pyarrow as pa

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


def _arrow_type_class(t: pa.DataType) -> str:
    """Hash-equivalence class of an arrow type. Width differences
    (int32 vs int64) hash identically under the driver's typed compare;
    CLASS differences (decimal128 vs int64, float vs int) do not —
    that's exactly what r6's one red row was (DuckDB windowed
    sum(BIGINT) -> HUGEINT -> decimal128 against Spark's int64,
    value-identical yet hash-mismatched)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_class(t.value_type)}>"
    return str(t)


def _spark_type_class(t) -> str:
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BinaryType):
        return "bytes"
    if isinstance(t, T.TimestampType):
        return "timestamp"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.ArrayType):
        return f"list<{_spark_type_class(t.elementType)}>"
    return str(t)


def compare_types(spark_df, duck_arrow_schema: pa.Schema, name: str) -> None:
    """Assert oracle and Spark column types fall in the same
    hash-equivalence class — the check the plain value compare cannot
    make (int(Decimal(5)) == 5 passes while the driver's typed hash
    fails). Runs on schemas only, before any rows are fetched."""
    stypes = {f.name: _spark_type_class(f.dataType) for f in spark_df.schema.fields}
    dtypes = {f.name: _arrow_type_class(f.type) for f in duck_arrow_schema}
    drift = {
        c: (stypes.get(c), dtypes.get(c))
        for c in set(stypes) | set(dtypes)
        if stypes.get(c) != dtypes.get(c)
    }
    assert not drift, (
        f"{name}: type-class drift (spark, oracle) per column: {drift} — "
        "cast the oracle (usually HUGEINT/DOUBLE from sum/floor) to the "
        "Spark side's class; see registry.py parity conventions"
    )


def run_pair(spark, con, sf_dir: str, name: str):
    from flink_exercise_spark import registry

    spec = registry.specs()[name]
    spark_df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None, f"{name} has no oracle"
    duck_tbl = con.execute(spec.oracle).arrow()
    compare_types(spark_df, duck_tbl.schema, name=name)
    compare(spark_df, duck_tbl.to_pandas(), name=name)
