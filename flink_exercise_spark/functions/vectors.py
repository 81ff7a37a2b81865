"""Vector (array<float> embedding) expression helpers.

All JVM-side higher-order functions — ``zip_with`` + ``aggregate`` keep
the dot product inside codegen instead of crossing into Python. Arrays
are cast to ``array<double>`` before arithmetic so the engine and the
DuckDB oracle accumulate identically-typed sums (floats would diverge in
the last bits and break value-hash parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_expr(a: str | Column, b: str | Column) -> Column:
    """Dot product of two equal-length array columns (double math).
    Memoized when both operands are column NAMES (r14 exprmemo —
    the HOF lambdas cost dozens of py4j round trips per build)."""
    if isinstance(a, str) and isinstance(b, str):
        from flink_exercise_spark.functions.exprmemo import expr_memo

        return expr_memo(("dot_expr", a, b), lambda: _dot_build(a, b))
    return _dot_build(a, b)


def _dot_build(a: str | Column, b: str | Column) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_expr(a: str | Column) -> Column:
    """Euclidean norm of an array column. Memoized per column NAME
    (r14 exprmemo)."""
    if isinstance(a, str):
        from flink_exercise_spark.functions.exprmemo import expr_memo

        return expr_memo(("l2_norm_expr", a), lambda: _l2_build(a))
    return _l2_build(a)


def _l2_build(a: str | Column) -> Column:
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array columns (no zero-norm guard —
    callers filter zero vectors if the corpus can contain them).

    Per-pair cost is THREE array folds (dot + both norms); inside a
    join this recomputes each operand's norm for every candidate pair.
    Pairwise operators should precompute a norm column per side
    (``with_norm``) and use ``cosine_from_norms`` so per-pair work is a
    single dot product."""
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))


def with_norm(df, vec_col: str = "embedding", out: str = "norm"):
    """Add a precomputed L2-norm column — evaluate once per vector
    BEFORE a pairwise join, not once per candidate pair. Bound as a
    named column in its own projection so CollapseProject cannot
    duplicate the fold into downstream consumers."""
    return df.withColumn(out, l2_norm_expr(vec_col))


def cosine_from_norms(
    a: str | Column, b: str | Column, na: str | Column, nb: str | Column
) -> Column:
    """Cosine from precomputed norms: one fold per pair. The division
    ``dot / (na * nb)`` is the same expression shape as ``cosine_expr``
    and the DuckDB oracles, so results are bit-identical."""
    if all(isinstance(c, str) for c in (a, b, na, nb)):
        from flink_exercise_spark.functions.exprmemo import expr_memo

        return expr_memo(
            ("cosine_from_norms", a, b, na, nb),
            lambda: dot_expr(a, b) / (F.col(na) * F.col(nb)),
        )
    na_c = F.col(na) if isinstance(na, str) else na
    nb_c = F.col(nb) if isinstance(nb, str) else nb
    return dot_expr(a, b) / (na_c * nb_c)
