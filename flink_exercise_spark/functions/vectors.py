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
    """Dot product of two equal-length array columns (double math)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_expr(a: str | Column) -> Column:
    """Euclidean norm of an array column."""
    sq = F.transform(_as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array columns (no zero-norm guard —
    callers filter zero vectors if the corpus can contain them)."""
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))
