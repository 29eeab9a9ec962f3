"""Vector math over array<float> embedding columns (SURVEY.md §2.10 X4).

JVM-side higher-order functions (zip_with/aggregate) — no Python in
the inner loop. Floats are widened to double before accumulation so
results are engine-portable (and match a double-precision oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (try_divide)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize (dot of normalized vectors == cosine)."""
    n = norm(a)
    return F.transform(a, lambda x: F.try_divide(x, n))
