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


def dot_fixed(a: Column, b: Column, dims: int) -> Column:
    """Dot product unrolled for a known dimensionality.

    Left-associated from 0.0 so the float accumulation order is
    IDENTICAL to ``dot`` (aggregate's acc chain) — bit-compatible
    results.

    Faster than the HOF ``dot`` ONLY inside whole-stage-codegen'd
    projections (zero allocation vs a 64-elem zip_with array per row).
    In INTERPRETED contexts — join conditions, where Catalyst pushes
    threshold filters — the relationship inverts hard: one
    zip_with/aggregate loop node beats this 64-term tree with 128
    getItem nodes ~4-6x (re-measured at sf0.1: 4.4 s vs 0.7 s in the
    LSH pair join). Rule: unrolled for codegen projects (csim, knn
    select), HOF for anything that can land in a join condition.
    """
    acc = F.lit(0.0)
    for i in range(dims):
        acc = acc + a.getItem(i) * b.getItem(i)
    return acc


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (try_divide).

    Both inputs are let-bound (functions/exprs.py): each is referenced
    twice (dot + norm), and callers routinely pass computed expressions
    (`to_double_array(col)`), which would otherwise be evaluated twice
    per row."""
    from .exprs import let

    return let(
        a, lambda aa: let(b, lambda bb: F.try_divide(dot(aa, bb), norm(aa) * norm(bb)))
    )


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
