"""Set operators (SURVEY.md §2.8).

Reference parity: ``pd.concat`` union-by-name with NaN-fill of missing
columns (9 sites, e.g. games.py:34-40 covid-only ``startET``), and
dedup-after-concat (coaches.py:22).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """U1: align on column names, null-fill gaps — exactly
    ``pd.concat`` semantics minus the index."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: SQL UNION."""
    return a.unionByName(b).distinct()


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: SQL INTERSECT."""
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: SQL EXCEPT (set semantics — removes every value present in b)."""
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: SQL EXCEPT ALL (bag semantics)."""
    return a.exceptAll(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: SQL INTERSECT ALL (bag semantics — keeps min(count_a, count_b)
    copies of each value). Plans as a grouped-count join, one shuffle
    per side, no row explosion."""
    return a.intersectAll(b)
