"""Sort / limit / top-k operators (SURVEY.md §2.7).

Reference parity: global sort before key assignment (games.py:82),
head/tail slices (playByplay.py:102, boxScores.py:48-49).

Scale notes: ``orderBy`` is a range-partitioned sort (sampled
boundaries, parallel); ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject — per-partition top-k then a k-row merge on the
driver, no global sort. Always give a total order (unique tiebreak)
when the rows feed a hash-compared result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_sort(df: DataFrame, *order: Column) -> DataFrame:
    """O1: total sort (range partitioned)."""
    return df.orderBy(*order)


def ordered_limit(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O2: deterministic head — ORDER BY + LIMIT (TakeOrderedAndProject)."""
    return df.orderBy(*order).limit(k)


def tail_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O3: last-k = top-k of the reversed order (no driver .tail collect)."""
    return df.orderBy(*[c.desc() if hasattr(c, "desc") else F.col(c).desc() for c in order]).limit(k)


def top_k(df: DataFrame, score: Column, k: int, tiebreak: Column | None = None) -> DataFrame:
    """O4: global top-k by score."""
    order = [score.desc()] + ([tiebreak.asc()] if tiebreak is not None else [])
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, part: list[str], order: list[Column], k: int) -> DataFrame:
    """O4 grouped: top-k per group via row_number window (one shuffle)."""
    w = Window.partitionBy(*part).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")
