"""Aggregation operators (SURVEY.md §2.5).

Reference parity: whole-frame reductions (boxScores.py:48-49),
order-preserving key dedup (coaches.py:22,50), and the implied
warehouse grouped aggregates (IaC/variables.tf:26-30; keys from
boxScores.py:37-39).

Scale notes: groupBy compiles to partial (map-side) + final
HashAggregate, so the shuffle carries pre-combined rows; rollup/cube
expand grouping sets before the same partial agg; pivot with an
explicit value list avoids the extra distinct-scan pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_agg(df: DataFrame, aggs: dict[str, Column]) -> DataFrame:
    """A1: whole-frame reduction (single row)."""
    return df.agg(*[expr.alias(name) for name, expr in aggs.items()])


def distinct_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A2: dedup (``dict.fromkeys`` in the reference, minus order dependence)."""
    return df.dropDuplicates(subset) if subset else df.distinct()


def grouped_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """A4: grouped aggregation with automatic partial+final hash agg."""
    return df.groupBy(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def count_distinct_per_group(df: DataFrame, keys: list[str], col: str, out: str) -> DataFrame:
    """A5 exact: distinct-count per group (expand+two-phase under the hood)."""
    return df.groupBy(*keys).agg(F.countDistinct(col).alias(out))


def approx_count_distinct_per_group(
    df: DataFrame, keys: list[str], col: str, out: str, rsd: float = 0.05
) -> DataFrame:
    """A5 approx: HyperLogLog++ sketch — the 100 TB path (one pass, fixed
    memory per group, no expand). Not oracle-comparable bit-for-bit."""
    return df.groupBy(*keys).agg(F.approx_count_distinct(col, rsd).alias(out))


def rollup_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """A6: hierarchical subtotals (season -> team -> total)."""
    return df.rollup(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def cube_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """A6: all grouping-set combinations."""
    return df.cube(*keys).agg(*[expr.alias(name) for name, expr in aggs.items()])


def pivot_agg(
    df: DataFrame, keys: list[str], pivot_col: str, pivot_values: list, agg: Column
) -> DataFrame:
    """A7: long->wide (home/away columnar from long box scores).

    ``pivot_values`` is required: leaving it out forces an extra job to
    collect distinct values — wasteful and nondeterministic at scale.
    """
    return df.groupBy(*keys).pivot(pivot_col, pivot_values).agg(agg)


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_col: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for SKEWED group-by keys: pre-aggregate on
    (keys, salt) so one hot key's rows spread over ``n_salts`` reducers,
    then combine the per-salt partials on the true keys.

    Spark's map-side partial aggregation already handles most skew; the
    residual case is a final-stage reducer that still receives one hot
    key's combined partials from EVERY map task (low-cardinality keys at
    100 TB — think 5 event types over a trillion rows). AQE splits skewed
    JOIN partitions but not skewed aggregations, so the salt is the
    explicit fix. Exact for algebraic aggregates: counts and decimal
    sums re-combine losslessly; the second shuffle moves only
    keys x n_salts rows.

    ``salt_col`` must be deterministic (hash of some high-cardinality
    column, never rand() — retries must re-salt identically).
    """
    dec = F.col(value_col).cast("decimal(18,4)")
    partial = (
        df.withColumn("__salt", salt_col % n_salts)
        .groupBy(*keys, F.col("__salt"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(dec).alias("__s"),
            F.min(value_col).alias("__mn"),
            F.max(value_col).alias("__mx"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum("__s").cast("double").alias("sum_value"),
        F.min("__mn").alias("min_value"),
        F.max("__mx").alias("max_value"),
    )
