"""Player-salary dataset builder — Spark recomposition of the
reference's ``playerSalary.py`` (reference: data_ingestion/dags/playerSalary.py).

Reference chain: current-season table (cols 1,2 positionally, :20-22) +
history tables (:13-16), '$3,000,000' money strings, union with
inflationAdjSalary missing on current rows (:17-24 NaN-fill).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.projections import positional_select
from ..operators.setops import union_by_name


def parse_money(col: Column) -> Column:
    """'$3,140,000' -> 3140000 (bigint); ANSI-safe on junk."""
    return F.regexp_replace(col, r"[$,]", "").try_cast("bigint")


def build_salaries(
    current_raw: DataFrame, history_raw: DataFrame, current_season: int
) -> DataFrame:
    cur = positional_select(current_raw, [1, 2])  # P4 iloc[:, [1, 2]]
    cur = cur.withColumn("seasonStartYear", F.lit(current_season))
    hist = history_raw.drop("rk").withColumn("seasonStartYear", F.lit(current_season - 1))
    # U1: history rows carry inflationAdjSalary; current rows null-fill
    out = union_by_name(cur, hist)
    return out.select(
        "playerName",
        parse_money(F.col("salary")).alias("salary"),
        parse_money(F.col("inflationAdjSalary")).alias("inflationAdjSalary"),
        "seasonStartYear",
    )
