"""Filter / predicate operators (SURVEY.md §2.3).

Reference parity: not-equal row drop (games.py:50), not-null keep
(playByplay.py:98, boxScores.py:35), NOT-IN marker removal
(boxScores.py:79), OR-of-predicates (games.py:70-72), and the three
predicate "UDFs" — createMask split-arity (coaches.py:64-72), isNumber
castable-to-int (coaches.py:102-110), numeric-instance check
(playByplay.py:117).

Policy §2.12: every predicate is a built-in Column expression so it
pushes down to the Parquet scan; no Python UDF filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_neq(df: DataFrame, col: str, value) -> DataFrame:
    """F1: ``df[df.Date != 'Playoffs']`` — note SQL semantics drop NULLs too."""
    return df.filter(F.col(col) != F.lit(value))


def filter_not_null(df: DataFrame, col: str) -> DataFrame:
    """F2: keep rows where ``col`` is present (played games)."""
    return df.filter(F.col(col).isNotNull())


def filter_not_in(df: DataFrame, col: str, values: list) -> DataFrame:
    """F3: conjunctive != chain == NOT IN (drops 'Reserves'/'Team Totals')."""
    return df.filter(~F.col(col).isin(values))


def filter_any(df: DataFrame, *predicates: Column) -> DataFrame:
    """F4: disjunction of predicates (2018 exhibition-game drop)."""
    cond = predicates[0]
    for p in predicates[1:]:
        cond = cond | p
    return df.filter(cond)


def split_arity_predicate(col: str, sep: str, arity: int) -> Column:
    """F5: createMask — keep rows whose ``col`` splits into ``arity`` parts.

    Built-in replacement for the reference's row-wise lambda: no UDF, so
    the predicate stays inside codegen and can be partially pushed down.
    """
    return F.size(F.split(F.col(col), sep)) == F.lit(arity)


def try_cast_predicate(col: str, to: str = "bigint") -> Column:
    """F6/F7: isNumber — keep rows where ``col`` parses as ``to``.

    ANSI-safe: uses try_cast (plain cast throws under Spark 4 ANSI mode).
    """
    return F.col(col).try_cast(to).isNotNull()


def filter_castable(df: DataFrame, col: str, to: str = "bigint") -> DataFrame:
    return df.filter(try_cast_predicate(col, to))
