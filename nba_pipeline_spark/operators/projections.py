"""Projection / column operators (SURVEY.md §2.2).

Reference parity: pandas ``rename`` (playerInfo.py:11), positional
``set_axis`` (games.py:86-87, coaches.py:79-80), ``drop(columns=...)``
(10 sites), ``iloc[:, [i,j]]`` (playerSalary.py:21), literal columns
(playerSalary.py:16 etc.), multi-level header flatten
(coaches.py:50-53, boxScores.py:47-51), duplicate-name disambiguation
(coaches.py:45-46).

All pure Column expressions — Catalyst prunes everything not selected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1: rename by name (pandas ``df.rename(columns=...)``)."""
    return df.withColumnsRenamed(mapping)


def positional_rename(df: DataFrame, names: list[str]) -> DataFrame:
    """P2: full positional header swap (pandas ``set_axis``)."""
    if len(names) != len(df.columns):
        raise ValueError(f"need {len(df.columns)} names, got {len(names)}")
    return df.toDF(*names)


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P3: drop columns; silently ignores absent names like pandas errors='ignore'."""
    return df.drop(*cols)


def positional_select(df: DataFrame, indices: list[int]) -> DataFrame:
    """P4: select by column position (pandas ``iloc[:, idx]``)."""
    return df.select(*[df.columns[i] for i in indices])


def with_literals(df: DataFrame, values: dict[str, object]) -> DataFrame:
    """P5: add constant columns (``table['seasonStartYear'] = year - 1``)."""
    return df.withColumns({name: F.lit(v) for name, v in values.items()})


def flatten_struct(df: DataFrame, struct_col: str, prefix: str = "") -> DataFrame:
    """P6: multi-level header flatten — nested struct -> top-level columns."""
    fields = df.schema[struct_col].dataType.names
    flat = [F.col(f"{struct_col}.{f}").alias(f"{prefix}{f}") for f in fields]
    others = [F.col(c) for c in df.columns if c != struct_col]
    return df.select(*others, *flat)


def disambiguate(df: DataFrame, dupes: dict[str, tuple[str, str]]) -> DataFrame:
    """P7: regular vs playoff duplicate headers -> suffixed names.

    ``dupes`` maps a base name to the (first, second) aliases for the two
    positional occurrences of that name. Duplicate names are ambiguous to
    resolve by name, so this is a positional full-header swap (toDF).
    """
    seen: dict[str, int] = {}
    names: list[str] = []
    for c in df.columns:
        if c in dupes:
            k = seen.get(c, 0)
            seen[c] = k + 1
            names.append(dupes[c][k])
        else:
            names.append(c)
    return df.toDF(*names)
