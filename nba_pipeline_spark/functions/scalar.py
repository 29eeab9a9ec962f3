"""Scalar functions: string / date / math / conditional (SURVEY.md §2.9).

Every reference ``.apply(lambda)`` compiles to a built-in Column
expression here — zero Python UDFs, so expressions stay inside
whole-stage codegen and predicates built from them still push down.

Reference parity is cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_part(col: Column, sep: str, index: int) -> Column:
    """M1/M3: ``s.split(sep)[index]`` (coaches.py:76 season start year;
    playByplay.py:43-47 score pair). 0-based index."""
    return F.split(col, sep).getItem(index)


def season_start_year(col: Column) -> Column:
    """M1: ``int(Season.split('-')[0])`` — ANSI-safe via try_cast."""
    return split_part(col, "-", 0).try_cast("int")


def mmss_to_seconds(col: Column) -> Column:
    """M2: ``"11:43.0"`` -> 703 (playByplay.py:11-17: min*60 + sec,
    fraction stripped)."""
    minute = split_part(col, ":", 0).try_cast("int")
    sec = split_part(split_part(col, ":", 1), "\\.", 0).try_cast("int")
    return minute * 60 + sec


def score_pair(col: Column) -> tuple[Column, Column]:
    """M3: ``"12-15"`` -> (12, 15) (playByplay.py:43-47). Unparseable
    strings yield NULLs (feeds the W2 forward-fill)."""
    return (
        split_part(col, "-", 0).try_cast("int"),
        split_part(col, "-", 1).try_cast("int"),
    )


def date_parts(col: Column) -> dict[str, Column]:
    """M4: datetime -> year/month/day components (playByplay.py:105)."""
    return {"year": F.year(col), "month": F.month(col), "day": F.dayofmonth(col)}


def parse_date(col: Column, fmt: str = "MMM d, yyyy") -> Column:
    """M5: explicit-format date parse replacing pandas inference
    (games.py:51 'Tue, Oct 29, 1996').

    Spark >= 3 rejects day-of-week (EEE) in PARSE patterns, so the
    weekday prefix is stripped before parsing — it carries no
    information the date doesn't.

    Tolerant by design: unparseable input yields NULL (try_to_timestamp)
    rather than an ANSI DateTimeException — one junk scraped row must
    not kill a 100 TB ingest job; the reference's pandas path likewise
    coerced to NaT.
    """
    return F.try_to_timestamp(F.regexp_replace(col, r"^[A-Za-z]+, ", ""), F.lit(fmt)).cast(
        "date"
    )


def fix_hornets(season: Column, team: Column, abbrev: Column) -> Column:
    """M6: the CHH special case (playByplay.py:5-9) — 2-column CASE."""
    return F.when(
        (season < F.lit(2014)) & (team == F.lit("Charlotte Hornets")), F.lit("CHH")
    ).otherwise(abbrev)


def bool_to_int(col: Column) -> Column:
    """M7: boolean -> 0/1 (games.py:64-65)."""
    return col.cast("int")


def null_out_dupes(target: Column, compare: Column, other: Column) -> Column:
    """M8: cleanDuplicateValues (playByplay.py:67-76) — NULL where the
    event text equals the point text or the point is NULL."""
    return (
        F.when(target == compare, F.lit(None))
        .when(compare.isNull(), F.lit(None))
        .otherwise(other)
    )


def coach_type(col: Column) -> Column:
    """M9: defineCoachType (coaches.py:86-96) — try-cast dispatch:
    numeric G -> 'Head Coach'; already-normalized suffixes kept; anything
    containing 'Coach' truncated to '...Coach'."""
    return (
        F.when(col.try_cast("int").isNotNull(), F.lit("Head Coach"))
        .when(~col.contains("Coach"), col)
        .otherwise(F.concat(F.split(col, "Coach").getItem(0), F.lit("Coach")))
    )


def surrogate_key(*natural_key: Column) -> Column:
    """M10: deterministic surrogate key.

    The reference uses ``uuid.uuid4().hex`` (games.py:83,
    playByplay.py:113) — nondeterministic across task retries, which
    corrupts joins at scale. Policy: sha256 of the natural key; stable
    under retry, speculative execution, and backfill re-runs.
    """
    return F.sha2(F.concat_ws("\x1f", *natural_key), 256)


def random_uuid() -> Column:
    """M10 (parity only): the reference's behavior — marked
    nondeterministic by Spark; do not join on it across stages."""
    return F.expr("uuid()")
