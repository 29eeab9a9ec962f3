"""Box-scores dataset builder — Spark recomposition of the reference's
``boxScores.py`` chain (reference: data_ingestion/dags/boxScores.py).

Reference chain: per-game fetch -> two-level header flatten
(boxScores.py:47-51) -> away/home flag (:53-57) -> isStarter marker scan
(:61-76) -> drop marker rows (:79) -> drop percentage cols (:80).

Spark version: the isStarter scan is the marker_flag_fill window over
(game_id, teamName, seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import mmss_to_seconds, surrogate_key
from ..operators.projections import drop_columns
from ..operators.windows import marker_flag_fill


def build_boxscores(box_raw: DataFrame) -> DataFrame:
    # W3: rows after 'Reserves' are bench (0); after 'Team Totals' the next
    # table's rows are starters again (1); first rows default 1; marker
    # rows dropped (boxScores.py:61-79).
    df = marker_flag_fill(
        box_raw,
        part=["game_id", "teamName"],
        order=["seq"],
        marker_value={"Reserves": 0, "Team Totals": 1},
        marker_col="playerName",
        out="isStarter",
        first_default=1,
    )
    df = drop_columns(df, ["FG%", "3P%", "FT%"])  # boxScores.py:80
    df = df.withColumn("secondsPlayed", mmss_to_seconds(F.col("MP")))
    df = df.withColumn(
        "boxscore_id", surrogate_key(F.col("game_id"), F.col("teamName"), F.col("playerName"))
    )
    return df
