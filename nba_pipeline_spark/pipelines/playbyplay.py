"""Play-by-play dataset builder — Spark recomposition of the reference's
``playByplay.py`` chain (reference: data_ingestion/dags/playByplay.py).

Reference chain: filter unplayed games (playByplay.py:98) -> team-name
abbreviation map + CHH fix (playByplay.py:84-99, 5-9) -> per-game fetch
loop + concat (playByplay.py:104-110) -> uuid4 play_id (:113) -> mm:ss
time parse (:115) -> numeric-time filter (:116-117) -> period counter
scan (:19-41) -> score forward-fill scan (:43-65) -> duplicate null-out
(:67-76) -> sink.

Spark version: the three sequential scans become window functions over
(game_id, seq) — the explicit ordering contract replacing scrape order.
One shuffle on game_id serves all three windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import mmss_to_seconds, null_out_dupes, score_pair, surrogate_key
from ..operators.filters import filter_castable
from ..operators.windows import forward_fill, running_count_with_reset

ORDER = ["seq"]
PART = ["game_id"]


def build_playbyplay(pbp_raw: DataFrame) -> DataFrame:
    df = pbp_raw.withColumn("periodTime", mmss_to_seconds(F.col("time")))
    # F7: drop embedded header rows whose time doesn't parse
    df = filter_castable(df.withColumn("pt_str", F.col("periodTime").cast("string")), "pt_str").drop("pt_str")
    # W1: period number — +1 at every 12:00 (=720s) marker after the first row
    df = running_count_with_reset(
        df, PART, ORDER, reset=F.col("periodTime") == 720, out="period"
    )
    # M3 + W2: parse 'a-b' score; carry last known; 0 at game start
    away, home = score_pair(F.col("score"))
    df = forward_fill(df, PART, ORDER, away, "awayPoints", default=0)
    df = forward_fill(df, PART, ORDER, home, "homePoints", default=0)
    # M8: null-out scraped artifacts where event text duplicates point text
    df = df.withColumn(
        "point_away", null_out_dupes(F.col("event_away"), F.col("point_away"), F.col("point_away"))
    ).withColumn(
        "point_home", null_out_dupes(F.col("event_home"), F.col("point_home"), F.col("point_home"))
    )
    # M10: deterministic play id
    df = df.withColumn("play_id", surrogate_key(F.col("game_id"), F.col("seq")))
    return df.select(
        "play_id", "game_id", "seq", "periodTime", "period",
        "awayPoints", "homePoints", "event_away", "point_away",
        "event_home", "point_home", "score",
    )
