"""End-to-end lake build: raw partitioned layout + warehouse star joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from nba_pipeline_spark.pipelines import fixtures as FX
from nba_pipeline_spark.pipelines.lake import build_lake


def test_build_lake_end_to_end(spark, tmp_path):
    out = str(tmp_path / "lake")
    tables = build_lake(
        spark,
        out,
        FX.games_raw(spark),
        FX.playbyplay_raw(spark),
        FX.boxscores_raw(spark),
        FX.coaches_raw(spark),
        FX.salary_raw_current(spark),
        FX.salary_raw_history(spark),
        FX.players_info_raw(spark),
    )
    # raw lake partition pruning works on the season axis
    games_back = spark.read.parquet(f"{out}/raw/games")
    assert games_back.filter(F.col("seasonStartYear") == 1996).count() == 3
    assert games_back.count() == 5
    # warehouse star join: plays enriched with their game's metadata
    enriched = spark.sql(
        """
        SELECT p.play_id, g.seasonStartYear
        FROM wh_playbyplay p JOIN wh_games g ON p.game_id = g.game_id
        """
    )
    # fixture pbp game ids ('g1','g2') are synthetic, so the join shape
    # works but matches nothing — the salary/player dimension join does:
    sal = spark.sql(
        """
        SELECT s.playerName, s.salary, pl.heightInches
        FROM wh_salaries s JOIN wh_players pl ON s.playerName = pl.playerName
        """
    ).collect()
    assert {r["playerName"] for r in sal} == {"Michael Jordan", "Magic Johnson"}
    assert enriched.count() == 0
    assert set(tables) >= {"wh_games", "wh_playbyplay", "wh_salaries"}
