"""End-to-end lake build — the reference's pipeline SHAPE as one Spark
job graph (SURVEY §1: staged ingest -> raw parquet lake -> transformed
/production tables; reference: per-season GCS objects at
scrape_data_to_gcs.py:196-266 + the unbuilt BigQuery layer).

``build_lake`` runs all six dataset builders over ingest frames and
writes:
- raw/: partitioned parquet (games/playbyplay partitioned by
  seasonStartYear-equivalent keys — the 100 TB pruning axes)
- warehouse: catalog tables (the production dataset the reference
  provisioned in Terraform but never loaded)

Airflow's role collapses to calling this function per schedule; there
is no local CSV hop and no per-object upload loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.cloud import save_as_warehouse_table
from ..sources.registry import write_partitioned
from .boxscores import build_boxscores
from .coaches import build_coaches
from .games import build_games
from .player_info import build_players
from .playbyplay import build_playbyplay
from .salary import build_salaries


def build_lake(
    spark: SparkSession,
    out_dir: str,
    games_raw: DataFrame,
    pbp_raw: DataFrame,
    box_raw: DataFrame,
    coaches_raw: DataFrame,
    salary_cur_raw: DataFrame,
    salary_hist_raw: DataFrame,
    players_raw: DataFrame,
    current_season: int = 1997,
) -> dict[str, DataFrame]:
    """Returns the built frames keyed by table name after writing the
    raw partitioned lake and registering warehouse tables."""
    games = build_games(games_raw, spark)
    pbp = build_playbyplay(pbp_raw)
    box = build_boxscores(box_raw)
    coaches_head, coaches_assist = build_coaches(coaches_raw)
    salaries = build_salaries(salary_cur_raw, salary_hist_raw, current_season)
    players = build_players(players_raw)

    # raw lake: season partitions = the reference's per-season objects
    write_partitioned(games, f"{out_dir}/raw/games", ["seasonStartYear"])
    write_partitioned(pbp, f"{out_dir}/raw/playbyplay", ["game_id"])
    write_partitioned(box, f"{out_dir}/raw/boxscores", ["game_id"])
    salaries.write.mode("overwrite").parquet(f"{out_dir}/raw/salaries")
    players.write.mode("overwrite").parquet(f"{out_dir}/raw/players")
    coaches_head.write.mode("overwrite").parquet(f"{out_dir}/raw/coaches")

    # warehouse layer (reference intent: production_nba_data dataset)
    tables = {
        "wh_games": games,
        "wh_playbyplay": pbp,
        "wh_boxscores": box,
        "wh_coaches": coaches_head,
        "wh_salaries": salaries,
        "wh_players": players,
    }
    for name, df in tables.items():
        save_as_warehouse_table(df, name)
    tables["wh_coaches_assistant"] = coaches_assist
    return tables
