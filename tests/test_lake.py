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


def test_catalog_ctas_insert_describe(spark):
    """SQL DDL surface over the session catalog: CTAS from a temp view,
    INSERT INTO appends, DESCRIBE/SHOW see the table, DROP removes it.
    (The warehouse dir is /tmp — saveAsTable/CTAS never touch the repo.)"""
    from nba_pipeline_spark.sources import load_table
    from conftest import SF_DIR

    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("nation_v")
    spark.sql("DROP TABLE IF EXISTS nation_small")
    spark.sql(
        "CREATE TABLE nation_small USING parquet AS "
        "SELECT n_nationkey, n_name FROM nation_v WHERE n_nationkey < 5"
    )
    try:
        assert spark.table("nation_small").count() == 5
        spark.sql("INSERT INTO nation_small VALUES (99, 'NATION_X')")
        assert spark.table("nation_small").count() == 6
        cols = [r["col_name"] for r in spark.sql("DESCRIBE TABLE nation_small").collect()]
        assert "n_nationkey" in cols and "n_name" in cols
        names = [r["tableName"] for r in spark.sql("SHOW TABLES").collect()]
        assert "nation_small" in names
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_small")


def test_cache_reuses_inmemory_relation(spark):
    """persist(): the second action scans the InMemoryRelation, not the
    parquet files — and results are identical either way."""
    from pyspark.sql import functions as F

    from nba_pipeline_spark.sources import load_table
    from conftest import SF_DIR

    base = load_table(spark, SF_DIR, "supplier").filter(F.col("s_acctbal") > 0)
    cold = base.groupBy("s_nationkey").count().collect()
    cached = base.persist()
    try:
        cached.count()  # materialize
        plan = cached.groupBy("s_nationkey").count()._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan[:500]
        warm = cached.groupBy("s_nationkey").count().collect()
        assert sorted(map(tuple, warm)) == sorted(map(tuple, cold))
    finally:
        cached.unpersist()


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an incremental backfill rewrites
    ONLY the partitions present in the incoming frame — static mode
    would truncate the whole table first. The idempotent-backfill
    primitive for a partitioned 100 TB lake."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, 1997, "a"), (2, 1997, "b"), (3, 1998, "c"), (4, 1999, "d")],
        "id long, yr int, v string",
    )
    base.write.partitionBy("yr").parquet(path)

    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        fix_1998 = spark.createDataFrame([(30, 1998, "c2")], "id long, yr int, v string")
        fix_1998.write.mode("overwrite").partitionBy("yr").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    got = {(r["id"], r["yr"], r["v"]) for r in spark.read.parquet(path).collect()}
    # 1997 and 1999 intact; 1998 replaced wholesale
    assert got == {(1, 1997, "a"), (2, 1997, "b"), (30, 1998, "c2"), (4, 1999, "d")}


def test_compact_batch_dirs_consolidates_and_preserves_rows(spark, tmp_path):
    """Trigger dirs below the newest -> one batch=<max-compacted> dir,
    identical row set; the NEWEST committed dir is deliberately left
    un-compacted (replay safety); re-running is a no-op; ingest can
    continue with higher ids."""
    from nba_pipeline_spark.sources.layout import compact_batch_dirs

    lake = str(tmp_path / "lake")
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, f"doc{i}-{j}") for j in range(4)], "id int, t string"
        ).write.parquet(f"{lake}/batch={i}")
    before = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}

    assert compact_batch_dirs(spark, lake) == 2  # 0,1 -> batch=1; newest kept
    import os
    dirs = sorted(d for d in os.listdir(lake) if d.startswith("batch="))
    assert dirs == ["batch=1", "batch=2"]
    after = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}
    assert after == before

    # only one dir below the newest -> nothing to consolidate
    assert compact_batch_dirs(spark, lake) == 0

    # ingest continues: a later trigger appends batch=3; next compact
    # folds 1,2 -> batch=2 and leaves 3 as the protected newest
    spark.createDataFrame([(99, "late")], "id int, t string").write.parquet(
        f"{lake}/batch=3"
    )
    assert compact_batch_dirs(spark, lake) == 2
    final = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}
    assert final == before | {(99, "late")}
    dirs2 = sorted(d for d in os.listdir(lake) if d.startswith("batch="))
    assert dirs2 == ["batch=2", "batch=3"]


def test_compact_batch_dirs_replay_safe_with_uncommitted_newest(spark, tmp_path):
    """A markerless (crashed mid-write) newest dir is never a
    consolidation source; a stream replay that mode('overwrite')s it
    can only clobber its own dir, never compacted history."""
    import os

    from nba_pipeline_spark.sources.layout import compact_batch_dirs

    lake = str(tmp_path / "lake")
    for i in range(2):
        spark.createDataFrame([(i, f"d{i}")], "id int, t string").write.parquet(
            f"{lake}/batch={i}"
        )
    settled = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}
    # crash mid-batch 2: dir exists, no _SUCCESS
    spark.createDataFrame([(2, "partial")], "id int, t string").write.parquet(
        f"{lake}/batch=2"
    )
    os.remove(f"{lake}/batch=2/_SUCCESS")

    # committed sources are 0,1 -> newest committed (1) excluded, so
    # only batch=0 is below it: nothing to consolidate, partial intact
    assert compact_batch_dirs(spark, lake) == 0
    assert os.path.isdir(f"{lake}/batch=2")
    assert sorted(d for d in os.listdir(lake) if d.startswith("batch=")) == [
        "batch=0",
        "batch=1",
        "batch=2",
    ]

    # replay: restart rewrites batch 2 over its own dir only
    spark.createDataFrame([(2, "replayed")], "id int, t string").write.mode(
        "overwrite"
    ).parquet(f"{lake}/batch=2")
    got = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}
    assert got == settled | {(2, "replayed")}


def test_compact_batch_dirs_recovers_from_crash_windows(spark, tmp_path):
    """(a) markerless tmp = dead partial write -> rolled back, sources
    intact; (b) marked tmp = committed -> swap completed on next run."""
    import os
    import shutil

    from nba_pipeline_spark.sources.layout import compact_batch_dirs

    lake = str(tmp_path / "lake")
    for i in range(3):
        spark.createDataFrame([(i, f"d{i}")], "id int, t string").write.parquet(
            f"{lake}/batch={i}"
        )
    rows = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}

    # (a) crash mid-write: tmp without _SUCCESS
    spark.createDataFrame([(7, "junk")], "id int, t string").write.parquet(
        f"{lake}/_compact_tmp_1"
    )
    os.remove(f"{lake}/_compact_tmp_1/_SUCCESS")
    assert compact_batch_dirs(spark, lake) == 2  # rollback, then compact 0,1
    got = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}
    assert got == rows

    # (b) crash after commit, before deletes/rename: marked tmp + stale dirs
    shutil.move(f"{lake}/batch=1", f"{lake}/_compact_tmp_1")
    spark.createDataFrame([(0, "stale")], "id int, t string").write.parquet(
        f"{lake}/batch=0"
    )
    # recovery deletes superseded ids <= 1 and renames the tmp into
    # place; afterwards only batch=1 sits below the newest -> no-op
    assert compact_batch_dirs(spark, lake) == 0
    got2 = {(r["id"], r["t"]) for r in spark.read.parquet(f"{lake}/batch=*").collect()}
    assert got2 == rows  # consolidated state won; stale batch=0 gone
