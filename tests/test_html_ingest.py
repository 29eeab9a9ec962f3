"""HTML-boundary golden tests (SURVEY §2.1 S1/S2): recorded page bytes
→ parse_tables/parse_anchors → fetch_urls mapInPandas fan-out →
relational layer → the SAME final frames as the in-memory fixture
pipelines. Closes the input gap with the reference scrapers
(games.py:23, coaches.py:15-19, boxScores.py:43) without network."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nba_pipeline_spark.pipelines import fixtures as FX
from nba_pipeline_spark.pipelines.boxscores import build_boxscores
from nba_pipeline_spark.pipelines.coaches import build_coaches
from nba_pipeline_spark.pipelines.games import build_games
from nba_pipeline_spark.sources.edge_ingest import (
    cells_to_columns,
    fetch_urls,
    recorded_html_fetcher,
)
from nba_pipeline_spark.sources.html_parse import parse_anchors, parse_tables

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "html")


def _page(name: str) -> str:
    with open(os.path.join(FIX, name), encoding="utf-8") as f:
        return f.read()


# --- parser unit coverage -----------------------------------------------------

def test_parse_tables_quirks():
    tables = parse_tables(_page("games_NBA_1997.html"))
    assert len(tables) == 1
    t = tables[0]
    # duplicate PTS headers mangled pandas-style
    assert t["header"] == [
        "Date", "Visitor/Neutral", "PTS", "Home/Neutral", "PTS.1", "Attend.", "Notes",
    ]
    # 'Playoffs' section row surfaces as a padded data row, not a header
    playoffs = [r for r in t["rows"] if r[0] == "Playoffs"]
    assert playoffs == [["Playoffs", None, None, None, None, None, None]]
    # anchor text contributes to the cell
    assert t["rows"][0][1] == "Chicago Bulls"


def test_two_level_header_flatten():
    t = parse_tables(_page("coach_jacksph01c.html"))[0]
    # the over-header (Regular Season / Playoffs) loses to the leaf row,
    # whose duplicated G/W/L/W-L% names mangle to .1 variants
    assert t["header"] == [
        "Season", "Age", "Tm", "Lg",
        "G", "W", "L", "W/L%", "G.1", "W.1", "L.1", "W/L%.1",
    ]
    assert t["rows"][0][0] == "1996-97"


def test_parse_anchors_order_preserved():
    anchors = parse_anchors(_page("coaches_list.html"))
    hrefs = [h for h, _ in anchors]
    assert hrefs == [
        "/coaches/jacksph01c.html", "/coaches/doeja99c.html",
        "/coaches/jacksph01c.html", "/coaches/smithri02c.html",
    ]
    # the reference's order-preserving dedup (coaches.py:22)
    assert list(dict.fromkeys(hrefs)) == [
        "/coaches/jacksph01c.html", "/coaches/doeja99c.html", "/coaches/smithri02c.html",
    ]


# --- golden: games chain from HTML bytes --------------------------------------

GAME_COLS = {
    "Date": "Date", "Start (ET)": "startET", "Visitor/Neutral": "awayTeam",
    "PTS": "pointsAway", "Home/Neutral": "homeTeam", "PTS.1": "pointsHome",
    "Attend.": "attendance", "Notes": "notes",
}


def _games_from_html(spark):
    pages = {
        "https://rec.test/leagues/NBA_1997_games-october.html": _page("games_NBA_1997.html"),
        "https://rec.test/leagues/NBA_2019_games-october.html": _page("games_NBA_2019.html"),
    }
    raw = fetch_urls(
        spark, sorted(pages), fetcher=recorded_html_fetcher(pages, columns=GAME_COLS)
    )
    cols = cells_to_columns(raw, list(GAME_COLS.values()))
    return cols.select(
        "Date",
        "startET",
        "awayTeam",
        F.col("pointsAway").try_cast("double").alias("pointsAway"),
        "homeTeam",
        F.col("pointsHome").try_cast("double").alias("pointsHome"),
        # build_games strips thousands separators itself; keep the raw string
        "attendance",
        "notes",
        (F.regexp_extract("url", r"NBA_(\d+)", 1).cast("long") - 1).alias("seasonStartYear"),
    )


def _rows(df, cols, order):
    return [tuple(r[c] for c in cols) for r in df.orderBy(*order).collect()]


def test_games_golden_html_vs_fixture(spark):
    from_html = build_games(_games_from_html(spark), spark)
    from_fx = build_games(FX.games_raw(spark), spark)
    cols = [
        "seasonStartYear", "awayTeam", "pointsAway", "homeTeam", "pointsHome",
        "attendance", "notes", "startET", "datetime", "isRegular", "game_id",
    ]
    assert _rows(from_html, cols, ["datetime"]) == _rows(from_fx, cols, ["datetime"])
    assert from_html.count() == 5  # Playoffs header + exhibition dropped


# --- golden: coaches chain (anchor walk -> per-coach pages) -------------------

COACH_COLS = {
    "Season": "Season", "Age": "Age", "Tm": "Tm", "Lg": "Lg",
    "G": "G", "W": "W", "L": "L", "W/L%": "WLpct",
    "G.1": "G2", "W.1": "W2", "L.1": "L2", "W/L%.1": "WL2pct",
}


def test_coaches_golden_html_vs_fixture(spark):
    base = "https://rec.test"
    hrefs = [h for h, _ in parse_anchors(_page("coaches_list.html"))]
    names = dict(parse_anchors(_page("coaches_list.html")))
    deduped = list(dict.fromkeys(hrefs))  # coaches.py:22 order-preserving dedup
    pages = {
        base + h: _page("coach_" + h.rsplit("/", 1)[-1]) for h in deduped
    }
    raw = fetch_urls(
        spark,
        [base + h for h in deduped],
        fetcher=recorded_html_fetcher(pages, columns=COACH_COLS),
    )
    cols = cells_to_columns(raw, list(COACH_COLS.values()))
    # coachName from the anchor text, coach_id from dedup order — the
    # reference's per-URL loop context, joined back as a broadcast dim
    dim = spark.createDataFrame(
        [(base + h, names[h], i + 1) for i, h in enumerate(deduped)],
        "url string, coachName string, coach_id long",
    )
    raw_frame = cols.join(F.broadcast(dim), "url").select(
        "coachName", "coach_id", "Season", "Age", "Tm", "Lg",
        "G", "W", "L", "WLpct", "G2", "W2", "L2", "WL2pct",
    )
    head_h, asst_h = build_coaches(raw_frame)
    head_f, asst_f = build_coaches(FX.coaches_raw(spark))
    hc = [
        "coachName", "coach_id", "seasonStartYear", "Tm", "coachType",
        "games_reg", "wins_reg", "losses_reg",
        "games_playoff", "wins_playoff", "losses_playoff",
    ]
    key = ["coach_id", "seasonStartYear"]
    assert _rows(head_h, hc, key) == _rows(head_f, hc, key)
    ac = ["coachName", "coach_id", "seasonStartYear", "Tm", "coachType"]
    assert _rows(asst_h, ac, key) == _rows(asst_f, ac, key)


# --- golden: boxscores chain (two tables per page -> away/home) ---------------

def test_boxscores_golden_html_vs_fixture(spark):
    url = "https://rec.test/boxscores/g1.html"
    pages = {url: _page("boxscore_g1.html")}
    raw = fetch_urls(
        spark,
        [url],
        fetcher=recorded_html_fetcher(
            pages,
            columns=["Starters", "MP", "PTS", "FG%"],
            table_index=None,
            prepend_table_idx=True,
        ),
    )
    cols = cells_to_columns(raw, ["tbl", "playerName", "MP", "PTS", "FGpct"])
    frame = cols.select(
        F.regexp_extract("url", r"/([^/]+)\.html", 1).alias("game_id"),
        # away table first, home second (boxScores.py:53-57)
        F.when(F.col("tbl") == "0", "BOS").otherwise("CHI").alias("teamName"),
        "playerName",
        "MP",
        F.col("PTS").try_cast("double").alias("PTS"),
        F.col("FGpct").try_cast("double").alias("FG%"),
        (F.col("row_idx") + 1).cast("long").alias("seq"),
    )
    out_h = build_boxscores(frame)
    out_f = build_boxscores(FX.boxscores_raw(spark))
    cc = [
        "game_id", "teamName", "playerName", "MP", "PTS",
        "isStarter", "secondsPlayed", "boxscore_id", "seq",
    ]
    assert _rows(out_h, cc, ["seq"]) == _rows(out_f, cc, ["seq"])
    flags = {r["playerName"]: r["isStarter"] for r in out_h.collect()}
    assert flags == {
        "Starter One": 1, "Starter Two": 1, "Bench One": 0,
        "Starter Three": 1, "Bench Two": 0,
    }
