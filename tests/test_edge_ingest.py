"""Edge-ingest fan-out plumbing (SURVEY S1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nba_pipeline_spark.sources.edge_ingest import fetch_urls


def test_fetch_urls_fans_out_and_isolates_errors(spark):
    urls = [f"http://example.test/players/{c}" for c in "abc"] + [
        "http://example.test/bad/page"
    ]
    out = fetch_urls(spark, urls, partitions=2)
    rows = out.collect()
    ok = [r for r in rows if r["fetch_error"] is None]
    bad = [r for r in rows if r["fetch_error"] is not None]
    assert len(ok) == 6  # 3 urls x 2 table rows
    assert len(bad) == 1 and "simulated fetch failure" in bad[0]["fetch_error"]
    # deterministic stub content survives the Arrow round-trip
    a = {tuple(r["cells"]) for r in ok if r["url"].endswith("/a")}
    assert a == {("a", "29"), ("A", str(ord("a") % 997))}


def test_fetch_urls_feeds_relational_layer(spark):
    urls = [f"http://example.test/t/{c}" for c in "xyz"]
    out = fetch_urls(spark, urls)
    # the edge frame composes with ordinary engine ops immediately
    tabular = out.filter(F.col("fetch_error").isNull()).select(
        "url", F.col("cells").getItem(0).alias("name"), F.col("cells").getItem(1).cast("int").alias("n")
    )
    assert tabular.count() == 6
    assert tabular.schema["n"].dataType.simpleString() == "int"
