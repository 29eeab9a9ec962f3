"""format("manifest_lake") — the batch Python DataSource over the
manifest lake, with Catalyst filter pushdown driving manifest pruning
(sources/lake_datasource.py).

Also pins the engine's per-relation plan-cache behavior (Spark 4.1):
pushdown REPLACES the cached plan of a load() handle, so the safe
usage is one query per handle (`read_lake`). The hazard test asserts
the SAFE pattern, not the buggy value — an engine upgrade that fixes
the cache must not fail this suite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nba_pipeline_spark.sources import manifest as M
from nba_pipeline_spark.sources.lake_datasource import (
    ManifestLakeReader,
    read_lake,
    register_lake_source,
)


@pytest.fixture()
def lake(spark, tmp_path):
    p = str(tmp_path / "lake")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("band"),
        (F.col("id").cast("double") * 1.5).alias("x"),
    )
    for b in range(4):
        M.commit_append(
            spark, p, df.filter(F.col("band") == b),
            partition={"band": b}, stats_cols=["k", "band"],
        )
    return p


def test_full_read_parity(spark, lake):
    got = read_lake(spark, lake).agg(
        F.count(F.lit(1)), F.sum("k"), F.sum("x")
    ).collect()
    exp = M.read_snapshot(spark, lake).agg(
        F.count(F.lit(1)), F.sum("k"), F.sum("x")
    ).collect()
    assert got == exp
    assert dict(read_lake(spark, lake).dtypes) == {
        "k": "bigint", "band": "bigint", "x": "double"
    }


def test_pushdown_filters_correct_counts(spark, lake):
    assert read_lake(spark, lake).filter("band = 2").count() == 100
    assert read_lake(spark, lake).filter("k >= 390").count() == 10
    assert read_lake(spark, lake).filter(
        F.col("k").isin([5, 7, 399])
    ).count() == 3
    assert read_lake(spark, lake).filter("band = 2 and k < 100").count() == 25


def test_pushdown_prunes_partitions(spark, lake):
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In

    n_all = len(ManifestLakeReader({"path": lake}).partitions())

    r = ManifestLakeReader({"path": lake})
    list(r.pushFilters([EqualTo(("band",), 2)]))
    assert len(r.partitions()) < n_all  # partition-tag pruning

    # k interleaves across segments (k % 4 = band), so only the top
    # band's segment can contain 399: range skip keeps 1 of 4 segments
    r = ManifestLakeReader({"path": lake})
    list(r.pushFilters([GreaterThanOrEqual(("k",), 399)]))
    assert len(r.partitions()) < n_all  # min/max range pruning

    # point-in-range bisect needs per-segment-disjoint ranges: band is
    # constant per segment (min == max == b), so IN (2,) keeps one
    r = ManifestLakeReader({"path": lake})
    list(r.pushFilters([In(("band",), (2,))]))
    assert len(r.partitions()) < n_all  # point-in-range bisect

    # a probe pruned to zero still plans (>=1 sentinel partition) and
    # the read yields nothing
    r = ManifestLakeReader({"path": lake})
    list(r.pushFilters([EqualTo(("band",), 99)]))
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].value is None


def test_probes_consumed_not_sticky(spark, lake):
    """Reader-side state never leaks: after a filtered plan consumes
    its probes, an unfiltered partitions() on the same reader plans
    the full file set."""
    from pyspark.sql.datasource import EqualTo

    r = ManifestLakeReader({"path": lake})
    n_all = len(r.partitions())
    list(r.pushFilters([EqualTo(("band",), 2)]))
    assert len(r.partitions()) < n_all
    assert len(r.partitions()) == n_all  # probes were consumed


def test_fresh_handle_per_query_is_safe(spark, lake):
    """The documented contract for the engine's per-relation plan
    cache: a fresh load() after a filtered query sees every row."""
    assert read_lake(spark, lake).filter("band = 2").count() == 100
    assert read_lake(spark, lake).count() == 400


def test_time_travel_and_colmap(spark, lake):
    assert read_lake(spark, lake, version=1).count() == 100
    M.rename_column(spark, lake, "k", "key_id")
    t = read_lake(spark, lake)
    assert "key_id" in t.columns and "k" not in t.columns
    assert read_lake(spark, lake).filter("key_id >= 390").count() == 10


def test_schema_evolution_null_fill(spark, lake):
    wider = spark.range(400, 410).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("band"),
        (F.col("id").cast("double") * 1.5).alias("x"),
        F.lit("new").alias("tagcol"),
    )
    M.commit_append(spark, lake, wider)
    t = read_lake(spark, lake)
    assert t.count() == 410
    assert t.filter(F.col("tagcol").isNull()).count() == 400


def test_tombstone_gate(spark, lake):
    M.commit_delete_mor(
        spark, lake,
        M.read_snapshot(spark, lake).filter("k = 1").select("k"), ["k"],
    )
    with pytest.raises(Exception, match="tombstones"):
        read_lake(spark, lake).count()


def test_options_guards(spark, lake):
    with pytest.raises(Exception, match="version"):
        read_lake(spark, lake, version=99).count()
    register_lake_source(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("manifest_lake").load().count()
