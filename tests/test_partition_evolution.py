"""Partition evolution on the manifest lake: segments tagged under an
OLD partition spec coexist with a finer/different new spec — pruning
stays sound (a probe on a column a segment isn't tagged by keeps it),
and probes on either generation's columns skip what they can prove."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nba_pipeline_spark.sources import manifest as M


@pytest.fixture()
def lake(spark, tmp_path):
    """Gen-1: segments tagged {g}; gen-2 (evolved, finer): {g, h}."""
    p = str(tmp_path / "lake")

    def rows(lo, g, h):
        return spark.createDataFrame(
            [(lo + i, g, h) for i in range(3)], "k int, g int, h string"
        )

    M.commit_append(spark, p, rows(0, 1, "x"), partition={"g": 1})
    M.commit_append(spark, p, rows(10, 2, "y"), partition={"g": 2})
    M.commit_append(spark, p, rows(20, 3, "x"), partition={"g": 3, "h": "x"})
    M.commit_append(spark, p, rows(30, 3, "y"), partition={"g": 3, "h": "y"})
    return p


def test_probe_on_old_spec_prunes_both_generations(spark, lake):
    assert len(M.resolve_segments(spark, lake, part_eq={"g": 1})) == 1
    assert len(M.resolve_segments(spark, lake, part_eq={"g": 3})) == 2


def test_probe_on_new_column_keeps_untagged_old_segments(spark, lake):
    segs = M.resolve_segments(spark, lake, part_eq={"h": "x"})
    # gen-1 segments lack an 'h' tag -> provably-unknowable -> kept;
    # the h=y gen-2 segment is provably disjoint -> pruned
    assert len(segs) == 3
    got = {
        r["k"]
        for r in M.read_snapshot(spark, lake, part_eq={"h": "x"})
        .filter(F.col("h") == "x")
        .collect()
    }
    assert got == {0, 1, 2, 20, 21, 22}  # correctness independent of pruning


def test_combined_probe(spark, lake):
    segs = M.resolve_segments(spark, lake, part_eq={"g": 3, "h": "y"})
    assert len(segs) == 1


def test_files_and_partitions_metadata_tables(spark, lake):
    f = {r["segment"]: r for r in M.files(spark, lake).collect()}
    assert len(f) == 4
    assert all(r["n_rows"] == 3 for r in f.values())
    assert sorted(r["seq"] for r in f.values()) == [1, 2, 3, 4]
    p = {r["part"]: (r["n_segments"], r["n_rows"])
         for r in M.partitions(spark, lake).collect()}
    assert p['{"g": 1}'] == (1, 3)
    assert p['{"g": 3, "h": "x"}'] == (1, 3)


def test_cluster_refuses_tagged_lake_unless_opted_in(spark, tmp_path):
    import pytest as _pytest

    p = str(tmp_path / "zlake")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "k int, p int, v string"
    )
    M.commit_append_partitioned(spark, p, df, "p")
    with _pytest.raises(ValueError, match="allow_untag"):
        M.cluster(spark, p, ["k"], target_segments=4)
    # tags intact after the refusal
    assert len(M.resolve_segments(spark, p, part_eq={"p": 1})) == 1
    # explicit opt-in performs the trade
    M.cluster(spark, p, ["k"], target_segments=4, allow_untag=True)
    assert M.read_snapshot(spark, p).count() == 30


def test_cluster_partitioned_keeps_tags_and_skips_on_both(spark, tmp_path):
    p = str(tmp_path / "zp")
    df = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(90)], "k int, band int, val int"
    )
    M.commit_append_partitioned(spark, p, df, "band")
    v = M.cluster_partitioned(spark, p, "band", ["k"], target_segments_per_partition=3)
    m = M._read_manifest(spark, p, v)
    tagged = [s for s in m["segments"] if "part" in m["meta"].get(s, {})]
    assert len(tagged) == 9  # 3 partitions x 3 z-runs, all tagged
    # partition pruning still works
    assert len(M.resolve_segments(spark, p, part_eq={"band": 1})) == 3
    # z-range skipping works WITHIN the partition probe
    segs = M.resolve_segments(
        spark, p, part_eq={"band": 1}, ranges={"k": (0, 10)}
    )
    assert len(segs) < 3
    # contents intact
    got = {r["k"] for r in M.read_snapshot(spark, p).collect()}
    assert got == set(range(90))
    # partitioned MERGE still available after maintenance
    ch = spark.createDataFrame([(1, 1, 999, 1)], "k int, band int, val int, ver int")
    M.commit_upsert_partitioned(spark, p, ch, ["k"], "ver", "band")
    assert M.read_snapshot(spark, p).filter("k = 1").collect()[0]["val"] == 999


def test_cluster_partitioned_requires_full_tags(spark, tmp_path):
    p = str(tmp_path / "zp2")
    M.commit_append(
        spark, p, spark.createDataFrame([(1, 0, 1)], "k int, band int, val int")
    )
    with pytest.raises(ValueError, match="tagged"):
        M.cluster_partitioned(spark, p, "band", ["k"])


def test_describe_detail(spark, lake):
    d = M.describe_detail(spark, lake).collect()[0]
    assert d["version"] == 4 and d["last_op"] == "append"
    assert d["n_segments"] == 4 and d["n_tombstones"] == 0
    assert d["size_bytes"] > 0
    assert d["schema"] == "k int, g int, h string"
    assert d["partition_cols"] == ["g", "h"]
    assert d["n_constraints"] == 0


def test_cluster_incremental_folds_only_receiving_runs(spark, tmp_path):
    p = str(tmp_path / "zi")
    base = spark.createDataFrame(
        [(i, (i * 37) % 400) for i in range(400)], "a int, b int"
    )
    M.commit_append(spark, p, base)
    M.cluster(spark, p, ["a", "b"], target_segments=4, bits_per_col=4)
    m1 = M._read_manifest(spark, p, M.current_version(spark, p))
    runs1 = {
        m1["meta"][s]["cluster"]["zrun"]: s
        for s in m1["segments"]
        if "cluster" in m1["meta"].get(s, {})
    }
    assert len(runs1) == 4
    # append rows living entirely in the LOW corner of key space
    M.commit_append(spark, p, spark.createDataFrame(
        [(i, i) for i in range(5)], "a int, b int"))
    v = M.cluster_incremental(spark, p)
    m2 = M._read_manifest(spark, p, v)
    runs2 = {
        m2["meta"][s]["cluster"]["zrun"]: s
        for s in m2["segments"]
        if "cluster" in m2["meta"].get(s, {})
    }
    # every run id persists; only run 0 (the low corner) was rewritten
    assert set(runs2) == set(runs1)
    rewritten = {r for r in runs1 if runs1[r] != runs2[r]}
    assert rewritten == {0}
    # no unclustered segments remain and contents are exact
    assert all("cluster" in m2["meta"].get(s, {}) for s in m2["segments"])
    got = M.read_snapshot(spark, p).groupBy().count().collect()[0][0]
    assert got == 405
    # skipping still sound+effective: tight range keeps a strict subset
    kept = M.resolve_segments(spark, p, ranges={"a": (0, 10)})
    assert 1 <= len(kept) < 4
    rows = {
        r["a"]
        for r in M.read_snapshot(spark, p, ranges={"a": (0, 10)})
        .filter("a BETWEEN 0 AND 10").collect()
    }
    assert rows == set(range(11))
    # idempotent: nothing new to fold -> same version, no commit
    assert M.cluster_incremental(spark, p) == v


def test_cluster_incremental_requires_spec(spark, tmp_path):
    p = str(tmp_path / "zi2")
    M.commit_append(spark, p, spark.createDataFrame([(1, 2)], "a int, b int"))
    with pytest.raises(ValueError, match="z-order spec"):
        M.cluster_incremental(spark, p)
