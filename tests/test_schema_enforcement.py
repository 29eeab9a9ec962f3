"""Commit-time schema enforcement on the manifest lake: type drift and
rename drift are refused at the WRITE (previously they poisoned later
reads or silently nulled data); additive evolution still works and the
schema is tracked in the manifest."""

from __future__ import annotations

import pytest

from nba_pipeline_spark.sources import manifest as M


@pytest.fixture()
def lake(spark, tmp_path):
    p = str(tmp_path / "lake")
    M.commit_append(spark, p, spark.createDataFrame([(1, "a")], "k int, v string"))
    return p


def test_type_drift_refused(spark, lake):
    v = M.current_version(spark, lake)
    with pytest.raises(M.SchemaDrift, match="'k' is int"):
        M.commit_append(
            spark, lake, spark.createDataFrame([("x", "b")], "k string, v string")
        )
    assert M.current_version(spark, lake) == v
    # the table stays readable (the poisoned-scan failure mode is gone)
    assert M.read_snapshot(spark, lake).count() == 1


def test_additive_evolution_allowed_and_tracked(spark, lake):
    M.commit_append(
        spark, lake,
        spark.createDataFrame([(2, "b", 9)], "k int, v string, w int"),
    )
    assert M.table_schema(spark, lake) == [["k", "int"], ["v", "string"], ["w", "int"]]
    got = M.read_snapshot(spark, lake, merge_schema=True)
    assert got.count() == 2 and "w" in got.columns


def test_missing_columns_allowed(spark, lake):
    M.commit_append(spark, lake, spark.createDataFrame([(3,)], "k int"))
    assert M.table_schema(spark, lake) == [["k", "int"], ["v", "string"]]


def test_upsert_type_drift_refused(spark, lake):
    bad = spark.createDataFrame([(1, 5, 1)], "k int, v int, ver int")
    with pytest.raises(M.SchemaDrift):
        M.commit_upsert(spark, lake, bad, ["k"], "ver")


def test_replace_resets_schema(spark, lake):
    M.commit_replace(spark, lake, spark.createDataFrame([("z", 1)], "a string, b int"))
    assert M.table_schema(spark, lake) == [["a", "string"], ["b", "int"]]
    # and the new schema is now enforced
    with pytest.raises(M.SchemaDrift):
        M.commit_append(spark, lake, spark.createDataFrame([(1, 1)], "a int, b int"))


def test_pre_feature_lake_probes_and_stamps(spark, tmp_path):
    import json
    import os

    p = str(tmp_path / "old")
    M.commit_append(spark, p, spark.createDataFrame([(1, "a")], "k int, v string"))
    # simulate a pre-feature manifest: strip props from the latest version
    mdir = os.path.join(p, "_manifests")
    latest = sorted(os.listdir(mdir))[-1]
    mf = os.path.join(mdir, latest)
    m = json.load(open(mf))
    m.pop("props", None)
    json.dump(m, open(mf, "w"))
    crc = os.path.join(mdir, f".{latest}.crc")  # hadoop local-fs checksum
    if os.path.exists(crc):
        os.remove(crc)
    assert M.table_schema(spark, p) is None
    with pytest.raises(M.SchemaDrift):  # probed from footers
        M.commit_append(
            spark, p, spark.createDataFrame([("x", "b")], "k string, v string")
        )
    M.commit_append(spark, p, spark.createDataFrame([(2, "b")], "k int, v string"))
    assert M.table_schema(spark, p) == [["k", "int"], ["v", "string"]]


def test_racing_additive_writers_schemas_both_recorded(spark, tmp_path):
    """The schema merge re-runs inside the commit CAS on the freshly
    read parent props: two writers racing appends with DIFFERENT new
    columns must both land, and the final recorded schema must contain
    both columns regardless of commit order."""
    import threading

    p = str(tmp_path / "race")
    M.commit_append(spark, p, spark.createDataFrame([(1,)], "k int"))
    errs = []

    def writer(col):
        try:
            df = spark.createDataFrame([(2, "v")], f"k int, {col} string")
            M.commit_append(spark, p, df)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(c,)) for c in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    cols = {n for n, _ in M.table_schema(spark, p)}
    assert cols == {"k", "a", "b"}
    assert M.read_snapshot(spark, p, merge_schema=True).count() == 3
