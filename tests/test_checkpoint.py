"""Manifest rollup checkpoint (VERDICT r11 #2): version walks read
ONE checkpoint + the post-checkpoint suffix instead of a KB manifest
JSON per version; the rollup is derived state (torn/stale/absent falls
back to per-manifest reads); vacuum/retention-gap semantics unchanged.
"""

from __future__ import annotations

import json
import os

import pytest

from nba_pipeline_spark.sources import manifest as M


def _counted(monkeypatch):
    """Patch M._read_manifest with a call counter; returns the list."""
    orig = M._read_manifest
    count = [0]

    def counting(spark, path, v):
        count[0] += 1
        return orig(spark, path, v)

    monkeypatch.setattr(M, "_read_manifest", counting)
    return count


def _history(spark, lake, n, record=True):
    M.commit_append(
        spark, lake,
        spark.createDataFrame([(1, "a", 10)], "k int, grp string, v bigint"),
        stats_cols=["k"],
    )
    for i in range(2, n + 1):
        M.commit_upsert(
            spark, lake,
            spark.createDataFrame(
                [(1, f"g{i}", 10 + i, i)], "k int, grp string, v bigint, ver int"
            ),
            ["k"], "ver", record_cdf=record,
        )


def test_checkpoint_bounds_feed_manifest_reads(spark, tmp_path, monkeypatch):
    """A recorded 35-version history walks in O(1) manifest reads per
    step AFTER the rollup: the auto-checkpoint (every 32 commits)
    covers the prefix, an explicit checkpoint covers everything. The
    pre-rollup cost was ~1 read per version PLUS one per recorded
    step (snapshot_diff re-read m_to) — the q_manifest_agg_meta 1.32x
    the round-11 bench measured at just SIX versions."""
    lake = str(tmp_path / "lake")
    _history(spark, lake, 35)
    ck = M._read_ckpt(spark, lake)
    assert ck and ck["version"] == 32          # auto-rollup fired at 32
    assert len(ck["entries"]) == 32 and len(ck["epochs"]) == 1

    count = _counted(monkeypatch)
    rows = M.read_feed(spark, lake, ["k"], 0, include_values=True).collect()
    assert len(rows) == 35
    # 3 suffix versions (33..35) + _latest_props + the v1 computed
    # step's snapshot reads — NOT one per version
    assert count[0] <= 8, count[0]

    M.checkpoint_manifest(spark, lake)
    count[0] = 0
    rows = M.read_feed(spark, lake, ["k"], 0, include_values=True).collect()
    assert len(rows) == 35
    assert count[0] <= 4, count[0]

    # consume_feed: same bound, checkpointed consumer state
    count[0] = 0
    state = str(tmp_path / "state")
    got: list = []
    n = M.consume_feed(
        spark, lake, ["k"], state, lambda df, v: got.append((v, df.count()))
    )
    assert n == 35 and len(got) == 35
    assert count[0] <= 4, count[0]

    # version_as_of_timestamp walks the rollup, not 35 manifests
    count[0] = 0
    ts = M._read_manifest(spark, lake, 20)["ts"]
    count[0] = 0
    assert M.version_as_of_timestamp(spark, lake, ts) == 20
    assert count[0] == 0, count[0]


def test_checkpoint_serves_identity_chain_bridge(spark, tmp_path, monkeypatch):
    """The schema-bridged feed (key renamed mid-history) builds its
    identity chain from the rollup — same output, bounded reads."""
    lake = str(tmp_path / "lake")
    M.commit_append(
        spark, lake,
        spark.createDataFrame([(1, "a", 10)], "k int, grp string, v bigint"),
        stats_cols=["k"],
    )
    M.commit_upsert(
        spark, lake,
        spark.createDataFrame(
            [(1, "b", 11, 1)], "k int, grp string, v bigint, ver int"
        ),
        ["k"], "ver", record_cdf=True,
    )
    M.rename_column(spark, lake, "k", "key_id")
    M.commit_upsert(
        spark, lake,
        spark.createDataFrame(
            [(1, "c", 12, 2)], "key_id int, grp string, v bigint, ver int"
        ),
        ["key_id"], "ver", record_cdf=True,
    )
    want = {
        (r["key_id"], r["op"], int(r["version"]))
        for r in M.read_feed(spark, lake, ["key_id"], 0).collect()
    }
    assert want == {(1, "insert", 1), (1, "update", 2), (1, "update", 4)}
    M.checkpoint_manifest(spark, lake)
    count = _counted(monkeypatch)
    got = {
        (r["key_id"], r["op"], int(r["version"]))
        for r in M.read_feed(spark, lake, ["key_id"], 0).collect()
    }
    assert got == want
    # walk itself is rollup-served; the remaining reads belong to the
    # rename step's COMPUTED diff (its two _snap sides each read their
    # version's manifest — O(step), not O(history))
    assert count[0] <= 6, count[0]


def test_checkpoint_vacuum_and_retention_gap(spark, tmp_path):
    """Vacuum refreshes the rollup (vacuumed versions drop out) and
    the retention-gap guard still fires — the rollup gates on the
    LIVE listing and can never resurrect a vacuumed version."""
    lake = str(tmp_path / "lake")
    _history(spark, lake, 5)
    M.checkpoint_manifest(spark, lake)
    assert len(M._read_ckpt(spark, lake)["entries"]) == 5
    state = str(tmp_path / "state")
    n = M.consume_feed(
        spark, lake, ["k"], state, lambda df, v: None, max_versions=1
    )
    assert n == 1
    M.vacuum(spark, lake, keep_versions=1)
    ck = M._read_ckpt(spark, lake)
    assert set(ck["entries"]) == {"5"}  # refreshed, survivors only
    with pytest.raises(ValueError, match="re-bootstrap"):
        M.consume_feed(spark, lake, ["k"], state, lambda df, v: None)


def test_checkpoint_torn_file_falls_back(spark, tmp_path):
    """A corrupt rollup never fails a read — consumers fall back to
    the per-version manifests (derived-state contract)."""
    lake = str(tmp_path / "lake")
    _history(spark, lake, 4)
    M.checkpoint_manifest(spark, lake)
    ckfile = os.path.join(lake, "_manifests", "_ckpt.json")
    with open(ckfile, "w") as fh:
        fh.write('{"version": 4, "entr')  # torn write
    assert M._read_ckpt(spark, lake) is None
    rows = M.read_feed(spark, lake, ["k"], 0, include_values=True).collect()
    assert len(rows) == 4
    # a stale-but-parseable rollup (json junk of the right shape but
    # missing epochs) also falls back per-entry
    with open(ckfile, "w") as fh:
        json.dump({"version": 4, "entries": {"2": {"pe": "9"}}, "epochs": {}}, fh)
    rows = M.read_feed(spark, lake, ["k"], 0, include_values=True).collect()
    assert len(rows) == 4


def test_checkpoint_interval_table_prop(spark, tmp_path):
    """Table prop ckpt_interval overrides the cadence; 0 disables."""
    lake = str(tmp_path / "lake")
    M.commit_append(
        spark, lake,
        spark.createDataFrame([(1, "a", 10)], "k int, grp string, v bigint"),
    )
    M.set_table_property(spark, lake, "ckpt_interval", 4)
    for i in range(2, 6):
        M.commit_append(
            spark, lake,
            spark.createDataFrame(
                [(i, f"g{i}", 10 + i)], "k int, grp string, v bigint"
            ),
        )
    ck = M._read_ckpt(spark, lake)
    assert ck and ck["version"] == 4
