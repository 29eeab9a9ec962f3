"""Incremental materialized-view maintenance over the manifest CDF:
the folded MV must equal a from-scratch groupBy of the source's final
snapshot, under updates that move rows between groups, deletes, crash
replays, and step-by-step vs catch-up consumption."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nba_pipeline_spark.operators import matview as MV
from nba_pipeline_spark.sources import manifest as M


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, grp string, v bigint, ver int")


@pytest.fixture()
def src(spark, tmp_path):
    """v1: 4 inserts; v2: MERGE moving k=2 from group a->b and
    updating k=3's value, inserting k=5; v3: delete k=1."""
    lake = str(tmp_path / "src")
    M.commit_append(
        spark,
        lake,
        _rows(spark, [(1, "a", 10, 0), (2, "a", 20, 0), (3, "b", 30, 0), (4, "b", 40, 0)]),
    )
    M.commit_upsert(
        spark,
        lake,
        _rows(spark, [(2, "b", 21, 1), (3, "b", 35, 1), (5, "c", 50, 1)]),
        ["k"],
        "ver",
    )
    M.commit_delete(spark, lake, spark.createDataFrame([(1,)], "k int"), ["k"])
    return lake


def _expected(spark, lake):
    return {
        (r["grp"], r["cnt"], r["sum_v"])
        for r in M.read_snapshot(spark, lake)
        .groupBy("grp")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("sum_v"))
        .collect()
    }


def _mv_rows(spark, mv):
    return {
        (r["grp"], r["cnt"], r["sum_v"])
        for r in M.read_snapshot(spark, mv).collect()
    }


def test_catchup_fold_matches_recompute(spark, tmp_path, src):
    mv, state = str(tmp_path / "mv"), str(tmp_path / "state")
    n = MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    assert n == 3
    assert _mv_rows(spark, mv) == _expected(spark, src)
    # group a lost k=1 (delete) and k=2 (moved to b): only k originally
    # in a via update path... assert the move really debited a
    got = {r[0]: (r[1], r[2]) for r in _mv_rows(spark, mv)}
    assert got["b"] == (3, 21 + 35 + 40)
    assert "a" not in got  # k=1 deleted, k=2 moved: count hit zero


def test_stepwise_equals_catchup(spark, tmp_path, src):
    mv, state = str(tmp_path / "mv"), str(tmp_path / "state")
    for _ in range(3):
        MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    assert _mv_rows(spark, mv) == _expected(spark, src)


def test_replay_after_checkpoint_loss_is_idempotent(spark, tmp_path, src):
    mv, state = str(tmp_path / "mv"), str(tmp_path / "state")
    MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    before = _mv_rows(spark, mv)
    v_before = M.current_version(spark, mv)
    # crash scenario: the consumer checkpoint is lost, every source
    # version redelivers — the mv=<version> tags make each fold a no-op
    shutil.rmtree(state)
    n = MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    assert n == 3
    assert _mv_rows(spark, mv) == before
    assert M.current_version(spark, mv) == v_before  # no new commits


def test_valued_diff_sides(spark, tmp_path, src):
    d = M.snapshot_diff(spark, src, 1, 2, ["k"], include_values=True)
    rows = {r["k"]: r for r in d.collect()}
    assert rows[2]["op"] == "update"
    assert rows[2]["old"]["grp"] == "a" and rows[2]["new"]["grp"] == "b"
    assert rows[5]["op"] == "insert" and rows[5]["old"] is None
    d3 = M.snapshot_diff(spark, src, 2, 3, ["k"], include_values=True)
    (del_row,) = d3.collect()
    assert del_row["op"] == "delete" and del_row["new"] is None
    assert del_row["old"]["v"] == 10


def test_stream_sink_to_matview_exactly_once(spark, tmp_path):
    """End-to-end composition: foreachBatch appends (idempotency-tagged
    via manifest_append_sink) -> valued CDF -> incremental MV. A
    replayed micro-batch (same batch id, the foreachBatch crash
    contract) must change NOTHING downstream: no lake version, no feed
    delta, no MV drift."""
    lake, mv, state = (str(tmp_path / d) for d in ("lake", "mv", "state"))
    sink = M.manifest_append_sink(lake)

    def batch(rows):
        return spark.createDataFrame(rows, "k int, grp string, v bigint")

    sink(batch([(1, "a", 10), (2, "b", 20)]), 0)
    sink(batch([(3, "a", 30)]), 1)
    MV.maintain_matview(spark, lake, ["k"], mv, ["grp"], ["v"], state)
    before = _mv_rows(spark, mv)

    sink(batch([(3, "a", 30)]), 1)  # replayed micro-batch: tag hit, no-op
    assert M.current_version(spark, lake) == 2
    n = MV.maintain_matview(spark, lake, ["k"], mv, ["grp"], ["v"], state)
    assert n == 0 and _mv_rows(spark, mv) == before

    sink(batch([(4, "b", 40)]), 2)  # genuinely new batch flows through
    MV.maintain_matview(spark, lake, ["k"], mv, ["grp"], ["v"], state)
    assert _mv_rows(spark, mv) == _expected(spark, lake)


def test_randomized_commit_sequences_match_recompute(spark, tmp_path):
    """Seeded random op sequences (append / upsert with group moves /
    delete) — after every fold the MV must equal a from-scratch
    recompute of the source's current snapshot."""
    import random

    rng = random.Random(66)
    for case in range(2):
        src = str(tmp_path / f"src{case}")
        mv = str(tmp_path / f"mv{case}")
        state = str(tmp_path / f"state{case}")
        live = {}
        nxt = 0
        for step in range(4):
            op = rng.choice(["append", "upsert", "delete"] if live else ["append"])
            if op == "append":
                rows = [
                    (nxt + i, rng.choice("abc"), rng.randint(1, 99), step)
                    for i in range(rng.randint(1, 4))
                ]
                for k, g, v, _ in rows:
                    live[k] = (g, v)
                nxt += len(rows)
                M.commit_append(spark, src, _rows(spark, rows))
            elif op == "upsert":
                ks = rng.sample(sorted(live), min(2, len(live)))
                rows = [
                    (k, rng.choice("abc"), rng.randint(1, 99), step) for k in ks
                ] + [(nxt, rng.choice("abc"), rng.randint(1, 99), step)]
                for k, g, v, _ in rows:
                    live[k] = (g, v)
                nxt += 1
                M.commit_upsert(spark, src, _rows(spark, rows), ["k"], "ver")
            else:
                ks = rng.sample(sorted(live), min(2, len(live)))
                for k in ks:
                    live.pop(k)
                M.commit_delete(
                    spark, src,
                    spark.createDataFrame([(k,) for k in ks], "k int"), ["k"],
                )
            MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
            if live:
                assert _mv_rows(spark, mv) == _expected(spark, src), (
                    f"case {case} step {step} op {op}"
                )
