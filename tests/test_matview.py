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


# ------------------------------------------------- join matviews (r9)


def _fact(spark, rows):
    return spark.createDataFrame(rows, "fk int, dk int, v bigint, ver int")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "dk int, grp string, ver int")


def _recompute(spark, fp, dp):
    return {
        (r["grp"], int(r["cnt"]), int(r["sv"]))
        for r in M.read_snapshot(spark, fp).alias("f")
        .join(
            M.read_snapshot(spark, dp).alias("d"),
            F.col("f.dk") == F.col("d.dk"),
        )
        .groupBy(F.col("d.grp").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("f.v").alias("sv"),
        )
        .collect()
    }


def _mv_rows(spark, mvp):
    return {
        (r["grp"], int(r["cnt"]), int(r["sum_v"]))
        for r in M.read_snapshot(spark, mvp).collect()
    }


def test_join_matview_tracks_both_lakes(spark, tmp_path):
    """The JOIN MV equals a from-scratch join-aggregate after every
    maintenance step: fact appends/updates/deletes, a dim update that
    MOVES a key between groups (retract + credit), interleaved and
    combined commits on both sides, and group disappearance."""
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    mvp, stp = str(tmp_path / "mv"), str(tmp_path / "state")
    args = (
        spark, fp, dp, ["fk"], ["dk"], "dk", "dk", "grp", ["v"], mvp, stp,
    )
    M.commit_append(
        spark, fp,
        _fact(spark, [(1, 10, 100, 0), (2, 10, 200, 0), (3, 20, 300, 0)]),
    )
    M.commit_append(
        spark, dp, _dim(spark, [(10, "a", 0), (20, "b", 0), (30, "c", 0)])
    )
    assert MV.maintain_join_matview(*args) is True  # bootstrap
    assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp)
    assert _mv_rows(spark, mvp) == {("a", 2, 300), ("b", 1, 300)}

    # fact-only change: append into dim 30's group, update k=1's value
    M.commit_upsert(
        spark, fp,
        _fact(spark, [(1, 10, 150, 1), (4, 30, 400, 1)]),
        ["fk"], "ver",
    )
    assert MV.maintain_join_matview(*args) is True
    assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp)

    # dim-only change: MOVE dk=10 from group a to b (retract 2 fact
    # rows from a — the group disappears — credit them to b)
    M.commit_upsert(spark, dp, _dim(spark, [(10, "b", 1)]), ["dk"], "ver")
    assert MV.maintain_join_matview(*args) is True
    assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp)
    assert not any(g == "a" for g, _, _ in _mv_rows(spark, mvp))

    # BOTH sides change in one window: fact delete + re-key, dim insert
    M.commit_delete(
        spark, fp, spark.createDataFrame([(2,)], "fk int"), ["fk"]
    )
    M.commit_upsert(
        spark, fp, _fact(spark, [(3, 40, 300, 2)]), ["fk"], "ver"
    )
    M.commit_upsert(spark, dp, _dim(spark, [(40, "d", 2)]), ["dk"], "ver")
    assert MV.maintain_join_matview(*args) is True
    assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp)

    # quiescent: nothing to do
    assert MV.maintain_join_matview(*args) is False


def test_join_matview_replay_is_exactly_once(spark, tmp_path):
    """Crash-window convergence: after a maintenance step, wiping the
    state lake back and re-running must not double-fold (the mvj tag
    no-ops the MV publish; the state replace lands)."""
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    mvp, stp = str(tmp_path / "mv"), str(tmp_path / "state")
    args = (
        spark, fp, dp, ["fk"], ["dk"], "dk", "dk", "grp", ["v"], mvp, stp,
    )
    M.commit_append(spark, fp, _fact(spark, [(1, 10, 100, 0)]))
    M.commit_append(spark, dp, _dim(spark, [(10, "a", 0)]))
    MV.maintain_join_matview(*args)
    M.commit_append(spark, fp, _fact(spark, [(2, 10, 50, 1)]))
    st_before = M.current_version(spark, stp)
    MV.maintain_join_matview(*args)
    mv_v = M.current_version(spark, mvp)
    want = _mv_rows(spark, mvp)
    # simulate the crash between MV publish and state replace: restore
    # the state lake to its pre-step version and re-run
    M.restore(spark, stp, st_before)
    MV.maintain_join_matview(*args)
    assert _mv_rows(spark, mvp) == want  # tag-skipped, not double-folded
    assert M.current_version(spark, mvp) == mv_v


def test_randomized_join_matview_sequences_match_recompute(spark, tmp_path):
    """Seeded random op sequences on BOTH lakes (fact append / upsert
    with FK re-pointing / delete; dim upsert with group moves / dim
    insert), maintained at random cadence (sometimes after several
    commits on both sides accumulate) — after every fold the JOIN MV
    must equal the from-scratch join-aggregate of the current
    snapshots."""
    import random

    rng = random.Random(99)
    for case in range(2):
        fp = str(tmp_path / f"f{case}")
        dp = str(tmp_path / f"d{case}")
        mvp = str(tmp_path / f"mv{case}")
        stp = str(tmp_path / f"st{case}")
        args = (
            spark, fp, dp, ["fk"], ["dk"], "dk", "dk", "grp", ["v"],
            mvp, stp,
        )
        dims = {10: "a", 20: "b"}
        M.commit_append(
            spark, dp, _dim(spark, [(k, g, 0) for k, g in dims.items()])
        )
        facts = {}
        nxt = 0
        M.commit_append(spark, fp, _fact(spark, [(0, 10, 5, 0)]))
        facts[0] = (10, 5)
        nxt = 1
        MV.maintain_join_matview(*args)
        for step in range(1, 6):
            for _ in range(rng.randint(1, 2)):  # 1-2 commits per fold
                op = rng.choice(
                    ["f_append", "f_upsert", "f_delete", "d_upsert", "d_insert"]
                )
                if op == "f_append":
                    rows = [
                        (
                            nxt + i,
                            rng.choice(sorted(dims) + [99]),  # 99: no dim
                            rng.randint(1, 50),
                            step,
                        )
                        for i in range(rng.randint(1, 3))
                    ]
                    for k, dk, v, _ in rows:
                        facts[k] = (dk, v)
                    nxt += len(rows)
                    M.commit_append(spark, fp, _fact(spark, rows))
                elif op == "f_upsert" and facts:
                    ks = rng.sample(sorted(facts), min(2, len(facts)))
                    rows = [
                        (k, rng.choice(sorted(dims)), rng.randint(1, 50), step)
                        for k in ks
                    ]
                    for k, dk, v, _ in rows:
                        facts[k] = (dk, v)
                    M.commit_upsert(spark, fp, _fact(spark, rows), ["fk"], "ver")
                elif op == "f_delete" and facts:
                    ks = rng.sample(sorted(facts), min(2, len(facts)))
                    for k in ks:
                        facts.pop(k)
                    M.commit_delete(
                        spark, fp,
                        spark.createDataFrame([(k,) for k in ks], "fk int"),
                        ["fk"],
                    )
                elif op == "d_upsert":
                    k = rng.choice(sorted(dims))
                    dims[k] = rng.choice("abcd")
                    M.commit_upsert(
                        spark, dp, _dim(spark, [(k, dims[k], step)]),
                        ["dk"], "ver",
                    )
                elif op == "d_insert":
                    k = max(dims) + 10
                    dims[k] = rng.choice("abcd")
                    M.commit_upsert(
                        spark, dp, _dim(spark, [(k, dims[k], step)]),
                        ["dk"], "ver",
                    )
            MV.maintain_join_matview(*args)
            assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp), (
                f"case {case} step {step}"
            )


def test_mv_sum_of_all_null_group_is_null(spark, tmp_path):
    """SQL SUM semantics through the IVM fold (adversarial r9 catch):
    a group whose every measure is NULL must report sum NULL, not 0 —
    the fold carries per-sum-col non-null counters; and once a
    non-NULL value arrives, the sum materializes; when deletes remove
    it again, the sum returns to NULL."""
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    state = str(tmp_path / "state")
    M.commit_append(
        spark, src,
        spark.createDataFrame(
            [(1, "a", None, 0), (2, "a", None, 0), (3, "b", 7, 0)],
            "k int, grp string, v bigint, ver int",
        ),
    )
    MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    got = {r["grp"]: (r["cnt"], r["sum_v"]) for r in M.read_snapshot(spark, mv).collect()}
    assert got == {"a": (2, None), "b": (1, 7)}
    # a non-NULL lands in group a -> sum materializes
    M.commit_upsert(
        spark, src,
        spark.createDataFrame([(4, "a", 5, 1)], "k int, grp string, v bigint, ver int"),
        ["k"], "ver",
    )
    MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    got = {r["grp"]: (r["cnt"], r["sum_v"]) for r in M.read_snapshot(spark, mv).collect()}
    assert got == {"a": (3, 5), "b": (1, 7)}
    # delete it again -> back to NULL (nn counter retracts)
    M.commit_delete(spark, src, spark.createDataFrame([(4,)], "k int"), ["k"])
    MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    got = {r["grp"]: (r["cnt"], r["sum_v"]) for r in M.read_snapshot(spark, mv).collect()}
    assert got == {"a": (2, None), "b": (1, 7)}


def test_partitioned_matview_equals_replace_based(spark, tmp_path):
    """The large-view landing: the group-partitioned MV folds only the
    touched groups per refresh (untouched group segments transfer by
    name), keeps dead groups as cnt=0 placeholders that read_matview
    filters, and agrees with the replace-based maintainer on every
    step of an append/move/delete sequence."""
    src = str(tmp_path / "src")
    mv_r = str(tmp_path / "mv_replace")
    st_r = str(tmp_path / "st_replace")
    mv_p = str(tmp_path / "mv_part")
    st_p = str(tmp_path / "st_part")

    def both():
        MV.maintain_matview(spark, src, ["k"], mv_r, ["grp"], ["v"], st_r)
        MV.maintain_matview_partitioned(
            spark, src, ["k"], mv_p, "grp", ["v"], st_p
        )
        live_r = {
            (r["grp"], r["cnt"], r["sum_v"])
            for r in MV.read_matview(spark, mv_r).collect()
        }
        live_p = {
            (r["grp"], r["cnt"], r["sum_v"])
            for r in MV.read_matview(spark, mv_p).collect()
        }
        assert live_r == live_p

    M.commit_append(spark, src, _rows(spark, [
        (1, "a", 10, 0), (2, "a", 20, 0), (3, "b", 30, 0), (4, "c", 5, 0),
    ]))
    both()
    segs0 = set(M.resolve_segments(spark, mv_p))
    # touch only group b: move k=3 to group a
    M.commit_upsert(spark, src, _rows(spark, [(3, "a", 30, 1)]), ["k"], "ver")
    both()
    segs1 = set(M.resolve_segments(spark, mv_p))
    # group c's segment transferred BY NAME (untouched by the fold)
    assert segs0 & segs1, "untouched group segments must transfer"
    # kill group b entirely? k=3 already left it; delete all of a
    M.commit_delete(
        spark, src,
        spark.createDataFrame([(1,), (2,), (3,)], "k int"), ["k"],
    )
    both()
    # the partitioned MV holds a physical cnt=0 row; the reader hides it
    raw = {r["grp"]: r["cnt"] for r in M.read_snapshot(spark, mv_p).collect()}
    assert raw.get("a") == 0 and raw.get("b") == 0
    assert {r["grp"] for r in MV.read_matview(spark, mv_p).collect()} == {"c"}


def test_join_matview_crash_then_advance_no_double_fold(spark, tmp_path):
    """ADVICE r9 (the double-fold window): a crash lands the MV
    publish (tag mvj=f1:d1) but NOT the state replace, and a lake
    ADVANCES before redo — the redo's tag is mvj=f2:d2 (never seen),
    so the old tag check can't save it; the maintainer must derive the
    consumed window from the MV lake's own newest mvj tag and fold
    ONLY (f1,d1)→(f2,d2)."""
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    mvp, stp = str(tmp_path / "mv"), str(tmp_path / "state")
    args = (
        spark, fp, dp, ["fk"], ["dk"], "dk", "dk", "grp", ["v"], mvp, stp,
    )
    M.commit_append(spark, fp, _fact(spark, [(1, 10, 100, 0)]))
    M.commit_append(spark, dp, _dim(spark, [(10, "a", 0)]))
    MV.maintain_join_matview(*args)  # bootstrap
    M.commit_append(spark, fp, _fact(spark, [(2, 10, 50, 1)]))
    st_before = M.current_version(spark, stp)
    MV.maintain_join_matview(*args)  # MV now holds fk=1,2
    # crash: state lake rolls back to pre-step; then the fact ADVANCES
    M.restore(spark, stp, st_before)
    M.commit_append(spark, fp, _fact(spark, [(3, 10, 25, 2)]))
    MV.maintain_join_matview(*args)
    # a double fold would re-add fk=2's window: cnt 4 / sum 225
    assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp)
    assert _mv_rows(spark, mvp) == {("a", 3, 175)}
    # state healed: quiescent call is a no-op
    assert MV.maintain_join_matview(*args) is False


def test_join_matview_crash_heal_without_advance(spark, tmp_path):
    """Crash window with NO advance: redo heals the state lake from
    the MV's tag without touching the view, and reports progress."""
    fp, dp = str(tmp_path / "fact"), str(tmp_path / "dim")
    mvp, stp = str(tmp_path / "mv"), str(tmp_path / "state")
    args = (
        spark, fp, dp, ["fk"], ["dk"], "dk", "dk", "grp", ["v"], mvp, stp,
    )
    M.commit_append(spark, fp, _fact(spark, [(1, 10, 100, 0)]))
    M.commit_append(spark, dp, _dim(spark, [(10, "a", 0)]))
    MV.maintain_join_matview(*args)
    M.commit_append(spark, fp, _fact(spark, [(2, 10, 50, 1)]))
    st_before = M.current_version(spark, stp)
    MV.maintain_join_matview(*args)
    mv_v = M.current_version(spark, mvp)
    M.restore(spark, stp, st_before)
    assert MV.maintain_join_matview(*args) is True  # state heal
    assert M.current_version(spark, mvp) == mv_v  # view untouched
    assert MV.maintain_join_matview(*args) is False


def test_matview_pre_nn_lake_backfills(spark, tmp_path):
    """ADVICE r9: an MV lake committed BEFORE the nn_ counters existed
    must keep refreshing (the first fold backfills nn from cnt/sum
    instead of failing with an unresolved-column AnalysisException) and
    stay exact while the measure column is non-null everywhere."""
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    state = str(tmp_path / "state")
    M.commit_append(
        spark, src,
        _rows(spark, [(1, "a", 10, 0), (2, "a", 20, 0), (3, "b", 30, 0)]),
    )
    MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    # strip the nn_ columns: the lake now looks like a pre-upgrade MV
    legacy = M.read_snapshot(spark, mv).drop("nn_v")
    M.commit_replace(spark, mv, legacy)
    # advance the source: update moves k=2 a->b, delete k=1
    M.commit_upsert(spark, src, _rows(spark, [(2, "b", 21, 1)]), ["k"], "ver")
    M.commit_delete(spark, src, spark.createDataFrame([(1,)], "k int"), ["k"])
    MV.maintain_matview(spark, src, ["k"], mv, ["grp"], ["v"], state)
    got = {
        (r["grp"], r["cnt"], r["sum_v"])
        for r in M.read_snapshot(spark, mv).collect()
    }
    assert got == _expected(spark, src)
    # and the refreshed view carries nn_ counters again going forward
    assert "nn_v" in M.read_snapshot(spark, mv).columns


def test_commit_multi_prefix_crash_converges(spark, tmp_path):
    """The generalized multi-lake publish (manifest.commit_multi,
    VERDICT r10 #4): a crash between participants leaves a PREFIX;
    re-invoking with the same token completes the suffix, skipped
    participants never re-evaluate their content, and a different
    token runs the full group."""
    import pytest

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    evals = {"a": 0, "b": 0}

    def part(path, key, rows, crash_after=False):
        def fn(tag):
            evals[key] += 1
            v = M.commit_replace(
                spark, path,
                spark.createDataFrame(rows, "k int, v string"), tag=tag,
            )
            if crash_after:
                raise RuntimeError("injected crash between the two commits")
            return v
        return (path, fn)

    with pytest.raises(RuntimeError, match="injected crash"):
        M.commit_multi(spark, "grp", "1:1", [
            part(a, "a", [(1, "x")], crash_after=True),
            part(b, "b", [(1, "y")]),
        ])
    assert M.current_version(spark, a) == 1
    assert M.current_version(spark, b) is None  # the suffix never ran
    assert evals == {"a": 1, "b": 0}
    # replay with the SAME token: prefix tag-skips (no re-eval), suffix lands
    out = M.commit_multi(spark, "grp", "1:1", [
        part(a, "a", [(9, "WRONG — must not re-evaluate")]),
        part(b, "b", [(1, "y")]),
    ])
    assert evals == {"a": 1, "b": 1}
    assert out == {a: 1, b: 1}
    assert [(r["k"], r["v"]) for r in M.read_snapshot(spark, a).collect()] == [(1, "x")]
    # a NEW token runs both participants
    M.commit_multi(spark, "grp", "2:1", [
        part(a, "a", [(2, "x2")]),
        part(b, "b", [(2, "y2")]),
    ])
    assert evals == {"a": 2, "b": 2}
    assert M.newest_multi_token(spark, "grp", a) == (2, 1)


def test_newest_multi_token_mixed_numeric_and_string(spark, tmp_path):
    """ADVICE r11 #3: a group mixing numeric and non-numeric tokens
    must still totally order (numeric above string) instead of raising
    TypeError on tuple[int] vs tuple[str]."""
    lake = str(tmp_path / "lake")
    for tok in ("run-a", "3:1"):
        M.commit_append(
            spark, lake,
            spark.createDataFrame([(1, "x")], "k int, v string"),
            tag=f"grp={tok}",
        )
    assert M.newest_multi_token(spark, "grp", lake) == (3, 1)
    # an all-string group still returns raw string tuples
    lake2 = str(tmp_path / "lake2")
    for tok in ("run-a", "run-b"):
        M.commit_append(
            spark, lake2,
            spark.createDataFrame([(1, "x")], "k int, v string"),
            tag=f"grp={tok}",
        )
    assert M.newest_multi_token(spark, "grp", lake2) == ("run-b",)


def test_join_matview_crash_injection_soak(spark, tmp_path):
    """Seeded crash-injection soak against the commit_multi-based
    maintainer (the r10 84-step soak, now COMMITTED and run through
    the primitive): random fact/dim histories with (a) crashes
    injected between the MV publish and the state replace and (b)
    out-of-band state-lake rollbacks, maintenance after every step —
    the MV must equal the from-scratch join-aggregate at EVERY step."""
    import random

    for seed in (7, 101):
        rng = random.Random(seed)
        root = tmp_path / f"s{seed}"
        fp, dp = str(root / "fact"), str(root / "dim")
        mvp, stp = str(root / "mv"), str(root / "state")
        args = (
            spark, fp, dp, ["fk"], ["dk"], "dk", "dk", "grp", ["v"], mvp, stp,
        )
        M.commit_append(
            spark, fp, _fact(spark, [(1, 10, 100, 0), (2, 20, 200, 0)])
        )
        M.commit_append(
            spark, dp, _dim(spark, [(10, "a", 0), (20, "b", 0)])
        )
        MV.maintain_join_matview(*args)
        assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp)
        next_fk = 3
        orig_replace = M.commit_replace
        for step in range(10):
            # 1-2 random commits on either lake
            for _ in range(rng.randint(1, 2)):
                if rng.random() < 0.6:
                    rows = [
                        (next_fk + i, rng.choice([10, 20, 30]),
                         rng.randint(1, 999), step + 1)
                        for i in range(rng.randint(1, 3))
                    ]
                    next_fk += len(rows)
                    if rng.random() < 0.5:
                        M.commit_append(spark, fp, _fact(spark, rows))
                    else:
                        M.commit_upsert(
                            spark, fp, _fact(spark, rows), ["fk"], "ver"
                        )
                else:
                    dk = rng.choice([10, 20, 30])
                    M.commit_upsert(
                        spark, dp,
                        _dim(spark, [(dk, rng.choice("abcd"), step + 1)]),
                        ["dk"], "ver",
                    )
            # maybe inject a crash between the two participant commits
            if rng.random() < 0.5:
                state = {"arm": True}

                def flaky(spark_, path_, df_, target_files=None, **kw):
                    if path_ == stp and state["arm"]:
                        state["arm"] = False
                        raise RuntimeError("injected crash")
                    return orig_replace(
                        spark_, path_, df_, target_files, **kw
                    )

                M.commit_replace = flaky
                try:
                    MV.maintain_join_matview(*args)
                except RuntimeError:
                    pass
                finally:
                    M.commit_replace = orig_replace
            # maybe roll the state lake back out-of-band
            if rng.random() < 0.3 and (M.current_version(spark, stp) or 0) > 1:
                M.restore(spark, stp, version=1)
            MV.maintain_join_matview(*args)
            MV.maintain_join_matview(*args)  # second call: converged no-op
            assert _mv_rows(spark, mvp) == _recompute(spark, fp, dp), (
                f"seed {seed} step {step}"
            )
