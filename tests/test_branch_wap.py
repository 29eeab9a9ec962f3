"""Branches + write-audit-publish, metadata-only aggregates, and the
bounded-key point fetch (manifest.py round-8 continuation).

Scale invariants under test:
- a branch fork and its publish are KB-sized manifest commits — main's
  data files are never rewritten, only the branch's NEW segments copy;
- merge-on-read ``seq`` fencing stays totally ordered across the
  branch boundary (branches CONTINUE main's version numbering, publish
  adopts the branch head's — version numbers may skip);
- metadata_agg answers COUNT/MIN/MAX from the manifest alone
  (allow_scan=False is the proof), falling back honestly otherwise;
- read_for_keys prunes segments by bloom AND point-in-range bisect,
  which stays sharp at key counts where the bloom union saturates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nba_pipeline_spark.sources import manifest as M


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .otherwise(F.col("id").cast("double"))
        .alias("maybe"),
    )


# ---------------------------------------------------------------- WAP


def test_branch_write_audit_publish(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 60))
    main_v = M.current_version(spark, lake)

    b = M.create_branch(spark, lake, "ingest")
    # branch numbering CONTINUES main's (seq fence total order)
    assert M._manifest_versions(spark, b) == [main_v]
    M.commit_append(spark, b, _frame(spark, 60, 100))
    # audit on the branch: CoW-delete the rows violating k % 7 == 0
    bad = M.read_snapshot(spark, b).filter(
        (F.col("k") >= 60) & (F.col("k") % 7 == 0)
    )
    M.commit_delete(spark, b, bad.select("k"), ["k"])
    expected = sorted(
        k for k in range(100) if k < 60 or k % 7 != 0
    )
    got_b = sorted(r["k"] for r in M.read_snapshot(spark, b).collect())
    assert got_b == expected
    # main is untouched mid-flight
    assert M.read_snapshot(spark, lake).count() == 60

    v = M.publish_branch(spark, lake, "ingest")
    assert v > main_v
    got = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    assert got == expected
    # publish consumed the branch
    assert M.list_branches(spark, lake) == []
    # history shows the single publish commit on main
    ops = [r["op"] for r in M.history(spark, lake).collect()]
    assert ops.count("publish") == 1


def test_publish_fast_forward_only(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 20))
    M.create_branch(spark, lake, "late")
    M.commit_append(spark, lake, _frame(spark, 20, 30))  # main advances
    with pytest.raises(M.CommitConflict, match="fast-forward"):
        M.publish_branch(spark, lake, "late")
    # refusal left main intact and the branch droppable
    assert M.read_snapshot(spark, lake).count() == 30
    M.drop_branch(spark, lake, "late")
    assert M.list_branches(spark, lake) == []


def test_branch_mor_seq_fence_across_publish(spark, tmp_path):
    """A MoR tombstone committed ON THE BRANCH must mask main's older
    segments (on the branch and after publish), and a LATER MoR delete
    on main must mask the published branch segments — both directions
    of the seq total order."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 40))
    M.commit_append(spark, lake, _frame(spark, 40, 70))

    b = M.create_branch(spark, lake, "mor")
    M.commit_append(spark, b, _frame(spark, 70, 90))
    M.commit_delete_mor(
        spark, b, _frame(spark, 0, 90).filter("k in (5, 45, 75)").select("k"),
        ["k"],
    )
    alive = [k for k in range(90) if k not in (5, 45, 75)]
    assert sorted(r["k"] for r in M.read_snapshot(spark, b).collect()) == alive

    M.publish_branch(spark, lake, "mor")
    assert (
        sorted(r["k"] for r in M.read_snapshot(spark, lake).collect()) == alive
    )
    # later main-side MoR delete must mask the PUBLISHED segments too
    M.commit_delete_mor(
        spark, lake, _frame(spark, 0, 90).filter("k = 80").select("k"), ["k"]
    )
    alive2 = [k for k in alive if k != 80]
    assert (
        sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
        == alive2
    )


def test_publish_zero_copy_for_main_segments(spark, tmp_path):
    """Publish folds refs into main's own data dir back to plain names
    — main's pre-fork segments are NOT copied (same names survive)."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 30))
    before = set(M.resolve_segments(spark, lake))
    b = M.create_branch(spark, lake, "zc")
    M.commit_append(spark, b, _frame(spark, 30, 40))
    M.publish_branch(spark, lake, "zc")
    after = set(M.resolve_segments(spark, lake))
    assert before < after  # original names intact, one new segment
    assert len(after - before) == 1


def test_branch_rename_travels_with_publish(spark, tmp_path):
    """Column mapping created on the branch lands on main at publish
    (props travel; segments stay uniform-physical)."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 20))
    b = M.create_branch(spark, lake, "schema")
    M.rename_column(spark, b, "maybe", "score")
    M.commit_append(spark, b, _frame(spark, 20, 25).withColumnRenamed("maybe", "score"))
    M.publish_branch(spark, lake, "schema")
    snap = M.read_snapshot(spark, lake)
    assert "score" in snap.columns and "maybe" not in snap.columns
    assert snap.count() == 25


def test_create_branch_guards(spark, tmp_path):
    lake = str(tmp_path / "lake")
    with pytest.raises(ValueError, match="empty"):
        M.create_branch(spark, lake, "x")
    M.commit_append(spark, lake, _frame(spark, 0, 5))
    with pytest.raises(ValueError, match="invalid branch name"):
        M.create_branch(spark, lake, "a/b")
    M.create_branch(spark, lake, "x")
    with pytest.raises(ValueError, match="already exists"):
        M.create_branch(spark, lake, "x")
    assert M.list_branches(spark, lake) == ["x"]
    M.drop_branch(spark, lake, "x")


# -------------------------------------------------- metadata-only agg


def _agg_cols(df):
    return df.agg(
        F.count(F.lit(1)).alias("count_rows"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.max("maybe").alias("max_maybe"),
        F.count("maybe").alias("count_maybe"),
    )


def test_metadata_agg_metadata_only(spark, tmp_path):
    lake = str(tmp_path / "lake")
    for lo, hi in [(0, 40), (40, 70), (70, 100)]:
        M.commit_append(
            spark, lake, _frame(spark, lo, hi), stats_cols=["k", "maybe"]
        )
    got = M.metadata_agg(
        spark,
        lake,
        min_cols=["k"],
        max_cols=["k", "maybe"],
        count_cols=["maybe"],
        allow_scan=False,  # raises if any data file would be read
    )
    exp = _agg_cols(M.read_snapshot(spark, lake)).drop("count_rows")
    assert got.collect() == _agg_cols(M.read_snapshot(spark, lake)).collect()
    # typed like the table, not like JSON
    assert dict(got.dtypes)["max_maybe"] == "double"


def test_metadata_agg_hybrid_and_refusal(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 50), stats_cols=["k", "maybe"])
    M.commit_append(spark, lake, _frame(spark, 50, 80))  # no stats
    with pytest.raises(ValueError, match="lack rows/stats"):
        M.metadata_agg(spark, lake, min_cols=["k"], allow_scan=False)
    got = M.metadata_agg(
        spark, lake, min_cols=["k"], max_cols=["k"], count_cols=["maybe"]
    )
    exp = M.read_snapshot(spark, lake).agg(
        F.count(F.lit(1)).alias("count_rows"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("maybe").alias("count_maybe"),
    )
    assert got.collect() == exp.collect()


def test_metadata_agg_tombstone_fallback(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 30), stats_cols=["k"])
    M.commit_delete_mor(
        spark, lake, _frame(spark, 0, 30).filter("k < 5").select("k"), ["k"]
    )
    with pytest.raises(ValueError, match="tombstones"):
        M.metadata_agg(spark, lake, min_cols=["k"], allow_scan=False)
    got = M.metadata_agg(spark, lake, min_cols=["k"], max_cols=["k"])
    row = got.collect()[0]
    assert (row["count_rows"], row["min_k"], row["max_k"]) == (25, 5, 29)


def test_metadata_agg_on_mapped_lake(spark, tmp_path):
    """Logical column names resolve through the column mapping."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 40), stats_cols=["k", "maybe"])
    M.rename_column(spark, lake, "maybe", "score")
    M.commit_append(
        spark,
        lake,
        _frame(spark, 40, 60).withColumnRenamed("maybe", "score"),
        stats_cols=["k", "score"],
    )
    got = M.metadata_agg(
        spark, lake, max_cols=["score"], count_cols=["score"],
        allow_scan=False,
    ).collect()[0]
    snap = M.read_snapshot(spark, lake)
    exp = snap.agg(F.max("score"), F.count("score")).collect()[0]
    assert (got["max_score"], got["count_score"]) == (exp[0], exp[1])
    assert got["count_rows"] == 60


def test_metadata_agg_survives_cluster(spark, tmp_path):
    """Z-order rewrites record rows/nulls too — clustering maintenance
    doesn't cost the lake its metadata-only aggregates."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 80), stats_cols=["k"])
    M.cluster(spark, lake, ["k"], target_segments=4, bits_per_col=6)
    got = M.metadata_agg(
        spark, lake, min_cols=["k"], max_cols=["k"], allow_scan=False
    ).collect()[0]
    assert (got["count_rows"], got["min_k"], got["max_k"]) == (80, 0, 79)


# ------------------------------------------------- bounded key fetch


def _banded_lake(spark, tmp_path, bands=8, per=1000):
    lake = str(tmp_path / "lake")
    df = spark.range(0, bands * per).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    for b in range(bands):
        M.commit_append(
            spark,
            lake,
            df.filter((F.col("k") >= b * per) & (F.col("k") < (b + 1) * per)),
            stats_cols=["k"],
            bloom_cols=["k"],
        )
    return lake


def test_read_for_keys_prunes_and_fetches(spark, tmp_path):
    lake = _banded_lake(spark, tmp_path)
    keys = [6500, 7003, 7555, 7999]
    assert len(M.resolve_segments(spark, lake, keys_in={"k": keys})) == 2
    got = sorted(r["k"] for r in M.read_for_keys(spark, lake, "k", keys).collect())
    assert got == sorted(keys)


def test_keys_in_sharp_where_bloom_saturates(spark, tmp_path):
    """143 keys inside one band: the bloom union admits almost every
    segment, the point-in-range bisect keeps exactly one."""
    lake = _banded_lake(spark, tmp_path)
    keys = list(range(3000, 3999, 7))
    segs = M.resolve_segments(spark, lake, keys_in={"k": keys})
    assert len(segs) == 1
    assert M.read_for_keys(spark, lake, "k", keys).count() == len(keys)


def test_read_for_keys_guards(spark, tmp_path):
    lake = _banded_lake(spark, tmp_path, bands=2, per=10)
    with pytest.raises(ValueError, match="max_keys"):
        M.read_for_keys(spark, lake, "k", list(range(100)), max_keys=10)
    assert M.read_for_keys(spark, lake, "k", []).count() == 0
    # None keys are dropped (a bloom/range can never prove NULL)
    assert M.read_for_keys(spark, lake, "k", [None, 3]).count() == 1


def test_keys_in_type_drift_keeps(spark, tmp_path):
    """String probes against int stats must keep every segment —
    skipping is optional, soundness isn't."""
    lake = _banded_lake(spark, tmp_path, bands=2, per=10)
    n_all = len(M.resolve_segments(spark, lake))
    assert (
        len(M.resolve_segments(spark, lake, keys_in={"k": ["7", "8"]}))
        == n_all
    )


def test_multi_value_bloom_point_parity(spark, tmp_path):
    """A single-element list probes identically to the scalar form."""
    lake = _banded_lake(spark, tmp_path)
    one = M.resolve_segments(spark, lake, bloom_eq={"k": 4321})
    lst = M.resolve_segments(spark, lake, bloom_eq={"k": [4321]})
    assert one == lst


# ------------------------------------------- token blooms / part agg


def test_token_bloom_prunes_and_any_of(spark, tmp_path):
    lake = str(tmp_path / "lake")
    rows = [
        (0, "alpha beta gamma"), (1, "beta delta"),
        (2, "epsilon zeta"), (3, "eta theta needle"),
        (4, "iota kappa"), (5, "lambda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for b in range(3):
        M.commit_append(
            spark, lake,
            df.filter((F.col("doc_id") >= 2 * b) & (F.col("doc_id") < 2 * b + 2)),
            token_bloom_cols=["text"],
        )
    assert len(M.resolve_segments(spark, lake, token_eq={"text": "needle"})) <= 2
    # case-insensitive: build lowers, probe lowers
    assert (
        M.resolve_segments(spark, lake, token_eq={"text": "NEEDLE"})
        == M.resolve_segments(spark, lake, token_eq={"text": "needle"})
    )
    # any-of keeps the union
    segs = M.resolve_segments(spark, lake, token_eq={"text": ["needle", "mu"]})
    assert len(segs) >= 2
    got = (
        M.read_snapshot(spark, lake, token_eq={"text": "needle"})
        .filter(F.array_contains(F.split(F.lower("text"), r"\s+"), "needle"))
        .count()
    )
    assert got == 1


def test_token_bloom_absent_everywhere(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    M.commit_append(spark, lake, df, token_bloom_cols=["text"])
    # absent token: usually zero segments survive (rare FP tolerated)
    assert len(M.resolve_segments(spark, lake, token_eq={"text": "zzzz"})) <= 1


def test_token_bloom_respects_rename(spark, tmp_path):
    """token_eq probes translate through column mapping like every
    other probe."""
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(0, "alpha needle"), (1, "beta gamma")], "doc_id long, body string"
    )
    M.commit_append(spark, lake, df.filter("doc_id = 0"), token_bloom_cols=["body"])
    M.commit_append(spark, lake, df.filter("doc_id = 1"), token_bloom_cols=["body"])
    M.rename_column(spark, lake, "body", "text")
    segs = M.resolve_segments(spark, lake, token_eq={"text": "needle"})
    assert len(segs) <= 1 + 1  # true segment + FP allowance
    got = (
        M.read_snapshot(spark, lake, token_eq={"text": "needle"})
        .filter(F.array_contains(F.split(F.lower("text"), r"\s+"), "needle"))
        .count()
    )
    assert got == 1


def test_metadata_agg_part_scoped(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("band")
    )
    for b in range(3):
        M.commit_append(
            spark, lake, df.filter(F.col("band") == b),
            partition={"band": b}, stats_cols=["k"],
        )
    r = M.metadata_agg(
        spark, lake, min_cols=["k"], max_cols=["k"],
        part_eq={"band": 1}, allow_scan=False,
    ).collect()[0]
    assert (r["count_rows"], r["min_k"], r["max_k"]) == (20, 1, 58)
    # untagged segment in scope -> allow_scan=False refuses, hybrid agrees
    M.commit_append(spark, lake, df.filter("k >= 57"))
    with pytest.raises(ValueError, match="partition proof"):
        M.metadata_agg(spark, lake, min_cols=["k"], part_eq={"band": 1},
                       allow_scan=False)
    r2 = M.metadata_agg(spark, lake, min_cols=["k"], max_cols=["k"],
                        part_eq={"band": 1}).collect()[0]
    assert (r2["count_rows"], r2["min_k"], r2["max_k"]) == (21, 1, 58)


def test_metadata_agg_by_partition_hybrid(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("band"),
        F.when(F.col("id") % 4 == 0, F.lit(None))
        .otherwise(F.col("id").cast("double")).alias("maybe"),
    )
    for b in range(2):
        M.commit_append(
            spark, lake, df.filter(F.col("band") == b),
            partition={"band": b}, stats_cols=["k", "maybe"],
        )
    got = M.metadata_agg_by_partition(
        spark, lake, "band", min_cols=["k"], max_cols=["k", "maybe"],
        count_cols=["maybe"], allow_scan=False,
    )
    exp = M.read_snapshot(spark, lake).groupBy("band").agg(
        F.count(F.lit(1)).alias("count_rows"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.max("maybe").alias("max_maybe"),
        F.count("maybe").alias("count_maybe"),
    )
    key = lambda r: r["band"]
    assert sorted(got.collect(), key=key) == sorted(exp.collect(), key=key)
    # hybrid: an untagged append merges through the grouped scan path
    M.commit_append(spark, lake, df.filter("k < 4"))
    got2 = M.metadata_agg_by_partition(
        spark, lake, "band", min_cols=["k"], max_cols=["k"],
        count_cols=["maybe"],
    )
    exp2 = M.read_snapshot(spark, lake).groupBy("band").agg(
        F.count(F.lit(1)).alias("count_rows"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("maybe").alias("count_maybe"),
    )
    assert sorted(got2.collect(), key=key) == sorted(exp2.collect(), key=key)


# -------------------------------------------------------- CLI verbs


def test_cli_branch_publish_stats(spark, tmp_path, capsys):
    import json

    from nba_pipeline_spark.__main__ import main

    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 30), stats_cols=["k"])

    assert main(["lake", "branch", lake, "--name", "wap"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["branch"] == "wap"
    M.commit_append(spark, out["root"], _frame(spark, 30, 40), stats_cols=["k"])

    assert main(["lake", "branches", lake]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == ["wap"]

    assert main(["lake", "publish", lake, "--name", "wap"]) == 0
    capsys.readouterr()
    assert M.read_snapshot(spark, lake).count() == 40

    assert main([
        "lake", "stats", lake, "--stats-cols", "k", "--metadata-only",
    ]) == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[0]
    assert (row["count_rows"], row["min_k"], row["max_k"]) == (40, 0, 39)


def test_cli_stats_by_partition(spark, tmp_path, capsys):
    import json

    from nba_pipeline_spark.__main__ import main

    lake = str(tmp_path / "lake")
    df = _frame(spark, 0, 40).withColumn("band", F.col("k") % 2)
    for b in range(2):
        M.commit_append(
            spark, lake, df.filter(F.col("band") == b),
            partition={"band": b}, stats_cols=["k"],
        )
    assert main([
        "lake", "stats", lake, "--stats-cols", "k",
        "--group-by", "band", "--metadata-only",
    ]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {r["band"]: r["count_rows"] for r in rows}
    assert got == {0: 20, 1: 20}


# --------------------------------------------------------- wap_ingest


def test_wap_ingest_happy_path(spark, tmp_path):
    lake = str(tmp_path / "lake")
    quar = str(tmp_path / "quarantine")
    M.commit_append(spark, lake, _frame(spark, 0, 50))

    def audit(snap):
        # batch rows violating the rule, in table context
        return snap.filter((F.col("k") >= 50) & (F.col("k") % 9 == 0))

    v = M.wap_ingest(
        spark, lake, _frame(spark, 50, 80), audit, ["k"], quarantine=quar
    )
    assert v == M.current_version(spark, lake)
    got = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    assert got == [k for k in range(80) if k < 50 or k % 9 != 0]
    qrows = sorted(r["k"] for r in M.read_snapshot(spark, quar).collect())
    assert qrows == [54, 63, 72]
    assert M.list_branches(spark, lake) == []


def test_wap_ingest_clean_batch_no_delete_commit(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    M.wap_ingest(
        spark, lake, _frame(spark, 10, 20),
        lambda snap: snap.filter("1 = 0"), ["k"],
    )
    assert M.read_snapshot(spark, lake).count() == 20
    ops = [r["op"] for r in M.history(spark, lake).collect()]
    assert "delete" not in ops


def test_wap_ingest_replays_on_conflict(spark, tmp_path):
    """A writer landing on main mid-audit forces a full replay: the
    final table holds BOTH the racing write and the audited batch."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    raced = {"done": False}

    def audit(snap):
        if not raced["done"]:
            raced["done"] = True  # advance main between fork and publish
            M.commit_append(spark, lake, _frame(spark, 100, 105))
        return snap.filter("k = 12")

    M.wap_ingest(spark, lake, _frame(spark, 10, 20), audit, ["k"])
    got = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    assert got == [k for k in range(20) if k != 12] + list(range(100, 105))
    assert M.list_branches(spark, lake) == []


def test_fully_pruned_read_is_empty_not_error(spark, tmp_path):
    """Probes that disprove EVERY segment return an empty frame with
    the table schema — a normal result, not an exception (the
    absent-token / out-of-range-key shape)."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 20), stats_cols=["k"])
    M.commit_append(spark, lake, _frame(spark, 20, 40), stats_cols=["k"])
    t = M.read_snapshot(spark, lake, ranges={"k": (1000, 2000)})
    assert t.count() == 0
    assert t.columns == ["k", "g", "maybe"]
    assert M.read_for_keys(spark, lake, "k", [999]).count() == 0


# ----------------------------------------------------- generated cols


def test_generated_column_computes_and_validates(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.set_generated_column(spark, lake, "g2", "k * 2")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    M.commit_append(spark, lake, df)  # column absent: computed
    snap = M.read_snapshot(spark, lake)
    assert snap.filter("g2 = k * 2").count() == 10
    # supplied-and-correct passes
    good = spark.range(10, 15).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("g2")
    )
    M.commit_append(spark, lake, good)
    assert M.read_snapshot(spark, lake).count() == 15
    # supplied-and-wrong refuses: a generated column is a contract
    bad = spark.range(15, 20).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("g2")
    )
    with pytest.raises(M.ConstraintViolation, match="generated"):
        M.commit_append(spark, lake, bad)
    assert M.read_snapshot(spark, lake).count() == 15


def test_generated_column_declare_guards(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    M.commit_append(spark, lake, df)
    # non-empty lake, column absent -> refuse (old rows would NULL-fill)
    with pytest.raises(M.SchemaDrift, match="Backfill"):
        M.set_generated_column(spark, lake, "g2", "k * 2")
    # column present but diverging -> refuse
    lake2 = str(tmp_path / "lake2")
    M.commit_append(
        spark, lake2,
        spark.range(0, 10).select(F.col("id").alias("k"),
                                  (F.col("id") * 3).alias("g2")),
    )
    with pytest.raises(M.ConstraintViolation, match="disagree"):
        M.set_generated_column(spark, lake2, "g2", "k * 2")
    # column present and matching -> declared, then enforced
    lake3 = str(tmp_path / "lake3")
    M.commit_append(
        spark, lake3,
        spark.range(0, 10).select(F.col("id").alias("k"),
                                  (F.col("id") * 2).alias("g2")),
    )
    M.set_generated_column(spark, lake3, "g2", "k * 2")
    assert M.generated_columns(spark, lake3) == {"g2": "k * 2"}


def test_generated_partition_column_prunes(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.set_generated_column(spark, lake, "band", "CAST(k % 3 AS INT)")
    df = spark.range(0, 30).select(F.col("id").alias("k"))
    M.commit_append_partitioned(spark, lake, df, "band")
    assert len(M.resolve_segments(spark, lake)) == 3
    segs = M.resolve_segments(spark, lake, part_eq={"band": 1})
    assert len(segs) == 1
    got = M.read_snapshot(spark, lake, part_eq={"band": 1}).filter(
        "band = 1"
    ).count()
    assert got == 10


# ------------------------------------------------------ type widening


def _narrow(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("float").alias("x"),
    )


def test_widen_reads_mixed_files(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _narrow(spark, 0, 50), stats_cols=["k"])
    M.widen_column_type(spark, lake, "k", "bigint")
    M.widen_column_type(spark, lake, "x", "double")
    # old narrow writer keeps working (auto-upcast at the boundary)
    M.commit_append(spark, lake, _narrow(spark, 50, 60))
    # new wide writer too
    M.commit_append(
        spark, lake,
        spark.range(60, 70).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("x")
        ),
    )
    snap = M.read_snapshot(spark, lake)
    assert dict(snap.dtypes) == {"k": "bigint", "x": "double"}
    assert snap.count() == 70
    assert snap.agg(F.sum("k")).collect()[0][0] == sum(range(70))
    # time travel BEFORE the widen surfaces the original narrow types
    assert dict(M.read_snapshot(spark, lake, version=1).dtypes) == {
        "k": "int", "x": "float",
    }
    # metadata-only: v1's segment is still referenced unchanged
    assert set(M.resolve_segments(spark, lake, version=1)) <= set(
        M.resolve_segments(spark, lake)
    )


def test_widen_guards_and_compact_materializes(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _narrow(spark, 0, 20))
    with pytest.raises(ValueError, match="not a supported widening"):
        M.widen_column_type(spark, lake, "x", "int")
    with pytest.raises(ValueError, match="no column"):
        M.widen_column_type(spark, lake, "zzz", "bigint")
    M.widen_column_type(spark, lake, "k", "bigint")
    # modify-in-place ops refuse until the widening is materialized
    with pytest.raises(ValueError, match="widened"):
        M.commit_delete(
            spark, lake,
            M.read_snapshot(spark, lake).filter("k = 1").select("k"), ["k"],
        )
    M.compact(spark, lake, target_files=1)
    M.commit_delete(
        spark, lake,
        M.read_snapshot(spark, lake).filter("k = 1").select("k"), ["k"],
    )
    assert M.read_snapshot(spark, lake).count() == 19
    # bigint never widens to double (2^53)
    with pytest.raises(ValueError, match="not a supported widening"):
        M.widen_column_type(spark, lake, "k", "double")


def test_widen_through_datasource_and_stream(spark, tmp_path):
    from nba_pipeline_spark.sources.lake_datasource import read_lake
    from nba_pipeline_spark.sources.lake_stream import register_lake_stream

    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _narrow(spark, 0, 30))
    M.widen_column_type(spark, lake, "k", "bigint")
    M.commit_append(
        spark, lake,
        spark.range(30, 40).select(
            F.col("id").alias("k"), F.col("id").cast("float").alias("x")
        ),
    )
    t = read_lake(spark, lake)
    assert dict(t.dtypes)["k"] == "bigint"
    assert t.count() == 40 and t.agg(F.sum("k")).collect()[0][0] == sum(range(40))
    # streaming source pins the widened schema and upcasts old files
    register_lake_stream(spark)
    got: list = []
    q = (
        spark.readStream.format("manifest_stream")
        .option("path", lake)
        .load()
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["k"] for r in got) == list(range(40))


# ------------------------------------------------------ compact_small


def test_compact_small_consolidates_only_the_tail(spark, tmp_path):
    lake = str(tmp_path / "lake")
    # one big segment + four small ones
    M.commit_append(spark, lake, _frame(spark, 0, 1000), stats_cols=["k"])
    for lo in range(1000, 1040, 10):
        M.commit_append(
            spark, lake, _frame(spark, lo, lo + 10), stats_cols=["k"]
        )
    before = M.resolve_segments(spark, lake)
    assert len(before) == 5
    v = M.compact_small(spark, lake, target_rows=100)
    assert v is not None
    after = M.resolve_segments(spark, lake)
    assert len(after) == 2  # big survives untouched, tail merged to one
    assert before[0] in after  # the big segment kept its identity
    got = M.read_snapshot(spark, lake)
    assert got.count() == 1040
    # merged segment re-recorded stats: metadata agg still zero-file
    r = M.metadata_agg(
        spark, lake, min_cols=["k"], max_cols=["k"], allow_scan=False
    ).collect()[0]
    assert (r["count_rows"], r["min_k"], r["max_k"]) == (1040, 0, 1039)
    # steady state: nothing left to do
    assert M.compact_small(spark, lake, target_rows=100) is None


def test_compact_small_respects_partitions(spark, tmp_path):
    lake = str(tmp_path / "lake")
    for b in range(2):
        for i in range(3):
            M.commit_append(
                spark, lake,
                _frame(spark, b * 100 + i * 10, b * 100 + i * 10 + 10),
                partition={"band": b}, stats_cols=["k"],
            )
    assert len(M.resolve_segments(spark, lake)) == 6
    M.compact_small(spark, lake, target_rows=1000)
    segs = M.resolve_segments(spark, lake)
    assert len(segs) == 2  # one merged segment PER PARTITION
    # partition pruning still works on the merged layout
    assert len(M.resolve_segments(spark, lake, part_eq={"band": 0})) == 1
    # the band-0 scoped read returns exactly that partition's rows
    assert M.read_snapshot(spark, lake, part_eq={"band": 0}).count() == 30
    assert M.read_snapshot(spark, lake).count() == 60


def test_cli_widen_and_generated(spark, tmp_path, capsys):
    import json

    from nba_pipeline_spark.__main__ import main

    lake = str(tmp_path / "lake")
    M.commit_append(
        spark, lake,
        spark.range(0, 10).select(F.col("id").cast("int").alias("k")),
    )
    assert main(["lake", "widen-type", lake, "--old", "k", "--new", "bigint"]) == 0
    capsys.readouterr()
    assert dict(M.read_snapshot(spark, lake).dtypes)["k"] == "bigint"

    lake2 = str(tmp_path / "lake2")
    assert main(["lake", "set-generated", lake2, "--rule", "g2:k * 2"]) == 0
    capsys.readouterr()
    M.commit_append(
        spark, lake2, spark.range(0, 5).select(F.col("id").alias("k"))
    )
    assert M.read_snapshot(spark, lake2).filter("g2 = k * 2").count() == 5


def test_history_operation_metrics(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 30), stats_cols=["k"])
    M.commit_append(spark, lake, _frame(spark, 30, 40), stats_cols=["k"])
    M.compact(spark, lake, target_files=1)
    h = {r["version"]: r for r in M.history(spark, lake).collect()}
    assert (h[1]["segments_added"], h[1]["rows_added"]) == (1, 30)
    assert (h[2]["segments_added"], h[2]["rows_added"]) == (1, 10)
    assert h[3]["segments_removed"] == 2  # compact consolidated both
    # appends without stats report NULL rows_added, never a guess
    M.commit_append(spark, lake, _frame(spark, 40, 45))
    h = {r["version"]: r for r in M.history(spark, lake).collect()}
    assert h[4]["rows_added"] is None and h[4]["segments_added"] == 1


# ------------------------------------------- persisted expectations


def test_wap_ingest_uses_recorded_expectations(spark, tmp_path):
    """The lake carries its quality contract: with audit=None,
    wap_ingest quarantines batch rows failing ANY recorded
    expectation — NULLs fail (unprovable = violation), pre-existing
    rows are never touched (batch-key scoping)."""
    lake = str(tmp_path / "lake")
    quar = str(tmp_path / "quar")
    # base contains a rule-violating row (k=5 -> maybe NULL) that must
    # SURVIVE: expectations gate ingestion, not history
    M.commit_append(spark, lake, _frame(spark, 0, 20))
    M.set_expectation(spark, lake, "maybe_known", "maybe IS NOT NULL")
    M.set_expectation(spark, lake, "small_g", "g < 9")
    assert set(M.table_expectations(spark, lake)) == {"maybe_known", "small_g"}

    M.wap_ingest(
        spark, lake, _frame(spark, 20, 40), keys=["k"], quarantine=quar
    )
    got = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    # batch rows with maybe NULL (k%5==0) or g==9 (k%10==9) quarantined
    bad = {k for k in range(20, 40) if k % 5 == 0 or k % 10 == 9}
    assert got == [k for k in range(40) if k < 20 or k not in bad]
    qrows = sorted(r["k"] for r in M.read_snapshot(spark, quar).collect())
    assert qrows == sorted(bad)

    # dropping a rule narrows the gate
    M.drop_expectation(spark, lake, "small_g")
    M.wap_ingest(spark, lake, _frame(spark, 40, 50), keys=["k"])
    got2 = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    assert all(k in got2 for k in (49,))  # g==9 now admitted
    assert 45 not in got2  # maybe NULL still quarantined
    with pytest.raises(ValueError, match="no such expectation"):
        M.drop_expectation(spark, lake, "zzz")


def test_wap_ingest_no_rules_admits_everything(spark, tmp_path):
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    M.wap_ingest(spark, lake, _frame(spark, 10, 20), keys=["k"])
    assert M.read_snapshot(spark, lake).count() == 20


def test_stream_over_wap_maintained_lake(spark, tmp_path):
    """Append-only WAP publishes stream incrementally: a publish whose
    branch only APPENDED adds segments without removing any, so the
    version-offset source treats it as a normal append commit."""
    from nba_pipeline_spark.sources.lake_stream import register_lake_stream

    register_lake_stream(spark)
    lake, ckpt = str(tmp_path / "lake"), str(tmp_path / "ckpt")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    got: list = []

    def pump():
        q = (
            spark.readStream.format("manifest_stream")
            .option("path", lake)
            .load()
            .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pump()
    M.wap_ingest(spark, lake, _frame(spark, 10, 20), keys=["k"])
    pump()
    assert sorted(r["k"] for r in got) == list(range(20))


def test_cli_expectation_and_wap_ingest(spark, tmp_path, capsys):
    import json

    from nba_pipeline_spark.__main__ import main

    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    assert main([
        "lake", "expectation", lake, "--rule", "maybe_known:maybe IS NOT NULL",
    ]) == 0
    capsys.readouterr()
    assert main(["lake", "expectation", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"maybe_known": "maybe IS NOT NULL"}

    batch = str(tmp_path / "batch.parquet")
    _frame(spark, 10, 20).write.parquet(batch)
    assert main([
        "lake", "wap-ingest", lake, "--input", batch, "--keys", "k",
        "--dest", str(tmp_path / "quar"),
    ]) == 0
    capsys.readouterr()
    got = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    assert got == [k for k in range(20) if k < 10 or k % 5 != 0]


def test_vacuum_ignores_open_branches(spark, tmp_path):
    """Main-side vacuum scans main's own data dir: an open branch's
    LOCAL segments are untouched, and the branch stays readable while
    its fork version's segments remain live in main."""
    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 20))
    b = M.create_branch(spark, lake, "open")
    M.commit_append(spark, b, _frame(spark, 20, 30))
    # main churns within retention (append + compact), then vacuums
    M.commit_append(spark, lake, _frame(spark, 100, 105))
    M.vacuum(spark, lake, keep_versions=10)  # fork version retained
    assert sorted(r["k"] for r in M.read_snapshot(spark, b).collect()) == (
        list(range(30))
    )
    # branch root is itself a lake: its own vacuum works
    M.commit_append(spark, b, _frame(spark, 30, 35))
    M.vacuum(spark, b, keep_versions=1)
    assert M.read_snapshot(spark, b).count() == 35
    M.drop_branch(spark, lake, "open")


def test_publish_conflict_leaves_no_referenced_orphans(spark, tmp_path):
    """A refused publish (fast-forward check) happens BEFORE any copy:
    main's data dir gains nothing, and vacuum finds nothing stray."""
    import os

    lake = str(tmp_path / "lake")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    M.create_branch(spark, lake, "late")
    bpath = M.branch_path(lake, "late")
    M.commit_append(spark, bpath, _frame(spark, 10, 20))
    before = set(os.listdir(f"{lake}/data"))
    M.commit_append(spark, lake, _frame(spark, 100, 101))  # main advances
    after_advance = set(os.listdir(f"{lake}/data"))
    with pytest.raises(M.CommitConflict):
        M.publish_branch(spark, lake, "late")
    assert set(os.listdir(f"{lake}/data")) == after_advance
    assert before < after_advance
    M.drop_branch(spark, lake, "late")


def test_metadata_agg_differential_random_layouts(spark, tmp_path):
    """Seeded-random lakes (varying segment counts, stats coverage,
    null densities, partition tags): metadata_agg must equal the scan
    aggregate in EVERY layout — the hybrid merge is exact, not
    approximate."""
    import random

    rng = random.Random(8)
    for trial in range(4):
        lake = str(tmp_path / f"lake{trial}")
        lo = 0
        for _ in range(rng.randint(2, 6)):
            hi = lo + rng.randint(1, 40)
            kw = {}
            if rng.random() < 0.7:
                kw["stats_cols"] = ["k", "maybe"]
            if rng.random() < 0.5:
                kw["partition"] = {"band": rng.randint(0, 1)}
            M.commit_append(spark, lake, _frame(spark, lo, hi), **kw)
            lo = hi
        got = M.metadata_agg(
            spark, lake, min_cols=["k", "maybe"], max_cols=["k", "maybe"],
            count_cols=["k", "maybe"],
        ).collect()
        exp = M.read_snapshot(spark, lake).agg(
            F.count(F.lit(1)).alias("count_rows"),
            F.min("k").alias("min_k"),
            F.min("maybe").alias("min_maybe"),
            F.max("k").alias("max_k"),
            F.max("maybe").alias("max_maybe"),
            F.count("k").alias("count_k"),
            F.count("maybe").alias("count_maybe"),
        ).collect()
        assert got == exp, f"trial {trial}: {got} != {exp}"
        # keyed fetch returns exactly the requested existing keys
        keys = sorted(rng.sample(range(lo), min(7, lo)))
        fetched = sorted(
            r["k"] for r in M.read_for_keys(spark, lake, "k", keys).collect()
        )
        assert fetched == keys, f"trial {trial}"


def test_wap_ingest_conflict_replay_no_quarantine_dupes(spark, tmp_path):
    """A publish conflict replays the whole WAP cycle; the quarantine
    append carries one idempotency tag per wap_ingest CALL so the
    replay does not duplicate the quarantined rows — ADVICE r8 #3."""
    lake = str(tmp_path / "lake")
    quar = str(tmp_path / "quarantine")
    M.commit_append(spark, lake, _frame(spark, 0, 10))
    raced = {"done": False}

    def audit(snap):
        if not raced["done"]:
            raced["done"] = True  # advance main between fork and publish
            M.commit_append(spark, lake, _frame(spark, 100, 105))
        return snap.filter("k in (12, 14)")

    M.wap_ingest(
        spark, lake, _frame(spark, 10, 20), audit, ["k"], quarantine=quar
    )
    qrows = sorted(r["k"] for r in M.read_snapshot(spark, quar).collect())
    assert qrows == [12, 14]  # exactly once despite the replay
    got = sorted(r["k"] for r in M.read_snapshot(spark, lake).collect())
    assert got == [k for k in range(20) if k not in (12, 14)] + list(
        range(100, 105)
    )


def test_metadata_agg_scans_widened_segments(spark, tmp_path):
    """The hybrid fallback scan reads uncovered segments under the
    recorded WIDENED schema: mixed int32/int64 files would fail the
    plain mergeSchema merge — ADVICE r8 #4 (both the global and the
    per-partition aggregate)."""
    lake = str(tmp_path / "lake")
    # no stats_cols anywhere: every segment is uncovered -> fallback
    M.commit_append(
        spark, lake,
        spark.range(0, 20).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") % 2).alias("p"),
        ),
        partition={"p": None},
    )
    M.widen_column_type(spark, lake, "k", "bigint")
    M.commit_append(
        spark, lake,
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("p")
        ),
        partition={"p": None},
    )
    r = M.metadata_agg(
        spark, lake, min_cols=["k"], max_cols=["k"], count_cols=["k"]
    ).collect()[0]
    assert (r["count_rows"], r["min_k"], r["max_k"], r["count_k"]) == (
        30, 0, 29, 30,
    )
    rp = {
        row["p"]: (row["count_rows"], row["max_k"])
        for row in M.metadata_agg_by_partition(
            spark, lake, "p", max_cols=["k"]
        ).collect()
    }
    assert rp == {0: (15, 28), 1: (15, 29)}
