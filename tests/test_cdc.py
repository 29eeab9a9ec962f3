"""Unit semantics for operators/cdc.py: last-writer-wins, inserts,
deletes, NULL-key and duplicate-key edges. Oracle parity at sf0.01 is
covered by the gate (q_cdc_upsert / q_cdc_changelog); NULL shapes by
tests/test_adversarial.py."""

from __future__ import annotations

from nba_pipeline_spark.operators.cdc import apply_changelog, merge_upsert


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_merge_upsert_last_writer_wins_and_insert(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    changes = spark.createDataFrame(
        [(1, "a2", 10), (1, "a3", 20), (3, "c", 5)], ["k", "v", "ver"]
    )
    got = _rows(merge_upsert(base, changes, ["k"], "ver"))
    assert got == [(1, "a3"), (2, "b"), (3, "c")]  # highest ver wins, 3 inserted


def test_merge_upsert_null_key_groups(spark):
    # window semantics: NULL keys form ONE group — a NULL-key change
    # replaces NULL-key base rows (documented, matches the SQL oracle)
    base = spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string")
    changes = spark.createDataFrame([(None, "y", 1)], "k int, v string, ver int")
    got = _rows(merge_upsert(base, changes, ["k"], "ver"))
    assert got == [(1, "a"), (None, "y")]


def test_apply_changelog_delete_upsert_passthrough(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    log = spark.createDataFrame(
        [
            (1, "a2", 10, "upsert"),
            (1, None, 20, "delete"),  # latest for k=1 → gone
            (2, "b2", 5, "upsert"),
            (4, "d", 1, "upsert"),  # new key inserted
        ],
        ["k", "v", "seq", "op"],
    )
    got = _rows(apply_changelog(base, log, ["k"], "seq", "op"))
    assert got == [(2, "b2"), (3, "c"), (4, "d")]


def test_apply_changelog_null_keys_never_match(spark):
    # join semantics: NULL-key deletes touch nothing; NULL-key upserts
    # insert their own row (SQL equality, matches NOT EXISTS oracle)
    base = spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string")
    log = spark.createDataFrame(
        [(None, "y", 1, "upsert")], "k int, v string, seq int, op string"
    )
    got = _rows(apply_changelog(base, log, ["k"], "seq", "op"))
    assert got == [(1, "a"), (None, "x"), (None, "y")]


def test_apply_changelog_keeps_duplicate_untouched_base_rows(spark):
    base = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
    log = spark.createDataFrame([(2, "b2", 1, "upsert")], ["k", "v", "seq", "op"])
    got = _rows(apply_changelog(base, log, ["k"], "seq", "op"))
    assert got == [(1, "a"), (1, "a"), (2, "b2")]


def test_streaming_upsert_sink_converges(spark, tmp_path):
    """Two micro-batches of changes drained through foreachBatch
    merge_upsert equal one batch merge of all changes."""
    import os, shutil

    from nba_pipeline_spark.operators.cdc import streaming_upsert_sink

    target = str(tmp_path / "target")
    spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "k int, v string, ver int").write.parquet(target)

    b1 = [(1, "a2", 10), (3, "c", 5)]
    b2 = [(1, "a3", 20), (2, "b2", 7)]
    src = str(tmp_path / "changes")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        sub = f"{src}/w{i}"
        spark.createDataFrame(rows, "k int, v string, ver int").coalesce(1).write.parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        shutil.move(f"{sub}/{part}", f"{src}/{i:03d}.parquet")
        shutil.rmtree(sub)
        os.utime(f"{src}/{i:03d}.parquet", (1000 + i, 1000 + i))

    stream = (
        spark.readStream.schema("k int, v string, ver int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_upsert_sink(stream, target, ["k"], "ver", str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a3"), (2, "b2"), (3, "c")}  # latest ver wins per key
