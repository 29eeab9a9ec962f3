"""Table CHECK constraints on the manifest lake: add-time validation
of existing data, per-commit enforcement on every write path, carry
across unrelated commits, and drop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nba_pipeline_spark.sources import manifest as M


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, amt int, ver int")


@pytest.fixture()
def lake(spark, tmp_path):
    p = str(tmp_path / "lake")
    M.commit_append(spark, p, _rows(spark, [(1, 10, 0), (2, 20, 0)]))
    M.set_constraint(spark, p, "amt_pos", "amt > 0")
    return p


def test_add_refused_when_existing_rows_violate(spark, tmp_path):
    p = str(tmp_path / "lake")
    M.commit_append(spark, p, _rows(spark, [(1, -5, 0)]))
    with pytest.raises(M.ConstraintViolation):
        M.set_constraint(spark, p, "amt_pos", "amt > 0")
    assert M.table_constraints(spark, p) == {}


def test_append_enforced_and_version_unchanged(spark, lake):
    v = M.current_version(spark, lake)
    with pytest.raises(M.ConstraintViolation):
        M.commit_append(spark, lake, _rows(spark, [(3, -1, 0)]))
    assert M.current_version(spark, lake) == v  # nothing committed
    M.commit_append(spark, lake, _rows(spark, [(3, 30, 0)]))
    assert M.read_snapshot(spark, lake).count() == 3


def test_null_predicate_is_a_violation(spark, lake):
    bad = spark.createDataFrame([(4, None, 0)], "k int, amt int, ver int")
    with pytest.raises(M.ConstraintViolation):
        M.commit_append(spark, lake, bad)


def test_upsert_and_replace_enforced(spark, lake):
    with pytest.raises(M.ConstraintViolation):
        M.commit_upsert(spark, lake, _rows(spark, [(1, -9, 1)]), ["k"], "ver")
    with pytest.raises(M.ConstraintViolation):
        M.commit_replace(spark, lake, _rows(spark, [(1, -9, 1)]))
    M.commit_upsert(spark, lake, _rows(spark, [(1, 99, 1)]), ["k"], "ver")
    got = {(r["k"], r["amt"]) for r in M.read_snapshot(spark, lake).collect()}
    assert got == {(1, 99), (2, 20)}


def test_constraints_carry_and_report(spark, lake):
    M.commit_append(spark, lake, _rows(spark, [(5, 50, 0)]))
    M.compact(spark, lake)
    assert M.table_constraints(spark, lake) == {"amt_pos": "amt > 0"}
    # multi-constraint violation report names each failing rule
    M.set_constraint(spark, lake, "k_small", "k < 1000")
    with pytest.raises(M.ConstraintViolation, match="amt_pos"):
        M.commit_append(spark, lake, _rows(spark, [(2000, -1, 0)]))


def test_drop_constraint(spark, lake):
    M.drop_constraint(spark, lake, "amt_pos")
    M.commit_append(spark, lake, _rows(spark, [(9, -9, 0)]))  # now allowed
    assert M.table_constraints(spark, lake) == {}
    with pytest.raises(ValueError):
        M.drop_constraint(spark, lake, "nope")


def test_partitioned_append_enforced(spark, lake, tmp_path):
    p = str(tmp_path / "plake")
    df = _rows(spark, [(1, 10, 0), (2, 20, 0)]).withColumn("part", F.col("k") % 2)
    M.commit_append_partitioned(spark, p, df, "part")
    M.set_constraint(spark, p, "amt_pos", "amt > 0")
    bad = _rows(spark, [(3, -3, 0)]).withColumn("part", F.lit(1))
    with pytest.raises(M.ConstraintViolation):
        M.commit_append_partitioned(spark, p, bad, "part")
