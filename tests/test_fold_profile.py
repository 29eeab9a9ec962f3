"""Semantics of the fold/profile family (plans/fold_profile_queries.py)
on small literal frames: the EWMA recurrence against pandas' reference
implementation, bitmap distinct against countDistinct, checksum
invariance under reordering, heavy-hitter threshold behavior."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


def test_ewma_matches_pandas_recurrence(spark):
    """alpha=0.1, seeded with the first value == pandas ewm(adjust=False)."""
    rows = [
        (1, i, float(v))
        for i, v in enumerate([10.0, 20.0, 15.0, 0.0, 5.0])
    ] + [(2, 0, 7.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")

    arr = F.array_sort(F.collect_list(F.struct("event_id", "value")))
    vals = F.transform(arr, lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.1) * x + F.lit(0.9) * acc,
    )
    got = {
        r["user_id"]: r["ewma"]
        for r in df.groupBy("user_id").agg(ewma.alias("ewma")).collect()
    }

    s = pd.Series([10.0, 20.0, 15.0, 0.0, 5.0])
    want = s.ewm(alpha=0.1, adjust=False).mean().iloc[-1]
    assert got[1] == pytest.approx(want, abs=1e-12)
    assert got[2] == 7.0  # single element: the seed itself


def test_bitmap_distinct_equals_count_distinct(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"), ((F.col("id") * 37) % 900 + 1).alias("k")
    )
    via_bitmap = (
        df.groupBy("g", F.bitmap_bucket_number(F.col("k")).alias("b"))
        .agg(
            F.bitmap_count(
                F.bitmap_construct_agg(F.bitmap_bit_position(F.col("k")))
            ).alias("c")
        )
        .groupBy("g")
        .agg(F.sum("c").cast("long").alias("n"))
    )
    exact = df.groupBy("g").agg(F.countDistinct("k").alias("n"))
    assert sorted(via_bitmap.collect()) == sorted(exact.collect())


def test_checksum_invariant_under_reordering(spark):
    from nba_pipeline_spark.plans.queries import REGISTRY

    base = REGISTRY["q_table_checksum"].fn(spark, SF_DIR)
    # same rows, different physical order / partitioning -> same checksum
    from nba_pipeline_spark.sources import load_table

    cust = load_table(spark, SF_DIR, "customer").orderBy(F.desc("c_name")).repartition(7)
    row = F.concat_ws(
        "|", F.col("c_custkey").cast("string"), F.col("c_name"), F.col("c_mktsegment")
    )
    word = F.conv(F.substring(F.md5(row), 1, 8), 16, 10).cast("long")
    shuffled = cust.groupBy("c_nationkey").agg(
        F.sum(word).alias("checksum"), F.count(F.lit(1)).alias("n_rows")
    )
    assert sorted(base.collect()) == sorted(shuffled.collect())


def test_heavy_hitters_flags_only_skewed_keys(spark):
    # 10 users with 10 events each, one user with 200: only the whale
    # exceeds 1.2x the uniform share
    rows = [(u, i) for u in range(10) for i in range(10)] + [(99, i) for i in range(200)]
    df = spark.createDataFrame(rows, "user_id long, event_id long")
    total = df.agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("user_id").alias("n_users")
    )
    hh = (
        df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") * F.col("n_users") * 5 > F.col("total") * 6)
    )
    assert [r["user_id"] for r in hh.collect()] == [99]


def test_median_interpolates_even_counts(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0), ("b", 5.0)],
        "g string, v double",
    )
    got = {r["g"]: r["m"] for r in df.groupBy("g").agg(F.median("v").alias("m")).collect()}
    assert got == {"a": 3.0, "b": 5.0}


def test_expectations_report_counts_planted_violations(spark):
    """Rules evaluate in one aggregate; NULL rule results count as
    violations; the FK check reports orphans."""
    from pyspark.sql import functions as F

    from nba_pipeline_spark.operators.expectations import (
        expectations_report,
        fk_orphans,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 0.5)], "k int, v double"
    )
    rep = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in expectations_report(
            df, {"v_pos": F.col("v") > 0, "k_small": F.col("k") < 10}
        ).collect()
    }
    assert rep["v_pos"] == (2, 0)   # -1 fails, NULL counts as violation
    assert rep["k_small"] == (0, 1)

    dim = spark.createDataFrame([(1,), (2,)], "dk int")
    fk = fk_orphans(df, dim, "k", "dk", "fk_k").collect()[0]
    assert (fk["rule"], fk["n_violations"], fk["passed"]) == ("fk_k", 2, 0)
