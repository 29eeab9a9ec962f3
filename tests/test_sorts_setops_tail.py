"""Coverage for the remaining sort/setop operator surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from nba_pipeline_spark.operators.setops import except_all
from nba_pipeline_spark.operators.sorts import tail_k, top_k_per_group


def test_tail_k_is_reversed_topk(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], ["x"])
    got = sorted(r["x"] for r in tail_k(df, [F.col("x")], 3).collect())
    assert got == [17, 18, 19]


def test_except_all_bag_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], ["k"])
    b = spark.createDataFrame([(1,), (3,)], ["k"])
    got = sorted(r["k"] for r in except_all(a, b).collect())
    assert got == [1, 1, 2]  # removes ONE copy of 1, unlike set EXCEPT


def test_top_k_per_group(spark):
    rows = [("a", i) for i in range(5)] + [("b", i * 10) for i in range(4)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r["g"], r["v"])
        for r in top_k_per_group(df, ["g"], [F.col("v").desc()], 2).collect()
    }
    assert got == {("a", 4), ("a", 3), ("b", 30), ("b", 20)}
