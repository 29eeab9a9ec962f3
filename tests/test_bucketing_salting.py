"""Scale-path join strategies: bucketed zero-shuffle joins and
deterministic skew salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from nba_pipeline_spark.operators.joins import salted_join
from nba_pipeline_spark.sources import load_table
from nba_pipeline_spark.sources.bucketing import bucketed_pair
from conftest import SF_DIR


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    bl, br = bucketed_pair(spark, li, orders, "l_orderkey", "o_orderkey", "t_bucket", 8)
    joined = bl.join(br, bl["l_orderkey"] == br["o_orderkey"])
    # disable broadcast so the bucketed SMJ path is what we observe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan(joined)
        assert "Exchange" not in p, p
        assert joined.count() == li.count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_salted_join_equals_plain_join(spark):
    # build a skewed left: one hot key with many rows
    hot = spark.range(500).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(50).select((F.col("id") % 5).alias("k"), (F.col("id") + 1000).alias("payload"))
    left = hot.unionByName(cold)
    right = spark.createDataFrame([(7, "hot"), (3, "cold"), (99, "miss")], ["rk", "label"])
    plain = left.join(right, left["k"] == right["rk"]).select("k", "payload", "label")
    salted = salted_join(left, right, "k", "rk", n_salts=4).select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_actually_spreads_hot_key(spark):
    hot = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    salts = hot.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
    )
    n_distinct = salts.select("__salt").distinct().count()
    assert n_distinct == 8  # all salt partitions hit
