"""Targeted tests for the breadth/analytics families: multiset set-op
bag semantics (property vs collections.Counter), sessionization gap
boundaries (exactly-30-min edge), outer-generator NULL semantics, and
stream-static broadcast enrichment equivalence."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from conftest import SF_DIR

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_vals = st.lists(st.one_of(st.integers(0, 3), st.none()), max_size=8)


@_slow
@given(a=_vals, b=_vals)
def test_multiset_ops_match_counter(spark, a, b):
    """INTERSECT ALL keeps min(count_a, count_b) copies per value and
    EXCEPT ALL keeps max(count_a - count_b, 0) — NULL is a value like
    any other (SQL set-op semantics, unlike join equality)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from nba_pipeline_spark.operators.setops import except_all, intersect_all

    schema = StructType([StructField("v", IntegerType())])
    dfa = spark.createDataFrame([(x,) for x in a], schema)
    dfb = spark.createDataFrame([(x,) for x in b], schema)
    ca, cb = Counter(a), Counter(b)

    got_i = Counter(r["v"] for r in intersect_all(dfa, dfb).collect())
    want_i = Counter({k: min(n, cb[k]) for k, n in ca.items() if cb[k]})
    assert got_i == want_i

    got_e = Counter(r["v"] for r in except_all(dfa, dfb).collect())
    want_e = ca - cb
    assert got_e == want_e


def _write_events(spark, tmp_path, rows):
    """Stage a crafted events.parquet with the registry's column order."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_sessionize_gap_boundary(spark, tmp_path):
    """A gap of exactly 30:00 continues the session; 30:01 starts a new
    one (strict `> 30 min`, matching the session_window streaming twin)."""
    from nba_pipeline_spark.plans.breadth_queries import _t  # noqa: F401  (import check)
    from nba_pipeline_spark.plans.queries import REGISTRY

    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0, 7, "view", 1.0, None),
        (2, t0 + 1800 * s, 7, "view", 1.0, None),          # exactly 30 min → same session
        (3, t0 + (1800 + 1801) * s, 7, "view", 1.0, None), # 30:01 gap → new session
        (4, None, 7, "view", 1.0, None),                   # NULL ts excluded by the query
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    got = {
        (r["session_id"], r["n_events"])
        for r in REGISTRY["q_sessionize"].fn(spark, sf_dir).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_explode_outer_null_and_empty_arrays(spark):
    """Empty and NULL arrays both yield exactly one row with NULL value
    (plain explode would drop them)."""
    df = spark.createDataFrame(
        [(1, [0.5, 0.6]), (2, []), (3, None)], "id int, arr array<double>"
    )
    rows = sorted(
        (r["id"], r["v"])
        for r in df.select("id", F.explode_outer("arr").alias("v")).collect()
    )
    assert rows == [(1, 0.5), (1, 0.6), (2, None), (3, None)]


def test_stream_static_join_equals_batch(spark):
    """Stream-static broadcast enrichment: a streaming fact joined to a
    static dimension inside the micro-batch plan must equal the batch
    join — the canonical lake-enrichment shape (dim re-broadcast per
    micro-batch, no state store involved)."""
    from nba_pipeline_spark.sources import load_table
    from nba_pipeline_spark.streaming.windows import read_events_stream, run_available_now

    dim = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(3)))
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id")
        .join(F.broadcast(dim), "user_id")
    )
    stream = (
        read_events_stream(spark, SF_DIR)
        .select("event_id", "user_id")
        .join(F.broadcast(dim), "user_id")
    )
    got = run_available_now(stream, "t_stream_static", output_mode="append")

    def norm(df):
        pdf = df.toPandas()
        return pdf.reindex(sorted(pdf.columns), axis=1).sort_values(
            by=sorted(pdf.columns), ignore_index=True
        )

    pd.testing.assert_frame_equal(norm(got), norm(batch))
