"""Windowed-aggregation queries (SURVEY.md §2.11 T2-T4), batch form.

The identical expressions run as Structured Streaming jobs via
``streaming.windows.read_events_stream`` + ``Trigger.AvailableNow``;
tests/test_streaming.py asserts the stream output equals these batch
results (the T1 batch-equivalence contract). Watermark semantics (T5)
are streaming-only and covered there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..session import tune
from ..streaming.windows import interval_join, session_agg, sliding_agg, tumbling_agg
from .queries import register


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "events")


def AGGS() -> dict:
    # built lazily: Column construction needs an active SparkContext.
    # sum in exact DECIMAL (order-independent; see flagship.py).
    return {
        "n": F.count(F.lit(1)),
        "sum_value": F.sum(F.col("value").cast("decimal(18,4)")).cast("double"),
    }


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(_ev(spark, sf_dir), "ts", "1 hour", ["event_type"], AGGS())


register(
    "q_stream_tumbling",
    q_stream_tumbling,
    """
    SELECT date_trunc('hour', ts) AS ws, event_type,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
)


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(_ev(spark, sf_dir), "ts", "1 hour", "15 minutes", ["event_type"], AGGS())


register(
    "q_stream_sliding",
    q_stream_sliding,
    # Every event belongs to 4 epoch-aligned 15-min-slid 1-hour windows:
    # starts floor(epoch/900)*900 - k*900, k = 0..3.
    """
    WITH expanded AS (
      SELECT make_timestamp(CAST((FLOOR(epoch(ts) / 900) * 900 - k * 900) * 1000000 AS BIGINT)) AS ws,
             event_type, value
      FROM events
      CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
      WHERE ts IS NOT NULL)
    SELECT ws, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY 1, 2
    """,
)


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(_ev(spark, sf_dir), "ts", "30 minutes", ["user_id"], AGGS())


register(
    "q_stream_session",
    q_stream_session,
    # Gaps-and-islands replay of session_window semantics: a new session
    # starts when the gap since the previous event is >= 30 min
    # (session end = last event + gap, end-exclusive).
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST)
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM islands GROUP BY user_id, sid
    """,
)


def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 batch form: purchases attributed to clicks by the same user in
    the preceding 10 minutes, rolled up per user. The identical
    interval_join plan runs as a stream-stream join in
    tests/test_streaming.py (batch/stream equivalence)."""
    ev = _ev(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = interval_join(purchases, clicks, "user_id", "ts", "ts", "10 MINUTES")
    return joined.groupBy(F.col("l_user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.countDistinct("r_event_id").alias("n_clicks"),
        F.sum(F.col("l_value").cast("decimal(18,4)")).cast("double").alias("attributed_value"),
    )


register(
    "q_stream_interval_join",
    q_stream_interval_join,
    """
    SELECT p.user_id AS user_id, COUNT(*) AS n_attributed,
           COUNT(DISTINCT c.event_id) AS n_clicks,
           CAST(SUM(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS attributed_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    GROUP BY 1
    """,
)


def q_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-spine resampling: one row per (hour, event_type) between the
    corpus' min and max hour, zero-filled where no events landed — the
    gap-filling shape every time-series rollup needs before charting or
    model features. The spine is generated (sequence + explode), never
    materialized as a table; the hourly agg is the q_stream_tumbling
    plan; the fill is a broadcast-able left join (spine is tiny: hours ×
    types, independent of event count)."""
    ev = _ev(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("ws")
    )
    types = ev.select("event_type").distinct()
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("ws"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(types)
        .join(hourly, ["ws", "event_type"], "left")
        .select("ws", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )


register(
    "q_resample_1h",
    q_resample_1h,
    """
    WITH ev AS (SELECT ts, event_type FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM ev),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws FROM b),
    types AS (SELECT DISTINCT event_type FROM ev),
    hourly AS (SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n
               FROM ev GROUP BY 1, 2)
    SELECT s.ws, t.event_type, COALESCE(h.n, 0) AS n
    FROM spine s CROSS JOIN types t
    LEFT JOIN hourly h ON h.ws = s.ws AND h.event_type = t.event_type
    """,
)


def _enriched_hourly(ev: DataFrame, dim: DataFrame) -> DataFrame:
    """Shared stream/batch plan body for q_stream_enrich: dim lookup
    (user_id -> market segment) then hourly tumbling rollup per
    segment. Written once so the streaming equivalence test runs the
    IDENTICAL expressions over read_events_stream."""
    from ..streaming.windows import enrich_with_dim

    enriched = enrich_with_dim(
        ev.filter(F.col("ts").isNotNull()),
        F.broadcast(dim),
        ev["user_id"] == dim["c_custkey"],
        "left",
    ).select(
        "ts", "value", F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment")
    )
    return tumbling_agg(enriched, "ts", "1 hour", ["segment"], AGGS())


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 batch form: stream-static dim enrichment (events joined to the
    customer dim on user_id, broadcast) followed by the tumbling-hour
    rollup per market segment. The identical plan body runs as a
    Structured Streaming job in tests/test_streaming.py — stream-static
    joins hold no state, so batch == stream exactly. At 100 TB the dim
    broadcast replaces a shuffle of the full event stream."""
    ev = _ev(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return _enriched_hourly(ev, dim)


register(
    "q_stream_enrich",
    q_stream_enrich,
    """
    SELECT date_trunc('hour', e.ts) AS ws,
           COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.ts IS NOT NULL
    GROUP BY 1, 2
    """,
)


def token_tally_batch(docs: DataFrame) -> DataFrame:
    """Shared stream/batch plan body for q_stream_token_tally: the
    per-source (n_docs, n_tokens) tally the streaming sink
    (streaming.sinks.token_tally_sink) maintains incrementally —
    written once so the equivalence test runs IDENTICAL expressions."""
    from ..functions.text import tokenize

    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokenize(F.col("text"))).cast("bigint"))
        .cast("bigint")
        .alias("n_tokens"),
    )


def q_stream_token_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the continuous token-accounting view: per-source
    document and token tallies. The streaming twin folds each
    micro-batch into a snapshot-committed view via
    incremental_agg_maintain (O(batch) tokenize + O(sources) merge per
    trigger — the settled corpus is never re-tokenized);
    tests/test_streaming.py pins stream == this batch plan after N
    batches and across a replay."""
    tune(spark)
    return token_tally_batch(load_table(spark, sf_dir, "documents"))


register(
    "q_stream_token_tally",
    q_stream_token_tally,
    """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
    """,
)
