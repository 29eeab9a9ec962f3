"""Event-time windowed aggregation (SURVEY.md §2.11 T1-T6).

The reference's closest analog is Airflow ``@yearly`` catchup DAGs —
per-execution-date incremental batches (scrape_data_to_gcs.py:268-340).
Here that becomes Structured Streaming: the same window expressions run
identically in batch and in ``readStream`` + ``Trigger.AvailableNow``
micro-batches; tests assert batch/stream equivalence.

Scale notes: windowed aggs shuffle on (window, keys) with map-side
partials; watermarks bound state so a 100 TB backfill doesn't
accumulate unbounded window state; ``dropDuplicatesWithinWatermark``
gives the bounded-state streaming dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import SCHEMAS


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """T2: fixed windows, epoch-aligned."""
    return (
        df.groupBy(F.window(ts_col, duration), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(F.col("window.start").alias("ws"), *keys, *aggs)
    )


def sliding_agg(
    df: DataFrame, ts_col: str, duration: str, slide: str, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """T3: overlapping windows — each event lands in duration/slide windows."""
    return (
        df.groupBy(F.window(ts_col, duration, slide), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(F.col("window.start").alias("ws"), *keys, *aggs)
    )


def session_agg(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """T4: data-driven windows that close after ``gap`` of inactivity."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(F.col("session_window.start").alias("session_start"), *keys, *aggs)
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: incremental file ingest of the events table.

    File sources require an explicit schema; the physical timestamp
    encoding of the lake files varies by writer (TIMESTAMP(NANOS) read
    as long under nanosAsLong; timestamp[us] without tz read as NTZ), so
    the footer is probed and the same normalization as the batch reader
    applied — stream and batch plans share every expression.
    """
    from pyspark.sql import types as T

    from ..session import tune
    from ..sources.registry import parquet_ts_encoding

    tune(spark)
    enc = parquet_ts_encoding(f"{sf_dir}/events.parquet", "ts")
    ts_read_type = {
        "nanos": T.LongType(),
        "ntz": T.TimestampNTZType(),
        "utc": T.TimestampType(),
    }[enc]
    schema = T.StructType(
        [
            T.StructField(f.name, ts_read_type if isinstance(f.dataType, T.TimestampType) else f.dataType)
            for f in SCHEMAS["events"].fields
        ]
    )
    # The file source requires a DIRECTORY (it tails new files). The
    # testdata table is a single read-only file, so stage a symlink dir —
    # exactly the layout a production ingest would write into.
    import os

    tag = sf_dir.strip("/").replace("/", "_")
    stream_dir = f"/tmp/nba_stream_src/{tag}/events"
    os.makedirs(stream_dir, exist_ok=True)
    link = f"{stream_dir}/events-000.parquet"
    if not os.path.exists(link):
        try:
            os.symlink(f"{sf_dir}/events.parquet", link)
        except FileExistsError:
            pass  # concurrent session staged it between check and create
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    if enc == "nanos":
        # nanos are micro-aligned in the lake (verified at ingest)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if enc == "ntz":
        # session tz is UTC: the NTZ->LTZ cast preserves wall-clock values
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """T5: bound lateness -> bounded state."""
    return df.withWatermark(ts_col, delay)


def streaming_dedup(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """T6: exactly-once-per-key within the watermark horizon."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """T8: stream-stream inner join — each left event matched to right
    events of the same key with ``right_ts`` in
    ``[left_ts - lookback, left_ts]`` (closed interval).

    The time-range predicate plus both watermarks is what lets Spark
    BOUND the join state: right rows older than
    (watermark + lookback) behind max event time are evicted, so a
    100 TB replay holds a sliding-horizon's worth of state, not the
    whole stream. Columns from each side come back prefixed ``l_`` /
    ``r_`` (a self-join of one events stream would otherwise collide).

    The same plan runs in batch (withWatermark is a batch no-op) —
    tests assert stream output == the batch join row-for-row.
    """
    # Rename BEFORE attaching the watermark so the event-time column the
    # join condition references is exactly the watermarked attribute.
    l = left.select(*[F.col(c).alias(f"l_{c}") for c in left.columns]).withWatermark(
        f"l_{left_ts}", watermark
    )
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns]).withWatermark(
        f"r_{right_ts}", watermark
    )
    lt, rt = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (rt >= lt - F.expr(f"INTERVAL {lookback}"))
        & (rt <= lt)
    )
    return l.join(r, cond, "inner")


def enrich_with_dim(
    stream_df: DataFrame,
    dim_df: DataFrame,
    cond: Column,
    how: str = "left",
) -> DataFrame:
    """T10: stream-static join — enrich a stream with a batch dimension
    table (the lookup-join J1/J2 shape, applied per micro-batch).

    Stream-static joins need NO watermark and hold NO join state: the
    static side is just re-planned into every micro-batch, and Spark
    broadcasts it when small (the normal dim case). Left/inner are the
    supported directions with the stream on the left — right/full would
    need to emit "dim rows that never matched", which is unknowable on
    an unbounded stream. The static frame is bound at plan time; a
    slowly-changing dim picks up file-level changes only per new
    micro-batch plan, so SCD-style dims should version via
    `merge_upsert` and re-start the query on dim reload.
    """
    if how not in ("left", "inner", "left_outer"):
        raise ValueError(f"stream-static join supports left/inner, got {how}")
    return stream_df.join(dim_df, cond, how)


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the stream into a memory sink with Trigger.AvailableNow and
    return the materialized result (test/bench harness).

    ``output_mode``: "complete" for aggregated streams (the default),
    "append" for map-only / dedup streams — complete mode is rejected by
    Spark when the stream has no aggregation."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
