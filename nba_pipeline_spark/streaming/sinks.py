"""Streaming sinks: the foreachBatch upsert pattern (the production
micro-batch lake-merge loop the reference's Airflow season backfills
approximate with whole-file rewrites, scrape_data_to_gcs.py:263-286).

``foreachBatch`` hands each micro-batch to ordinary BATCH DataFrame
code, which is how Structured Streaming jobs write to sinks that lack
a native streaming writer (JDBC, merge-into table formats, partition
overwrite). Idempotency contract: the function receives
(batch_df, batch_id); replays after a failure re-deliver the SAME
batch_id, so a sink keyed on batch_id (or an idempotent overwrite of
the partitions the batch touches) gives effectively-exactly-once even
though delivery is at-least-once.

Scale notes: each micro-batch's write is a normal batch job — dynamic
partition overwrite only rewrites the partitions present in the batch
(incremental backfill semantics, same as the batch lake writer in
sources/registry.py), so a late-arriving sliver doesn't rewrite the
lake. State on the streaming side stays bounded by the watermark as
usual; nothing here adds driver state beyond the batch-id ledger the
checkpoint already keeps.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def upsert_partitions_sink(
    base_path: str, partition_col: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: dynamic-partition-overwrite the batch's
    slice of a parquet lake. Re-delivery of a batch overwrites the same
    partitions with the same rows — idempotent."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(base_path)
        )

    return write_batch


def run_foreach_batch(
    stream_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> None:
    """Drain an available-now stream through a foreachBatch sink with a
    real checkpoint (the batch-id ledger that makes replays detectable)."""
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
