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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def dedup_ingest_sink(
    lake_path: str,
    seen_path: str,
    text_col: str,
    id_col: str,
    gate: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: streaming corpus ingestion with
    CROSS-BATCH exact dedup — the continuous form of the tier-1 dedup
    + quality-gate front of q_data_recipe.

    Per micro-batch: (optional) quality gate → in-batch exact dedup
    (sha256 of lowercased text, min-id representative) → anti join
    against the accumulated seen-hash table → accepted docs land in the
    lake, their hashes in the seen table. At 100 TB the seen table is
    the small side of the anti join (32 B per unique doc ever seen) and
    is bucketable on the hash; per-batch cost is O(batch) + one
    broadcast-able anti join — settled corpus data is never re-read.

    Crash safety WITHOUT a ledger: both sinks write to a
    ``batch=<id>`` subdirectory with mode("overwrite"), so a replayed
    batch overwrites its own previous (possibly partial) output —
    idempotent by layout. The seen-hash read set is "all batch dirs
    with id < current", which deterministically EXCLUDES the crashed
    attempt's own hashes (reading them back would wrongly anti-join the
    replay's rows away).
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.cdc import _view_fs

        spark = batch_df.sparkSession
        b = gate(batch_df) if gate is not None else batch_df
        b = b.withColumn("__h", F.sha2(F.lower(F.col(text_col)), 256))
        w = Window.partitionBy("__h").orderBy(F.col(id_col).asc_nulls_last())
        firsts = (
            b.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # Hadoop FS listing, not os.listdir: seen_path may be an object
        # store / HDFS URI; a driver-local listing would see nothing and
        # silently stop deduplicating across batches.
        fs, jpath = _view_fs(spark, seen_path)
        prior = []
        if fs.exists(jpath):
            for st in fs.listStatus(jpath):
                name = st.getPath().getName()
                if not name.startswith("batch="):
                    continue
                try:
                    i = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if i < batch_id:
                    prior.append(st.getPath().toString())
        prior.sort()
        if prior:
            seen = spark.read.parquet(*prior)
            accepted = firsts.join(seen, "__h", "left_anti")
        else:
            accepted = firsts
        accepted.drop("__h").write.mode("overwrite").parquet(
            f"{lake_path}/batch={batch_id}"
        )
        accepted.select("__h").write.mode("overwrite").parquet(
            f"{seen_path}/batch={batch_id}"
        )

    return _apply


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
