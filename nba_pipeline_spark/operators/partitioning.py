"""Partition-shape helpers.

`fan_out` rescues the "tiny scan, heavy projection" shape: a corpus
that fits in one parquet row group arrives as ONE scan partition, so a
compute-bound projection (minhash signatures, per-pair cosine) runs on
a single core no matter how many executors exist. Splitting by
`spark.sql.files.maxPartitionBytes` can't help — a row group is the
atomic read unit — so the fix is an explicit round-robin repartition.

Guarded so it is a no-op at scale: a 100 TB scan already has thousands
of partitions (> defaultParallelism), and an unconditional repartition
there would shuffle the whole corpus for nothing. The explicit
numPartitions also means AQE will NOT coalesce it back down (AQE only
coalesces its own shuffle outputs, byte-sized — which is exactly how
the single-task plans happened: 600 KB of docs coalesce to 1 partition
even when each row costs milliseconds of compute downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def under_parallelized(df: DataFrame, min_parts: int | None = None) -> bool:
    """True when the plan yields fewer partitions than the cluster can
    run in parallel — the trigger for `fan_out` and for pinning
    computed projections against filter push-through (see
    plans/corpus_queries.py)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    return df.rdd.getNumPartitions() < target


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up to `min_parts` (default: defaultParallelism) when
    the current plan has fewer partitions; unchanged otherwise."""
    if not under_parallelized(df, min_parts):
        return df
    return df.repartition(
        min_parts or df.sparkSession.sparkContext.defaultParallelism
    )
