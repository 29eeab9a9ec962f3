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


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up to `min_parts` (default: defaultParallelism) when
    the current plan has fewer partitions; unchanged otherwise."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
