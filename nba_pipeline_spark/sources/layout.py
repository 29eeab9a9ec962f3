"""Multi-dimensional lake layout: Z-order (Morton) clustering for
data skipping, plus small-file compaction.

Extends SURVEY.md §2.1 S7: directory partitions prune on ONE axis
(seasonStartYear / event_date). Queries that filter on two independent
keys (part AND supplier; user AND time) skip nothing on the second
axis — unless file-level clustering makes every file's min/max narrow
on BOTH. Interleaving the key bits (Morton order) and range-writing on
the interleaved value does exactly that: each output file covers a
small square of the key plane instead of a thin full-width stripe.

The z-value is pure integer bit arithmetic — a JVM projection, oracle-
replayable in SQL — so "Z-order the table" is just
``repartitionByRange(zvalue).sortWithinPartitions(zvalue).write``:
no custom writer, and parquet's ordinary row-group min/max stats turn
into a 2-D index for free. At 100 TB this is the difference between
scanning one file stripe and scanning ~sqrt(files) squares for a
two-dimensional point lookup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(col_a: Column, col_b: Column, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    keys: bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Plain shift/mask arithmetic — identical in any SQL engine; columns
    are masked to ``bits`` first so out-of-range keys wrap rather than
    interleave garbage into high positions."""
    a = col_a.cast("long").bitwiseAND((1 << bits) - 1)
    b = col_b.cast("long").bitwiseAND((1 << bits) - 1)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1)
    return z


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int, bits: int = 8
) -> None:
    """Cluster ``df`` into ``n_files`` files by z-value range: range
    partitioning gives globally sorted file boundaries (each file one
    z-interval = one square-ish region of the (a, b) plane), the
    within-partition sort tightens row-group stats inside each file."""
    z = zvalue(F.col(col_a), F.col(col_b), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(spark_df: DataFrame, path: str, target_files: int) -> None:
    """Small-file compaction: rewrite a table at a chosen file count.
    coalesce (not repartition) — no shuffle, adjacent input splits just
    concatenate. The maintenance job every streaming/incremental sink
    needs: thousands of per-trigger files → scheduler-friendly
    ~128 MB-1 GB objects, same rows."""
    spark_df.coalesce(target_files).write.mode("overwrite").parquet(path)
