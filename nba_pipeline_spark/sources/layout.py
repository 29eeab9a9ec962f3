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


def _fs_path(spark, p: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _recover_compaction(spark, path: str) -> None:
    """Finish (or roll back) an interrupted `compact_batch_dirs` swap:
    a ``_compact_tmp_<ik>`` dir WITH ``_SUCCESS`` holds the complete
    consolidated state through id ik — delete the superseded batch
    dirs and rename it into place; one WITHOUT the marker is a dead
    partial write — delete it. Idempotent; crash-safe to re-run."""
    jvm = spark._jvm
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not name.startswith("_compact_tmp_"):
            continue
        ok = fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS"))
        if not ok:
            fs.delete(st.getPath(), True)
            continue
        ik = int(name.rsplit("_", 1)[1])
        for st2 in fs.listStatus(jpath):
            n2 = st2.getPath().getName()
            if n2.startswith("batch="):
                try:
                    i = int(n2.split("=", 1)[1])
                except ValueError:
                    continue
                if i <= ik:
                    fs.delete(st2.getPath(), True)
        fs.rename(st.getPath(), jvm.org.apache.hadoop.fs.Path(jpath, f"batch={ik}"))


def compact_batch_dirs(spark, path: str, target_files: int = 1) -> int:
    """Consolidate a streaming sink's ``batch=<id>`` dirs (the layout
    dedup_ingest_sink / neardup_ingest_sink / the MV snapshots write —
    one dir per trigger) into a single ``batch=<max id>`` dir with
    `target_files` files. Returns the number of dirs consolidated.

    Crash safety by RECOVERY, not atomicity (plain parquet has no
    multi-dir atomic commit — that's what table formats add): the
    consolidated state is first fully written to ``_compact_tmp_<ik>``
    (its ``_SUCCESS`` is the commit point), and only then are the
    source dirs deleted and the tmp renamed to ``batch=<ik>``. A crash
    anywhere leaves either (a) a markerless tmp — rolled back on the
    next run, sources untouched — or (b) a marked tmp — the next run
    completes the swap. Single-writer contract: run between triggers
    (ingest appending ids > ik concurrently is safe; concurrent
    READERS of ids <= ik during the swap window are not — the same
    maintenance-window rule as any manifest-less lake; the manifest
    lake in ``manifest.py`` removes that window).

    Replay safety: only dirs WITH ``_SUCCESS`` are compaction sources
    (a markerless dir is an uncommitted partial write — left alone),
    and the NEWEST committed id is deliberately excluded from
    consolidation. If the stream crashed before checkpointing its last
    batch, the restart replays it with ``mode('overwrite')`` on its
    own ``batch=<id>`` dir; because that id is never a consolidation
    target, the replay can only clobber itself, never the compacted
    history of earlier batches."""
    _recover_compaction(spark, path)
    jvm = spark._jvm
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return 0
    dirs = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("batch="):
            try:
                i = int(name.split("=", 1)[1])
            except ValueError:
                continue
            committed = fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            )
            if not committed:
                continue  # partial/uncommitted dir: never a source
            dirs.append((i, st.getPath().toString()))
    dirs.sort()
    # keep the newest committed dir out of the consolidation set
    dirs = dirs[:-1]
    if len(dirs) <= 1:
        return 0  # nothing consolidated (contract: count of dirs folded)
    ik = dirs[-1][0]
    tmp = f"{path}/_compact_tmp_{ik}"
    spark.read.parquet(*[d for _, d in dirs]).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{tmp}/_SUCCESS")):
        raise RuntimeError(f"compaction write to {tmp} did not commit (_SUCCESS missing)")
    for _, d in dirs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(f"{path}/batch={ik}"),
    )
    return len(dirs)
