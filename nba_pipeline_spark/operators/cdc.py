"""CDC / merge patterns (warehouse maintenance, SURVEY §2 extended).

Reference parity: the reference refreshes its lake by re-scraping a
season and overwriting the same GCS object path per table/year
(scrape_data_to_gcs.py:55-90, rm + re-upload) — "partition replace by
rewrite". At 100 TB that strategy rewrites everything; the Spark-native
scale path is a keyed merge: ship only the changed rows and apply them
with ONE shuffle on the merge key.

Both operators are pure DataFrame compositions (union + window / anti
join), so Catalyst sees the whole plan: filters on the base table
still push to the parquet scan, and AQE can pick broadcast for a small
changelog. No UDFs, no driver-side loops.

Scale notes:
- ``merge_upsert``: unionByName is free (no shuffle); the row_number
  window shuffles once on `keys` — same cost as the groupBy any
  engine needs for last-writer-wins. Skewed keys follow the same
  salting recipe as `salted_join` if a hot key dominates the changelog.
- ``apply_changelog``: latest-change dedup shuffles the changelog on
  `keys` (changelog << base, cheap); the anti join of base vs changed
  keys is broadcast-able whenever the distinct changed-key set is
  small — the common CDC shape (AQE handles it; no hint needed). The
  changelog subplan is referenced twice (anti-join keys + upsert rows)
  and Catalyst can't reuse the exchange across them (the join adds an
  IsNotNull(key) below one window); with a big changelog, persist it
  (or pre-dedup to latest) before calling.
- NULL merge keys follow SQL equality: a NULL-keyed change never
  matches a base row (anti join keeps base NULLs; the change row, if
  an upsert, inserts as its own row) — pinned by the adversarial gate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SCD1 / last-writer-wins upsert: every key keeps exactly one row —
    the highest-version change if any change exists, else the base row.
    Keys present only in `changes` are inserted.

    `changes` must carry the base columns plus `version_col`; pass
    `tiebreak` columns when versions can collide (ordering is pinned
    NULLS LAST on every sort key so both engines agree).
    """
    b = base.withColumn("__src", F.lit(0)).withColumn(
        "__ver", F.lit(None).cast("bigint")
    )
    c = changes.withColumn("__src", F.lit(1)).withColumn(
        "__ver", F.col(version_col).cast("bigint")
    )
    u = b.unionByName(c.drop(version_col), allowMissingColumns=True)
    order = [F.col("__src").desc(), F.col("__ver").desc_nulls_last()]
    order += [F.col(t).desc_nulls_last() for t in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src", "__ver")
    )


def streaming_upsert_sink(
    changes_stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    version_col: str,
    checkpoint_dir: str,
    tiebreak: Sequence[str] = (),
):
    """Continuous CDC apply: drain a changelog stream into a parquet
    target with last-writer-wins semantics, one transactional merge per
    micro-batch (``foreachBatch`` + ``merge_upsert``).

    Exactly-once story: foreachBatch may REPLAY a batch after a crash,
    but merge_upsert is idempotent (same change rows -> same winners),
    so replays converge. The target is read fresh each batch; at lake
    scale the overwrite step becomes a partition-replace (or a Delta/
    Iceberg MERGE) — plain parquet has no atomic row-level commit, which
    is exactly why the merge itself stays a pure DataFrame op.

    Returns the StreamingQuery (caller awaits termination).
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = spark.read.parquet(target_path)
        merged = merge_upsert(base, batch_df, keys, version_col, tiebreak)
        # write-then-swap: parquet can't overwrite a path it's reading
        tmp = f"{target_path}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)

    return (
        changes_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "delete",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Delete-aware CDC apply: per key, the highest-`seq_col` changelog
    row decides the outcome — `delete_op` removes the key, anything
    else replaces (or inserts) it. Base rows whose key never appears in
    the changelog pass through untouched.

    `changelog` must carry the base columns plus (`seq_col`, `op_col`).
    """
    order = [F.col(seq_col).desc_nulls_last()]
    order += [F.col(t).desc_nulls_last() for t in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = base.join(latest.select(*keys), on=list(keys), how="left_anti")
    upserts = latest.filter(F.col(op_col) != F.lit(delete_op)).drop(op_col, seq_col)
    return untouched.unionByName(upserts, allowMissingColumns=True)
