"""Bucketed table layout (SURVEY §4 'co-locate joins via bucketing').

At 100 TB the dominant cost of fact-fact joins is the shuffle. Writing
both fact tables bucketed (and sorted) on the join key makes the join a
zero-exchange sort-merge: each task reads matching bucket files from
both sides. This module materializes bucketed catalog tables from lake
parquet — the one-time layout cost that every subsequent join amortizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (+sorted) managed table if absent."""
    import shutil

    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        # validate the existing layout actually matches the request — a
        # stale table with different buckets/column silently reintroduces
        # the shuffle this module exists to remove
        desc = {r["col_name"]: (r["data_type"] or "") for r in spark.sql(
            f"DESCRIBE TABLE FORMATTED {table}"
        ).collect()}
        ok = (
            str(n_buckets) == desc.get("Num Buckets", "").strip()
            and bucket_col in desc.get("Bucket Columns", "")
        )
        if ok:
            return
        spark.sql(f"DROP TABLE {table}")
    # fresh metastore + orphaned warehouse dir from a previous session
    # would fail LOCATION_ALREADY_EXISTS — clear the stale location
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    except Exception:
        pass
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    name_prefix: str,
    n_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Materialize both sides bucketed on their join keys and return the
    catalog-backed frames. Joining them on the keys produces a plan with
    NO shuffle exchange (asserted by tests/test_bucketing.py)."""
    lt, rt = f"{name_prefix}_l", f"{name_prefix}_r"
    ensure_bucketed_table(left, lt, left_key, n_buckets)
    ensure_bucketed_table(right, rt, right_key, n_buckets)
    return spark.table(lt), spark.table(rt)
