"""CDC / merge queries (warehouse maintenance).

The reference maintains its lake by overwrite-on-rescrape
(scrape_data_to_gcs.py:55-90); these queries are the keyed-merge scale
path. The changelog is synthesized deterministically from `orders`:
each order is a change event against its customer (version/seq =
o_orderkey, delete when o_orderstatus = 'F').

Parity pins (see operators/cdc.py): every sort key is NULLS LAST on
both sides; NULL merge keys group in the window (both engines) and
never equal in the anti join (both engines); money rounded to 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import apply_changelog, incremental_agg_maintain, merge_upsert
from ..session import tune
from ..sources import load_table
from .queries import register


def _tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders")
    return cust, orders


def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 last-writer-wins: latest order per customer overwrites the
    customer row (name := o_orderpriority, acctbal := o_totalprice)."""
    cust, orders = _tables(spark, sf_dir)
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("c_name"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderkey").alias("ver"),
    )
    merged = merge_upsert(
        cust, changes, ["c_custkey"], "ver", tiebreak=("c_acctbal", "c_name")
    )
    return merged.select(
        "c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal")
    )


register(
    "q_cdc_upsert",
    q_cdc_upsert,
    """
    WITH u AS (
      SELECT c_custkey, c_name, c_acctbal, 0 AS src, CAST(NULL AS BIGINT) AS ver
      FROM customer
      UNION ALL
      SELECT o_custkey, o_orderpriority, o_totalprice, 1, o_orderkey FROM orders
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
    FROM (
      SELECT u.*, ROW_NUMBER() OVER (
        PARTITION BY c_custkey
        ORDER BY src DESC, ver DESC NULLS LAST,
                 c_acctbal DESC NULLS LAST, c_name DESC NULLS LAST) AS rn
      FROM u) t
    WHERE rn = 1
    """,
)


def q_cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-aware CDC apply: the latest order per customer decides —
    finished ('F') orders delete the customer row, anything else
    replaces it; customers with no orders pass through."""
    cust, orders = _tables(spark, sf_dir)
    changelog = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("c_name"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderstatus") == "F", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    out = apply_changelog(
        cust,
        changelog,
        ["c_custkey"],
        "seq",
        "op",
        tiebreak=("c_acctbal", "c_name"),
    )
    return out.select("c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal"))


register(
    "q_cdc_changelog",
    q_cdc_changelog,
    """
    WITH latest AS (
      SELECT * FROM (
        SELECT o_custkey AS c_custkey, o_orderpriority AS c_name,
               o_totalprice AS c_acctbal,
               CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'upsert' END AS op,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderkey DESC NULLS LAST,
                          o_totalprice DESC NULLS LAST,
                          o_orderpriority DESC NULLS LAST) AS rn
        FROM orders) t
      WHERE rn = 1
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'delete') t
    """,
)


def q_mv_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-customer
    (count, sum) view built over 80% of `orders` absorbs a changelog
    (the other 20% as inserts, the %10==1 stripe as deletes/retractions)
    WITHOUT rescanning the base — and must equal a full recompute over
    the effective row set (oracle). Exercises the self-maintainable-
    aggregate path: signed delta aggregation + null-safe full-outer
    merge + zero-count drop. At 100 TB this replaces the reference's
    rewrite-the-season refresh (scrape_data_to_gcs.py:55-90) with an
    O(|delta|) merge."""
    _, orders = _tables(spark, sf_dir)
    price = F.col("o_totalprice").cast("decimal(18,4)")
    bucket = F.col("o_orderkey") % 10
    base = orders.filter(bucket < 8)
    mv = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(price).alias("total")
    )
    delta = (
        orders.filter(bucket >= 8)
        .withColumn("__sign", F.lit(1))
        .unionByName(orders.filter(bucket == 1).withColumn("__sign", F.lit(-1)))
    )
    out = incremental_agg_maintain(mv, delta, ["o_custkey"], {"total": price})
    return out.select(
        "o_custkey",
        "cnt",
        F.round(F.col("total"), 4).cast("double").alias("total"),
    )


register(
    "q_mv_maintain",
    q_mv_maintain,
    """
    SELECT o_custkey, COUNT(*) AS cnt,
           CAST(COALESCE(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4), 0)
                AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 10 <> 1
    GROUP BY o_custkey
    """,
)


def q_mv_minmax_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial view refresh for non-self-maintainable aggregates: a
    per-customer (min, max, cnt) view over the 80% base stripe absorbs
    the same changelog as q_mv_maintain — but MIN/MAX under deletes
    need the group re-read, so only AFFECTED groups (keys present in
    the changelog) are recomputed from the post-change base; untouched
    groups pass through from the stale view. Must equal a full
    recompute (oracle). At scale the affected-key semi join broadcasts
    and the base re-read partition-prunes to the touched groups."""
    _, orders = _tables(spark, sf_dir)
    price = F.col("o_totalprice").cast("decimal(18,4)")
    bucket = F.col("o_orderkey") % 10
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.min(price).alias("lo"),
        F.max(price).alias("hi"),
    ]
    mv = orders.filter(bucket < 8).groupBy("o_custkey").agg(*aggs)
    changed = orders.filter((bucket >= 8) | (bucket == 1)).select("o_custkey")
    base_after = orders.filter(bucket != 1)
    from ..operators.cdc import minmax_refresh_affected

    out = minmax_refresh_affected(base_after, mv, changed, ["o_custkey"], aggs)
    return out.select(
        "o_custkey",
        "cnt",
        F.col("lo").cast("double").alias("lo"),
        F.col("hi").cast("double").alias("hi"),
    )


register(
    "q_mv_minmax_refresh",
    q_mv_minmax_refresh,
    """
    SELECT o_custkey, COUNT(*) AS cnt,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS lo,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS hi
    FROM orders
    WHERE o_orderkey % 10 <> 1
    GROUP BY o_custkey
    """,
)


def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction ("time travel" over a plain-parquet
    CDC log): the table state AS OF sequence S is base + only the
    changelog rows with seq <= S applied — the same delete-aware apply
    as q_cdc_changelog, with the log truncated at the cut. S is half
    the max order key, computed IN-PLAN (1-row agg broadcast into the
    log filter) so the query is a pure function of the inputs on both
    engines. At scale the seq filter prunes the changelog scan (seq is
    the natural lake sort/partition axis for a log), and everything
    downstream costs what the truncated log costs."""
    cust, orders = _tables(spark, sf_dir)
    cut = orders.agg(
        F.floor(F.max("o_orderkey") / 2).cast("bigint").alias("cut")
    )
    changelog = (
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderpriority").alias("c_name"),
            F.col("o_totalprice").alias("c_acctbal"),
            F.col("o_orderkey").alias("seq"),
            F.when(F.col("o_orderstatus") == "F", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
        )
        .crossJoin(F.broadcast(cut))
        .filter(F.col("seq") <= F.col("cut"))
        .drop("cut")
    )
    out = apply_changelog(
        cust,
        changelog,
        ["c_custkey"],
        "seq",
        "op",
        tiebreak=("c_acctbal", "c_name"),
    )
    return out.select("c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal"))


register(
    "q_cdc_time_travel",
    q_cdc_time_travel,
    """
    WITH cut AS (SELECT CAST(FLOOR(MAX(o_orderkey) / 2) AS BIGINT) AS cut FROM orders),
    latest AS (
      SELECT * FROM (
        SELECT o_custkey AS c_custkey, o_orderpriority AS c_name,
               o_totalprice AS c_acctbal,
               CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'upsert' END AS op,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderkey DESC NULLS LAST,
                          o_totalprice DESC NULLS LAST,
                          o_orderpriority DESC NULLS LAST) AS rn
        FROM orders, cut WHERE o_orderkey <= cut) t
      WHERE rn = 1
    )
    SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal FROM (
      SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'delete') t
    """,
)
