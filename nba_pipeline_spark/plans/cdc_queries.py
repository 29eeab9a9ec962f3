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

from ..operators.cdc import apply_changelog, merge_upsert
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
