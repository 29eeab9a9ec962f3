"""Flagship end-to-end query (SURVEY.md §7 step 1).

Exercises the minimum real slice through Catalyst:
scan -> pushed-down filter (F1-style date threshold) -> fact/fact join
(J3) -> broadcast dimension joins (J1/J2) -> case-when (M6) -> grouped
agg with map-side partials (A4) -> orderBy (O1) -> limit/top-k (O4).

Scale notes: the lineitem/orders/customer joins shuffle on their keys
(SMJ or shuffled hash, AQE decides); nation/region are broadcast
explicitly so no shuffle is spent on dimensions. The date filter and
the 6-column projection push down to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out
from ..session import tune
from ..sources import load_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    # fan_out: the bench file is one row group -> one scan partition,
    # which would serialize the whole probe-side pipeline on one core.
    # No-op on a real multi-partition lake scan (see partitioning.py).
    lineitem = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # money math in DECIMAL: price(2dp) and discount(2dp) are exact
    # decimals, so the sum is EXACT on any engine in any order — the
    # only way a grouped money sum stays hash-identical at 100 TB
    # magnitudes, where double accumulation error exceeds any rounding
    # grid (see SCALE.md). Cast to double only at the very end.
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    seg = (
        F.when(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"), F.lit("industrial"))
        .otherwise(F.lit("consumer"))
    )

    return (
        lineitem.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("segment", seg)
        .groupBy("r_name", "segment")
        .agg(
            # Exact-to-double money out: the scale-8 decimal sum's
            # unscaled value exceeds 2^53 at sf0.1+, and engines'
            # decimal->double conversions then disagree by 1 ulp (found
            # by the sf0.1 oracle sweep). Round to the money grid,
            # scale to an exactly-representable BIGINT, convert, and
            # divide once — every step bit-deterministic on any engine.
            ((F.round(F.sum(revenue), 4) * 10000).cast("bigint").cast("double")
             / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("r_name"), F.asc("segment"))
        .limit(20)
    )


FLAGSHIP_ORACLE = """
SELECT r_name,
       CASE WHEN c_mktsegment IN ('BUILDING','MACHINERY') THEN 'industrial'
            ELSE 'consumer' END AS segment,
       CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4)
                 * 10000 AS BIGINT) AS DOUBLE) / 10000.0
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY 1, 2
ORDER BY revenue DESC NULLS LAST, r_name ASC NULLS FIRST, segment ASC NULLS FIRST
LIMIT 20
"""
