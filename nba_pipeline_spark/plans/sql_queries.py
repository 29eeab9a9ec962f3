"""Pure SQL-API queries (`spark.sql`), proving the engine's second
declarative surface: everything the DataFrame queries do is equally
expressible as ANSI SQL over registered views, hitting the same
Catalyst plans (scan pushdown, partial aggregation, AQE).

The flagship here is the classic TPC-H Q1 pricing summary over
`lineitem` — money sums in exact DECIMAL (order-independent at any
scale, see flagship.py), averages derived as sum/count and rounded
past their precision so the hash can't flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune
from ..sources import load_table
from .queries import register


def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4)
                         * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


register(
    "q_sql_pricing_summary",
    q_sql_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 4)
                     * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)


def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id — finer than rollup/cube (the
    DataFrame API stops at rollup/cube; the SQL surface does not)."""
    tune(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING(o_orderstatus) AS g_status,
               GROUPING(o_orderpriority) AS g_prio,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


register(
    "q_sql_grouping_sets",
    q_sql_grouping_sets,
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)


def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each nation's 3 priciest suppliers —
    the top-N-per-group shape as the optimizer sees it from SQL
    (decorrelated into a ranked window, same plan family as q_win_rank)."""
    tune(spark)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT n.n_name, t.s_name, t.s_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT s_name, ROUND(s_acctbal, 4) AS s_acctbal
          FROM supplier s
          WHERE s.s_nationkey = n.n_nationkey
          ORDER BY s_acctbal DESC, s_name ASC
          LIMIT 3
        ) t
        """
    )


register(
    "q_sql_lateral_topn",
    q_sql_lateral_topn,
    """
    SELECT n.n_name, t.s_name, t.s_acctbal
    FROM nation n
    JOIN LATERAL (
      SELECT s_name, ROUND(s_acctbal, 4) AS s_acctbal
      FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name ASC
      LIMIT 3
    ) t ON TRUE
    """,
)


def q_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery per row (decorrelated by Catalyst into
    a left outer aggregate join — no per-row execution)."""
    tune(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        """
    )


register(
    "q_sql_scalar_subquery",
    q_sql_scalar_subquery,
    """
    SELECT c_custkey,
           (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_order
    FROM customer c
    """,
)


def q_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT clause (Spark SQL syntax surface; the DataFrame twin
    is q_agg_pivot): per-nation customer counts and summed balances
    spread across explicit market-segment columns. Explicit IN list —
    implicit pivot values would cost a discovery job at 100 TB. The
    oracle lowers the pivot to conditional aggregation, which is
    exactly what Catalyst compiles it to."""
    tune(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT c_nationkey, c_mktsegment,
                 CAST(c_acctbal AS DECIMAL(18,4)) AS bal
          FROM customer
        )
        PIVOT (
          COUNT(*) AS n, CAST(SUM(bal) AS DOUBLE) AS bal
          FOR c_mktsegment IN ('BUILDING' AS building, 'MACHINERY' AS machinery)
        )
        """
    )


register(
    "q_sql_pivot",
    q_sql_pivot,
    """
    SELECT c_nationkey,
           CAST(NULLIF(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS building_n,  -- PIVOT emits NULL, not 0, for absent cells
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                         THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS DOUBLE)
             AS building_bal,
           CAST(NULLIF(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS machinery_n,
           CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                         THEN CAST(c_acctbal AS DECIMAL(18,4)) END) AS DOUBLE)
             AS machinery_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)


def q_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNPIVOT clause (DataFrame twin: q_agg_unpivot / melt): the
    three part metrics fold into (metric, value) rows. INCLUDE NULLS
    keeps row counts schema-stable — the lake-contract-friendly choice;
    Catalyst compiles this to Expand, a narrow operator (no shuffle).
    Oracle: the UNION ALL it desugars to."""
    tune(spark)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_partkey, metric, CAST(value AS DOUBLE) AS value
        FROM (SELECT p_partkey,
                     CAST(p_size AS DOUBLE) AS size,
                     p_retailprice AS retail
              FROM part)
        UNPIVOT INCLUDE NULLS (value FOR metric IN (size, retail))
        """
    )


register(
    "q_sql_unpivot",
    q_sql_unpivot,
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
    """,
)
