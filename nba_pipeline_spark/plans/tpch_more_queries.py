"""TPC-H decision-support coverage, part 2 — with analytics_queries.py
(Q3/Q5/Q10) and sql_queries.py (Q1 = q_sql_pricing_summary), ALL 22
TPC-H query shapes are adapted to the driver schema and oracle-checked.

The reference's Terraform provisions a warehouse it never queries
(IaC/variables.tf:26-30); this module completes the classic
decision-support set: conditional aggregation, left-join
distributions, group-filter semi-joins, decorrelated scalar
subqueries, disjunctive pushdown, NOT-IN exclusion, max-match
selection, nested-aggregate semi-join chains, and the only-late-
supplier exists/not-exists pair recast as pure aggregation.

Schema adaptations (the driver tables lack some TPC-H columns):
no partsupp -> supplier relationships come from lineitem (Q2: cost =
min observed line price; Q11: stock value = shipped line value;
Q16/Q20: supplier-part pairs from lines); no l_commitdate/receiptdate
-> "late" = shipped >60 days after the order date (Q4/Q21); no
l_shipmode -> Q12 buckets on o_orderpriority per l_linestatus; no
c_phone -> Q22 segments on c_nationkey.

Engine-parity rules as everywhere (flagship.py): money in exact
DECIMAL(18,4) until the output boundary, correlated averages compared
multiplicatively (5*qty*n < sum) so no division ever happens on the
comparison path, counts cast BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources import load_table
from .queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


_DEC = "decimal(18,4)"


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


# --- Q6: forecasting revenue change (single-scan conditional agg) --------------

def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side query — every predicate pushes to the
    parquet reader (PushedFilters on shipdate/discount/quantity), the
    agg is a two-phase partial+final over zero shuffled rows. The
    cheapest possible 100 TB query; anything slower means pushdown
    broke."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


register(
    "q_tpch_q6",
    q_tpch_q6,
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)


# --- Q7: volume shipping between two nations -----------------------------------

def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    The nation pair predicate is an OR across the two directions —
    applied AFTER both dimension joins but before the agg. supplier,
    customer, nation are all broadcast; lineitem joins orders once
    (the only shuffle)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


register(
    "q_tpch_q7",
    q_tpch_q7,
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)


# --- Q8: national market share -------------------------------------------------

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of AMERICA-region revenue per order
    year — conditional-sum ratio over a 6-way join. Both sums stay in
    exact decimal; the single division happens on the final grouped row
    in double (identical bits on both engines)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_c = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_s = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    target = F.when(F.col("supp_nation") == "NATION_6", _revenue()).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(_revenue()).cast("double"), 6
            ).alias("mkt_share")
        )
    )


register(
    "q_tpch_q8",
    q_tpch_q8,
    f"""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_6' THEN {_REV_SQL}
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)


# --- Q12 shape: priority buckets per line status --------------------------------

def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> l_linestatus, the driver schema has
    no shipmode): count high- vs low-priority order lines per status —
    the canonical CASE-inside-SUM conditional aggregation over a
    fact-fact join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


register(
    "q_tpch_q12",
    q_tpch_q12,
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)


# --- Q13: customer order-count distribution ------------------------------------

def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer, INCLUDING
    zero-order customers — the left outer join with an extra ON-clause
    predicate (not a WHERE, which would turn it inner), then a second
    aggregation over the first's result. Two shuffles by nature
    (custkey, then count)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


register(
    "q_tpch_q13",
    q_tpch_q13,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)


# --- Q14: promotion revenue share ----------------------------------------------

def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: fraction of one year's revenue from PROMO parts.
    part broadcasts into the lineitem scan; both conditional sums ride
    the same partial agg; one double division at the end."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_revenue()).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


register(
    "q_tpch_q14",
    q_tpch_q14,
    f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
)


# --- Q15: top supplier (max-match selection) -----------------------------------

def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) whose quarterly revenue equals the max.
    The per-supplier revenue aggregates once and is reused for both the
    max and the match (cache-free: the scalar max is a 1-row broadcast
    crossJoin, so the agg subtree runs twice at most — at 100 TB the
    agg output is ~#suppliers rows, so recompute is cheap and the plan
    stays fully distributed). Exact-decimal sums make the equality
    safe; ties all surface."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
    )


register(
    "q_tpch_q15",
    q_tpch_q15,
    f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)


# --- Q16 shape: supplier diversity per part config, with exclusion -------------

def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp -> lineitem as the part-supplier
    relation): distinct suppliers per (brand, type, size), excluding one
    brand, one type, and "complaint" suppliers (negative balance) via
    NOT IN. The NOT-IN inner set is provably non-NULL (keys), so the
    anti join needs no null-aware path."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


register(
    "q_tpch_q16",
    q_tpch_q16,
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)


# --- Q17: small-quantity-order revenue (decorrelated scalar subquery) ----------

def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from lineitems under 20% of their part's
    average quantity, one brand. The correlated AVG decorrelates to a
    pre-aggregate + join — and the 0.2*avg comparison is done
    multiplicatively (5*qty*n < sum) entirely in integer-valued doubles,
    so no engine ever divides and the boundary is exact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("ag_partkey")).agg(
        F.count(F.lit(1)).alias("n_li"), F.sum("l_quantity").alias("sum_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("ag_partkey"))
        .filter(F.lit(5.0) * F.col("l_quantity") * F.col("n_li") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0), 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


register(
    "q_tpch_q17",
    q_tpch_q17,
    """
    WITH per_part AS (
      SELECT l_partkey AS ag_partkey, COUNT(*) AS n_li, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2)
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN per_part ON l_partkey = ag_partkey
    WHERE p_brand = 'Brand#3'
      AND 5.0 * l_quantity * n_li < sum_qty
    """,
)


# --- Q18: large-volume orders (group-filter semi-join) -------------------------

def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customer. The HAVING-filtered agg output is tiny (hundreds of
    orders), so it drives the join as the build side; top-100 compiles
    to TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


register(
    "q_tpch_q18",
    q_tpch_q18,
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM orders
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 250) big
      ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
    LIMIT 100
    """,
)


# --- Q19: disjunctive predicate pushdown ---------------------------------------

def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR of three brand/size/quantity
    conjunctions. Catalyst extracts the common sub-predicates and pushes
    what it can below the join (CNF conversion); the point of keeping
    this shape is that the disjunction must NOT disable scan pushdown
    of the per-branch quantity bounds."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    qty, size = F.col("l_quantity"), F.col("p_size")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & size.between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & size.between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & size.between(1, 15)
            & qty.between(20, 30)
        )
    )
    return joined.filter(branch).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


register(
    "q_tpch_q19",
    q_tpch_q19,
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)


# --- Q22 shape: dormant high-balance customers ---------------------------------

def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone prefix -> nationkey segment): customers in
    selected nations with above-average positive balance and no RECENT
    orders (every synthetic customer has lifetime orders, so dormancy
    is defined against a date horizon — same decorrelation shape).
    The scalar AVG is compared multiplicatively in exact decimal
    (bal*n > sum), the no-recent-orders test is a left-anti join, and
    the 1-row average broadcasts — three classic decorrelations in one
    query."""
    nations = [1, 6, 11, 16, 21]
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    bal = F.col("c_acctbal").cast(_DEC)
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("sum_bal"), F.count(F.lit(1)).alias("n_bal")
    )
    return (
        cust.join(F.broadcast(pos))
        .filter(bal * F.col("n_bal") > F.col("sum_bal"))
        .join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


register(
    "q_tpch_q22",
    q_tpch_q22,
    """
    WITH seg AS (
      SELECT * FROM customer WHERE c_nationkey IN (1, 6, 11, 16, 21)
    ),
    pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS sum_bal, COUNT(*) AS n_bal
      FROM seg WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM seg, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_bal > sum_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
)


# --- Q4: order priority checking (EXISTS against the detail table) -------------

def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (no commit/receipt dates -> "late" = shipped more
    than 60 days after order): count orders per priority with at least
    one late line. The EXISTS decorrelates to a left-semi join on the
    DISTINCT late order keys — one shuffle, no row multiplication."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    late = li.join(
        orders.select("o_orderkey", "o_orderdate").withColumnRenamed("o_orderkey", "lk"),
        F.col("l_orderkey") == F.col("lk"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        orders.join(
            late.select("l_orderkey").distinct(),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


register(
    "q_tpch_q4",
    q_tpch_q4,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey
                    AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)


# --- Q2: minimum-cost supplier per part ----------------------------------------

def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp -> lineitem: a supplier's "cost" for a
    part is its minimum observed line price, exact decimal): for ASIA
    suppliers and one part size, the supplier(s) matching the per-part
    minimum cost. Two-level min + equality match — the same
    decorrelated correlated-subquery family as Q15/Q17."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    cost_ps = (
        li.join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "n_name")
        .agg(F.min(F.col("l_extendedprice").cast(_DEC)).alias("cost"))
    )
    min_pp = cost_ps.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        cost_ps.join(
            F.broadcast(min_pp),
            (F.col("p_partkey") == F.col("mk")) & (F.col("cost") == F.col("min_cost")),
        )
        .select(
            "p_partkey", "s_suppkey", "s_name", "n_name", F.col("cost").cast("double").alias("cost")
        )
    )


register(
    "q_tpch_q2",
    q_tpch_q2,
    """
    WITH asia_supp AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    cost_ps AS (
      SELECT p_partkey, s_suppkey, s_name, n_name,
             MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS cost
      FROM lineitem
      JOIN asia_supp ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_size = 15
      GROUP BY p_partkey, s_suppkey, s_name, n_name
    )
    SELECT p_partkey, s_suppkey, s_name, n_name, CAST(cost AS DOUBLE) AS cost
    FROM cost_ps c
    WHERE cost = (SELECT MIN(cost) FROM cost_ps m WHERE m.p_partkey = c.p_partkey)
    """,
)


# --- Q9: product-type profit by nation and year --------------------------------

def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no ps_supplycost -> cost proxy = 60% of retail
    price x quantity, exact decimal): profit by supplier nation and
    order year over the 'o'-marked part-name family (the synthetic
    names are word pairs, not numbered). One
    fact-fact shuffle; part/supplier/nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%o%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    # x10 integer scaling: profit*10 = rev*10 - retail*qty*6 keeps every
    # decimal multiplication exact (a 0.6 decimal factor overflows the
    # product precision and the engines round it differently)
    cost6 = F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC) * F.lit(6)
    profit10 = _revenue() * F.lit(10) - cost6
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit10).cast("double") / F.lit(10.0)).alias("profit"))
    )


register(
    "q_tpch_q9",
    q_tpch_q9,
    f"""
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM({_REV_SQL} * 10
                    - CAST(p_retailprice AS DECIMAL(18,4))
                      * CAST(l_quantity AS DECIMAL(18,4)) * 6) AS DOUBLE) / 10.0
             AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%o%'
    GROUP BY n_name, year(o_orderdate)
    """,
)


# --- Q11: important stock (group value vs global-fraction scalar) --------------

def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value -> shipped line value): parts
    whose EUROPE-supplied value exceeds 1/2000 of the total. The total
    is a 1-row broadcast; the fraction compares multiplicatively in
    exact decimal (value*2000 > total) so no division, no float."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    base = li.join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
    value = F.sum(F.col("l_extendedprice").cast(_DEC))
    per_part = base.groupBy("l_partkey").agg(value.alias("part_value"))
    total = base.agg(value.alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") * 2000 > F.col("total_value"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


register(
    "q_tpch_q11",
    q_tpch_q11,
    """
    WITH euro AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    base AS (SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,4)) AS v
             FROM lineitem JOIN euro ON l_suppkey = s_suppkey)
    SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
    FROM base
    GROUP BY l_partkey
    HAVING SUM(v) * 2000 > (SELECT SUM(v) FROM base)
    """,
)


# --- Q20: suppliers with a dominant share of a part family ---------------------

def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty -> shipped-quantity share): NATION_2
    suppliers holding >30% of 1997 shipped quantity for some 'red'
    part — nested aggregate (per part+supplier, then per part) feeding
    a semi join into the supplier list. Shares compare multiplicatively
    (10*sq > 3*tq) on integer-valued quantity sums."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    f = (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    t = f.groupBy(F.col("l_partkey").alias("tk")).agg(F.sum("sq").alias("tq"))
    qualifying = (
        f.join(F.broadcast(t), F.col("l_partkey") == F.col("tk"))
        .filter(F.col("sq") * 10 > F.col("tq") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


register(
    "q_tpch_q20",
    q_tpch_q20,
    """
    WITH f AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    t AS (SELECT l_partkey, SUM(sq) AS tq FROM f GROUP BY l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM f JOIN t USING (l_partkey)
                  WHERE f.l_suppkey = s_suppkey AND sq * 10 > tq * 3)
    """,
)


# --- Q21: suppliers who kept orders waiting ------------------------------------

def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >60 days after order): count,
    per supplier, multi-supplier orders where THEY were the only late
    supplier. The exists / not-exists pair becomes pure aggregation:
    per (order, supplier) max(late), per order countDistinct suppliers
    + late-supplier count, then the qualifying pairs group by supplier.
    No correlated execution anywhere; three keyed shuffles total."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier")
    flagged = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .cast("int")
            .alias("late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("has_late"))
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("has_late").alias("n_late")
    )
    qualifying = (
        flagged.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("has_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        qualifying.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


register(
    "q_tpch_q21",
    q_tpch_q21,
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS has_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_late) AS n_late
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE has_late = 1 AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC NULLS LAST, s_name ASC
    LIMIT 20
    """,
)
