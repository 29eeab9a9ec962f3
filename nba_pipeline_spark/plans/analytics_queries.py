"""Warehouse-analytics breadth: multi-join TPC-H-class reports, full
outer join, ordered list aggregation, statistical aggregates, RANGE
window frames, batch sessionization, EXISTS/NOT EXISTS decorrelation,
calendar truncation, array unnest-with-ordinality, and blocked
edit-distance fuzzy matching.

These extend the implied warehouse layer of the reference (SURVEY.md
§2.4 J4 / §2.5 A4: the star schema its Terraform provisions but never
queries) with the report shapes such a warehouse exists to serve.

Engine-parity rules (same as everywhere): money sums in exact DECIMAL,
floats rounded past their precision, counts as BIGINT on both sides,
every ordering given a total tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import joins as OJ
from ..session import tune
from ..sources import load_table
from .queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


_DEC = "decimal(18,4)"


def _revenue() -> F.Column:
    # exact-decimal money math (see flagship.py for why at 100 TB)
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)


# --- J4 extension: FULL OUTER join ---------------------------------------------

def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer: customers with no big order AND big orders whose
    customer row is missing both survive with NULLs. Same shuffle as an
    inner SMJ; AQE cannot broadcast a full-outer side, so both sides
    sort — the reason to prefer left/semi when semantics allow."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return OJ.equi_join(
        cust, big, cust["c_custkey"] == big["o_custkey"], how="full"
    ).select("c_custkey", "o_orderkey")


register(
    "q_join_full",
    q_join_full,
    "SELECT c_custkey, o_orderkey FROM customer "
    "FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o "
    "ON c_custkey = o.o_custkey",
)


# --- TPC-H-class multi-join reports --------------------------------------------

def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape (TPC-H Q3 on the driver schema): revenue
    of not-yet-shipped lineitems for BUILDING-segment orders placed
    before the cutoff. customer is the small side of orders (broadcast
    after the segment filter); lineitem⋈orders shuffles once on the
    order key; top-10 compiles to TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    "q_tpch_q3",
    q_tpch_q3,
    f"""
    SELECT l_orderkey, o_orderdate, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC NULLS LAST, l_orderkey ASC
    LIMIT 10
    """,
)


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape (TPC-H Q5): revenue where the
    supplier and the customer sit in the same ASIA nation, one order
    year. The 5-way join keeps ONE fact-fact shuffle (lineitem⋈orders);
    supplier/customer/nation/region are all broadcast dimensions, and
    the same-nation predicate rides the supplier join condition instead
    of a post-join filter (Catalyst pushes it into the hash lookup)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


register(
    "q_tpch_q5",
    q_tpch_q5,
    f"""
    SELECT n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC NULLS LAST, n_name ASC
    """,
)


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting shape (TPC-H Q10): top-20 customers by
    revenue lost to returns in one quarter. Aggregates BEFORE the final
    sort; the customer dimension broadcasts into the post-agg top-k."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


register(
    "q_tpch_q10",
    q_tpch_q10,
    f"""
    SELECT c_custkey, c_name, c_acctbal, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC NULLS LAST, c_custkey ASC
    LIMIT 20
    """,
)


# --- A4 extensions: ordered list agg + statistical aggregates ------------------

def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): names of
    high-balance customers per nation, '|'-joined in sorted order.
    collect_list is unordered across partitions by design — array_sort
    makes the result deterministic, the engine-portable way to get
    ordered aggregation without a single-partition sort."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 9000)
    return cust.groupBy("c_nationkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("c_name"))).alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "q_agg_listagg",
    q_agg_listagg,
    """
    SELECT c_nationkey,
           COALESCE(string_agg(c_name, '|' ORDER BY c_name), '') AS names,
           COUNT(*) AS n
    FROM customer WHERE c_acctbal >= 9000
    GROUP BY c_nationkey
    """,
)


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: correlation, sample covariance,
    stddev, variance. Both engines use numerically-stable co-moment
    updates; results are rounded well past the achievable agreement
    (~1e-12 relative) but inside each statistic's magnitude."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "q_agg_stats",
    q_agg_stats,
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(stddev_samp(l_discount), 6) AS sd_discount,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)


# --- W5 extensions: RANGE frame + batch sessionization -------------------------

def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, count and max over the trailing
    hour — a true value-range frame (all peers within 3600s enter the
    frame), not a row count. Ordered on unix MICROS so both engines
    frame on the identical integer axis. Count/max only: both are exact
    under any accumulation order."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # cast: unix_micros rejects TIMESTAMP_NTZ (ingest variants); under the
    # package's UTC session the NTZ->LTZ cast is instant-preserving
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.max("value").over(w).alias("max_trailing_1h"),
    )


register(
    "q_win_range_frame",
    q_win_range_frame,
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_trailing_1h,
           MAX(value) OVER w AS max_trailing_1h
    FROM events WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (the lag+cumsum classic):
    a new session starts after >30 min of silence; sessions then
    aggregate to bounds and counts. ONE shuffle on user_id serves both
    windows and the final groupBy (same-key partitioning reused); the
    (ts, event_id) tiebreak makes lag deterministic under ties. The
    streaming twin is q_stream_session (session_window); this is the
    shape you run over the lake."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ-tolerant, see above
    gap_us = ts_us - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    staged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0).alias("is_new"),
    )
    sess = staged.select(
        "user_id",
        "ts",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


register(
    "q_sessionize",
    q_sessionize,
    """
    WITH l AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM l
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)


# --- SQL surface: EXISTS / NOT EXISTS together ---------------------------------

def q_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one predicate — Catalyst
    decorrelates to a left-semi and a left-anti join against the same
    orders scan (visible as two joins in the plan, zero per-row
    subquery execution)."""
    tune(spark)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        """
    )


register(
    "q_sql_exists",
    q_sql_exists,
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)


# --- M-family extension: calendar truncation + interval arithmetic -------------

def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order report: date_trunc bucketing plus day-interval
    arithmetic (due date = order date + 90 days). DuckDB's date_trunc
    returns DATE where Spark returns TIMESTAMP — both sides cast to
    TIMESTAMP so the hash sees one type."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("first_due"),
        F.max(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("last_due"),
    )


register(
    "q_date_trunc",
    q_date_trunc,
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           MIN(o_orderdate + INTERVAL 90 DAY) AS first_due,
           MAX(o_orderdate + INTERVAL 90 DAY) AS last_due
    FROM orders GROUP BY 1
    """,
)


# --- X2 extension: unnest WITH ORDINALITY --------------------------------------

def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode = unnest WITH ORDINALITY: first 8 embedding
    coordinates as (vec_id, ord, val) rows. The position filter lands
    on the generator output before anything widens; NULL/short arrays
    simply emit fewer rows on both engines."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("int").alias("ord"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
    )


register(
    "q_posexplode",
    q_posexplode,
    """
    SELECT vec_id, CAST(t.ord AS INT) AS ord,
           ROUND(CAST(embedding[t.ord] AS DOUBLE), 6) AS val
    FROM embeddings, range(1, 9) t(ord)
    WHERE t.ord <= len(embedding)
    """,
)


# --- X6 extension: blocked edit-distance fuzzy match ---------------------------

def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance on a 40-char normalized
    prefix, blocked by (lang, source) like the jaccard tier — the
    quadratic term stays inside blocks. Prefix-bounded levenshtein is
    the standard cheap filter before a full-text verify; both engines
    implement the same classic DP distance."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.substring(F.lower("text"), 1, 40).alias("pfx")
    )
    a, b = docs.alias("a"), docs.alias("b")
    # thresholded levenshtein (Spark 3.5+): banded DP, O(len*k) not
    # O(len^2), early-exit at distance 9 -> -1. The filter keeps
    # 0..8, so the -1 early-exits drop exactly the rows the unbounded
    # distance would have dropped; kept distances are identical.
    dist = F.levenshtein(F.col("a.pfx"), F.col("b.pfx"), 8)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist").between(0, 8))
    )


register(
    "q_dedup_levenshtein",
    q_dedup_levenshtein,
    """
    WITH d AS (SELECT doc_id, lang, source, substr(lower(text), 1, 40) AS pfx
               FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pfx, b.pfx) AS INT) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 8
    """,
)
