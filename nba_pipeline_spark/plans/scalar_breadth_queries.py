"""Scalar-function breadth: calendar functions, string functions,
numeric/conditional functions, and an order-independent table checksum.

Extends SURVEY.md §2.9 (M4/M5/M11/M12): the reference's pandas code
leans on a handful of string/date idioms; a complete engine surface
needs the whole builtin family, and each function here is exercised
with a DuckDB oracle so the cross-engine semantic corners (day-of-week
numbering, month-add clamping, pad/truncate, pmod sign) are pinned by
hash, not by documentation.

Everything is a JVM builtin projection — narrow, codegen'd, zero
shuffle except the checksum's single-stage agg. At 100 TB these are
the free operators; the point of the queries is semantic parity, not
plan shape.
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


# --- M4/M5 extension: calendar function family ---------------------------------

def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar breadth over o_orderdate: month arithmetic (clamped at
    month end on both engines), last_day, day difference, quarter,
    day-of-week (Spark numbers Sunday=1; DuckDB Sunday=0 — the oracle
    adds 1), ISO week-of-year."""
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("int").alias("days_to_2002"),
        F.quarter(d).cast("int").alias("q"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.weekofyear(d).cast("int").alias("iso_week"),
    )


register(
    "q_date_funcs",
    q_date_funcs,
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           last_day(o_orderdate) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
             AS days_to_2002,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week
    FROM orders
    """,
)


# --- M11 extension: string function family -------------------------------------

def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String breadth over part names: pad (lpad truncates past the
    target length on both engines), character translation, repetition,
    reversal, first-codepoint, 1-based substring position (0 = absent),
    prefix/suffix slices, and delimiter field extraction (empty string
    past the last field)."""
    part = _t(spark, sf_dir, "part")
    s = F.col("p_name")
    return part.select(
        "p_partkey",
        F.lpad(s, 12, "*").alias("padded"),
        F.rpad(s, 6, "#").alias("clipped"),
        F.translate(s, "AEP", "aep").alias("translated"),
        F.repeat(F.substring(s, 1, 2), 3).alias("repeated"),
        F.reverse(s).alias("reversed"),
        F.ascii(s).cast("int").alias("first_code"),
        F.instr(s, "_").cast("int").alias("underscore_at"),
        F.expr("left(p_name, 4)").alias("head4"),
        F.expr("right(p_name, 3)").alias("tail3"),
        F.split_part(s, F.lit("_"), F.lit(2)).alias("field2"),
    )


register(
    "q_str_funcs",
    q_str_funcs,
    """
    SELECT p_partkey,
           lpad(p_name, 12, '*') AS padded,
           rpad(p_name, 6, '#') AS clipped,
           translate(p_name, 'AEP', 'aep') AS translated,
           repeat(substr(p_name, 1, 2), 3) AS repeated,
           reverse(p_name) AS reversed,
           CAST(ascii(p_name) AS INT) AS first_code,
           CAST(strpos(p_name, '_') AS INT) AS underscore_at,
           left(p_name, 4) AS head4,
           right(p_name, 3) AS tail3,
           split_part(p_name, '_', 2) AS field2
    FROM part
    """,
)


# --- M12 extension: numeric + conditional function family ----------------------

def q_num_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric/conditional breadth over customer balances: greatest/
    least, sign, exp/ln/log10 (libm results agree to well past the
    6-dp rounding), power, sqrt, C-style %, always-positive pmod
    (DuckDB spells it ((a%b)+b)%b), NULLIF and IFNULL."""
    cust = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    k = F.col("c_custkey")
    small = (k % 7).cast("int")
    return cust.select(
        "c_custkey",
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1k"),
        F.signum(bal).cast("int").alias("bal_sign"),
        F.round(F.exp(small.cast("double") / 10.0), 6).alias("exp_v"),
        F.round(F.log(F.abs(bal) + 1.0), 6).alias("ln_v"),
        F.round(F.log10(F.abs(bal) + 1.0), 6).alias("log10_v"),
        F.round(F.pow(F.lit(2.0), small), 4).alias("pow2"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_v"),
        ((k - 3) % 5).cast("int").alias("cmod"),
        F.pmod(k - 3, F.lit(5)).cast("int").alias("pm"),
        F.nullif(small, F.lit(0)).alias("nz"),
        F.ifnull(F.nullif(small, F.lit(0)), F.lit(-1)).alias("nz_filled"),
    )


register(
    "q_num_funcs",
    q_num_funcs,
    """
    SELECT c_custkey,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 1000.0) AS bal_cap1k,
           CAST(sign(c_acctbal) AS INT) AS bal_sign,
           ROUND(exp(CAST(c_custkey % 7 AS DOUBLE) / 10.0), 6) AS exp_v,
           ROUND(ln(abs(c_acctbal) + 1.0), 6) AS ln_v,
           ROUND(log10(abs(c_acctbal) + 1.0), 6) AS log10_v,
           ROUND(pow(2.0, CAST(c_custkey % 7 AS INT)), 4) AS pow2,
           ROUND(sqrt(abs(c_acctbal)), 6) AS sqrt_v,
           CAST((c_custkey - 3) % 5 AS INT) AS cmod,
           CAST((((c_custkey - 3) % 5) + 5) % 5 AS INT) AS pm,
           CAST(nullif(c_custkey % 7, 0) AS INT) AS nz,
           CAST(ifnull(nullif(c_custkey % 7, 0), -1) AS INT) AS nz_filled
    FROM customer
    """,
)


# --- Lake maintenance: order-independent table checksum ------------------------

def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine table fingerprint: md5 each row's canonical string,
    take the first 8 hex digits as an integer, SUM per group. Addition
    is commutative, so the checksum is partition- and order-independent
    — the cheap way to compare a 100 TB table across engines/copies
    without moving rows (each side scans locally, ships one number per
    group). String/int columns only: float/timestamp formatting is not
    canonical across engines."""
    cust = _t(spark, sf_dir, "customer")
    row = F.concat_ws(
        "|", F.col("c_custkey").cast("string"), F.col("c_name"), F.col("c_mktsegment")
    )
    word = F.conv(F.substring(F.md5(row), 1, 8), 16, 10).cast("long")
    return cust.groupBy("c_nationkey").agg(
        F.sum(word).alias("checksum"), F.count(F.lit(1)).alias("n_rows")
    )


register(
    "q_table_checksum",
    q_table_checksum,
    """
    SELECT c_nationkey,
           -- outer CAST: DuckDB SUM(BIGINT) returns HUGEINT, which pandas
           -- fetches as float64 — cast back so the oracle frame is int64
           -- like Spark's LongType (values fit: 25k rows x 2^32 < 2^63).
           CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|', CAST(c_custkey AS VARCHAR),
                                                  c_name, c_mktsegment)), 1, 8))
                    AS BIGINT)) AS BIGINT) AS checksum,
           COUNT(*) AS n_rows
    FROM customer
    GROUP BY c_nationkey
    """,
)


# --- Lake layout: Morton (Z-order) clustering key ------------------------------

def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value over (l_partkey, l_suppkey) — the clustering key
    write_zordered ranges on (sources/layout.py). Pure shift/mask
    integer arithmetic, so the 2-D data-skipping layout is driven by an
    oracle-replayable JVM projection, not engine magic."""
    from ..sources.layout import zvalue

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zvalue(F.col("l_partkey"), F.col("l_suppkey"), 8).alias("zval"),
    )


def _zvalue_sql(a: str, b: str, bits: int = 8) -> str:
    # full parens around every term: DuckDB's << binds looser than +,
    # so unparenthesized terms would chain into each other's shifts
    terms = []
    for i in range(bits):
        terms.append(f"(((({a} & 255) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b} & 255) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


register(
    "q_zorder_key",
    q_zorder_key,
    f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_zvalue_sql('l_partkey', 'l_suppkey')} AS BIGINT) AS zval
    FROM lineitem
    """,
)


# --- ANSI-mode safety family: try_* functions ----------------------------------

def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI mode is ON engine-wide (Spark 4 default): a junk row must
    yield NULL, not kill the 100 TB job. try_divide nulls
    divide-by-zero, try_cast nulls unparseable strings (the words
    column really parses where p_name's numeric suffix is numeric),
    try_to_timestamp nulls junk timestamps, and try_add nulls SIGNED
    OVERFLOW — the oracle replays overflow as an explicit range check,
    since DuckDB has no try-arithmetic."""
    part = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    big = F.lit(9223372036854775807)
    return part.select(
        "p_partkey",
        F.try_divide(k.cast("double"), (k % 5).cast("double")).alias("div5"),
        F.col("p_type").try_cast("int").alias("type_as_int"),
        F.split_part(F.col("p_name"), F.lit("_"), F.lit(2)).try_cast("long").alias("suffix_num"),
        F.try_to_timestamp(F.col("p_type")).alias("junk_ts"),
        F.try_to_timestamp(F.lit("1997-03-01 12:30:00")).alias("good_ts"),
        F.try_add(big - (k % 10), k % 7).alias("maybe_overflow"),
    )


register(
    "q_try_funcs",
    q_try_funcs,
    """
    SELECT p_partkey,
           p_partkey / nullif(CAST(p_partkey % 5 AS DOUBLE), 0.0) AS div5,
           TRY_CAST(p_type AS INT) AS type_as_int,
           TRY_CAST(split_part(p_name, '_', 2) AS BIGINT) AS suffix_num,
           TRY_CAST(p_type AS TIMESTAMP) AS junk_ts,
           TRY_CAST('1997-03-01 12:30:00' AS TIMESTAMP) AS good_ts,
           CASE WHEN (p_partkey % 7) > (p_partkey % 10) THEN NULL
                ELSE (9223372036854775807 - (p_partkey % 10)) + (p_partkey % 7) END
             AS maybe_overflow
    FROM part
    """,
)


# --- Spark 4 collations: case-insensitive comparison without lower() -----------

def q_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF8_LCASE collation (Spark 4): case-insensitive equality as a
    COLLATION on the comparison, not a lower() rewrite of the data —
    the engine-native path for mixed-case joins/filters (predicate
    pushdown and stats survive, and the original casing is preserved
    in the output). The oracle replays it as lower() equality, which
    is exactly the semantics UTF8_LCASE guarantees for ASCII."""
    part = _t(spark, sf_dir, "part")
    mixed = F.when(F.col("p_partkey") % 2 == 0, F.col("p_type")).otherwise(
        F.lower(F.col("p_type"))
    )
    return (
        part.select("p_partkey", mixed.alias("mixed_type"))
        .filter(F.collate(F.col("mixed_type"), "UTF8_LCASE") == F.lit("promo"))
    )


register(
    "q_collation",
    q_collation,
    """
    SELECT p_partkey,
           CASE WHEN p_partkey % 2 = 0 THEN p_type ELSE lower(p_type) END AS mixed_type
    FROM part
    WHERE lower(CASE WHEN p_partkey % 2 = 0 THEN p_type ELSE lower(p_type) END) = 'promo'
    """,
)
