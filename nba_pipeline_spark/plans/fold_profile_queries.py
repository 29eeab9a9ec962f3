"""Ordered folds, exact medians, heavy hitters, bitmap distinct
counting, and one-pass data profiling.

Extends SURVEY.md §2.5/§2.10: the per-key ordered fold (EWMA) shows
that sequential recurrences — the classic "needs a Python loop" shape —
compile to JVM higher-order functions (collect → array_sort →
aggregate), keeping the only shuffle on the group key. The bitmap
distinct count is the exact-but-mergeable middle ground between
countDistinct's row expansion and HLL's approximation.

Oracle notes pinned by probe (DuckDB 1.0): list_reduce is a left fold
seeded with the first element (same as F.aggregate with element_at(1)
as init); DuckDB median() interpolates only for DOUBLE inputs
(DECIMAL inputs take the lower middle) — the oracle casts; decimal
lambda literals poison list_reduce into decimal rounding — the oracle
casts the list to DOUBLE[].
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


# --- Per-key ordered fold: EWMA without Python ---------------------------------

def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event values per user
    (alpha=0.1), final value per key. A sequential recurrence — yet
    fully JVM-side: collect_list under the group, array_sort on the
    (ts, event_id) struct prefix for a total order, then a seeded left
    fold with F.aggregate. One shuffle on user_id; the fold itself is
    narrow. Both engines fold in the identical order, so the float
    result matches bit-for-bit before the safety rounding.

    Scale note: state per key is its event array — fine for bounded
    per-key cardinality (sessions, devices); for unbounded keys use the
    streaming twin (applyInPandasWithState) which folds incrementally
    without materializing history."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    vals = F.transform(arr, lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.1) * x + F.lit(0.9) * acc,
    )
    return (
        ev.groupBy("user_id")
        .agg(ewma.alias("raw"), F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.round("raw", 6).alias("ewma"), "n_events")
    )


register(
    "q_ewma",
    q_ewma,
    """
    SELECT user_id,
           ROUND(list_reduce(CAST(list(value ORDER BY ts, event_id) AS DOUBLE[]),
                             (acc, x) -> 0.1 * x + 0.9 * acc), 6) AS ewma,
           COUNT(*) AS n_events
    FROM events WHERE ts IS NOT NULL
    GROUP BY user_id
    """,
)


# --- Exact median per group ----------------------------------------------------

def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per group. Spark's median() is the
    exact percentile(0.5) (sort-based within the agg — heavier than
    approx_percentile's sketch, the deliberate trade for exactness);
    quantities are integer-valued doubles so the even-count midpoint
    is exact in binary on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.median("l_discount").alias("med_disc"),
        F.count(F.lit(1)).alias("n"),
    )


register(
    "q_agg_median",
    q_agg_median,
    """
    SELECT l_returnflag,
           median(CAST(l_quantity AS DOUBLE)) AS med_qty,
           median(CAST(l_discount AS DOUBLE)) AS med_disc,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)


# --- Exact heavy hitters (relative threshold) ----------------------------------

def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users contributing more than 1.2x the uniform share of events —
    the exact heavy-hitter query, scale-free (the threshold tracks the
    user population instead of a fixed percentage). The totals are a
    1-row broadcast; the comparison is multiplicative in integers
    (5*cnt*n_users > 6*total) so no division and no float. The
    approximate-at-scale twin is a count-min sketch (see q_sketch_cms):
    this exact form is one extra shuffle but gives the true set."""
    ev = _t(spark, sf_dir, "events")
    total = ev.agg(
        F.count(F.lit(1)).alias("total"), F.countDistinct("user_id").alias("n_users")
    )
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_user.join(F.broadcast(total))
        .filter(F.col("cnt") * F.col("n_users") * 5 > F.col("total") * 6)
        .select("user_id", "cnt")
    )


register(
    "q_heavy_hitters",
    q_heavy_hitters,
    """
    SELECT user_id, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * (SELECT COUNT(DISTINCT user_id) FROM events) * 5
           > (SELECT COUNT(*) FROM events) * 6
    """,
)


def q_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of user_id frequencies per event type — the
    mergeable approximate twin of q_heavy_hitters. The sketch binary is
    engine-specific, so the oracle-checkable surface is its size and
    the exact row count it summarizes (rows-only gate covers the rest).
    At 100 TB: sketches built per partition/day merge associatively,
    answering point frequency queries without a second scan."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.length(
                F.count_min_sketch(
                    F.col("user_id"), F.lit(0.001), F.lit(0.99), F.lit(42)
                )
            ).alias("sketch_bytes"),
        )
    )


register("q_sketch_cms", q_sketch_cms, None)  # sketch binary: rows-only gate


# --- Exact-but-mergeable distinct: bitmap aggregation --------------------------

def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority via bitmap aggregation:
    keys bucket into 32k-bit bitmaps (bitmap_bucket_number), each
    bucket OR-aggregates positions, bucket popcounts sum per group.
    EXACT like countDistinct but without its row expansion, and the
    per-bucket bitmaps are mergeable partials — written to a lake
    partition they roll distinct counts up across days the way HLL
    sketches do, with no error bar. Two keyed shuffles, both on
    pre-combined rows."""
    orders = _t(spark, sf_dir, "orders")
    per_bucket = (
        orders.groupBy(
            "o_orderpriority",
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
        )
        .agg(
            F.bitmap_count(
                F.bitmap_construct_agg(F.bitmap_bit_position(F.col("o_custkey")))
            ).alias("bucket_cnt")
        )
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum("bucket_cnt").cast("long").alias("n_custs")
    )


register(
    "q_agg_bitmap_distinct",
    q_agg_bitmap_distinct,
    """
    SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders GROUP BY o_orderpriority
    """,
)


# --- One-pass data profiling ---------------------------------------------------

def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem in ONE scan: per-column null counts,
    exact distinct cardinalities, and min/max. The shape every ingest
    pipeline runs before trusting a new drop. countDistinct over
    multiple columns expands rows (one per column) — acceptable here
    because the profile is a deliberate full-scan job; the everyday
    monitoring twin would swap in approx_count_distinct."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_shipdate").isNull().cast("int")).cast("long").alias("null_shipdate"),
        F.countDistinct("l_orderkey").alias("d_orderkey"),
        F.countDistinct("l_partkey").alias("d_partkey"),
        F.countDistinct("l_returnflag").alias("d_returnflag"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


register(
    "q_profile",
    q_profile,
    """
    SELECT COUNT(*) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS null_shipdate,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS d_orderkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_partkey,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS d_returnflag,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate
    FROM lineitem
    """,
)


# --- Skewed-key aggregation: explicit two-phase salt ---------------------------

def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the 5 hot event types (see
    operators.aggregates.salted_two_phase_agg: AQE splits skewed join
    partitions, not skewed agg reducers). Results are exactly the plain
    groupBy — counts and decimal sums recombine losslessly — which is
    what the oracle checks."""
    from ..operators.aggregates import salted_two_phase_agg

    ev = _t(spark, sf_dir, "events")
    return salted_two_phase_agg(
        ev, ["event_type"], "value", F.abs(F.xxhash64(F.col("user_id"))), n_salts=16
    )


register(
    "q_agg_salted",
    q_agg_salted,
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
)


# --- Theta sketches: approximate SET OPERATIONS on distinct sets ---------------

def q_sketch_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches Theta sketches (Spark 4.1): union / intersection /
    difference of DISTINCT-user sets without materializing either set —
    the sketch twin of q_agg_hll_sketch (HLL can only union; Theta
    composes all three set ops). Each side aggregates to one sketch,
    the 1-row frames cross-broadcast, and the set algebra happens on
    sketch binaries. Below 4096 retained entries Theta is EXACT (it
    keeps every hash until saturation), which is what lets the oracle
    pin this with exact DISTINCT set ops at gate scale; above that it
    degrades to a ~2% relative-error estimate — the 100 TB mode, where
    per-day sketches stored at ingest answer audience-overlap queries
    in milliseconds."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("s_purchase")
    )
    c = ev.filter(F.col("event_type") == "click").agg(
        F.theta_sketch_agg("user_id").alias("s_click")
    )
    return p.crossJoin(F.broadcast(c)).select(
        F.theta_sketch_estimate(F.theta_union("s_purchase", "s_click")).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection("s_purchase", "s_click")).alias(
            "n_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference("s_purchase", "s_click")).alias(
            "n_only_purchase"
        ),
    )


register(
    "q_sketch_theta",
    q_sketch_theta,
    """
    SELECT
      (SELECT COUNT(DISTINCT user_id) FROM events
        WHERE event_type IN ('purchase','click')) AS n_union,
      (SELECT COUNT(*) FROM
        (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'click'))
        AS n_intersect,
      (SELECT COUNT(*) FROM
        (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         EXCEPT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'click'))
        AS n_only_purchase
    """,
)


# --- RFM segmentation (per-market quintiles) -----------------------------------

def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary
    quintiles WITHIN each nation (the partition keeps every ntile
    window off the banned single-task shape and is how a 100 TB
    engine segments per market anyway). Total tiebreak on custkey
    makes every quintile boundary deterministic; the digits compose
    into the familiar 3-digit segment code."""
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary"),
        )
    )
    def quintile(order_cols):
        return F.ntile(5).over(
            Window.partitionBy("c_nationkey").orderBy(*order_cols)
        )

    r = quintile([F.col("last_order").desc(), F.col("c_custkey").asc()])
    f = quintile([F.col("freq").desc(), F.col("c_custkey").asc()])
    m = quintile([F.col("monetary").desc(), F.col("c_custkey").asc()])
    return per_cust.select(
        "c_custkey",
        "c_nationkey",
        (r * 100 + f * 10 + m).cast("int").alias("rfm_code"),
    )


register(
    "q_rfm",
    q_rfm,
    """
    WITH per_cust AS (
      SELECT c_custkey, c_nationkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_nationkey
    )
    SELECT c_custkey, c_nationkey,
           CAST(NTILE(5) OVER (PARTITION BY c_nationkey
                               ORDER BY last_order DESC, c_custkey ASC) * 100
              + NTILE(5) OVER (PARTITION BY c_nationkey
                               ORDER BY freq DESC, c_custkey ASC) * 10
              + NTILE(5) OVER (PARTITION BY c_nationkey
                               ORDER BY monetary DESC, c_custkey ASC) AS INT)
             AS rfm_code
    FROM per_cust
    """,
)


# --- Deterministic hash sampling (the oracle-able, retry-safe sample) ----------

def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample selected by an md5 hash threshold on the
    key instead of engine RNG: the SAME rows come back on any engine,
    any partitioning, any retry — which is why q_sample (engine RNG) is
    rows-only but this twin hash-matches its oracle exactly. The
    100 TB default for reproducible eval splits and debugging samples;
    stratify by composing the key with the stratum."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    word = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return li.filter(word % 10 == 0).select("l_orderkey", "l_linenumber", "l_quantity")


register(
    "q_sample_hash",
    q_sample_hash,
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE CAST(('0x' || substr(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                             CAST(l_linenumber AS VARCHAR))), 1, 8))
               AS BIGINT) % 10 = 0
    """,
)


# --- Declarative expectations (ingest contract checks) -------------------------

def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations over lineitem in ONE scan (operators/
    expectations.py): per-rule violation counts + pass flags, plus a
    referential orphan check against orders as a second tiny
    aggregate. The publish gate every ingest pipeline runs — NULL rule
    results count as violations."""
    from ..operators.expectations import expectations_report, fk_orphans

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rules = {
        "qty_positive": F.col("l_quantity") > 0,
        "discount_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
        "shipdate_not_null": F.col("l_shipdate").isNotNull(),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "tax_range": (F.col("l_tax") >= 0) & (F.col("l_tax") <= 1),
    }
    report = expectations_report(li, rules)
    fk = fk_orphans(li, orders, "l_orderkey", "o_orderkey", "fk_orderkey")
    return report.unionByName(fk)


register(
    "q_expectations",
    q_expectations,
    """
    SELECT 'qty_positive' AS rule,
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_quantity > 0, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations,
           CASE WHEN COALESCE(SUM(CASE WHEN NOT COALESCE(l_quantity > 0, FALSE) THEN 1 ELSE 0 END), 0) = 0 THEN 1 ELSE 0 END AS passed
    FROM lineitem
    UNION ALL
    SELECT 'discount_range',
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_discount >= 0 AND l_discount <= 1, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT),
           CASE WHEN COALESCE(SUM(CASE WHEN NOT COALESCE(l_discount >= 0 AND l_discount <= 1, FALSE) THEN 1 ELSE 0 END), 0) = 0 THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'shipdate_not_null',
           CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT),
           CASE WHEN COALESCE(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), 0) = 0 THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_domain',
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT),
           CASE WHEN COALESCE(SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END), 0) = 0 THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'tax_range',
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_tax >= 0 AND l_tax <= 1, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT),
           CASE WHEN COALESCE(SUM(CASE WHEN NOT COALESCE(l_tax >= 0 AND l_tax <= 1, FALSE) THEN 1 ELSE 0 END), 0) = 0 THEN 1 ELSE 0 END
    FROM lineitem
    UNION ALL
    SELECT 'fk_orderkey',
           CAST(COUNT(*) AS BIGINT),
           CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
)


# --- Quarantine channel (expectations dual-sink, round 5) ---------------------

_QUAR_RULES_SQL = {
    "qty_le_45": "l_quantity <= 45",
    "disc_le_008": "l_discount <= 0.08",
    "tax_le_006": "l_tax <= 0.06",
}


def _quarantine_rules():
    return {
        "qty_le_45": F.col("l_quantity") <= 45,
        "disc_le_008": F.col("l_discount") <= 0.08,
        "tax_le_006": F.col("l_tax") <= 0.06,
    }


def q_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine channel itself: rows failing >=1 expectation with
    their rule tags (deterministic rule order -> hashable string). The
    dual-sink publish gate's reject stream, kept auditable instead of
    swallowed (reference anti-pattern: games.py:21-27 try/except-
    continue)."""
    from ..operators.expectations import split_quarantine

    li = _t(spark, sf_dir, "lineitem")
    _, quarantined = split_quarantine(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
        _quarantine_rules(),
    )
    return quarantined.withColumn(
        "failed_rules", F.array_join("failed_rules", ",")
    )


register(
    "q_quarantine_rows",
    q_quarantine_rows,
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
           array_to_string(list_filter([
               CASE WHEN NOT COALESCE(l_quantity <= 45, FALSE) THEN 'qty_le_45' END,
               CASE WHEN NOT COALESCE(l_discount <= 0.08, FALSE) THEN 'disc_le_008' END,
               CASE WHEN NOT COALESCE(l_tax <= 0.06, FALSE) THEN 'tax_le_006' END
           ], x -> x IS NOT NULL), ',') AS failed_rules
    FROM lineitem
    WHERE NOT COALESCE(l_quantity <= 45, FALSE)
       OR NOT COALESCE(l_discount <= 0.08, FALSE)
       OR NOT COALESCE(l_tax <= 0.06, FALSE)
    """,
)


def q_expectations_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split summary off the SAME single tagged scan the dual sink
    writes from: per-rule violation counts plus the __passed /
    __quarantined totals — the report a publish gate reads to decide
    ship-or-hold."""
    from ..operators.expectations import tag_violations

    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax"
    )
    tagged = tag_violations(li, _quarantine_rules())
    names = list(_quarantine_rules())
    counts = tagged.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.array_contains("failed_rules", n), 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias(f"__v_{n}")
            for n in names
        ],
        F.coalesce(
            F.sum(F.when(F.size("failed_rules") > 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("__v___quarantined"),
        F.coalesce(
            F.sum(F.when(F.size("failed_rules") == 0, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("__v___passed"),
    )
    rows = names + ["__quarantined", "__passed"]
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"),
                        F.col(f"__v_{n}").alias("n_rows"),
                    )
                    for n in rows
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.n_rows")


register(
    "q_expectations_quarantine",
    q_expectations_quarantine,
    """
    SELECT 'qty_le_45' AS rule,
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_quantity <= 45, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_rows
    FROM lineitem
    UNION ALL
    SELECT 'disc_le_008',
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_discount <= 0.08, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'tax_le_006',
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_tax <= 0.06, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT '__quarantined',
           CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_quantity <= 45, FALSE)
                                    OR NOT COALESCE(l_discount <= 0.08, FALSE)
                                    OR NOT COALESCE(l_tax <= 0.06, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT '__passed',
           CAST(COALESCE(SUM(CASE WHEN COALESCE(l_quantity <= 45, FALSE)
                                   AND COALESCE(l_discount <= 0.08, FALSE)
                                   AND COALESCE(l_tax <= 0.06, FALSE) THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    """,
)
