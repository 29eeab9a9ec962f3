"""Window / ordered-stateful queries (SURVEY.md §2.6).

These are the Spark re-expressions of the reference's three hand-rolled
sequential scans (period counter, score forward-fill, isStarter marker
fill) plus standard ranking/lag analytics. Every window partitions by a
key (user_id / nation) — never a bare global orderBy — so the shuffle
scales out; ordering uses (ts, event_id) so ties are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import windows as OW
from ..sources import load_table
from ..session import tune
from .queries import register


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "events")


ORDER = ["ts", "event_id"]


# --- W1: running sum / counter with reset -------------------------------------

def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = OW.running_sum(ev, ["user_id"], ORDER, F.col("value"), "running_value")
    return out.select("event_id", "user_id", F.round("running_value", 4).alias("running_value"))


register(
    "q_win_running_sum",
    q_win_running_sum,
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_value
    FROM events
    """,
)


def q_win_running_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """playByplay.py:19-41 period counter: starts at 1 per game, +1 at
    every marker row after the first. Here: per user, +1 at every
    'signup' event after the user's first event."""
    ev = _ev(spark, sf_dir)
    out = OW.running_count_with_reset(
        ev, ["user_id"], ORDER, F.col("event_type") == "signup", "period"
    )
    return out.select("event_id", "user_id", "period")


register(
    "q_win_running_reset",
    q_win_running_reset,
    """
    WITH seq AS (
      SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           1 + CAST(SUM(CASE WHEN rn <> 1 AND event_type = 'signup' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS period
    FROM seq
    """,
)


# --- W2: forward fill ---------------------------------------------------------

def q_win_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """playByplay.py:43-65 score carry: parseable score -> value, else
    carry previous, 0 at start. Here 'error' events have no usable value."""
    ev = _ev(spark, sf_dir)
    v = F.when(F.col("event_type") != "error", F.col("value"))
    out = OW.forward_fill(ev, ["user_id"], ORDER, v, "filled_value", default=0.0)
    return out.select("event_id", "user_id", F.round("filled_value", 4).alias("filled_value"))


register(
    "q_win_ffill",
    q_win_ffill,
    """
    SELECT event_id, user_id,
           ROUND(COALESCE(
             LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             0.0), 4) AS filled_value
    FROM events
    """,
)


# --- W3: marker-row flag fill -------------------------------------------------

def q_win_marker_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """boxScores.py:61-76 isStarter: marker rows set the flag for
    FOLLOWING rows, first rows default 1, markers dropped. Markers here:
    'signup' -> 0, 'error' -> 1."""
    ev = _ev(spark, sf_dir)
    out = OW.marker_flag_fill(
        ev,
        ["user_id"],
        ORDER,
        marker_value={"signup": 0, "error": 1},
        marker_col="event_type",
        out="flag",
        first_default=1,
    )
    return out.select("event_id", "user_id", "flag")


register(
    "q_win_marker_fill",
    q_win_marker_fill,
    """
    WITH tagged AS (
      SELECT event_id, user_id, event_type,
             COALESCE(
               LAST_VALUE(CASE WHEN event_type = 'signup' THEN 0
                               WHEN event_type = 'error' THEN 1 END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               1) AS flag
      FROM events
    )
    SELECT event_id, user_id, flag FROM tagged
    WHERE event_type NOT IN ('signup', 'error')
    """,
)


# --- W5: rank / lag -----------------------------------------------------------

def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    ranked = OW.rank_in_group(
        cust, ["c_nationkey"], [F.col("c_acctbal").desc()], "bal_rank", method="rank"
    )
    dense = OW.rank_in_group(
        ranked, ["c_nationkey"], [F.col("c_acctbal").desc()], "bal_dense", method="dense_rank"
    )
    return dense.select("c_custkey", "c_nationkey", "bal_rank", "bal_dense")


register(
    "q_win_rank",
    q_win_rank,
    """
    SELECT c_custkey, c_nationkey,
           CAST(RANK() OVER w AS INT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS INT) AS bal_dense
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
    """,
)


def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    out = OW.lag_delta(ev, ["user_id"], ORDER, F.col("value"), "delta")
    return out.select("event_id", "user_id", F.round("delta", 4).alias("delta"))


register(
    "q_win_lag",
    q_win_lag,
    """
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS delta
    FROM events
    """,
)


def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: quartile bucketing per nation (total order via custkey tiebreak
    so bucket assignment is engine-deterministic)."""
    tune(spark)
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey", "c_nationkey", F.ntile(4).over(w).alias("bal_quartile")
    )


register(
    "q_win_ntile",
    q_win_ntile,
    """
    SELECT c_custkey, c_nationkey,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS bal_quartile
    FROM customer
    """,
)


# --- W4: global ordinal (bounded use) -----------------------------------------

def q_win_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """games.py:82-83 sort-then-assign-ids. Global window = one task by
    design; kept for parity and small frames — production keys use
    surrogate_key (q_surrogate_key)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    out = OW.ordered_surrogate(
        orders, [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()], "seq_id"
    )
    return out.select("o_orderkey", "seq_id")


register(
    "q_win_ordinal",
    q_win_ordinal,
    "SELECT o_orderkey, CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS INT) AS seq_id "
    "FROM orders",
)
