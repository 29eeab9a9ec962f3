"""Incremental materialized-view maintenance from the manifest lake's
change data feed.

Classic delta-based IVM for distributive aggregates (count / sum —
avg derives as sum/count at read time): each source commit's valued
CDF delta (``snapshot_diff(include_values=True)``) is folded into the
MV by RETRACTING the old row's contribution and ADDING the new one,
so updates that move a row between groups debit one group and credit
the other. Groups whose count reaches zero leave the view.

Reference parity: the reference recomputes its warehouse tables from
scratch per DAG run (gcs_to_bq_dag.py:6's load-replaces-table shape);
this is the incremental form a 100 TB lake needs — per refresh it
reads O(delta) + O(MV), never the source table.

Scale shape: the delta contribution is one partial-agg'd groupBy over
the CDF delta (O(changes) rows); the fold is a null-safe full-outer
join of the group-cardinality MV against the delta groups (AQE
broadcasts the small side); the publish is a `commit_replace` of the
group-cardinality view with an ``mv=<version>`` idempotency tag —
combined with `consume_feed`'s checkpointed high-water version the
pipeline is exactly-once under any crash/replay (the redelivered
version's tag is already in the MV lake's manifest, so the replayed
publish is a no-op). For a view too large to rewrite per refresh,
partition it and land the fold with `commit_upsert_partitioned`; the
delta computation is identical.

Determinism: counts and integer sums are exact; for float measures
sum through DECIMAL so fold order can't change the result (SCALE.md
"Numeric determinism").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import manifest as M


def delta_contributions(
    delta: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Per-group aggregate deltas from one valued CDF delta: inserts
    and the new side of updates contribute +1 / +value under the NEW
    row's group; deletes and the old side of updates contribute
    -1 / -value under the OLD row's group. Group columns that are part
    of the source key stay top-level in the delta and are identical on
    both sides; value-group columns resolve through the old/new
    structs."""

    def side(struct: str, ops: list[str], w: int) -> DataFrame:
        return delta.filter(F.col("op").isin(*ops)).select(
            *[
                (
                    F.col(g) if g in delta.columns else F.col(f"{struct}.{g}")
                ).alias(g)
                for g in group_cols
            ],
            F.lit(w).alias("__w"),
            *[F.col(f"{struct}.{c}").alias(c) for c in sum_cols],
        )

    plus = side("new", ["insert", "update"], 1)
    minus = side("old", ["update", "delete"], -1)
    return (
        plus.unionByName(minus)
        .groupBy(*group_cols)
        .agg(
            F.sum("__w").cast("bigint").alias("d_cnt"),
            *[
                F.sum(F.col(c) * F.col("__w")).alias(f"d_sum_{c}")
                for c in sum_cols
            ],
        )
    )


def _mv_schema(d: DataFrame, group_cols: list[str],
               sum_cols: list[str]) -> T.StructType:
    """Empty-MV schema derived from the delta-contribution frame, so
    sum columns carry the AGGREGATED type (long for ints, widened
    decimal for decimals) — never the narrower source-column type."""
    return T.StructType(
        [d.schema[g] for g in group_cols]
        + [T.StructField("cnt", T.LongType())]
        + [
            T.StructField(f"sum_{c}", d.schema[f"d_sum_{c}"].dataType)
            for c in sum_cols
        ]
    )


def fold_delta(mv: DataFrame, d: DataFrame, group_cols: list[str],
               sum_cols: list[str]) -> DataFrame:
    """Fold per-group deltas into the current MV state (null-safe
    full-outer on the group key — NULL groups are groups too), keeping
    groups with a live row count."""
    cond = None
    for g in group_cols:
        c = mv[g].eqNullSafe(d[g])
        cond = c if cond is None else (cond & c)
    j = mv.join(d, cond, "full_outer")
    out_groups = [F.coalesce(mv[g], d[g]).alias(g) for g in group_cols]
    cnt = (
        F.coalesce(mv["cnt"], F.lit(0)) + F.coalesce(d["d_cnt"], F.lit(0))
    ).alias("cnt")
    sums = [
        (
            F.coalesce(mv[f"sum_{c}"], F.lit(0))
            + F.coalesce(d[f"d_sum_{c}"], F.lit(0))
        )
        .cast(mv.schema[f"sum_{c}"].dataType)
        .alias(f"sum_{c}")
        for c in sum_cols
    ]
    return j.select(*out_groups, cnt, *sums).filter(F.col("cnt") > 0)


def matview_sink(
    spark: SparkSession,
    mv_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    target_files: int | None = None,
):
    """``process`` function for `consume_feed(include_values=True)`
    that maintains a count/sum MV in its own manifest lake. Publishes
    with the ``mv=<version>`` idempotency tag — replays are no-ops."""

    def _apply(delta: DataFrame, version: int) -> None:
        d = delta_contributions(delta, group_cols, sum_cols)
        cur = M.current_version(spark, mv_path)
        if cur is None:
            mv = spark.createDataFrame([], _mv_schema(d, group_cols, sum_cols))
        else:
            mv = M.read_snapshot(spark, mv_path)
        folded = fold_delta(mv, d, group_cols, sum_cols)
        M.commit_replace(
            spark, mv_path, folded, target_files=target_files,
            tag=f"mv={version}",
        )

    return _apply


def maintain_matview(
    spark: SparkSession,
    src_path: str,
    src_keys: list[str],
    mv_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    state_path: str,
    target_files: int | None = None,
) -> int:
    """Advance the MV at `mv_path` over every unconsumed commit of the
    source lake; returns versions processed. Safe to call repeatedly /
    concurrently-with-crashes: the high-water checkpoint + tagged
    publishes make each source version fold exactly once."""
    return M.consume_feed(
        spark,
        src_path,
        src_keys,
        state_path,
        matview_sink(spark, mv_path, group_cols, sum_cols, target_files),
        include_values=True,
    )
