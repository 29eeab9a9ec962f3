"""Declarative data-quality expectations — the contract-check pass an
ingest pipeline runs before publishing a drop (the Delta Live Tables /
Great Expectations shape, engine-native).

One table scan evaluates EVERY row rule: each rule is a boolean Column
that must hold per row, violations are counted map-side into a single
aggregate row, then unpivoted to one row per rule. NULL rule results
count as violations (a rule that can't be evaluated did not pass —
matching SQL CHECK-constraint pragmatics would instead pass them;
callers opting into that wrap their rule in coalesce(rule, TRUE)).

Referential rules (FK orphans) need the dimension side, so they run as
a separate anti-join aggregate unioned into the report — still
O(fact + dim) with the dim side broadcastable.

Scale: the row-rule pass is ONE partial-agg'd scan regardless of rule
count (rules are columns of the same aggregate); the report is
O(rules) rows. Gate-on-failure is a driver-side decision over that
tiny frame, or `observe`-based for zero extra actions in streaming.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations, passed) — one scan, all rules."""
    if not rules:
        raise ValueError("expectations_report requires at least one rule")
    counts = df.agg(
        *[
            # outer coalesce: SUM over zero rows is NULL — an empty
            # table must report 0 violations / passed=1 (and match the
            # oracle's CASE), not a NULL the gate can't read
            F.coalesce(
                F.sum(
                    F.when(~F.coalesce(rule, F.lit(False)), 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias(f"__v_{name}")
            for name, rule in rules.items()
        ]
    )
    report = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"__v_{name}").alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.n_violations")
    return report.withColumn("passed", (F.col("n_violations") == 0).cast("int"))


def tag_violations(
    df: DataFrame, rules: dict[str, Column], tag_col: str = "failed_rules"
) -> DataFrame:
    """Per-row rule tags: `tag_col` = array of the rule names this row
    violates, in rule (dict) order — deterministic, so the tag column
    is hashable cross-engine. One projection, no shuffle."""
    if not rules:
        raise ValueError("tag_violations requires at least one rule")
    tags = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
                for name, rule in rules.items()
            ]
        )
    )
    return df.withColumn(tag_col, tags)


def split_quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(passed, quarantined): rows violating no rule vs rows violating
    at least one, the latter carrying their `failed_rules` tags — the
    dual-channel publish gate that replaces swallow-and-continue error
    handling (reference: the try/except-continue at games.py:21-27
    silently drops bad rows; a quarantine channel keeps them auditable
    and replayable)."""
    tagged = tag_violations(df, rules)
    passed = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = tagged.filter(F.size("failed_rules") > 0)
    return passed, quarantined


def publish_with_quarantine(
    df: DataFrame,
    rules: dict[str, Column],
    lake_path: str,
    quarantine_path: str,
    lake_writer=None,
) -> dict[str, int]:
    """Gate + dual-sink + report off ONE source scan: tag, persist the
    tagged frame (so the source is read once, not three times), write
    pass rows to the lake and fail rows (with rule tags) to quarantine,
    and return {rule: n_violations, "__passed": n, "__quarantined": n}.

    `lake_writer(passed_df) -> version | None` overrides the pass-side
    sink (e.g. a manifest-lake `commit_append` for an atomic,
    time-travelable publish — the CLI's --manifest path); a returned
    version lands in the report as "__lake_version". On that path the
    pass side ACCUMULATES across publishes, so the quarantine side must
    too: fail rows land in a per-run ``run=<lake version>`` subdir
    (key=value layout — a parquet read of `quarantine_path` surfaces
    `run` as a partition column for auditing), never overwriting
    earlier runs' rejects. A REPLAYED publish (idempotency-tagged
    commit_append returning the already-committed version) rewrites
    its own run's subdir only — idempotent, still no cross-run loss.

    Scale: the persist holds only the batch being published (ingest
    granularity, not the corpus); both writes and the report reuse it.
    Works unchanged as a foreachBatch body — paths become
    ``.../batch=<id>`` for the replay-idempotent layout."""
    tagged = tag_violations(df, rules).persist()
    try:
        passed = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
        quarantined = tagged.filter(F.size("failed_rules") > 0)
        version = None
        if lake_writer is not None:
            version = lake_writer(passed)
            run = version if version is not None else uuid.uuid4().hex[:12]
            quarantined.write.mode("overwrite").parquet(
                f"{quarantine_path}/run={run}"
            )
        else:
            # single-drop publish: both sides replace wholesale
            passed.write.mode("overwrite").parquet(lake_path)
            quarantined.write.mode("overwrite").parquet(quarantine_path)
        counts = {
            r["rule"]: r["n"]
            for r in quarantined.select(
                F.explode("failed_rules").alias("rule")
            )
            .groupBy("rule")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        report = {name: int(counts.get(name, 0)) for name in rules}
        report["__quarantined"] = quarantined.count()
        report["__passed"] = passed.count()
        if version is not None:
            report["__lake_version"] = version
        return report
    finally:
        tagged.unpersist()


def fk_orphans(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, rule: str
) -> DataFrame:
    """Referential expectation: fact rows whose key misses the dim —
    one anti join + count, same report schema as expectations_report."""
    orphans = fact.join(
        dim, fact[fact_key] == dim[dim_key], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_violations"))
    return orphans.select(
        F.lit(rule).alias("rule"),
        F.col("n_violations"),
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )
