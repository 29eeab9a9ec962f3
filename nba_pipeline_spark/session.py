"""SparkSession factory + per-session tuning.

The driver hands us its own SparkSession for ``entry``/``queries``;
``tune(spark)`` applies the runtime-settable knobs idempotently so
results are deterministic regardless of who built the session.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Runtime-settable (safe to apply on a live session).
_RUNTIME_CONF = {
    # Deterministic timestamp semantics vs the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime re-plan, skew-join splitting, shuffle-partition coalesce.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (multimodal / edge ingest).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dims under this size broadcast automatically.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Right-size shuffles for local/bench; AQE coalesces batch shuffles
    # anyway, but STATEFUL streaming shuffles are not AQE-coalesced and
    # pay per-partition state-store overhead (200 default = 200 stores).
    "spark.sql.shuffle.partitions": "32",
    # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    # reader rejects; read as long and convert at the source boundary
    # (sources.registry normalizes back to TimestampType, micros).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The SQL-text expression twins (functions/vectors.py, operators/
    # bpe.py::_sql_str) escape string literals assuming the DEFAULT
    # parser mode (backslash IS an escape char). A driver-provided
    # Hive-compat session (escapedStringLiterals=true) would silently
    # change how \' and \\ parse — pin the mode the twins were
    # differential-tested under (ADVICE r12).
    "spark.sql.parser.escapedStringLiterals": "false",
}


# Sessions already tuned this process (r12, guide §1.2 fixed per-query
# overhead): every registered query calls tune() defensively, and each
# conf.set is a ~2 ms py4j round-trip — 12 keys × 2 runs × 108 headline
# queries ≈ seconds of pure driver chatter per bench run for values
# that never change after the first application. The memo is per
# PYTHON session object (WeakSet — a new/driver-provided session still
# tunes on first touch); anything that deliberately overrides a tuned
# key mid-session (the bench skew demo, conf-toggling tests) already
# saves and restores the value itself, which is the contract that made
# re-applying redundant. `retune` is the explicit escape hatch.
_TUNED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime conf to any session (driver-provided or ours).
    Idempotent and memoized: repeat calls on an already-tuned session
    are a set-membership check, not 12 py4j round-trips."""
    if spark in _TUNED:
        return spark
    any_ok = False
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
            any_ok = True
        except Exception:
            pass  # non-settable on this build — keep going
    # memoize only a tune that actually took (ADVICE r12): a session
    # where EVERY set raised (stopped/misbehaving) retries next call
    # instead of being permanently recorded as tuned
    if any_ok:
        _TUNED.add(spark)
    return spark


def retune(spark: SparkSession) -> SparkSession:
    """Force re-application of the runtime conf (drop the memo)."""
    _TUNED.discard(spark)
    return tune(spark)


def get_spark(app_name: str = "nba_pipeline_spark", cores: int | None = None) -> SparkSession:
    """Local session for tests/bench. Cluster deploys pass their own conf."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        # AQE advisory partition size stays at the 64MB default: smaller
        # targets (2m/8m) looked faster in isolated single-query probes
        # (warm-JVM artifact) but measured NEUTRAL-to-worse across the
        # full headline bench — more tasks just buys scheduler overhead
        # at ~100MB shuffle totals. Override per-run if needed:
        # --conf spark.sql.adaptive.advisoryPartitionSizeInBytes=...
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # keep managed-table data out of the repo; a stale spark-warehouse
        # dir from a previous session breaks saveAsTable(overwrite)
        .config("spark.sql.warehouse.dir", "/tmp/nba_spark_warehouse")
    )
    return tune(builder.getOrCreate())
