"""Partition-shape helpers.

`fan_out` rescues the "tiny scan, heavy projection" shape: a corpus
that fits in one parquet row group arrives as ONE scan partition, so a
compute-bound projection (minhash signatures, per-pair cosine) runs on
a single core no matter how many executors exist. Splitting by
`spark.sql.files.maxPartitionBytes` can't help — a row group is the
atomic read unit — so the fix is an explicit round-robin repartition.

Guarded so it is a no-op at scale: a 100 TB scan already has thousands
of partitions (> defaultParallelism), and an unconditional repartition
there would shuffle the whole corpus for nothing. The explicit
numPartitions also means AQE will NOT coalesce it back down (AQE only
coalesces its own shuffle outputs, byte-sized — which is exactly how
the single-task plans happened: 600 KB of docs coalesce to 1 partition
even when each row costs milliseconds of compute downstream).

The probe is Catalyst's own cost-model size (optimizedPlan stats), not
``df.rdd.getNumPartitions()`` — the RDD conversion forced a second
full plan analysis + physical planning per guarded query build. Stats
come from the same plan object the query will execute, so reading them
is free, and for the scan-shaped frames this guard runs on (every call
site is a fresh parquet load) sizeInBytes is the exact on-disk size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Catalyst's "unknown size" default is Long.MaxValue-ish (8 EB); any
# estimate at or beyond this means "no stats — assume big" and the
# fan_out guard must treat it as already-parallel (no-op), which is
# also the safe direction at scale.
_UNKNOWN_SIZE = 1 << 62


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated output size of `df` in bytes (on-disk size
    for parquet scans; conservative propagation elsewhere). Reads the
    already-analyzed plan — no job, no RDD conversion."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def _bytes_conf(df: DataFrame, key: str, default: int) -> int:
    raw = df.sparkSession.conf.get(key, str(default))
    s = raw.strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return default


def under_parallelized(df: DataFrame, min_parts: int | None = None) -> bool:
    """True when the scan is estimated to yield fewer partitions than
    the cluster can run in parallel — the trigger for `fan_out` and for
    pinning computed projections against filter push-through (see
    plans/corpus_queries.py). Estimate = plan size / maxPartitionBytes
    (the split rule FileSourceScan itself uses, modulo row-group
    rounding — close enough for a greater/less-than-parallelism test)."""
    size = plan_size_bytes(df)
    if size >= _UNKNOWN_SIZE:
        return False  # no stats: assume big, never shuffle on a guess
    max_part = _bytes_conf(df, "spark.sql.files.maxPartitionBytes", 128 << 20)
    est_parts = max(1, (size + max_part - 1) // max_part)
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    return est_parts < target


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up to `min_parts` (default: defaultParallelism) when
    the current plan has fewer partitions; unchanged otherwise."""
    if not under_parallelized(df, min_parts):
        return df
    return df.repartition(
        min_parts or df.sparkSession.sparkContext.defaultParallelism
    )


# --- iterative-loop fan-in (r13, guide §1.2/§2.2) --------------------------
#
# The iterative operators (star-CC, min-label CC, pagerank, BPE train)
# run a driver-sequential loop of TINY per-round jobs at convergence
# scale: the round frames are KB-sized and AQE already coalesces every
# shuffle to 1 partition, so the wall-clock cost is pure scheduling —
# adaptive execution materializes each Exchange as its OWN job (3-4
# stage jobs + broadcast jobs + the action per round; one star-CC run
# measured 49 jobs at sf0.1). When a round frame is PROVABLY tiny (the
# loops already count rows every round for convergence), running the
# loop non-adaptively on one shuffle partition collapses each round to
# one job with the same 1-task parallelism AQE was choosing anyway
# (measured 1.37-1.52x on the three loop queries at sf0.1).
#
# Scale safety: the guard fires only below `narrow_rows_max(spark)`
# rows (default 100k — a few MB of edge/rank/word rows; conf-
# overridable per deploy). A 100 TB graph or vocabulary never trips it,
# so the wide adaptive path is untouched where parallelism matters, and
# the toggle saves/restores the session conf so nothing leaks.

_NARROW_ROWS_CONF = "spark.nba_pipeline.iterative.narrowRowsMax"
_NARROW_ROWS_DEFAULT = 100_000


def narrow_rows_max(spark) -> int:
    """Row threshold under which an iterative loop's rounds run
    non-adaptively on one shuffle partition."""
    try:
        return int(spark.conf.get(_NARROW_ROWS_CONF, str(_NARROW_ROWS_DEFAULT)))
    except ValueError:
        return _NARROW_ROWS_DEFAULT


class narrow_rounds:
    """Context manager: run the enclosed (provably tiny) loop actions
    with adaptive execution OFF and one shuffle partition, restoring
    the prior conf on exit. ``narrow_rounds(spark, rows)`` is a no-op
    when ``rows`` is at or above ``narrow_rows_max(spark)`` — the
    at-scale path keeps AQE and full shuffle width."""

    _KEYS = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")

    def __init__(self, spark, rows: int):
        self._spark = spark
        self._active = 0 <= rows < narrow_rows_max(spark)
        self._saved: dict[str, str | None] = {}

    def __enter__(self):
        if not self._active:
            return self
        for k in self._KEYS:
            try:
                self._saved[k] = self._spark.conf.get(k)
            except Exception:
                self._saved[k] = None
        self._spark.conf.set("spark.sql.adaptive.enabled", "false")
        self._spark.conf.set("spark.sql.shuffle.partitions", "1")
        return self

    def __exit__(self, *exc):
        for k, v in self._saved.items():
            if v is None:
                try:
                    self._spark.conf.unset(k)
                except Exception:
                    pass
            else:
                self._spark.conf.set(k, v)
        return False

    @property
    def active(self) -> bool:
        return self._active
