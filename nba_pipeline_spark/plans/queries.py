"""Query registry: name -> (builder, oracle SQL).

Each builder takes (spark, sf_dir) and returns a DataFrame; the oracle
is the ANSI-SQL equivalent DuckDB runs on the same parquet tables.
Computed columns are aliased identically on both sides (the driver
sorts columns by name before hashing). Floating aggregates are rounded
on both sides so summation order can't flip the hash.

``oracle=None`` marks genuinely non-SQL-expressible ops (approx
sketches, streaming-only semantics) — the driver records a rows-only
check for those.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .flagship import FLAGSHIP_ORACLE, flagship

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name {name}")
    REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle)


register("q_flagship", flagship, FLAGSHIP_ORACLE)

# Populated by the operator query modules (import order defines registry order).
from . import relational_queries  # noqa: E402,F401
from . import join_agg_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import semi_structured_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import multimodal_queries  # noqa: E402,F401
from . import cdc_queries  # noqa: E402,F401
from . import corpus_queries  # noqa: E402,F401
from . import sql_queries  # noqa: E402,F401
from . import quality_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import breadth_queries  # noqa: E402,F401
from . import tpch_more_queries  # noqa: E402,F401
from . import scalar_breadth_queries  # noqa: E402,F401
from . import fold_profile_queries  # noqa: E402,F401
from . import lake_queries  # noqa: E402,F401


# The driver's per-round CORRECTNESS check records only the FIRST 50
# registry entries (dict order).  Rounds 1-3 cumulatively sampled 148
# distinct queries (relational/scalar/join/agg; windows/semi-
# structured/text/dedup/ANN/streaming/multimodal/CDC/corpus/quality;
# TPC-H/sketches/skew/graph/retrieval — r3 49/50 green, the one
# q_table_checksum hash miss fixed this round with an oracle-side
# BIGINT cast).  Round 4 rotates onto the 50 remaining DuckDB-oracled
# never-sampled queries: corpus/LLM-pipeline plans, SQL-surface
# breadth, quality gates, window/agg long tail, and the round-4
# q_dedup_cluster_star.  Deferred to round 5: q_orc_roundtrip (the
# round-trip family is driver-green via q_csv_roundtrip r1) and the
# six rows-only sketches/ML-path entries.  Names not present in the
# registry are skipped (lets the list reference queries added later
# in the round without import-order coupling); everything else keeps
# its original import order.
# ROUND-6 ROTATION (CORRECTNESS_r05 recorded the r5 window 50/50
# green, cutting at q_str_time; the union of r1-r5 windows covers the
# whole pre-round-6 registry).  Leading: the round-6 registrations
# (segment-skipping MERGE, row deletes CoW+MoR, change-feed consumer,
# quantized-ANN rerank, IVF-PQ index-as-table + incremental
# maintenance, replaceWhere, z-order, timestamp history, span dedup,
# bigram perplexity) so every query registered this round ships inside
# the r6 window per the round-5 protocol; then this session's planned
# registrations (skipped until their modules land).  Backfill to 50 =
# the oldest r1 greens whose r5 re-sample was cut by the 50-entry
# window (q_date_parts onward, original order).  Names not present in
# the registry are skipped; everything else keeps import order.
_PRIORITY: tuple[str, ...] = (
    # round-6 registrations already landed
    "q_manifest_merge_pruned",
    "q_manifest_delete",
    "q_manifest_delete_mor",
    "q_manifest_feed",
    "q_ann_quantized_rerank",
    "q_ann_ivf_quantized",
    "q_ann_ivf_incremental",
    "q_manifest_replace_where",
    "q_manifest_zorder",
    "q_manifest_history",
    "q_dedup_spans",
    "q_bigram_ppl",
    # round-6 session additions (skipped until registered)
    "q_bpe_train",
    "q_bpe_encode",
    "q_manifest_matview",
    "q_decontaminate_semantic",
    "q_manifest_restore",
    "q_manifest_clone",
    "q_manifest_constraints",
    "q_manifest_partition_evolution",
    "q_manifest_files",
    "q_manifest_stream",
    "q_manifest_zorder_partitioned",
    "q_manifest_zorder_incremental",
    "q_data_card",
    # backfill: r1 greens cut from the r5 window, original order
    "q_date_parts",
    "q_date_parse",
    "q_math",
    "q_surrogate_key",
    "q_regex_filter",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_sort",
    "q_limit",
    "q_topk",
    "q_partition_prune",
    "q_csv_roundtrip",
    "q_jsonl_roundtrip",
    "q_lookup_join",
    "q_join_inner",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_range",
    "q_join_asof",
    "q_join_interval_overlap",
    "q_join_full",
    "q_join_cross",
    "q_agg_global",
    "q_distinct",
    "q_agg_group",
    "q_agg_countdistinct",
    "q_rollup",
    "q_cube",
    "q_pivot",
    "q_win_running_sum",
    "q_win_ffill",
)


def _reorder_registry() -> None:
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
