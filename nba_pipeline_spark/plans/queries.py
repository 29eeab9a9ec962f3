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
# ROUND-5 ROTATION (executed; CORRECTNESS_r04 recorded the r4 window
# 50/50 green): the window now covers every entry that has never had —
# or whose fix has never re-had — a driver row.  Leading: the round-3
# q_table_checksum oracle-cast fix re-sample, q_orc_roundtrip, the
# seven round-4 registrations, the six rows-only sketch/ML entries plus
# the four rows-only sampling re-records, then the round-5
# registrations (manifest lake time-travel, expectations quarantine,
# streaming token tallies).  Backfill to 50 = the oldest r1 greens in
# their original order as regression re-samples.  Names not present in
# the registry are skipped (round-5 names can appear here before their
# module lands); everything else keeps its original import order.
_PRIORITY: tuple[str, ...] = (
    # never/not-re-confirmed: the hard-signal gap from VERDICT r4
    "q_table_checksum",
    "q_orc_roundtrip",
    "q_decontaminate_fuzzy",
    "q_intradoc_dedup",
    "q_token_budget",
    "q_unicode_normalize",
    "q_dedup_keep_best",
    "q_expectations",
    "q_curriculum_order",
    # rows-only entries: first driver rows-only record
    "q_dedup_minhash_ml",
    "q_semdedup_trained",
    "q_kmeans_cells",
    "q_multimodal_embed_ann",
    "q_agg_hll_sketch",
    "q_sketch_cms",
    "q_sample",
    "q_sample_stratified",
    "q_agg_approx_distinct",
    "q_agg_approx_percentile",
    # round-5 registrations (skipped until their modules land)
    "q_manifest_snapshot",
    "q_manifest_time_travel",
    "q_expectations_quarantine",
    "q_quarantine_rows",
    "q_stream_token_tally",
    "q_manifest_compact_read",
    "q_manifest_upsert",
    "q_manifest_schema_evolution",
    "q_dedup_containment",
    "q_tfidf_keywords",
    "q_inverted_index",
    "q_dedup_containment_full",
    "q_embed_quantize",
    "q_manifest_pruned_read",
    "q_ann_quantized",
    "q_manifest_diff",
    "q_manifest_bloom_read",
    # backfill: oldest r1 greens, original order (driver keeps first 50)
    "q_flagship",
    "q_project_rename",
    "q_with_literal",
    "q_struct_flatten",
    "q_filter_basic",
    "q_filter_null",
    "q_filter_isin",
    "q_filter_or",
    "q_filter_split",
    "q_filter_trycast",
    "q_case_when",
    "q_trycast_case",
    "q_str_split",
    "q_str_time",
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
