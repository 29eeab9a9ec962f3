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
# ROUND-5 ROTATION TODO (only after the driver records CORRECTNESS_r04
# for this window): promote the still-unsampled set — q_orc_roundtrip,
# the six rows-only entries (q_dedup_minhash_ml, q_semdedup_trained,
# q_kmeans_cells, q_multimodal_embed_ann, q_agg_hll_sketch,
# q_sketch_cms), and the round-4 registrations (q_dedup_keep_best,
# q_decontaminate_fuzzy, q_intradoc_dedup, q_token_budget,
# q_unicode_normalize, q_expectations) — then backfill to 50 with the
# oldest r1 greens as regression re-samples.
_PRIORITY: tuple[str, ...] = (
    # corpus / LLM-pipeline plans
    "q_paragraph_dedup",
    "q_mixture_sample",
    "q_tokenize_ids",
    "q_corpus_shuffle",
    "q_chunk_docs",
    "q_seq_pack",
    "q_split_assign",
    "q_dedup_cluster_star",
    # quality gates
    "q_pii_redact",
    "q_repetition_filter",
    "q_unigram_ppl",
    "q_quality_classifier",
    "q_decontaminate_bloom",
    # multimodal / streaming / CDC long tail
    "q_multimodal_frames",
    "q_stream_enrich",
    "q_mv_minmax_refresh",
    "q_cdc_time_travel",
    # SQL-surface breadth
    "q_sql_pricing_summary",
    "q_sql_grouping_sets",
    "q_sql_lateral_topn",
    "q_sql_scalar_subquery",
    "q_sql_pivot",
    "q_sql_unpivot",
    "q_sql_exists",
    "q_sql_not_in",
    "q_sql_recursive",
    # join / set-op long tail
    "q_join_full",
    "q_join_cross",
    "q_join_interval_overlap",
    "q_intersect_all",
    "q_except_all",
    # agg long tail
    "q_agg_unpivot",
    "q_agg_histogram",
    "q_agg_listagg",
    "q_agg_stats",
    "q_agg_argminmax",
    "q_agg_bool_bit",
    "q_basket_rules",
    # window / sessionization long tail
    "q_win_running_reset",
    "q_win_first_last",
    "q_win_distinct",
    "q_win_bfill",
    "q_win_range_frame",
    "q_win_nth_value",
    "q_interpolate",
    "q_sessionize",
    # scalar / generator long tail
    "q_date_trunc",
    "q_posexplode",
    "q_explode_outer",
    "q_regexp_extract_all",
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
