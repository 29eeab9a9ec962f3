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


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
