"""Multimodal plumbing queries (binary columns + mapInPandas decode stub).

The fake decode is arithmetic on byte length, so DuckDB can replay it —
proving the Arrow batch plumbing delivers exactly the declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal.binary_ops import attach_binary, extract_media_features, sample_frames
from ..sources import load_table
from ..session import tune
from .queries import register


def _bin_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return attach_binary(load_table(spark, sf_dir, "documents"), "text")


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_features(_bin_docs(spark, sf_dir))


register(
    "q_multimodal_meta",
    q_multimodal_meta,
    """
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           CAST(64 + n % 512 AS INT) AS width,
           CAST(64 + (n // 7) % 512 AS INT) AS height,
           CAST(1 + n % 30 AS INT) AS n_frames
    FROM b
    """,
)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_bin_docs(spark, sf_dir), "doc_id", every_nth=10)


register(
    "q_multimodal_frames",
    q_multimodal_frames,
    """
    WITH b AS (SELECT doc_id, 1 + octet_length(encode(text)) % 30 AS n_frames FROM documents)
    SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx FROM b
    """,
)
