"""Multimodal plumbing queries (binary columns + mapInPandas decode stub).

The fake decode is arithmetic on byte length, so DuckDB can replay it —
proving the Arrow batch plumbing delivers exactly the declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..multimodal.binary_ops import (
    attach_binary,
    embed_media,
    extract_media_features,
    sample_frames,
)
from ..operators.similarity import brute_force_topk
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


def q_multimodal_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal -> similarity composition: binary payloads through the
    mapInPandas embedding stub, then exact cosine top-10 against doc 0's
    vector. Rows-only (the stub embedding is a byte histogram — not
    replayable in portable SQL for non-ASCII payloads), but the pytest
    asserts unit norms, determinism, and the self-hit at sim 1.0."""
    emb = embed_media(_bin_docs(spark, sf_dir)).filter(F.col("embedding").isNotNull())
    query = emb.filter(F.col("doc_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    return brute_force_topk(emb, query, "doc_id", "embedding", k=10)


register("q_multimodal_embed_ann", q_multimodal_embed_ann, None)


def q_multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping byte-window chunking of binary payloads (audio/video
    window prep) — fully JVM-side (sequence/posexplode/substring on the
    binary column), so unlike the decode stages it carries an exact
    oracle. Oracle notes: DuckDB can't substring BLOBs and reserves
    `offset` as a keyword, so both engines hash the HEX of each chunk
    (hex is uppercase on both) and the column is byte_off."""
    from ..multimodal.binary_ops import attach_binary, chunk_binary

    tune(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    wrapped = attach_binary(docs, "text", modality="audio")
    out = chunk_binary(wrapped, "doc_id", "content", chunk_bytes=256, stride=192)
    return out.select(
        "doc_id",
        "chunk_idx",
        F.col("offset").alias("byte_off"),
        "n_bytes",
        "chunk_hex_md5",
    )


register(
    "q_multimodal_chunks",
    q_multimodal_chunks,
    """
    WITH b AS (SELECT doc_id, hex(encode(text)) AS h FROM documents
               WHERE text IS NOT NULL),
    raw AS (
      SELECT doc_id, h,
             unnest(generate_series(1,
               CAST(ceil(greatest(length(h) / 2, 1) / 192.0) AS BIGINT))) AS o
      FROM b
    )
    SELECT doc_id,
           CAST(o - 1 AS INT) AS chunk_idx,
           CAST(1 + (o - 1) * 192 AS BIGINT) AS byte_off,
           CAST(length(substr(h, 1 + (o - 1) * 384, 512)) / 2 AS BIGINT) AS n_bytes,
           md5(substr(h, 1 + (o - 1) * 384, 512)) AS chunk_hex_md5
    FROM raw
    """,
)
