"""Multimodal composition: the mapInPandas embedding stub feeding the
similarity operators end-to-end."""

from __future__ import annotations

from conftest import SF_DIR


def test_embed_media_feeds_ann(spark):
    """Binary -> embedding -> top-k composition: vectors are unit-norm,
    deterministic, and the query doc ranks itself first at sim 1.0."""
    from nba_pipeline_spark.multimodal.binary_ops import attach_binary, embed_media
    from nba_pipeline_spark.operators.similarity import brute_force_topk
    from nba_pipeline_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = attach_binary(load_table(spark, SF_DIR, "documents").limit(50), "text")
    emb = embed_media(docs).filter(F.col("embedding").isNotNull())
    norms = emb.select(
        F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)).alias("n")
    ).collect()
    assert all(abs(r["n"] - 1.0) < 1e-6 for r in norms)
    # deterministic across runs
    a = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    b = {r["doc_id"]: r["embedding"] for r in embed_media(docs).collect()}
    assert a == b
    query = emb.filter(F.col("doc_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    top = brute_force_topk(emb, query, "doc_id", "embedding", k=5).collect()
    assert top[0]["doc_id"] == 0 and abs(top[0]["sim"] - 1.0) < 1e-9
