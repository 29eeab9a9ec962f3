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


def test_chunk_binary_windows_and_tail(spark):
    """256-byte windows at stride 192: offsets advance by the stride,
    every full chunk is 256 bytes, the tail is short, and overlapping
    bytes mean consecutive chunks share content."""
    from pyspark.sql import functions as F

    from nba_pipeline_spark.multimodal.binary_ops import attach_binary, chunk_binary

    text = "x" * 500  # 500 utf-8 bytes
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_binary(
        attach_binary(df, "text"), "doc_id", "content", chunk_bytes=256, stride=192
    ).orderBy("chunk_idx")
    rows = out.collect()
    assert [r["offset"] for r in rows] == [1, 193, 385]
    assert [r["n_bytes"] for r in rows] == [256, 256, 116]
    # identical bytes everywhere -> identical hashes for same-size chunks
    assert rows[0]["chunk_hex_md5"] == rows[1]["chunk_hex_md5"]
    assert rows[0]["chunk_hex_md5"] != rows[2]["chunk_hex_md5"]


def test_resize_media_plumbing(spark):
    """Stubbed resize: fixed output byte budget per target dims, NULL
    payloads pass through, schema carries the new dimensions."""
    from nba_pipeline_spark.multimodal.binary_ops import attach_binary, resize_media

    df = spark.createDataFrame(
        [(1, "x" * 10), (2, None)], "doc_id long, text string"
    )
    out = resize_media(attach_binary(df, "text"), width=64, height=64).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id[1]["content"]) == (64 * 64) // 64
    assert by_id[1]["width"] == 64 and by_id[1]["height"] == 64
    assert by_id[2]["content"] is None
