"""Similarity-search queries over the embeddings table (X4/ANN)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import to_double_array
from ..operators import similarity as SIM
from ..sources import load_table
from ..session import tune
from .queries import register


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "embeddings")


QUERY_ID = 0
TOP_K = 10
N_CELLS = 8


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    query = emb.filter(F.col("vec_id") == QUERY_ID).select(
        to_double_array(F.col("embedding")).alias("qv")
    )
    others = emb.filter(F.col("vec_id") != QUERY_ID)
    return SIM.brute_force_topk(others, query, "vec_id", "embedding", TOP_K)


register(
    "q_cosine_topk",
    q_cosine_topk,
    f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_ID}),
    scored AS (
      SELECT vec_id,
             ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS sim6
      FROM embeddings, q WHERE vec_id <> {QUERY_ID})
    SELECT vec_id, ROUND(sim6, 4) AS sim FROM scored
    ORDER BY sim6 DESC NULLS LAST, vec_id ASC NULLS FIRST LIMIT {TOP_K}
    """,
)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.ivf_topk(_emb(spark, sf_dir), "vec_id", "embedding", QUERY_ID, TOP_K, N_CELLS)


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-means cell assignment (rows-only: 5 iterations of
    float averaging aren't SQL-replayable bit-for-bit)."""
    return SIM.kmeans_cells(_emb(spark, sf_dir), "vec_id", "embedding", k=N_CELLS)


register("q_kmeans_cells", q_kmeans_cells, None)


register(
    "q_ann_ivf",
    q_ann_ivf,
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {N_CELLS}),
    asg AS (
      SELECT vec_id, v, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY ROUND(list_distance(v, cv), 6) ASC NULLS FIRST, cid ASC NULLS FIRST) AS rn
      FROM e CROSS JOIN c),
    cells AS (SELECT vec_id, v, cid FROM asg WHERE rn = 1),
    q AS (SELECT v AS qv, cid AS qcid FROM cells WHERE vec_id = {QUERY_ID}),
    cand AS (
      SELECT cells.vec_id,
             ROUND(list_cosine_similarity(cells.v, q.qv), 6) AS sim6
      FROM cells, q WHERE cells.cid = q.qcid AND cells.vec_id <> {QUERY_ID})
    SELECT vec_id, ROUND(sim6, 4) AS sim FROM cand
    ORDER BY sim6 DESC NULLS LAST, vec_id ASC NULLS FIRST LIMIT {TOP_K}
    """,
)


N_BITS = 4
DIMS = 64


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH ANN (see operators.similarity.lsh_topk):
    training-free bucketing twin of q_ann_ivf."""
    return SIM.lsh_topk(
        _emb(spark, sf_dir), "vec_id", "embedding", QUERY_ID, TOP_K, N_BITS, DIMS
    )


def _planes_sql() -> str:
    rows = []
    for b, plane in enumerate(SIM.hyperplane_planes(N_BITS, DIMS)):
        arr = ",".join(str(x) for x in plane)
        rows.append(f"({b}, CAST([{arr}] AS DOUBLE[]))")
    return ", ".join(rows)


register(
    "q_ann_lsh",
    q_ann_lsh,
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT * FROM (VALUES {_planes_sql()}) AS t(b, plane)),
    bk AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN ROUND(list_dot_product(v, plane), 6) >= 0
                           THEN (1 << b) ELSE 0 END) AS INT) AS bucket
      FROM e CROSS JOIN p GROUP BY vec_id),
    eb AS (SELECT e.vec_id, v, bucket FROM e JOIN bk USING (vec_id)),
    q AS (SELECT v AS qv, bucket AS qb FROM eb WHERE vec_id = {QUERY_ID}),
    cand AS (
      SELECT eb.vec_id, ROUND(list_cosine_similarity(eb.v, q.qv), 6) AS sim6
      FROM eb, q WHERE eb.bucket = q.qb AND eb.vec_id <> {QUERY_ID})
    SELECT vec_id, ROUND(sim6, 4) AS sim FROM cand
    ORDER BY sim6 DESC NULLS LAST, vec_id ASC NULLS FIRST LIMIT {TOP_K}
    """,
)


# --- batch k-NN join (query set, not a single probe) --------------------------

KNN_QUERIES, KNN_K = 5, 5


def _knn_queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact batch k-NN join: broadcast the query set, one corpus scan,
    per-query top-k window (operators/similarity.py::knn_join)."""
    emb = _emb(spark, sf_dir)
    return SIM.knn_join(emb, _knn_queries(emb), "vec_id", "embedding", KNN_K, dims=64)


def q_knn_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed batch k-NN join: both sides sign-LSH-bucketed, pair
    space = the bucket equi-join — the plan that survives query sets
    too big to broadcast."""
    emb = _emb(spark, sf_dir)
    return SIM.knn_join(
        emb, _knn_queries(emb), "vec_id", "embedding", KNN_K, n_bits=N_BITS, dims=DIMS
    )


_KNN_SCORE = """
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim6
      FROM e {join} q
      {where} e.vec_id <> q.query_id
"""

register(
    "q_knn_join",
    q_knn_join,
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < {KNN_QUERIES}),
    scored AS ({_KNN_SCORE.format(join=",", where="WHERE")}),
    ranked AS (
      SELECT query_id, vec_id, sim6,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim6 DESC NULLS LAST,
                                         vec_id ASC NULLS FIRST) AS rk
      FROM scored)
    SELECT query_id, vec_id, ROUND(sim6, 4) AS sim, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {KNN_K}
    """,
)


def _knn_lsh_oracle() -> str:
    planes_sql = _planes_sql()
    return f"""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (SELECT * FROM (VALUES {planes_sql}) AS t(b, plane)),
    bk AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN ROUND(list_dot_product(v, plane), 6) >= 0
                           THEN (1 << b) ELSE 0 END) AS INT) AS bucket
      FROM e0 CROSS JOIN p GROUP BY vec_id),
    e AS (SELECT e0.vec_id, v, bucket FROM e0 JOIN bk USING (vec_id)),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket
          FROM e WHERE vec_id < {KNN_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(e.v, q.qv), 6) AS sim6
      FROM e JOIN q USING (bucket)
      WHERE e.vec_id <> q.query_id),
    ranked AS (
      SELECT query_id, vec_id, sim6,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim6 DESC NULLS LAST,
                                         vec_id ASC NULLS FIRST) AS rk
      FROM scored)
    SELECT query_id, vec_id, ROUND(sim6, 4) AS sim, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {KNN_K}
    """


register("q_knn_join_lsh", q_knn_join_lsh, _knn_lsh_oracle())
