"""Similarity search over embedding columns (SURVEY.md §2.10 X4;
BASELINE north star: ANN).

Two paths:

- ``brute_force_topk``: exact cosine top-k against a query vector.
  The query vector rides along as a broadcast single-row frame; scoring
  is a narrow map (JVM higher-order fns); ``orderBy().limit(k)``
  compiles to TakeOrderedAndProject — per-partition top-k, k-row merge.
  At 100 TB this is one full scan, no shuffle: the right baseline.

- ``ivf_topk``: IVF-style two-stage ANN. Stage 1 assigns every vector
  to its nearest centroid (broadcast cross join over k centroids —
  narrow). Stage 2 searches only the query's cell (nprobe=1 here).
  With cells materialized as a ``partitionBy(cell)`` lake layout, the
  probe prunes to 1/k of the data — that's the scale path; centroids
  come from a proper k-means offline, here deterministically the first
  k vectors so the oracle can replay it.

Determinism contract for hash-compared results: order by the SCORE
ROUNDED to 6dp with the id as tiebreak, so last-bit float divergence
across engines cannot flip the top-k set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, l2_distance, to_double_array


def brute_force_topk(
    emb: DataFrame, query: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Exact top-k by cosine. ``query`` is a 1-row frame with ``qv``
    (array<double>); returns (id, sim rounded 4)."""
    scored = emb.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        F.round(cosine(to_double_array(F.col(vec_col)), F.col("qv")), 6).alias("sim6"),
    )
    return (
        scored.orderBy(F.desc("sim6"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round(F.col("sim6"), 4).alias("sim"))
    )


def assign_cells(emb: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast centroids, argmin by
    rounded L2 with centroid id tiebreak (engine-portable argmin)."""
    joined = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "dist6", F.round(l2_distance(F.col("v"), F.col("cv")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("dist6"), F.asc("cid"))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "v", "cid")
    )


def ivf_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_id, k: int, n_cells: int
) -> DataFrame:
    """IVF ANN with deterministic 'training': centroids = first n_cells
    vectors by id. Search probes only the query's cell."""
    e = emb.select(F.col(id_col), to_double_array(F.col(vec_col)).alias("v"))
    centroids = e.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv")
    )
    assigned = assign_cells(e, centroids, id_col)
    q = assigned.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv"), F.col("cid").alias("qcid")
    )
    cand = assigned.join(F.broadcast(q), F.col("cid") == F.col("qcid")).filter(
        F.col(id_col) != query_id
    )
    scored = cand.select(
        F.col(id_col), F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim6")
    )
    return (
        scored.orderBy(F.desc("sim6"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round(F.col("sim6"), 4).alias("sim"))
    )
