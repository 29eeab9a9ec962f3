"""Iterative graph operators: connected components for near-dup
clustering (pairs -> clusters -> canonical doc), the final step of the
dedup stack the BASELINE north star calls for.

Scale notes (100 TB):
- Min-label propagation converges in O(graph diameter) rounds; near-dup
  clusters are shallow star/clique shapes (chains of transitive dups
  are short), so a handful of rounds suffices in practice. Each round
  is ONE shuffle join (edges x labels on src) plus ONE keyed
  min-aggregation on the node id — both partial-aggregated map-side.
- Lineage is cut every round with localCheckpoint; without it the
  Catalyst plan doubles per iteration and the optimizer may re-derive
  (and re-execute) earlier rounds.
- The symmetric edge list is checkpointed once up front because every
  round re-scans it.
- For adversarially deep graphs (long chains, e.g. web-link graphs, not
  dup pairs) switch to the large-star/small-star algorithm (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14), which
  converges in O(log^2 n) rounds with the same join+min primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph `edges` with the
    minimum node id reachable from it. Returns (node, comp). NULL
    endpoints are dropped (an edge to NULL identifies nothing —
    matches SQL equi-join semantics on the pair generators).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    e = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    e = e.localCheckpoint(eager=True)

    comp = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = e.join(comp, e["src"] == comp["node"]).select(
            e["dst"].alias("node"), F.col("comp")
        )
        new = (
            comp.union(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(comp.alias("c"), "node")
            .where(F.col("n.comp") != F.col("c.comp"))
            .limit(1)
            .count()
        )
        comp = new
        if changed == 0:
            break
    return comp


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Turn a near-dup pair list into clusters: (doc_id, cluster_id,
    cluster_size, keep) where cluster_id is the min doc id of the
    component and keep=1 marks the canonical survivor."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.col("cluster_size"),
        F.when(F.col("node") == F.col("comp"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("keep"),
    )
