"""Connected-components closure for duplicate clustering.

The near-dedup families (MinHash-LSH / SimHash / embedding-LSH) verify
*pairs*. Dropping only the higher member of each direct pair leaves
transitive chains behind: for verified edges (1,3),(2,3) with no (1,2)
edge, doc 2 survives although it sits in doc 1's duplicate cluster.
The corpus-dedup contract is per-CLUSTER: keep exactly the minimum id
of every connected component of the verified-pair graph. This extends
the reference's T5 exact dedup
(/root/reference/SDE_forecast_ActiveSampling.py:134-135) from
equality-clusters to similarity-clusters.

Scale shape: the edge set is duplicates-only — a small fraction of the
corpus in any real workload — and every frame here is ``(BIGINT,
BIGINT)``. Min-label propagation converges in O(cluster diameter)
rounds; each round is one equi-join + one map-side-combined ``min``
aggregation, and a pointer-jumping (label-of-label) step halves the
remaining diameter so star-shaped AND chain-shaped clusters both close
in a handful of rounds. Lineage is cut per round with a lazy barrier,
so the plan does not grow exponentially across iterations (the classic
iterative-Spark failure mode). For adversarial corpora whose duplicate
graph itself is data-sized, the same loop is the standard
MapReduce-CC recipe (Kiveris et al., "Connected Components in
MapReduce and Beyond") minus the large-star/small-star rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected ``pairs`` graph with the
    minimum id in its connected component. Returns ``(id, component)``
    for every vertex that appears in at least one edge.

    Min-label propagation + pointer jumping, early-exit on fixpoint:
    each round sets ``label(v) = min(label(v), min over neighbors u of
    label(u))`` and then shortcuts ``label(v) = label(label(v))``.
    """
    edges = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("component").alias("__nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("__nl").alias("__minl"))
        )
        stepped = labels.join(
            neigh.select(F.col("src").alias("id"), "__minl"), "id", "left"
        ).select(
            "id",
            F.least(F.col("component"), F.coalesce(F.col("__minl"), F.col("component"))).alias(
                "component"
            ),
        )
        # pointer jumping: component <- component's own label, halving
        # chain depth every round (chains close in O(log n) not O(n)).
        jumped = (
            stepped.join(
                stepped.select(
                    F.col("id").alias("component"), F.col("component").alias("__jl")
                ),
                "component",
                "left",
            )
            .select("id", F.coalesce("__jl", "component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.join(labels.select("id", F.col("component").alias("__old")), "id")
            .filter(F.col("component") != F.col("__old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("id", "component")


def duplicate_drop_ids(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """Ids to DROP under the cluster contract: every member of each
    connected duplicate component except the component minimum.
    Returns a single-column frame ``(id)`` (caller aliases to its own
    id column name)."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.filter(F.col("id") != F.col("component")).select("id")
