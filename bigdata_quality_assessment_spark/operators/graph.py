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

Scale shape — two tiers, auto-selected by edge count:

* **small** (the common case): the verified-duplicate edge list is a
  tiny fraction of the corpus, so ship it to ONE executor task and run
  vectorized numpy min-label propagation with pointer jumping (a
  whole-array union-find; O(E) memory, O(E·log D) work, zero driver
  collect). The edge frame sits behind a lazy checkpoint, so the
  sizing ``count()`` materializes the (possibly expensive) verify
  subtree exactly once and both the sizing and the closure reuse it.
* **iterative** (adversarial corpora whose duplicate graph is itself
  data-sized): distributed min-label propagation; each round is one
  equi-join + one map-side-combined ``min`` aggregation, plus a
  pointer-jumping (label-of-label) step so star- and chain-shaped
  clusters both close in O(log diameter) rounds. Lineage is cut per
  round with a lazy barrier so the plan does not grow across
  iterations (the classic iterative-Spark failure mode). This is the
  standard MapReduce-CC recipe (Kiveris et al., "Connected Components
  in MapReduce and Beyond") minus the large-star/small-star rewrite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many directed edges the single-task tier would concentrate
# too much data on one executor; fall back to distributed iteration.
# 20M edges ≈ 320 MB of (int64, int64) — comfortable for one task slot.
SMALL_EDGE_THRESHOLD = 20_000_000


def _cc_single_task(edges: DataFrame) -> DataFrame:
    """Whole-graph min-label closure in ONE executor task: vectorized
    numpy min-propagation + pointer jumping (``lab = lab[lab]``) until
    fixpoint. Converges in O(log diameter) passes, each O(E) vector
    ops — no per-edge Python loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(dtype=np.int64))
            dsts.append(pdf["dst"].to_numpy(dtype=np.int64))
        if not srcs:
            return
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        ids = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(ids, src)
        di = np.searchsorted(ids, dst)
        lab = np.arange(len(ids), dtype=np.int64)
        while True:
            old = lab
            lab = lab.copy()
            # undirected min exchange across every edge, then shortcut
            np.minimum.at(lab, si, lab[di])
            np.minimum.at(lab, di, lab[si])
            lab = lab[lab]
            if np.array_equal(lab, old):
                break
        # ids is sorted ascending, so the min label INDEX is the min id
        yield pd.DataFrame({"id": ids, "component": ids[lab]})

    return edges.repartition(1).mapInPandas(run, "id BIGINT, component BIGINT")


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    strategy: str = "auto",
    small_edge_threshold: int = SMALL_EDGE_THRESHOLD,
) -> DataFrame:
    """Label every vertex of the undirected ``pairs`` graph with the
    minimum id in its connected component. Returns ``(id, component)``
    for every vertex that appears in at least one edge.

    ``strategy``: ``"auto"`` (count the edge list — materialized once
    behind a lazy barrier — and pick), ``"single"`` (one-task numpy
    closure), or ``"iterative"`` (distributed min-label propagation +
    pointer jumping, early-exit on fixpoint).
    """
    if strategy not in ("auto", "single", "iterative"):
        raise ValueError(f"unknown strategy {strategy!r}")
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        # a null endpoint would surface as an opaque executor-side numpy
        # failure in the single-task tier; drop it here on the slim frame
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .localCheckpoint(eager=False)
    )
    if strategy == "auto":
        # tier on DISTINCT undirected edges so dup-heavy pair lists
        # (e.g. both (a,b) and (b,a) from a symmetric verify join) don't
        # spill small graphs into the slower iterative tier; the count
        # also materializes the lazy barrier exactly once.
        n_edges = (
            edges.select(
                F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
            )
            .distinct()
            .count()
        )
        strategy = "single" if n_edges <= small_edge_threshold else "iterative"
    if strategy == "single":
        return _cc_single_task(edges)

    und = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        neigh = (
            und.join(
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
