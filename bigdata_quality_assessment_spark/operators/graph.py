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
  data-sized): the ALTERNATING large-star/small-star algorithm of
  Kiveris et al., "Connected Components in MapReduce and Beyond"
  (SoCC'14). Each half-round is one map-side-combined ``min``
  aggregation + one equi-join + a distinct, and — unlike plain
  min-label propagation, which re-shuffles the FULL edge list every
  round — the rewrites *shrink* the edge set toward disjoint stars
  rooted at each component's minimum id, so per-round shuffle bytes
  decay as components collapse. Converges in O(log² n) rounds
  worst-case (O(log n) observed); fixpoint is detected with a cheap
  count+hash checksum instead of a full set comparison. Lineage is
  cut per round with a lazy barrier so the plan does not grow across
  iterations (the classic iterative-Spark failure mode).
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

    Ids of ANY orderable type work (round-13): the alternating-stars
    tier is pure ``min``/``least``/``greatest`` Catalyst ops, so
    string ids (URLs, content hashes) close under LEXICOGRAPHIC min —
    the same "first id" order the span/substring dedup family
    documents. Under ``strategy="auto"`` non-integral ids route to
    that tier (the single-task tier is an int64 numpy closure),
    keeping the whole dedup family's any-id-type contract; an EXPLICIT
    ``strategy="single"`` with non-integral ids raises instead of
    silently substituting a different algorithm (round-14).
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
    integral = edges.schema["src"].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint"
    )
    if not integral:
        if strategy == "single":
            # the single-task tier is an int64 numpy closure; silently
            # handing back a different algorithm would defeat an
            # explicit tier request (round-14, ADVICE)
            raise ValueError(
                "strategy='single' requires integral ids (the single-task "
                "tier is an int64 numpy closure); got "
                f"{edges.schema['src'].dataType.simpleString()} ids — use "
                "strategy='auto' or 'iterative'"
            )
        strategy = "iterative"
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
    return _cc_alternating_stars(edges, max_iter)


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris large-star: for every node u with neighborhood Γ(u) and
    m = min(Γ(u) ∪ {u}), rewrite each edge to a LARGER neighbor v > u
    as (v, m). Keeps the canonical bigger-first orientation (v > u ≥ m)
    and strictly never grows the edge count."""
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("u", "mv").alias("m")
    )
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Kiveris small-star: per node u over its SMALLER neighbors
    Γ⁻(u) (all of them, given bigger-first orientation) with
    m = min(Γ⁻(u)), rewrite to (v, m) for v ∈ Γ⁻(u) \\ {m} plus
    (u, m). Bigger-first orientation is preserved (v > m, u > m)."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = mins.select("u", F.col("m").alias("v"))
    return rewired.union(centers).distinct()


def _cc_alternating_stars(edges: DataFrame, max_iter: int) -> DataFrame:
    """Distributed CC via alternating large-star/small-star rounds.
    At fixpoint the edge set is exactly the disjoint star forest
    {(child, component-min)}; labels fall out of one final left join
    against the full vertex set (covering roots, isolated self-loop
    vertices, and singletons alike)."""
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # canonical bigger-first undirected edge list, self-loops dropped
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # cheap fixpoint probe: count + two independent hash sums over
        # the canonical edge set (materializes the round's barrier)
        # bit_xor, not sum: ANSI mode overflows a long sum of hashes,
        # and the edge list is distinct so xor is a sound set signature
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h1"),
            F.coalesce(F.expr("bit_xor(hash(u, v))"), F.lit(0)).alias("h2"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h1"], sig_row["h2"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # star forest -> labels; vertices not appearing as a child (roots,
    # singletons from self-loop-only input) label themselves
    child_map = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return verts.join(child_map, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def duplicate_drop_ids(
    pairs: DataFrame, src_col: str = "doc_a", dst_col: str = "doc_b"
) -> DataFrame:
    """Ids to DROP under the cluster contract: every member of each
    connected duplicate component except the component minimum.
    Returns a single-column frame ``(id)`` (caller aliases to its own
    id column name)."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.filter(F.col("id") != F.col("component")).select("id")
