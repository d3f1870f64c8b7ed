"""Mergeable frequency sketches: distributed heavy-hitters with
bounded memory (engine extension; complements the HLL/KLL sketches in
operators/profiling.py).

``frequent_items`` is the distributed Misra-Gries / SpaceSaving
summary (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
PODS 2012): each input slice keeps at most ``capacity`` counters, the
per-slice summaries are unioned and summed per item, and the top
candidates are returned with DETERMINISTIC error bounds:

    true_count - total_rows/capacity  <=  est_count  <=  true_count

so every item with true frequency > n/capacity is GUARANTEED present
(the classic heavy-hitters contract), and reported counts
under-estimate by at most the summed per-slice admission thresholds.

Spark shape: one ``mapInPandas`` pass emits <= capacity rows per Arrow
batch (the summary — kilobytes), a groupBy-sum over those summary rows
(map-side combined, cardinality <= capacity x batches), one top-k.
The data itself is never shuffled — this is the operator to reach for
when ``groupBy(col).count()`` would shuffle a 100 TB column whose
distinct cardinality is data-sized but only the head matters (domain
counts, user-agent strings, hot tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_summarize(values, capacity: int) -> dict:
    """Misra-Gries over an iterable: at most ``capacity`` counters;
    when full, decrement all (implicitly, via the admission debt).
    Returns item -> lower-bound count."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all step, dropping zeros
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-k most frequent values of ``col`` with bounded
    memory. Returns ``(item, est_count, max_error)`` ranked by
    ``est_count`` desc — ``est_count`` is a LOWER bound on the true
    count and ``est_count + max_error`` an upper bound; any value
    whose true count exceeds ``total_rows / capacity`` is guaranteed
    to appear among the candidates. Nulls are ignored.

    ``capacity`` is the per-slice counter budget (memory is
    O(capacity) per task regardless of input size); ``k <= capacity``
    is the returned head."""
    if k > capacity:
        raise ValueError("k must be <= capacity")
    in_type = df.schema[col].dataType
    schema = T.StructType(
        [
            T.StructField("item", in_type),
            T.StructField("est_count", T.LongType()),
            T.StructField("slice_rows", T.LongType()),
        ]
    )

    def summarize(batches):
        import pandas as pd

        for pdf in batches:
            vals = pdf[col].dropna()
            counters = _mg_summarize(vals, capacity)
            # one MARKER row per slice (item = null) carries the slice
            # size, so the global error bound can be computed without
            # re-scanning the data
            yield pd.DataFrame(
                {
                    "item": pd.Series(
                        list(counters.keys()) + [None], dtype=object
                    ),
                    "est_count": pd.Series(
                        list(counters.values()) + [0], dtype="int64"
                    ),
                    "slice_rows": pd.Series(
                        [0] * len(counters) + [int(len(vals))], dtype="int64"
                    ),
                }
            )

    summaries = df.select(col).mapInPandas(summarize, schema=schema)
    summaries = summaries.localCheckpoint(eager=False)  # two consumers
    per_item = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est_count").alias("est_count"))
    )
    # MG underestimates an item by at most the summed decrement debt —
    # bounded by total_rows/capacity across all slices
    total = summaries.agg(
        F.ceil(F.sum("slice_rows") / F.lit(capacity)).alias("max_error")
    )
    return (
        per_item.crossJoin(F.broadcast(total))
        .orderBy(F.col("est_count").desc(), F.col("item").asc())
        .limit(k)
    )
