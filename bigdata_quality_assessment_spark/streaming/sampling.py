"""Streaming weighted sampling — the A-ES reservoir over micro-batches.

Efraimidis-Spirakis is THE streaming-native weighted sampler: assign
each row the key ``u^(1/w)`` and keep the k largest keys; the kept set
is a valid weighted sample without replacement of EVERYTHING seen so
far, no matter how the rows arrive. Two design choices make this exact
and scalable here:

* **Counter keys, computed JVM-side.** ``u`` comes from the md5
  counter stream (functions/counter_rng.py) keyed ``wor:{seed}:{id}``
  — the SAME Catalyst expression the batch operator
  ``operators/select.py weighted_sample_without_replacement`` uses, so
  the streaming reservoir selects the BIT-IDENTICAL sample the batch
  operator would select on the union of all batches (pinned in
  tests/test_streaming_sampling.py). A clock- or partition-seeded key
  could never give that parity, and re-keying on retry would silently
  re-sample.
* **Bucketed reservoirs.** A single global top-k would funnel every
  row through one state task. Instead ``n_buckets`` independent
  reservoirs each keep their bucket's top-k (state = k rows of
  (id, w, key) per bucket, O(k·n_buckets) total), and the tiny final
  global top-k over ``n_buckets·k`` candidates happens at read time
  (``finalize_weighted_sample``). The bucket of a row is
  ``counter_hash % n_buckets`` — deterministic, so a row lands in the
  same reservoir on every retry and layout. Correctness: the global
  top-k of per-bucket top-k's equals the top-k of everything, because
  each bucket keeps at least its own global-top-k members.

Reference anchor: T3 weighted sampling
(/root/reference/BigDataQualityAssessment_ActiveSampling.py:56) — this is its
unbounded-stream counterpart.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.functions.counter_rng import (
    counter_hash,
    counter_uniform,
)


def streaming_weighted_sample(
    stream: DataFrame,
    weight_col: str,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> DataFrame:
    """Maintain ``n_buckets`` A-ES reservoirs over a stream; each
    emitted row is a current reservoir member tagged with its bucket
    and the bucket's running ``n_seen``. Weights must be > 0 (the
    ``u^(1/w)`` key is undefined otherwise — same contract as the
    batch operator). Feed the drained output to
    ``finalize_weighted_sample`` for the global k-sample."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(weight_col).cast("double").alias("__w"),
        F.pow(
            counter_uniform("wor", seed, F.col(id_col)),
            F.lit(1.0) / F.col(weight_col),
        ).alias("__es_key"),
        (counter_hash("worb", F.col(id_col)) % n_buckets)
        .cast("int")
        .alias("__bucket"),
    )

    out_schema = (
        f"bucket INT, {id_col} BIGINT, {weight_col} DOUBLE, "
        "es_key DOUBLE, n_seen BIGINT"
    )
    state_schema = (
        "ids ARRAY<BIGINT>, ws ARRAY<DOUBLE>, keys ARRAY<DOUBLE>, n_seen BIGINT"
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ids, ws, keys, n_seen = state.get
            ids, ws, keys = list(ids), list(ws), list(keys)
        else:
            ids, ws, keys, n_seen = [], [], [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            ids.extend(int(v) for v in pdf["__id"])
            ws.extend(float(v) for v in pdf["__w"])
            keys.extend(float(v) for v in pdf["__es_key"])
        # top-k by (key desc, id asc) — the batch operator's exact
        # ordering, so ties break identically
        order = sorted(range(len(ids)), key=lambda j: (-keys[j], ids[j]))[:k]
        ids = [ids[j] for j in order]
        ws = [ws[j] for j in order]
        keys = [keys[j] for j in order]
        state.update((ids, ws, keys, n_seen))
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(ids),
                id_col: ids,
                weight_col: ws,
                "es_key": keys,
                "n_seen": [n_seen] * len(ids),
            }
        )

    return keyed.groupBy("__bucket").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def finalize_weighted_sample(
    drained: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Reduce a drained ``streaming_weighted_sample`` memory-sink table
    to the global k-sample: per bucket keep only the LATEST emission
    (max ``n_seen`` — update-mode sinks retain every per-batch
    emission), then global top-k over the ≤ ``n_buckets·k`` candidate
    rows — driver-trivial at any stream size."""
    latest = (
        drained.withColumn(
            "__max_seen", F.max("n_seen").over(Window.partitionBy("bucket"))
        )
        .filter(F.col("n_seen") == F.col("__max_seen"))
        # a bucket that saw no new rows re-emits the same (n_seen,
        # members) — identical candidates, dropped before the top-k
        .dropDuplicates(["bucket", id_col])
    )
    return (
        latest.orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__max_seen")
    )
