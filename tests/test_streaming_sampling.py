"""Streaming A-ES weighted reservoir: exact batch parity, batch-split
invariance, bounded state.

The reservoir keys rows with the SAME Catalyst counter-RNG expression
the batch sampler uses, so the streamed sample must equal the batch
sample bit-for-bit — not approximately, not distributionally.

Cost discipline: each applyInPandasWithState drain pays
``shuffle.partitions`` state stores PER micro-batch, which adds up in
the full suite — so all assertions share TWO module-scoped drains
(3-file and 1-file arrivals) instead of one drain per test.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.select import (
    weighted_sample_without_replacement,
)
from bigdata_quality_assessment_spark.sources.tables import load_table
from bigdata_quality_assessment_spark.streaming.aggregates import (
    run_available_now,
)
from bigdata_quality_assessment_spark.streaming.sampling import (
    finalize_weighted_sample,
    streaming_weighted_sample,
)

SF = "/root/testdata/sf0.001"
K = 25
SEED = 17


@pytest.fixture(scope="module")
def weighted_docs(spark):
    docs = load_table(spark, "documents", SF).select("doc_id", "n_chars")
    # strictly positive weights from a data column
    return docs.withColumn("w", (F.col("n_chars") + 1).cast("double")).select(
        "doc_id", "w"
    )


def _stage(df, root: str, n_files: int) -> str:
    for i in range(n_files):
        df.filter(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(root, f"f{i}"))
    return root


def _drain(spark, root: str, name: str):
    stream = (
        spark.readStream.schema("doc_id LONG, w DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "*"))
    )
    res = streaming_weighted_sample(stream, "w", K, seed=SEED, id_col="doc_id")
    return run_available_now(res, name)


@pytest.fixture(scope="module")
def drained3(spark, weighted_docs, tmp_path_factory):
    """One 3-batch drain shared by parity/bound/distinct assertions."""
    root = _stage(weighted_docs, str(tmp_path_factory.mktemp("ws3")), 3)
    return _drain(spark, root, "ws_three").localCheckpoint()


def test_stream_matches_batch_sample_exactly(spark, weighted_docs, drained3):
    got = sorted(
        r["doc_id"] for r in finalize_weighted_sample(drained3, K).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in weighted_sample_without_replacement(
            weighted_docs, "w", K, seed=SEED, id_col="doc_id"
        ).collect()
    )
    assert got == want
    assert len(got) == K
    # without replacement — all distinct
    assert len(set(got)) == K


def test_batch_split_invariance(spark, weighted_docs, drained3, tmp_path):
    """3 arrival files vs 1 arrival file → identical final sample (the
    counter keys depend on rows, never on arrival batching)."""
    r1 = _stage(weighted_docs, str(tmp_path / "one"), 1)
    a = sorted(
        r["doc_id"] for r in finalize_weighted_sample(drained3, K).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in finalize_weighted_sample(_drain(spark, r1, "ws_one"), K).collect()
    )
    assert a == b


def test_reservoir_state_is_bounded(spark, drained3):
    """Every per-batch emission carries ≤ k rows per bucket — the state
    (and therefore the store) never grows past k·n_buckets regardless
    of stream length."""
    per = (
        drained3.groupBy("bucket", "n_seen")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per <= K
    # candidates handed to the final top-k: ≤ n_buckets · k
    cand = finalize_weighted_sample(drained3, 8 * K + 1)
    assert cand.count() <= 8 * K
