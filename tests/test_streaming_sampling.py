"""Streaming A-ES weighted reservoir: exact batch parity, batch-split
invariance, bounded state.

The reservoir keys rows with the SAME Catalyst counter-RNG expression
the batch sampler uses, so the streamed sample must equal the batch
sample bit-for-bit — not approximately, not distributionally.
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


def test_stream_matches_batch_sample_exactly(spark, weighted_docs, tmp_path):
    root = _stage(weighted_docs, str(tmp_path / "s3"), 3)
    drained = _drain(spark, root, "ws_parity")
    got = sorted(
        r["doc_id"]
        for r in finalize_weighted_sample(drained, K).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in weighted_sample_without_replacement(
            weighted_docs, "w", K, seed=SEED, id_col="doc_id"
        ).collect()
    )
    assert got == want
    assert len(got) == K


def test_batch_split_invariance(spark, weighted_docs, tmp_path):
    """1 arrival file vs 4 arrival files → identical final sample (the
    counter keys depend on rows, never on arrival batching)."""
    r1 = _stage(weighted_docs, str(tmp_path / "one"), 1)
    r4 = _stage(weighted_docs, str(tmp_path / "four"), 4)
    a = sorted(
        r["doc_id"]
        for r in finalize_weighted_sample(_drain(spark, r1, "ws_one"), K).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in finalize_weighted_sample(_drain(spark, r4, "ws_four"), K).collect()
    )
    assert a == b


def test_reservoir_state_is_bounded(spark, weighted_docs, tmp_path):
    """Every per-batch emission carries ≤ k rows per bucket — the state
    (and therefore the store) never grows past k·n_buckets regardless
    of stream length."""
    root = _stage(weighted_docs, str(tmp_path / "b"), 3)
    drained = _drain(spark, root, "ws_bound")
    per = (
        drained.groupBy("bucket", "n_seen")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per <= K
    # candidates handed to the final top-k: ≤ n_buckets · k
    cand = finalize_weighted_sample(drained, 10**9)
    assert cand.count() <= 8 * K


def test_without_replacement_distinct(spark, weighted_docs, tmp_path):
    root = _stage(weighted_docs, str(tmp_path / "d"), 2)
    rows = finalize_weighted_sample(_drain(spark, root, "ws_dist"), K).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == K
