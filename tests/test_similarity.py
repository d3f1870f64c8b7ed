"""Similarity-search tests: brute-force vs numpy cosine, ANN recall,
embedding near-dedup of planted duplicates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.similarity import (
    ann_hyperplane_knn,
    embedding_near_dedup,
    knn_brute_force,
)

DIM = 16


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.RandomState(9)
    v = rng.normal(size=(120, DIM))
    v[100] = v[0] + 1e-3 * rng.normal(size=DIM)  # planted near-dup of 0
    return v


@pytest.fixture(scope="module")
def corpus(spark, vectors):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(vectors)]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>").cache()


def _np_topk(vectors, qi, k):
    v = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    sims = v @ v[qi]
    order = [i for i in np.argsort(-sims, kind="stable") if i != qi]
    return order[:k], sims


def test_knn_matches_numpy(corpus, vectors):
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = knn_brute_force(corpus, q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qi in range(3):
        expect, sims = _np_topk(vectors, qi, 5)
        got = [v for _, v, _ in sorted(by_q[qi])]
        assert got == [int(e) for e in expect]
        for rank, vid, cos in by_q[qi]:
            assert abs(cos - sims[vid]) < 1e-9


def test_ann_recall(corpus, vectors):
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = ann_hyperplane_knn(corpus, q, dim=DIM, k=5, n_planes=6, n_tables=8)
    got = {}
    for r in ann.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qi in range(10):
        expect, _ = _np_topk(vectors, qi, 5)
        hits += len(got.get(qi, set()) & {int(e) for e in expect})
        total += 5
    assert hits / total > 0.5  # 8 tables × 6 planes on 120 vecs: recall well above half


def test_embedding_near_dedup_drops_planted(corpus):
    out = {r["vec_id"] for r in embedding_near_dedup(corpus, threshold=0.999, dim=DIM, n_planes=6, n_tables=8).collect()}
    assert 0 in out and 100 not in out  # higher id of the dup pair dropped
    assert len(out) == 119


def test_knn_topk_is_two_phase(corpus):
    """Scale guard: the per-query ranking must never sort the whole
    scored corpus in one partition — phase 1 windows partition on
    (query_id, spark_partition_id) before the k-bounded global merge."""
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_brute_force(corpus, q, k=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan, "partial top-k salt column missing from plan"
    assert "SPARK_PARTITION_ID" in plan.upper().replace(" ", "_") or "spark_partition_id" in plan
    # two ranking windows: the salted partial and the k-bounded merge
    assert plan.count("row_number") >= 2


def test_ivf_recall(corpus, vectors):
    from bigdata_quality_assessment_spark.operators.similarity import ivf_knn

    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = ivf_knn(corpus, q, dim=DIM, k=5, n_centroids=8, n_probe=4, seed=7)
    got = {}
    for r in ivf.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qi in range(10):
        expect, _ = _np_topk(vectors, qi, 5)
        hits += len(got.get(qi, set()) & {int(e) for e in expect})
        total += 5
    # probing half the cells on a 120-vector corpus: high recall
    assert hits / total > 0.6
    # every query returns exactly k ranked rows
    counts = {qi: len(v) for qi, v in got.items()}
    assert all(c == 5 for c in counts.values())
