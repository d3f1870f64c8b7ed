"""Planted-embedding corpus generator (sources/embgen.py) + the
embedding-dedup recall gate it feeds (round-12 verdict ask #1 — the
round-11 text recall pattern transferred to the embedding family)."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_quality_assessment_spark.sources.embgen import (
    planted_embeddings,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return planted_embeddings(spark, 400, seed=7).collect()


def test_schema_and_roles(corpus):
    assert {r["role"] for r in corpus} <= {"orig", "dup", "near"}
    by_id = {r["vec_id"]: r for r in corpus}
    assert len(by_id) == 400
    for r in corpus:
        assert len(r["embedding"]) == 64
        if r["role"] == "orig":
            assert r["src_id"] is None
        else:
            assert r["src_id"] is not None
            assert by_id[r["src_id"]]["role"] == "orig"
            assert r["src_id"] < r["vec_id"]
    # first 16 ids are always originals (valid rejection-sample space)
    assert all(by_id[i]["role"] == "orig" for i in range(16))


def test_originals_are_unit_vectors(corpus):
    for r in corpus:
        if r["role"] == "orig":
            n = float(np.linalg.norm(np.asarray(r["embedding"], "float64")))
            assert abs(n - 1.0) < 1e-5


def test_dups_are_bit_exact_copies(corpus):
    by_id = {r["vec_id"]: r for r in corpus}
    n_dup = 0
    for r in corpus:
        if r["role"] == "dup":
            assert r["embedding"] == by_id[r["src_id"]]["embedding"]
            n_dup += 1
    assert n_dup > 0


def test_nears_sit_at_controlled_cosine(corpus):
    """The planted cosine is drawn from U[0.92, 0.98] in float64 and
    survives the float32 round-trip to well inside (0.9199, 0.9801) —
    never near the 0.9 grading threshold."""
    by_id = {r["vec_id"]: r for r in corpus}
    n_near = 0
    for r in corpus:
        if r["role"] == "near":
            u = np.asarray(by_id[r["src_id"]]["embedding"], "float64")
            v = np.asarray(r["embedding"], "float64")
            c = float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
            assert 0.9199 < c < 0.9801
            n_near += 1
    assert n_near > 0


def test_partitioning_invariance(spark):
    """Counter-RNG discipline: the corpus is a pure function of
    (seed, vec_id) — identical under any partitioning."""
    a = {
        r["vec_id"]: (r["embedding"], r["role"], r["src_id"], r["label"])
        for r in planted_embeddings(
            spark, 120, seed=3, num_partitions=1
        ).collect()
    }
    b = {
        r["vec_id"]: (r["embedding"], r["role"], r["src_id"], r["label"])
        for r in planted_embeddings(
            spark, 120, seed=3, num_partitions=13
        ).collect()
    }
    assert a == b


def test_embrecall_fixture_matches_generator(spark):
    """The committed planted-embedding fixture (fixtures/
    embgen_recall.parquet — the corpus part='recall' of
    x_embedding_near_dedup grades on) must stay equal to what
    tools/gen_embrecall_fixture.py regenerates from the code: any
    embgen change that silently shifts the corpus fails HERE, not as
    an opaque oracle mismatch."""
    from tools.gen_embrecall_fixture import N_VECS, SEED

    from bigdata_quality_assessment_spark.queries import _EDDR_FIXTURE

    fixture = {
        r["vec_id"]: (r["embedding"], r["role"], r["src_id"], r["label"])
        for r in spark.read.parquet(_EDDR_FIXTURE).collect()
    }
    regen = {
        r["vec_id"]: (r["embedding"], r["role"], r["src_id"], r["label"])
        for r in planted_embeddings(spark, N_VECS, seed=SEED).collect()
    }
    assert fixture == regen


def test_embrecall_part_semantics(spark):
    """The graded recall metrics hold their semantic floor on the
    committed fixture: every original survives (zero false drops —
    random-pair cosine tops out ~0.51, far below the 0.9 verify
    threshold), every exact-dup pair collapses, and near-pair banded
    recall beats 90% (measured 154/159 = 96.9%; banded theory ≈96% at
    the mean planted cosine 0.95 with 8 planes × 6 tables)."""
    from bigdata_quality_assessment_spark.queries import (
        _eddr_recall_metrics,
    )

    m = {r["metric"]: r["n"] for r in _eddr_recall_metrics(spark).collect()}
    assert m["orig_survived"] == m["orig_total"]
    assert m["dup_pairs_collapsed"] == m["dup_total"]
    assert m["near_pairs_collapsed"] >= 0.9 * m["near_total"]
