"""Realistic-text generator (round-10): counter-RNG determinism,
planted dup/near/contam structure recovered by the REAL operators,
and non-trivial vocabulary / language signal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.sources.textgen import (
    eval_spans,
    realistic_documents,
)

N = 1500


@pytest.fixture(scope="module")
def corpus(spark):
    df = realistic_documents(spark, N, seed=7).cache()
    df.count()
    return df


def test_deterministic_under_repartitioning(spark, corpus):
    """Text is a pure function of (seed, doc_id): regenerating through
    a different partitioning yields byte-identical rows."""
    again = realistic_documents(spark, N, seed=7).repartition(13)
    a = {r["doc_id"]: r["text"] for r in corpus.collect()}
    b = {r["doc_id"]: r["text"] for r in again.collect()}
    assert a == b
    other = {r["doc_id"]: r["text"] for r in
             realistic_documents(spark, N, seed=8).collect()}
    assert a != other  # seed actually matters


def test_planted_rates_and_ground_truth(corpus):
    roles = {r["role"]: r["cnt"] for r in
             corpus.groupBy("role").agg(F.count("*").alias("cnt")).collect()}
    # 6% / 4% / 1% of 1500 with binomial noise
    assert 50 <= roles.get("dup", 0) <= 140
    assert 30 <= roles.get("near", 0) <= 100
    assert 4 <= roles.get("contam", 0) <= 40
    # every dup's text is byte-identical to its src (an ORIGINAL)
    texts = {r["doc_id"]: (r["text"], r["role"], r["src_id"])
             for r in corpus.collect()}
    n_dup = 0
    for did, (txt, role, src) in texts.items():
        if role == "dup":
            n_dup += 1
            assert texts[src][1] == "orig"
            assert txt == texts[src][0]
        elif role == "near":
            assert texts[src][1] == "orig"
            assert txt != texts[src][0]
            # near-dup: >=90% token overlap with the source
            a, b = set(txt.split(" ")), set(texts[src][0].split(" "))
            assert len(a & b) / len(a | b) > 0.75
    assert n_dup > 0


def test_exact_dedup_recovers_planted_duplicates(spark, corpus):
    from bigdata_quality_assessment_spark.operators.text import exact_dedup

    survivors = {r["doc_id"] for r in exact_dedup(corpus).collect()}
    dups = {r["doc_id"] for r in corpus.filter(F.col("role") == "dup").collect()}
    # every planted exact duplicate is dropped (its lower-id original
    # survives); chance full-text collisions are impossible at 50k vocab
    assert dups & survivors == set()
    origs = {r["doc_id"] for r in corpus.filter(F.col("role") == "orig").collect()}
    assert origs <= survivors


def test_minhash_recovers_near_duplicates(spark, corpus):
    """MinHash near-dedup on the realistic corpus: planted near-dups
    (97% token overlap) drop with high recall, originals survive —
    on a 50k-token vocabulary chance shingle collisions are rare, so
    precision is near-perfect (the 30-word corpus could not test
    this)."""
    from bigdata_quality_assessment_spark.operators.text import near_dedup_minhash

    kept = {r["doc_id"] for r in
            near_dedup_minhash(corpus, k=3, n_hashes=64, bands=16,
                               min_jaccard=0.6).collect()}
    rows = corpus.select("doc_id", "role").collect()
    dup_ids = [r["doc_id"] for r in rows if r["role"] in ("dup", "near")]
    orig_ids = [r["doc_id"] for r in rows if r["role"] == "orig"]
    dropped_planted = sum(1 for d in dup_ids if d not in kept)
    assert dropped_planted / len(dup_ids) > 0.85  # recall on planted
    kept_orig = sum(1 for d in orig_ids if d in kept)
    assert kept_orig / len(orig_ids) > 0.98  # precision: originals survive


def test_contamination_detected_against_eval_spans(spark, corpus):
    """Every contam doc contains its eval span verbatim — the exact
    decontamination screen must flag them all, and (near-)zero clean
    docs, on a vocabulary where chance n-gram collisions are rare."""
    ev = eval_spans(spark, seed=7)
    contam = {r["doc_id"] for r in
              corpus.filter(F.col("role") == "contam").collect()}
    spans = [r["text"] for r in ev.collect()]
    flagged = {
        r["doc_id"]
        for r in corpus.collect()
        if any(s in r["text"] for s in spans)
    }
    assert contam <= flagged
    assert len(flagged - contam) <= 2  # chance 24-gram hits ~ none


def test_vocabulary_and_language_signal(spark, corpus):
    from bigdata_quality_assessment_spark.operators.text import language_id

    n_distinct = (
        corpus.select(F.explode(F.split("text", " ")).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )
    assert n_distinct > 5000  # vs the 31-token driver corpus
    pred = language_id(corpus).select("doc_id", "lang_pred")
    hit = (
        corpus.select("doc_id", "lang")
        .join(pred, "doc_id")
        .agg(F.avg((F.col("lang") == F.col("lang_pred")).cast("double")))
        .first()[0]
    )
    assert hit > 0.9  # stopword interspersal carries a real signal


def test_textgen_edge_cases(spark):
    """Tiny corpora are all-original (ids < 16 never draw dup roles);
    rate validation fails fast; zero rates yield only originals."""
    tiny = realistic_documents(spark, 10, seed=3).collect()
    assert len(tiny) == 10
    assert all(r["role"] == "orig" and r["src_id"] is None for r in tiny)
    zero = realistic_documents(
        spark, 200, dup_rate=0.0, near_rate=0.0, contam_rate=0.0, seed=3
    )
    assert zero.filter(F.col("role") != "orig").count() == 0
    with pytest.raises(ValueError):
        realistic_documents(spark, 10, dup_rate=0.6, near_rate=0.5)


def test_eval_spans_deterministic(spark):
    a = {r["eval_id"]: r["text"] for r in eval_spans(spark, seed=7).collect()}
    b = {r["eval_id"]: r["text"] for r in eval_spans(spark, seed=7).collect()}
    assert a == b and len(a) == 64
    assert all(len(t.split(" ")) == 24 for t in a.values())


def test_recall_fixture_matches_generator(spark):
    """The committed planted-recall fixture (fixtures/textgen_recall.
    parquet — the corpus part='recall' of x_minhash_near_dedup grades
    on) must stay byte-equal to what tools/gen_recall_fixture.py
    regenerates from the code: any textgen change that silently
    shifts the corpus fails HERE, not as an opaque oracle mismatch."""
    from tools.gen_recall_fixture import N_DOCS, SEED

    from bigdata_quality_assessment_spark.queries import _RECALL_FIXTURE

    fixture = {
        r["doc_id"]: (r["text"], r["role"], r["src_id"])
        for r in spark.read.parquet(_RECALL_FIXTURE).collect()
    }
    regen = {
        r["doc_id"]: (r["text"], r["role"], r["src_id"])
        for r in realistic_documents(spark, N_DOCS, seed=SEED).collect()
    }
    assert fixture == regen


def test_recall_part_semantics(spark):
    """The graded recall metrics hold their semantic floor on the
    committed fixture: every original survives (zero false drops),
    every exact-dup pair collapses, and near-pair recall stays high
    (the 3% substitutions sit near the 0.8 Jaccard threshold, so 100%
    is not expected — but a banding/verify regression would crater
    this)."""
    from bigdata_quality_assessment_spark.queries import (
        _minhash_recall_metrics,
    )

    m = {r["metric"]: r["n"] for r in _minhash_recall_metrics(spark).collect()}
    assert m["orig_survived"] == m["orig_total"]
    assert m["dup_pairs_collapsed"] == m["dup_total"]
    assert m["near_pairs_collapsed"] >= 0.8 * m["near_total"]
