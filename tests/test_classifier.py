"""Quality-classifier tests: hash parity between the Catalyst and
python featurizers, learnability on separable corpora, distillation
fidelity vs the heuristic labels, and the zero-shuffle plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.classifier import (
    QualityClassifier,
    _featurize,
    _py_token_bucket,
    classify_quality,
    distill_quality_classifier,
    token_bucket,
    train_quality_classifier,
)

GOOD = "the quick brown fox jumps over the lazy dog in the warm sun"
BAD = "zzz qqq xxx kkk vvv www yyy jjj ppp fff ggg hhh"


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    rng = np.random.default_rng(7)
    good_w = GOOD.split()
    bad_w = BAD.split()
    for i in range(200):
        ws = rng.choice(good_w, size=12)
        rows.append((i, " ".join(ws), 1.0))
    for i in range(200, 400):
        ws = rng.choice(bad_w, size=12)
        rows.append((i, " ".join(ws), 0.0))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_token_bucket_parity(spark):
    """The Catalyst hash and the python twin agree token-for-token —
    the property that makes driver training valid for cluster
    scoring. Includes astral-plane (non-BMP) characters: Spark 4's
    ``split(tok, '')`` + ``ascii()`` operate on CODE POINTS ('😀' is
    one element with ascii 128512, not two UTF-16 surrogates —
    verified empirically), matching Python's code-point iteration;
    this pin catches any engine regression to code-unit splitting."""
    toks = ["the", "fox", "zzz", "a", "Straße", "x1!", "12345",
            "x\U0001F600y", "\U0001F600", "中文", "émixed\U0001F680"]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    got = {
        r["tok"]: r["b"]
        for r in df.select("tok", token_bucket(F.col("tok"), 512).alias("b")).collect()
    }
    for t in toks:
        assert got[t] == _py_token_bucket(t, 512), t


def test_classifier_separates_and_scores_identically(spark, labeled):
    model = train_quality_classifier(labeled, dim=256, n_train=400)
    out = classify_quality(labeled, model).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    rows = out.collect()
    acc = np.mean([(r["p_good"] >= 0.5) == (r["label"] == 1.0) for r in rows])
    assert acc >= 0.99

    # Spark scoring == numpy scoring with the same frozen weights
    pdf = labeled.select("doc_id", "text").toPandas().sort_values("doc_id")
    X = _featurize(list(pdf["text"]), model.dim)
    z = X @ np.array(model.weights) + model.bias
    p_np = 1.0 / (1.0 + np.exp(-z))
    got = {r["doc_id"]: r["p_good"] for r in rows}
    for doc_id, p in zip(pdf["doc_id"], p_np):
        assert got[doc_id] == pytest.approx(p, rel=1e-9, abs=1e-12)


def test_classify_plan_is_narrow(spark, labeled):
    """Scoring must be one projection: no exchange anywhere in the
    plan — the property that makes it free at 100 TB."""
    model = QualityClassifier(weights=tuple(np.zeros(64)), bias=0.1, dim=64)
    plan = classify_quality(labeled, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "InMemoryTableScan" not in plan


def test_empty_doc_scores_at_bias(spark):
    model = QualityClassifier(weights=tuple(np.ones(16)), bias=-1.5, dim=16)
    df = spark.createDataFrame([(0, ""), (1, "a b")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in classify_quality(df, model).collect()}
    assert rows[0]["logit"] == pytest.approx(-1.5)
    # non-empty: bias + mean(w[h]) = -1.5 + 1.0
    assert rows[1]["logit"] == pytest.approx(-0.5)


def test_distillation_matches_heuristic(spark):
    """The distilled model reproduces the heuristic's accept/reject
    decision on clearly-separated docs (the corpus-bootstrap use)."""
    rng = np.random.default_rng(11)
    rows = []
    # "good": sane length, stopwords, normal tokens
    for i in range(150):
        ws = rng.choice(GOOD.split(), size=40)
        rows.append((i, " ".join(ws)))
    # "bad": screaming punctuation, no stopwords
    for i in range(150, 300):
        ws = rng.choice(["!!!!", "????", "@@@@", "####"], size=40)
        rows.append((i, " ".join(ws)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    model = distill_quality_classifier(docs, threshold=0.5, dim=128, n_train=300)
    from bigdata_quality_assessment_spark.operators.text import quality_score

    truth = {r["doc_id"]: r["quality"] >= 0.5 for r in quality_score(docs).collect()}
    pred = {r["doc_id"]: r["p_good"] >= 0.5 for r in classify_quality(docs, model).collect()}
    agree = np.mean([truth[i] == pred[i] for i in truth])
    assert agree >= 0.95


def test_training_survives_null_text_and_label(spark):
    """Corpora with NULL text / NULL label rows must train (rows are
    dropped before the sample), and the model still separates."""
    rows = [(i, "good solid the and of words here", 1.0) for i in range(50)]
    rows += [(100 + i, "zz qq xx kk vv ww", 0.0) for i in range(50)]
    rows += [(200, None, 1.0), (201, "orphan text", None)]
    lab = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = train_quality_classifier(lab, dim=64, n_train=200)
    docs = spark.createDataFrame(
        [(0, "good solid the and of words here"), (1, "zz qq xx kk vv ww")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["p_good"] for r in classify_quality(docs, model).collect()}
    assert out[0] > out[1]


def test_classify_arrow_matches_sql_bit_exact(spark, labeled):
    """The Arrow scorer's per-doc accumulation order equals the
    Catalyst fold's (flat token order via bincount), so logits agree
    BIT-FOR-BIT — including unicode, astral-plane, >64-char tokens
    (python-fallback hash), empty, whitespace-only, and NULL docs."""
    model = train_quality_classifier(labeled, dim=256, n_train=400)
    edge = labeled.sparkSession.createDataFrame(
        [
            (1000, "héllo wörld ünïcode ẞ 中文 🎉"),
            (1001, ""),
            (1002, "   "),
            (1003, None),
            (1004, "x" * 200 + " short " + "\U0001F600" * 70),
            (1005, "a " * 500),
        ],
        ["doc_id", "text", ],
    )
    docs = labeled.select("doc_id", "text").union(edge.select("doc_id", "text"))
    a = {r["doc_id"]: r for r in classify_quality(docs, model).collect()}
    s = {
        r["doc_id"]: r
        for r in classify_quality(docs, model, impl="sql").collect()
    }
    assert set(a) == set(s) and len(a) == 406
    for did, row in s.items():
        assert a[did]["logit"] == row["logit"], did
        # sigmoid goes through libm exp (numpy) vs JVM Math.exp — the
        # two differ by at most 1 ulp; the logit itself is exact
        assert a[did]["p_good"] == pytest.approx(
            row["p_good"], rel=1e-15, abs=1e-15
        ), did
