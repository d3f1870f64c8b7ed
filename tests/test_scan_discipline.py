"""Chaos-tests for the barrier discipline (VERDICT r3 item 8): count
FileScan nodes in EXECUTED plans over real parquet, pinning "one
source scan per action" so a refactor can't silently reintroduce the
3-7x multi-reference re-execution pathology PLANS.md measured."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _filescans(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("FileScan parquet")


def test_near_dedup_final_action_scans_docs_once(spark):
    """The consuming anti-join reads documents ONCE; the entire
    shingle->signature->candidate->verify->closure pipeline sits behind
    materialized barriers (its single scan ran in the sizing job)."""
    from bigdata_quality_assessment_spark.operators.text import near_dedup_minhash

    docs = load_table(spark, "documents", SF)
    nd = near_dedup_minhash(docs, k=3, n_hashes=32, bands=8, min_jaccard=0.7)
    assert nd.count() > 0
    assert _filescans(nd) == 1


def test_fused_kde_joint_consumes_zero_filescans(spark):
    """A13 shape: after the one binning pass materializes, the joint
    log-pdf-error plan contains NO file scan at all — both convolutions
    and the interp/trapz read the stored <=2*ngrid binned rows."""
    from bigdata_quality_assessment_spark.operators.density import (
        kde_1d_multi,
        log_pdf_error,
    )

    ev = load_table(spark, "events", SF)
    b = spark.range(1).select(F.lit(0.0).alias("lo"), F.lit(500.0).alias("hi"))
    g = kde_1d_multi(
        ev,
        [
            {"tag": "a", "col": "value", "bw": 20.0, "bounds": b,
             "where": F.col("event_type") == "click"},
            {"tag": "b", "col": "value", "bw": 20.0, "bounds": b,
             "where": F.col("event_type") == "view"},
        ],
        ngrid=64,
    )
    joint = log_pdf_error(g["a"], g["b"])
    assert joint.first()["log_pdf_error"] is not None
    assert _filescans(joint) == 0


def test_exact_dedup_final_action_scans_docs_once(spark):
    from bigdata_quality_assessment_spark.operators.text import exact_dedup

    docs = load_table(spark, "documents", SF)
    out = exact_dedup(docs)
    assert out.count() > 0
    # the (md5, id) digest projection is barriered, so the final action
    # reads documents exactly once (drop-id subtree reads stored rows)
    assert _filescans(out) == 1


def test_dedup_spans_scans_docs_once(spark):
    """Span dedup: the barriered (id, sid, key) frame serves both the
    count and the removal join — the reassembly action reads documents
    exactly once (the span-key scan ran when the barrier
    materialized)."""
    from bigdata_quality_assessment_spark.operators.text import dedup_spans

    docs = load_table(spark, "documents", SF)
    out = dedup_spans(docs, 5)
    assert out.count() > 0
    assert _filescans(out) == 1


def test_ngram_lm_scoring_scan_budget(spark):
    """LM scoring: the barriered bigram table pins training to its one
    (already-run) scan; the scoring action reads documents exactly
    ONCE — the outer-explode pair scan carries token-less docs as NULL
    sentinels, so there is no id-universe join-back scan."""
    from bigdata_quality_assessment_spark.operators.text import ngram_lm_score

    docs = load_table(spark, "documents", SF)
    out = ngram_lm_score(docs)
    assert out.count() > 0
    assert _filescans(out) == 1
