"""Scoring/acquisition oracle tests (A1-A6, P12, P14-P16) against
numpy semantics, plus the P12 scale-plan guard (VERDICT r1 item 3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.score import (
    acquisition_us,
    acquisition_us_lw,
    ensemble_stats,
    inverse_density_weights,
    regression_metrics,
)
from bigdata_quality_assessment_spark.sources.generators import stub_predictions


@pytest.fixture(scope="module")
def preds(spark):
    rng = np.random.RandomState(3)
    rows = [
        (i, m, float(rng.normal(i * 0.1, 1.0)))
        for i in range(40)
        for m in range(3)
    ]
    return spark.createDataFrame(rows, "point_id BIGINT, model_id INT, y_pred DOUBLE").cache()


def test_ensemble_stats_mean_varpop(preds):
    pdf = preds.toPandas()
    got = {r["point_id"]: (r["y_mean"], r["y_var"]) for r in ensemble_stats(preds).collect()}
    for pid, grp in pdf.groupby("point_id"):
        v = grp["y_pred"].to_numpy()
        assert abs(got[pid][0] - v.mean()) < 1e-12
        assert abs(got[pid][1] - v.var(ddof=0)) < 1e-12  # np.var default, NOT ddof=1


def test_regression_metrics(spark):
    truth = np.array([1.0, 2.0, 3.0, 4.0])
    pred = np.array([1.1, 1.8, 3.3, 3.6])
    var = np.array([0.1, 0.2, 0.3, 0.4])
    df = spark.createDataFrame(
        [(float(t), float(p), float(v)) for t, p, v in zip(truth, pred, var)],
        "y DOUBLE, y_mean DOUBLE, y_var DOUBLE",
    )
    m = regression_metrics(df, "y_mean", "y", "y_var").first()
    assert abs(m["mse"] - ((pred - truth) ** 2).mean()) < 1e-12
    assert abs(m["mae"] - np.abs(pred - truth).mean()) < 1e-12
    assert abs(m["mean_var"] - var.mean()) < 1e-12
    assert m["n_rows"] == 4


def test_inverse_density_weights_normalize(spark):
    df = spark.createDataFrame([(i, float(i + 1)) for i in range(1000)], "point_id BIGINT, pdf DOUBLE")
    out = inverse_density_weights(df)
    total = out.agg(F.sum("w")).first()[0]
    assert abs(total - 1.0) < 1e-9
    # rare (low pdf) rows get the biggest weight
    top = out.orderBy(F.col("w").desc()).first()["point_id"]
    assert top == 0


def test_inverse_density_weights_plan_has_no_window(spark):
    """The r1 scale bug: an empty-frame window physically single-
    partitions the pool. The fix is agg + broadcast cross join — the
    physical plan must contain no Window operator at all."""
    df = spark.createDataFrame([(i, float(i + 1)) for i in range(10)], "point_id BIGINT, pdf DOUBLE")
    plan = inverse_density_weights(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_acquisitions_formulas(spark, grid20):
    st = ensemble_stats(stub_predictions(grid20, 2))
    df = st.withColumn("fx", F.lit(2.0)).withColumn("pdf_y_mean", F.lit(0.5))
    rows = (
        df.withColumn("us", acquisition_us(df, fx_col="fx"))
        .withColumn("us_lw", acquisition_us_lw(df, fx_col="fx", tol=0.0))
        .collect()
    )
    for r in rows:
        assert abs(r["us"] - 2.0 * r["y_var"]) < 1e-12
        assert abs(r["us_lw"] - 2.0 / 0.5 * r["y_var"]) < 1e-12


def test_inverse_density_weights_zero_pdf_ansi_safe(spark):
    # ANSI mode: a zero pdf must not throw DIVIDE_BY_ZERO; it yields a
    # dominating weight (the finite analog of numpy inf/inf).
    from bigdata_quality_assessment_spark.operators.score import (
        inverse_density_weights,
    )

    df = spark.createDataFrame(
        [(0, 0.0), (1, 0.5), (2, 0.5)], "point_id BIGINT, pdf DOUBLE"
    )
    rows = {
        r["point_id"]: r["w"]
        for r in inverse_density_weights(df, pdf_col="pdf", weight_col="w").collect()
    }
    assert rows[0] > 0.999999
    assert abs(sum(rows.values()) - 1.0) < 1e-9
