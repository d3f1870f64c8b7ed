"""Ensemble model surface tests (M1/M2/M3/M5): the engine consumes the
predictions-table contract; the default member is a closed-form poly
ridge whose derivatives are analytic (SURVEY.md §2.8)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.models import (
    _poly_features,
    ensemble_jac_hess,
    fit_poly_member,
    predict_ensemble,
    predict_poly,
    train_ensemble,
)
from bigdata_quality_assessment_spark.operators.score import ensemble_stats


@pytest.fixture(scope="module")
def quad_points(spark):
    # exactly representable target: y = 2 + x1 - 3 x2 + 0.5 x1² + x1 x2
    rng = np.random.RandomState(0)
    X = rng.uniform(-1, 1, size=(80, 2))
    y = 2 + X[:, 0] - 3 * X[:, 1] + 0.5 * X[:, 0] ** 2 + X[:, 0] * X[:, 1]
    rows = [(i, float(a), float(b), float(t)) for i, ((a, b), t) in enumerate(zip(X, y))]
    return spark.createDataFrame(rows, "point_id BIGINT, x1 DOUBLE, x2 DOUBLE, y DOUBLE").cache()


def test_train_predict_recovers_quadratic(spark, quad_points):
    thetas = train_ensemble(quad_points, ["x1", "x2"], "y", n_models=2, ridge=1e-10)
    preds = predict_ensemble(quad_points, thetas, ["x1", "x2"])
    joined = quad_points.join(ensemble_stats(preds), "point_id")
    max_err = joined.agg(F.max(F.abs(F.col("y_mean") - F.col("y")))).first()[0]
    assert max_err < 1e-6  # target lies in the hypothesis class


def test_mapinpandas_matches_driver_eval(spark, quad_points):
    thetas = train_ensemble(quad_points, ["x1", "x2"], "y", n_models=2)
    preds = predict_ensemble(quad_points, thetas, ["x1", "x2"]).toPandas()
    pdf = quad_points.toPandas().sort_values("point_id")
    X = pdf[["x1", "x2"]].to_numpy()
    for m, theta in enumerate(thetas):
        got = preds[preds.model_id == m].set_index("point_id")["y_pred"]
        expect = predict_poly(X, np.asarray(theta))
        assert np.allclose(got.loc[pdf["point_id"]].to_numpy(), expect, atol=1e-12)


def test_member_diversity_deterministic():
    X = np.random.RandomState(1).uniform(-1, 1, (50, 2))
    y = X[:, 0] + X[:, 1]
    t0 = fit_poly_member(X, y, 0)
    t0b = fit_poly_member(X, y, 0)
    t1 = fit_poly_member(X, y, 1)
    assert np.allclose(t0, t0b)
    assert not np.allclose(t0, t1)  # bootstrap reweighting differs per member


def test_jac_hess_matches_numeric_gradient(spark, quad_points):
    thetas = train_ensemble(quad_points, ["x1", "x2"], "y", n_models=2)
    jh = {r["point_id"]: r for r in ensemble_jac_hess(quad_points, thetas, ["x1", "x2"]).collect()}
    pdf = quad_points.toPandas().head(5)
    theta_arr = [np.asarray(t) for t in thetas]

    def mean_pred(x):
        return float(np.mean([predict_poly(x[None, :], t)[0] for t in theta_arr]))

    eps = 1e-5
    for _, row in pdf.iterrows():
        x = np.array([row["x1"], row["x2"]])
        r = jh[row["point_id"]]
        for i in range(2):
            dx = np.zeros(2)
            dx[i] = eps
            num = (mean_pred(x + dx) - mean_pred(x - dx)) / (2 * eps)
            assert abs(r["jac"][i] - num) < 1e-6
        # hessian: analytic constant for quadratic features
        num_h = (
            mean_pred(x + np.array([eps, 0])) - 2 * mean_pred(x) + mean_pred(x - np.array([eps, 0]))
        ) / eps**2
        assert abs(r["hess"][0][0] - num_h) < 1e-3


def test_poly_features_layout():
    X = np.array([[2.0, 3.0]])
    phi = _poly_features(X)
    assert np.allclose(phi, [[1.0, 2.0, 3.0, 4.0, 6.0, 9.0]])
