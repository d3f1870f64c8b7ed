"""Numpy-MLP ensemble members (the reference's network family,
TF-free): convergence, determinism, and the Spark inference contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.mlp import (
    fit_mlp_member,
    predict_ensemble_stats_mlp,
    predict_mlp,
    train_mlp_ensemble,
)


def _toy(n=200, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-1, 1, size=(n, 2))
    y = X[:, 0] ** 2 + 0.5 * X[:, 1]
    return X, y


def test_mlp_fits_smooth_surface():
    X, y = _toy()
    params = fit_mlp_member(X, y, model_id=0, epochs=800, lr=5e-3, seed=42)
    pred = predict_mlp(params, X)
    mse = float(((pred - y) ** 2).mean())
    assert mse < 0.25 * float(y.var()), mse  # clearly better than the mean


def test_mlp_deterministic():
    X, y = _toy()
    a = fit_mlp_member(X, y, model_id=1, epochs=50, seed=9)
    b = fit_mlp_member(X, y, model_id=1, epochs=50, seed=9)
    for (Wa, ba), (Wb, bb) in zip(a, b):
        assert np.array_equal(Wa, Wb) and np.array_equal(ba, bb)
    c = fit_mlp_member(X, y, model_id=2, epochs=50, seed=9)
    assert not np.array_equal(a[0][0], c[0][0])  # members independent


def test_mlp_ensemble_stats_contract(spark):
    from bigdata_quality_assessment_spark.sources.generators import grid_points_2d

    pts = grid_points_2d(spark, 15)
    train = pts.filter(F.col("point_id") % 5 == 0)
    params = train_mlp_ensemble(train, ["x1", "x2"], "y", n_models=2, epochs=60)
    scored = predict_ensemble_stats_mlp(
        pts, params, ["x1", "x2"], carry_cols=["x1", "x2", "y"]
    )
    rows = scored.collect()
    assert len(rows) == 225
    assert set(scored.columns) == {"point_id", "x1", "x2", "y", "y_mean", "y_var"}
    assert all(r["y_var"] >= 0 for r in rows)
    # mean/var equal the driver-side member average (A5/A6 semantics)
    import numpy as np

    p0 = pts.orderBy("point_id").collect()
    X = np.array([[r["x1"], r["x2"]] for r in p0])
    from bigdata_quality_assessment_spark.operators.mlp import _params_from_lists

    preds = np.stack([predict_mlp(_params_from_lists(p), X) for p in params])
    by_id = {r["point_id"]: r for r in rows}
    got = np.array([by_id[r["point_id"]]["y_mean"] for r in p0])
    assert np.allclose(got, preds.mean(axis=0), atol=1e-12)


def test_mlp_loop_smoke(spark):
    # M4 with the reference's real network family end-to-end.
    from bigdata_quality_assessment_spark.loop import active_sampling_loop
    from bigdata_quality_assessment_spark.sources.generators import grid_points_2d

    pts = grid_points_2d(spark, 12).cache()
    pts.count()
    init = pts.filter(F.col("point_id") % 6 == 0)
    res = active_sampling_loop(
        pts, ["x1", "x2"], n_iter=1, n_models=2, ngrid=32, bw=0.1,
        acq_list=("se", "us"), init_train=init,
        member_family="mlp", mlp_epochs=40,
    )
    assert res.train.count() == init.count() + 2
    assert res.metrics[0]["mse"] >= 0

    with pytest.raises(ValueError):
        active_sampling_loop(
            pts, ["x1", "x2"], n_iter=1, acq_list=("us_lgw",),
            init_train=init, member_family="mlp",
        )
    pts.unpersist()
