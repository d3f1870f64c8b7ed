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


def test_grouped_training_matches_driver_twin(spark):
    """The per-member grouped-map trainer (reference shape: one
    independent fit per member on an executor) must be BIT-IDENTICAL
    to fit_mlp_member on the same canonically-sorted arrays."""
    from bigdata_quality_assessment_spark.operators.mlp import (
        _params_from_lists,
        train_mlp_ensemble_grouped,
    )

    X, y = _toy(n=60)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    train = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = train_mlp_ensemble_grouped(
        train, ["x1", "x2"], "y", n_models=2, epochs=40, seed=5
    )
    order = np.lexsort((y, X[:, 1], X[:, 0]))
    Xs, ys = X[order], y[order]
    for mid in range(2):
        want = fit_mlp_member(Xs, ys, mid, epochs=40, seed=5)
        have = _params_from_lists(got[mid])
        for (Ww, bw), (Wh, bh) in zip(want, have):
            assert np.array_equal(Ww, Wh) and np.array_equal(bw, bh)
    # and the output format feeds the shared inference path
    pred = predict_mlp(_params_from_lists(got[0]), Xs)
    assert pred.shape == (60,)


def test_grouped_training_rejects_unknown_backend(spark):
    from bigdata_quality_assessment_spark.operators.mlp import (
        train_mlp_ensemble_grouped,
    )

    train = spark.createDataFrame([(0.0, 0.0, 0.0)], "x1 double, x2 double, y double")
    with pytest.raises(Exception, match="backend"):
        train_mlp_ensemble_grouped(
            train, ["x1", "x2"], "y", n_models=1, epochs=1, backend="jax"
        )


def test_tf_backend_member_parity(spark):
    """Opt-in reference-parity path: Keras Adam+MSE members must fit
    the toy surface comparably to the numpy twin. Skipped where
    tensorflow is not installed (this container)."""
    pytest.importorskip("tensorflow")
    from bigdata_quality_assessment_spark.operators.mlp import (
        _params_from_lists,
        train_mlp_ensemble_grouped,
    )

    X, y = _toy(n=120)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    train = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    got = train_mlp_ensemble_grouped(
        train, ["x1", "x2"], "y", n_models=1, epochs=400, lr=5e-3,
        seed=3, backend="tf",
    )
    pred = predict_mlp(_params_from_lists(got[0]), X)
    mse = float(((pred - y) ** 2).mean())
    assert mse < 0.25 * float(y.var()), mse
