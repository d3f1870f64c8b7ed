"""Numpy LSTM forecaster (M6, the reference's actual network,
TF-free): numerical gradient check on the full backprop, convergence,
continue-training semantics, and the Spark inference contract."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_quality_assessment_spark.operators.lstm import (
    _backward,
    _forward,
    fit_lstm,
    init_lstm_forecaster,
    predict_lstm,
)


def test_gradient_check():
    # Full-network numerical gradient check: perturb a handful of
    # weights in EVERY parameter tensor and compare to backprop.
    rng = np.random.RandomState(3)
    X = rng.standard_normal((4, 5))
    Y = rng.standard_normal((4, 2))
    p = init_lstm_forecaster(5, 2, embed_dims=(3, 4), units=6, head_dims=(5,), seed=1)

    def loss(pp):
        pred, _ = _forward(pp, X)
        return float(((pred - Y) ** 2).mean())

    pred, cache = _forward(p, X)
    dpred = (2.0 / pred.size) * (pred - Y)
    grads = _backward(p, cache, dpred)

    eps = 1e-6

    def check(arr, garr, label):
        flat = arr.ravel()
        gflat = np.asarray(garr).ravel()
        for k in rng.choice(flat.size, size=min(6, flat.size), replace=False):
            orig = flat[k]
            flat[k] = orig + eps
            lp = loss(p)
            flat[k] = orig - eps
            lm = loss(p)
            flat[k] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - gflat[k]) < 1e-5 * max(1.0, abs(num)), (
                label, k, num, gflat[k],
            )

    check(p["Wx"], grads["Wx"], "Wx")
    check(p["Wh"], grads["Wh"], "Wh")
    check(p["b"], grads["b"], "b")
    for li, (W, b) in enumerate(p["embed"]):
        gW, gb = grads["embed"][li]
        check(W, gW, f"embed{li}.W")
        check(b, gb, f"embed{li}.b")
    for li, (W, b) in enumerate(p["head"]):
        gW, gb = grads["head"][li]
        check(W, gW, f"head{li}.W")
        check(b, gb, f"head{li}.b")


def _sine_windows(n=120, history=10, prediction=5, seed=0):
    t = np.arange(n + history + prediction) * 0.3
    series = np.sin(t) + 0.3 * np.sin(2.7 * t)
    X = np.stack([series[i : i + history] for i in range(n)])
    Y = np.stack([series[i + history : i + history + prediction] for i in range(n)])
    return X, Y


def test_lstm_converges_on_sine():
    X, Y = _sine_windows()
    p0 = init_lstm_forecaster(10, 5, seed=42)
    mse0 = float(((predict_lstm(p0, X) - Y) ** 2).mean())
    p = fit_lstm(X, Y, lr=1e-2, epochs=60, batch_size=16, seed=42)
    mse = float(((predict_lstm(p, X) - Y) ** 2).mean())
    assert mse < 0.1 * mse0, (mse0, mse)
    assert mse < 0.05, mse  # the signal is deterministic — near-interpolation


def test_continue_training_improves():
    X, Y = _sine_windows()
    p = fit_lstm(X, Y, epochs=15, seed=7)
    m1 = float(((predict_lstm(p, X) - Y) ** 2).mean())
    p = fit_lstm(X, Y, epochs=30, seed=8, params=p)  # retrain semantics
    m2 = float(((predict_lstm(p, X) - Y) ** 2).mean())
    assert m2 < m1


def test_spark_contract(spark):
    from bigdata_quality_assessment_spark.operators.lstm import (
        fit_lstm_forecaster_df,
        predict_lstm_forecaster,
    )
    from bigdata_quality_assessment_spark.operators.windows import sliding_windows
    from bigdata_quality_assessment_spark.sources.generators import ou_process

    series = ou_process(spark, n_trajectories=1, n_steps=120, seed=5)
    w = sliding_windows(series, "step", "y", history=10, prediction=5)
    params = fit_lstm_forecaster_df(w, epochs=5, seed=11)
    out = predict_lstm_forecaster(w, params)
    rows = out.collect()
    assert len(rows) == w.count()
    assert all(len(r["pred"]) == 5 for r in rows)
    # mapInPandas batching must not change values vs driver-side predict
    import numpy as np

    from bigdata_quality_assessment_spark.operators.lstm import (
        _params_from_lists,
    )

    first = sorted(rows, key=lambda r: r["window_id"])[0]
    drv = predict_lstm(
        _params_from_lists(params), np.array([list(first["history"])])
    )[0]
    assert np.allclose(drv, np.array(first["pred"]), atol=1e-12)


def test_sde_loop_lstm_family(spark):
    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.loop import sde_forecast_loop
    from bigdata_quality_assessment_spark.sources.generators import ou_process

    series = ou_process(spark, n_trajectories=1, n_steps=100, seed=3)
    init = series.select(F.col("step").alias("window_id")).filter(
        F.col("window_id") % 9 == 0
    )
    res = sde_forecast_loop(
        series, value_col="y", order_col="step", history=8, prediction=3,
        n_iter=1, n_select=5, init_train=init,
        forecaster_family="lstm", lstm_epochs=5,
    )
    assert len(res.metrics) == 1
    assert res.metrics[0]["mae"] >= 0
    with pytest.raises(ValueError):
        sde_forecast_loop(
            series, value_col="y", order_col="step", n_iter=1,
            init_train=init, forecaster_family="gru",
        )


def test_lstm_backend_validation(spark):
    """The DF trainer rejects unknown backends and TF continuation."""
    import pytest as _pytest

    from bigdata_quality_assessment_spark.operators.lstm import (
        fit_lstm_forecaster_df,
    )

    w = spark.createDataFrame(
        [([0.1, 0.2, 0.3], [0.4])], "history array<double>, target array<double>"
    )
    with _pytest.raises(ValueError, match="backend"):
        fit_lstm_forecaster_df(w, epochs=1, backend="jax")
    with _pytest.raises((ValueError, ImportError)):
        # TF absent -> ImportError; TF present + params -> ValueError
        fit_lstm_forecaster_df(w, epochs=1, backend="tf", params={"x": 1})


def test_lstm_tf_backend_parity(spark):
    """Opt-in Keras M6 fit: exported weights must drive the numpy
    forward pass to a reasonable fit. Skipped without tensorflow."""
    import numpy as np
    import pytest as _pytest

    _pytest.importorskip("tensorflow")
    from bigdata_quality_assessment_spark.operators.lstm import (
        _params_from_lists,
        fit_lstm_forecaster_df,
        predict_lstm,
    )

    rng = np.random.RandomState(0)
    base = np.cumsum(rng.randn(300) * 0.1)
    X = np.stack([base[i : i + 10] for i in range(200)])
    Y = np.stack([base[i + 10 : i + 12] for i in range(200)])
    w = spark.createDataFrame(
        [(x.tolist(), y.tolist()) for x, y in zip(X, Y)],
        "history array<double>, target array<double>",
    )
    got = fit_lstm_forecaster_df(w, epochs=150, backend="tf", seed=1)
    pred = predict_lstm(_params_from_lists(got), X)
    mse = float(((pred - Y) ** 2).mean())
    assert mse < 0.5 * float(Y.var()), mse
