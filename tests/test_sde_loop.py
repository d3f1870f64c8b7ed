"""§3.2 SDE-forecast pipeline tests: M6 forecaster contract + the full
composed loop on a short OU path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.loop import sde_forecast_loop, sde_initial_resample
from bigdata_quality_assessment_spark.operators.decomp import pod_svd_modes, project_coeffs
from bigdata_quality_assessment_spark.operators.models import (
    fit_linear_forecaster,
    fit_lstm_forecaster,
    predict_forecaster,
)
from bigdata_quality_assessment_spark.operators.windows import (
    concat_history_target,
    sliding_windows,
)
from bigdata_quality_assessment_spark.sources.generators import ou_process


@pytest.fixture(scope="module")
def series(spark):
    df = ou_process(spark, n_trajectories=1, n_steps=300, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def windows(spark, series):
    return sliding_windows(
        series, "step", "y", history=8, prediction=3, group_cols=["trajectory_id"]
    ).cache()


def test_linear_forecaster_recovers_linear_dynamics(spark):
    # y[t] = 0.5*y[t-1] + 0.2*y[t-2]: exactly representable
    n = 200
    y = np.zeros(n)
    y[0], y[1] = 1.0, 0.8
    for t in range(2, n):
        y[t] = 0.5 * y[t - 1] + 0.2 * y[t - 2]
    df = spark.createDataFrame(
        [(0, i, float(v)) for i, v in enumerate(y)], "trajectory_id INT, step BIGINT, y DOUBLE"
    )
    w = sliding_windows(df, "step", "y", history=4, prediction=2, group_cols=["trajectory_id"])
    weights = fit_linear_forecaster(w, ridge=1e-12)
    pred = predict_forecaster(w, weights)
    max_err = pred.select(
        F.aggregate(
            F.zip_with(F.col("pred"), F.col("target"), lambda a, b: F.abs(a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("e")
    ).agg(F.max("e")).first()[0]
    assert max_err < 1e-8


def test_predict_forecaster_matches_numpy(windows):
    weights = fit_linear_forecaster(windows)
    rows = predict_forecaster(windows, weights).orderBy("window_id").limit(10).collect()
    W = np.asarray(weights)
    for r in rows:
        phi = np.concatenate([[1.0], np.asarray(r["history"])])
        assert np.allclose(r["pred"], phi @ W, atol=1e-12)


def test_lstm_forecaster_trains_tf_free(spark, windows):
    # M6 reference network now trains via the numpy BPTT implementation
    # (operators/lstm.py) — no TensorFlow required; full coverage in
    # tests/test_lstm.py.
    params = fit_lstm_forecaster(windows.limit(20), epochs=2, seed=1)
    assert set(params) >= {"meta", "embed", "head", "Wx", "Wh", "b"}


def test_initial_resample_union_dedup(spark, windows):
    joint = concat_history_target(windows)
    _, u = pod_svd_modes(joint, "joint", p=11)
    coeffs = project_coeffs(joint, "joint", u, mean=None)
    sel = sde_initial_resample(coeffs, n_modes=3, n_draws=30, ngrid=64, bw=0.05)
    n = sel.count()
    assert 0 < n <= 90
    assert sel.select("window_id").distinct().count() == n  # T5 dedup on identity


def test_sde_loop_end_to_end(spark, series):
    res = sde_forecast_loop(
        series, history=8, prediction=3, n_iter=2, n_select=10, n_modes=3,
        n_draws=30, ngrid=64, group_cols=["trajectory_id"],
    )
    assert len(res.metrics) == 2
    assert res.metrics[1]["train_rows"] == res.metrics[0]["train_rows"] + 10
    # train ∪ pool partitions the window set
    total = res.train.count() + res.pool.count()
    assert total == 300 - 8 - 3 + 1
    assert res.train.join(res.pool, "window_id", "inner").count() == 0
    assert all(m["mae"] >= 0 for m in res.metrics)
