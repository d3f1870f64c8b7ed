"""Window/sequence operator tests (W1, A4, P11, U2) vs numpy windowing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.windows import (
    concat_history_target,
    horizon_abs_error,
    minmax_scale,
    sliding_windows,
)


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.RandomState(5)
    vals = rng.normal(size=60)
    rows = [(0, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "trajectory_id INT, step BIGINT, y DOUBLE").cache()
    return df, vals


def _np_windows(vals, history, prediction, horizon=0, stride=1):
    out = []
    n = len(vals) - history - prediction - horizon + 1
    for i in range(0, n, stride):
        out.append(
            (i, vals[i : i + history], vals[i + history + horizon : i + history + horizon + prediction])
        )
    return out


def test_sliding_windows_match_numpy(series):
    df, vals = series
    rows = (
        sliding_windows(df, "step", "y", history=10, prediction=5, group_cols=["trajectory_id"])
        .orderBy("window_id")
        .collect()
    )
    expect = _np_windows(vals, 10, 5)
    assert len(rows) == len(expect)  # reference loop bound: n-h-p+1
    for r, (wid, h, t) in zip(rows, expect):
        assert r["window_id"] == wid
        assert np.allclose(r["history"], h)
        assert np.allclose(r["target"], t)


def test_sliding_windows_stride_and_horizon(series):
    df, vals = series
    rows = (
        sliding_windows(
            df, "step", "y", history=6, prediction=2, horizon=3, stride=4,
            group_cols=["trajectory_id"],
        )
        .orderBy("window_id")
        .collect()
    )
    expect = _np_windows(vals, 6, 2, horizon=3, stride=4)
    assert [r["window_id"] for r in rows] == [e[0] for e in expect]
    for r, (_, h, t) in zip(rows, expect):
        assert np.allclose(r["history"], h) and np.allclose(r["target"], t)


def test_horizon_abs_error_matches_numpy(series):
    df, vals = series
    w = sliding_windows(df, "step", "y", history=5, prediction=5, group_cols=["trajectory_id"])
    w = w.withColumn("pred", F.col("history"))
    rows = horizon_abs_error(w, pred_col="pred").orderBy("window_id").collect()
    for r in rows:
        i = r["window_id"]
        expect = np.abs(vals[i : i + 5] - vals[i + 5 : i + 10]).sum()
        assert abs(r["horizon_err"] - expect) < 1e-12


def test_concat_history_target(series):
    df, vals = series
    w = sliding_windows(df, "step", "y", history=3, prediction=2, group_cols=["trajectory_id"])
    r = concat_history_target(w).orderBy("window_id").first()
    assert np.allclose(r["joint"], vals[:5])


def test_minmax_scale_sklearn_semantics(spark):
    vals = np.array([3.0, 7.0, 5.0, 11.0])
    df = spark.createDataFrame([(float(v),) for v in vals], "y DOUBLE")
    got = sorted(r["y_scaled"] for r in minmax_scale(df, "y").collect())
    expect = sorted((vals - vals.min()) / (vals.max() - vals.min()))
    assert np.allclose(got, expect)
    # custom feature range
    got2 = sorted(r["y_scaled"] for r in minmax_scale(df, "y", feature_range=(-1.0, 1.0)).collect())
    assert np.allclose(got2, sorted((vals - 3) / 8 * 2 - 1))


def test_minmax_scale_grouped(spark):
    rows = [(1, 0.0), (1, 10.0), (2, 100.0), (2, 300.0)]
    df = spark.createDataFrame(rows, "g INT, y DOUBLE")
    out = {(r["g"], r["y"]): r["y_scaled"] for r in minmax_scale(df, "y", group_cols=["g"]).collect()}
    assert out[(1, 10.0)] == 1.0 and out[(2, 300.0)] == 1.0
    assert out[(1, 0.0)] == 0.0 and out[(2, 100.0)] == 0.0
