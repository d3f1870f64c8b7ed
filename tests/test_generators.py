"""Source generator tests (S1-S6): numpy parity for deterministic
sources, structural/statistical properties for seeded ones."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.sources.generators import (
    gaussian_samples,
    grid_points_2d,
    latin_hypercube,
    ou_process,
    stub_predictions,
    uniform_samples,
)


def test_grid_matches_np_mgrid(spark):
    rows = grid_points_2d(spark, 10).orderBy("point_id").collect()
    g = np.mgrid[-1 : 1 : 10j, -1 : 1 : 10j]
    x1, x2 = g[0].ravel(), g[1].ravel()
    y = x1**3 - x1 + x2**2 + 0.5 * np.sin(8 * x1 * x2)
    assert np.allclose([r["x1"] for r in rows], x1, atol=1e-12)
    assert np.allclose([r["x2"] for r in rows], x2, atol=1e-12)
    assert np.allclose([r["y"] for r in rows], y, atol=1e-12)


def test_stub_predictions_shape_and_determinism(spark, grid20):
    p = stub_predictions(grid20, 3)
    assert p.count() == 3 * 400
    a = p.orderBy("point_id", "model_id").limit(5).collect()
    b = stub_predictions(grid20, 3).orderBy("point_id", "model_id").limit(5).collect()
    assert a == b


def test_uniform_samples_bounds(spark):
    df = uniform_samples(spark, 1000, [2.0, -5.0], [3.0, 5.0], seed=1)
    r = df.agg(
        F.min("x1"), F.max("x1"), F.min("x2"), F.max("x2"), F.avg("x1")
    ).first()
    assert r[0] >= 2.0 and r[1] <= 3.0 and r[2] >= -5.0 and r[3] <= 5.0
    assert abs(r[4] - 2.5) < 0.05


def test_gaussian_samples_moments(spark):
    mean = [1.0, -2.0]
    cov = [[2.0, 0.8], [0.8, 1.0]]
    df = gaussian_samples(spark, 20000, mean, cov, seed=3).toPandas()
    got_mean = df[["x1", "x2"]].mean().to_numpy()
    got_cov = np.cov(df[["x1", "x2"]].to_numpy().T, ddof=0)
    assert np.allclose(got_mean, mean, atol=0.05)
    assert np.allclose(got_cov, cov, atol=0.1)


def test_latin_hypercube_stratification(spark):
    n = 64
    df = latin_hypercube(spark, n, [0.0, 0.0], [1.0, 1.0], seed=5).toPandas()
    for col in ("x1", "x2"):
        strata = np.floor(df[col].to_numpy() * n).astype(int)
        # exactly one sample per stratum per dimension — the LHS contract
        assert sorted(strata) == list(range(n))


def test_ou_process_matches_numpy_reference(spark):
    """Parity with the reference recurrence (SDE_forecast_
    ActiveSampling.py:23-43) re-implemented in numpy with our seeding."""
    sigma, mu, tau, dt, n = 2.0, 2.0, 0.5, 0.001, 200
    rows = (
        ou_process(
            spark, n_trajectories=1, n_steps=n, dt=dt, sigma=sigma, mu=mu,
            tau=tau, seed=42, rng="numpy",
        )
        .orderBy("step")
        .collect()
    )
    rng = np.random.RandomState(42)  # trajectory 0 → seed + 0
    x = np.zeros(n)
    noise = rng.randn(n - 1)
    sigma_bis = sigma * math.sqrt(2.0 / tau)
    for i in range(n - 1):
        x[i + 1] = x[i] + dt * (-(0.25 * x[i] - mu) / tau) + sigma_bis * math.sqrt(dt) * noise[i]
    assert np.allclose([r["y"] for r in rows], x, atol=1e-12)
    assert [r["step"] for r in rows] == list(range(n))


def test_ou_process_parallel_trajectories(spark):
    df = ou_process(spark, n_trajectories=3, n_steps=50, seed=7)
    counts = {r["trajectory_id"]: r["count"] for r in df.groupBy("trajectory_id").count().collect()}
    assert counts == {0: 50, 1: 50, 2: 50}
    # distinct seeds → distinct paths
    finals = df.filter(F.col("step") == 49).select("y").distinct().count()
    assert finals == 3
