"""A14 PCA/POD golden numeric tests vs the reference algorithm
re-implemented in numpy (snapshot method, core/utils.py:7-40)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.decomp import (
    comp_pca,
    pod_svd_modes,
    project_coeffs,
)


@pytest.fixture(scope="module")
def snapshots():
    rng = np.random.RandomState(42)
    base = rng.normal(size=(3, 8))
    coef = rng.normal(size=(200, 3)) * np.array([5.0, 2.0, 0.5])
    return coef @ base + 0.01 * rng.normal(size=(200, 8))


@pytest.fixture(scope="module")
def sdf(spark, snapshots):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(snapshots)]
    return spark.createDataFrame(rows, "row_id BIGINT, x ARRAY<DOUBLE>").cache()


def test_comp_pca_matches_numpy_eigh(sdf, snapshots):
    lam, psi, mean = comp_pca(sdf, "x", p=8, n_trunc=4)
    X = snapshots - snapshots.mean(axis=0)
    cov = X.T @ X / len(X)
    np_lam, np_vec = np.linalg.eigh(cov)
    order = np_lam.argsort()[::-1]
    np_lam = np_lam[order][:4]
    assert np.allclose(lam, np_lam, atol=1e-9)
    assert np.allclose(mean, snapshots.mean(axis=0), atol=1e-12)
    # eigenvectors match up to sign; compare |cos| of column pairs
    psi = np.asarray(psi)
    for j in range(4):
        cos = abs(np.dot(psi[:, j], np_vec[:, order[j]]))
        assert cos > 1 - 1e-9


def test_pca_energy_capture(sdf, snapshots):
    lam, psi, mean = comp_pca(sdf, "x", p=8, n_trunc=3)
    total_var = ((snapshots - snapshots.mean(0)) ** 2).sum() / len(snapshots)
    assert sum(lam) / total_var > 0.99  # 3 planted modes carry the energy


def test_pod_svd_matches_numpy(sdf, snapshots):
    s, u = pod_svd_modes(sdf, "x", p=8)
    np_u, np_s, _ = np.linalg.svd(snapshots.T, full_matrices=False)
    assert np.allclose(s[:4], np_s[:4], atol=1e-8)
    u = np.asarray(u)
    for j in range(3):
        assert abs(np.dot(u[:, j], np_u[:, j])) > 1 - 1e-9


def test_project_coeffs_reconstruction(sdf, snapshots):
    lam, psi, mean = comp_pca(sdf, "x", p=8, n_trunc=8)
    out = project_coeffs(sdf, "x", psi, mean).orderBy("row_id").collect()
    psi_m = np.asarray(psi)
    for r in out[:10]:
        x = np.asarray(snapshots[r["row_id"]])
        recon = np.asarray(mean) + psi_m @ np.asarray(r["coeff"])
        assert np.allclose(recon, x, atol=1e-9)


def test_project_coeffs_mode_scaling(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0]), (1, [0.0, 1.0])], "row_id BIGINT, x ARRAY<DOUBLE>")
    modes = [[1.0, 0.0], [0.0, 1.0]]
    rows = project_coeffs(df, "x", modes, mode_scale_power=2).orderBy("row_id").collect()
    # mode j scaled by (j+1)^2 → second coefficient ×4
    assert rows[0]["coeff"] == [1.0, 0.0]
    assert rows[1]["coeff"] == [0.0, 4.0]
