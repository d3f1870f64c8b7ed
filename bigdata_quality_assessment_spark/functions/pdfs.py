"""Analytic input-domain pdfs P2-P6 (SURVEY.md §2.2).

The reference wraps scipy frozen distributions (core/inputs.py:159-249);
here each pdf is a closed-form Catalyst expression over the feature
columns. Σ⁻¹ and normalization constants are computed once on the
driver (they are d×d with d≤3 in every reference use) and folded in as
literals — the per-row cost is a handful of fused arithmetic ops.

Reference citations (files under /root/reference/):
  * P2 uniform pdf           core/inputs.py:187-193
  * P3 gaussian pdf          core/inputs.py:156-162
  * P4 gaussian pdf grad     core/inputs.py:164-167
  * P5 lognormal pdf         core/inputs.py:240-244
  * P6 lognormal pdf grad    core/inputs.py:246-249
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def uniform_pdf(cols: list[Column], lo: list[float], hi: list[float]) -> Column:
    """P2: product of independent per-dimension uniform densities."""
    out = F.lit(1.0)
    for c, a, b in zip(cols, lo, hi):
        out = out * F.when(c.between(a, b), F.lit(1.0 / (b - a))).otherwise(F.lit(0.0))
    return out


def _inv_and_logdet(cov: list[list[float]]) -> tuple[list[list[float]], float]:
    """Driver-side inverse + log-determinant of a tiny covariance."""
    import numpy as np

    a = np.asarray(cov, dtype="float64")
    inv = np.linalg.inv(a)
    _, logdet = np.linalg.slogdet(a)
    return inv.tolist(), float(logdet)


def _quad_form(diffs: list[Column], inv: list[list[float]]) -> Column:
    """``dᵀ Σ⁻¹ d`` as an unrolled Catalyst expression (d ≤ a few)."""
    q = F.lit(0.0)
    for i, di in enumerate(diffs):
        for j, dj in enumerate(diffs):
            if inv[i][j] != 0.0:
                q = q + F.lit(inv[i][j]) * di * dj
    return q


def gaussian_pdf(cols: list[Column], mean: list[float], cov: list[list[float]]) -> Column:
    """P3: multivariate normal density ``exp(const − ½ dᵀΣ⁻¹d)``."""
    d = len(cols)
    inv, logdet = _inv_and_logdet(cov)
    diffs = [c - F.lit(m) for c, m in zip(cols, mean)]
    log_norm = -0.5 * (d * math.log(2.0 * math.pi) + logdet)
    return F.exp(F.lit(log_norm) - 0.5 * _quad_form(diffs, inv))


def gaussian_pdf_grad(
    cols: list[Column], mean: list[float], cov: list[list[float]]
) -> list[Column]:
    """P4: ``∇pdf = −Σ⁻¹(x−μ)·pdf(x)`` per dimension."""
    inv, _ = _inv_and_logdet(cov)
    pdf = gaussian_pdf(cols, mean, cov)
    diffs = [c - F.lit(m) for c, m in zip(cols, mean)]
    grads = []
    for i in range(len(cols)):
        lin = F.lit(0.0)
        for j, dj in enumerate(diffs):
            lin = lin + F.lit(inv[i][j]) * dj
        grads.append(-lin * pdf)
    return grads


def lognormal_pdf(cols: list[Column], mean: list[float], cov: list[list[float]]) -> Column:
    """P5: log-normal density — Gaussian in log-space with the Jacobian
    correction ``exp(−Σᵢ log xᵢ)``; zero for any non-positive xᵢ."""
    log_cols = [F.log(c) for c in cols]
    gauss = gaussian_pdf(log_cols, mean, cov)
    jac = F.lit(0.0)
    for c in cols:
        jac = jac + F.log(c)
    pdf = gauss * F.exp(-jac)
    positive = F.lit(True)
    for c in cols:
        positive = positive & (c > 0)
    return F.when(positive, pdf).otherwise(F.lit(0.0))


def lognormal_pdf_grad(
    cols: list[Column], mean: list[float], cov: list[list[float]]
) -> list[Column]:
    """P6: ``∇pdf = −(1 + Σ⁻¹(log x − μ))/x · pdf(x)`` per dimension
    (core/inputs.py:246-249)."""
    inv, _ = _inv_and_logdet(cov)
    pdf = lognormal_pdf(cols, mean, cov)
    diffs = [F.log(c) - F.lit(m) for c, m in zip(cols, mean)]
    grads = []
    for i, ci in enumerate(cols):
        lin = F.lit(0.0)
        for j, dj in enumerate(diffs):
            lin = lin + F.lit(inv[j][i]) * dj
        grads.append(-(F.lit(1.0) + lin) / ci * pdf)
    return grads
