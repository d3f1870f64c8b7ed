"""A14: PCA / POD (snapshot method) over an array column.

Reference: ``comp_pca`` (/root/reference/core/utils.py:7-40) builds the
m×m snapshot Gram matrix ``R = U·Uᵀ/m`` with ``einsum`` and eigendecomposes
it; the SDE path (/root/reference/SDE_forecast_ActiveSampling.py:88-98)
runs an SVD of the p×m transposed snapshot matrix and keeps the n×p
coefficient matrix ``(diag(s)·V)ᵀ = X·U``.

Spark-first design: the snapshot count m is the BIG axis (rows) and the
feature dimension p is small (history+prediction = 15 in the reference),
so the distributed object is the p×p scatter matrix ``XᵀX`` — computed
in ONE pass as a posexplode + groupBy(pos) sum (map-side combined,
shuffle of p²+p keys), collected to the driver (≤ a few hundred doubles),
and eigendecomposed there with ``numpy.linalg.eigh``. Eigenvalues of
``XᵀX/m`` equal the nonzero eigenvalues of the reference's ``X·Xᵀ/m``
Gram, and its eigenvectors ARE the spatial modes ψ — so this matches
``comp_pca`` without ever materializing the m×m matrix (which would be
10¹⁰×10¹⁰ at 100 TB).

Projection back onto the modes is a pure Catalyst expression (the p×k
mode matrix rides in as literals) — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _column_moments(df: DataFrame, col: str, p: int) -> tuple[list[list[float]], list[float], int]:
    """One distributed pass → (XᵀX as p×p, per-column sums, row count).

    Emits the p² outer-product entries plus the p values per row,
    posexplodes, and sums per position — a single narrow shuffle of
    p²+p keys regardless of row count.
    """
    arr = F.col(col)
    outer = F.flatten(
        F.transform(arr, lambda xi: F.transform(arr, lambda xj: xi * xj))
    )
    combined = F.concat(outer, arr)
    sums = (
        df.select(F.posexplode(combined).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    n = df.count()
    by_pos = {r["pos"]: r["s"] for r in sums}
    xtx = [[by_pos.get(i * p + j, 0.0) for j in range(p)] for i in range(p)]
    col_sums = [by_pos.get(p * p + i, 0.0) for i in range(p)]
    return xtx, col_sums, n


def _fix_signs(vecs):
    """Deterministic sign convention: the largest-|component| entry of
    each mode is positive (eigh sign is otherwise arbitrary)."""
    import numpy as np

    for j in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    return vecs


def comp_pca(
    df: DataFrame, col: str, p: int, n_trunc: int, detrend: bool = True
) -> tuple[list[float], list[list[float]], list[float]]:
    """A14: snapshot-method PCA of the m×p matrix stored as array
    column ``col`` (length p). Returns ``(lam[k], psi[p][k], mean[p])``
    matching ``comp_pca`` (core/utils.py:7-40): top ``n_trunc``
    eigenvalues of the covariance, the p×n_trunc spatial modes, and
    the column means.
    """
    import numpy as np

    xtx, col_sums, m = _column_moments(df, col, p)
    xtx = np.asarray(xtx)
    mean = np.asarray(col_sums) / m
    if detrend:
        # centered scatter: (X−1μ)ᵀ(X−1μ) = XᵀX − m·μμᵀ
        xtx = xtx - m * np.outer(mean, mean)
    lam, vecs = np.linalg.eigh(xtx / m)
    idx = lam.argsort()[::-1]
    lam = lam[idx][:n_trunc]
    psi = _fix_signs(vecs[:, idx][:, :n_trunc])
    return lam.tolist(), psi.tolist(), mean.tolist()


def pod_svd_modes(
    df: DataFrame, col: str, p: int
) -> tuple[list[float], list[list[float]]]:
    """A14 (SDE variant): the POD basis of the UNcentered snapshot
    matrix — singular values ``s`` and the p×p left-singular basis U of
    ``Xᵀ`` (SDE_forecast_ActiveSampling.py:94). ``s = sqrt(eig(XᵀX))``,
    ``U = eigenvectors`` — no detrending, matching the reference."""
    import numpy as np

    xtx, _, _ = _column_moments(df, col, p)
    lam, vecs = np.linalg.eigh(np.asarray(xtx))
    idx = lam.argsort()[::-1]
    s = np.sqrt(np.clip(lam[idx], 0.0, None))
    u = _fix_signs(vecs[:, idx])
    return s.tolist(), u.tolist()


def project_coeffs(
    df: DataFrame,
    col: str,
    modes: list[list[float]],
    mean: list[float] | None = None,
    mode_scale_power: int = 0,
    out_col: str = "coeff",
) -> DataFrame:
    """Project each snapshot row onto the modes: ``c_j = Σ_k (x_k −
    μ_k)·ψ[k][j]``, optionally scaling mode j by ``(j+1)^p`` — the
    reference's scaled coefficient matrices
    (SDE_forecast_ActiveSampling.py:95-97).

    Pure Catalyst: the mode matrix is unrolled into literals (p·k
    terms, p≈15 k≤15) so the projection is a whole-stage-codegen
    expression over the array column — no UDF, no shuffle.
    """
    p = len(modes)
    k = len(modes[0])
    mu = mean if mean is not None else [0.0] * p
    arr = F.col(col)
    coeffs = []
    for j in range(k):
        term = F.lit(0.0)
        for i in range(p):
            if modes[i][j] != 0.0:
                term = term + (arr[i] - F.lit(float(mu[i]))) * F.lit(float(modes[i][j]))
        if mode_scale_power:
            term = term * F.lit(float((j + 1) ** mode_scale_power))
        coeffs.append(term)
    return df.withColumn(out_col, F.array(*coeffs))
