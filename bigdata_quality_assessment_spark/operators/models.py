"""M1/M2/M5: ensemble training, batch inference, and Jacobian/Hessian
production (SURVEY.md §2.8).

Reference: ``UQ_NN`` (/root/reference/core/ensemble_model.py:30-217)
trains N Keras MLPs sequentially and predicts/differentiates them over
the full candidate pool. The Spark-first re-expression decouples the
two halves:

  * TRAINING (M1/M4) happens on the distilled training set, which is
    ≤ a few hundred rows BY DESIGN (that is the whole point of the
    tool) — so each ensemble member trains inside one
    ``applyInPandas`` group keyed by ``model_id``. N members train in
    parallel across executors; each sees the full (tiny) training set.
  * INFERENCE (M2) and gradients (M5) run over the FULL pool — the
    100 TB axis — as ``mapInPandas`` with Arrow batches, one pass,
    embarrassingly parallel. Models ride to the executors as broadcast
    parameter vectors, loaded once per worker.

TensorFlow is NOT required: the default member model is a seeded
polynomial ridge regression (closed-form normal-equation fit) whose
predictions, Jacobians, and Hessians are exact analytic expressions —
giving every downstream operator (A5/A6, P14-P16) a deterministic,
oracle-checkable producer. A Keras path can be slotted in by passing a
different ``fit_fn``/``predict_fn`` pair; the engine only consumes the
``predictions(point_id, model_id, y_pred)`` contract
(core/ensemble_model.py:59-68).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------
# Default member model: degree-2 polynomial ridge regression.
# Member k perturbs via a bootstrap reweighting seeded by model_id —
# the ensemble-diversity mechanism standing in for random NN init
# (core/ensemble_model.py:44-57 trains each member from a fresh init).
# --------------------------------------------------------------------


def _poly_features(X, degree: int = 2):
    import numpy as np

    n, d = X.shape
    cols = [np.ones(n)]
    for i in range(d):
        cols.append(X[:, i])
    if degree >= 2:
        for i in range(d):
            for j in range(i, d):
                cols.append(X[:, i] * X[:, j])
    return np.column_stack(cols)


def fit_poly_member(X, y, model_id: int, degree: int = 2, ridge: float = 1e-6, seed: int = 42):
    """Closed-form weighted ridge fit; member diversity via seeded
    Poisson bootstrap weights (deterministic per model_id)."""
    import numpy as np

    rng = np.random.RandomState(seed + model_id)
    w = rng.poisson(1.0, size=len(y)).astype("float64") + 1e-3
    Phi = _poly_features(X, degree)
    A = Phi.T @ (Phi * w[:, None]) + ridge * np.eye(Phi.shape[1])
    b = Phi.T @ (w * y)
    return np.linalg.solve(A, b)


def predict_poly(X, theta, degree: int = 2):
    return _poly_features(X, degree) @ theta


def train_ensemble(
    train: DataFrame,
    feature_cols: list[str],
    target_col: str = "y",
    n_models: int = 2,
    degree: int = 2,
    seed: int = 42,
    ridge: float = 1e-6,
) -> list[list[float]]:
    """M1: train N members in parallel — one ``applyInPandas`` group
    per ``model_id``; the (small) training set is replicated across
    members with a broadcast cross join, each group fits independently
    and returns its parameter vector.

    Returns the list of parameter vectors (driver-side; the model is
    deliberately tiny — parameters, not data, cross the boundary).
    """
    spark = train.sparkSession
    members = spark.range(n_models).select(F.col("id").cast("int").alias("model_id"))
    replicated = train.select(*feature_cols, target_col).crossJoin(F.broadcast(members))

    schema = "model_id INT, theta ARRAY<DOUBLE>"

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mid = int(pdf["model_id"].iloc[0])
        X = pdf[feature_cols].to_numpy(dtype="float64")
        y = pdf[target_col].to_numpy(dtype="float64")
        theta = fit_poly_member(X, y, mid, degree=degree, ridge=ridge, seed=seed)
        return pd.DataFrame({"model_id": [mid], "theta": [list(theta)]})

    rows = (
        replicated.groupBy("model_id")
        .applyInPandas(fit_group, schema)
        .orderBy("model_id")
        .collect()
    )
    return [list(r["theta"]) for r in rows]


def predict_ensemble(
    points: DataFrame,
    thetas: list[list[float]],
    feature_cols: list[str],
    id_col: str = "point_id",
    degree: int = 2,
) -> DataFrame:
    """M2: ensemble batch inference over the full pool as
    ``mapInPandas`` — one Arrow-batched pass producing the long-format
    ``predictions(point_id, model_id, y_pred)`` table
    (core/ensemble_model.py:59-65). Parameters are closure-captured
    (tiny), evaluated vectorized per batch; each input batch yields
    N×batch rows with zero shuffle."""
    import numpy as np

    theta_arr = [np.asarray(t, dtype="float64") for t in thetas]
    f_cols = list(feature_cols)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = pdf[f_cols].to_numpy(dtype="float64")
            ids = pdf[id_col].to_numpy()
            out = []
            for mid, th in enumerate(theta_arr):
                out.append(
                    pd.DataFrame(
                        {
                            id_col: ids,
                            "model_id": mid,
                            "y_pred": predict_poly(X, th, degree),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    schema = f"{id_col} BIGINT, model_id INT, y_pred DOUBLE"
    return points.select(id_col, *f_cols).mapInPandas(score, schema)


def ensemble_jac_hess(
    points: DataFrame,
    thetas: list[list[float]],
    feature_cols: list[str],
    id_col: str = "point_id",
    degree: int = 2,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """M5: per-point ensemble-mean Jacobian and Hessian columns
    (``jac ARRAY<DOUBLE>``, ``hess ARRAY<ARRAY<DOUBLE>>``) — the
    producer for P16 ``us_lgw`` (core/ensemble_model.py:70-217).

    For the polynomial member model both derivatives are analytic:
    ŷ = θ₀ + Σθᵢxᵢ + Σθᵢⱼxᵢxⱼ ⇒ ∂ŷ/∂xᵢ and ∂²ŷ/∂xᵢ∂xⱼ are linear /
    constant in x. One ``mapInPandas`` pass, averaged over members —
    a single code path (the reference's batched jac-only branch is a
    latent dead path we do not replicate,
    core/ensemble_model.py:195)."""
    import numpy as np

    d = len(feature_cols)
    theta_arr = [np.asarray(t, dtype="float64") for t in thetas]
    f_cols = list(feature_cols)
    carry = [c for c in (carry_cols or []) if c != id_col]
    in_cols = [id_col, *dict.fromkeys([*f_cols, *carry])]

    # index maps for the quadratic terms laid out by _poly_features
    quad_idx = {}
    pos = 1 + d
    for i in range(d):
        for j in range(i, d):
            quad_idx[(i, j)] = pos
            pos += 1

    def grads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = pdf[f_cols].to_numpy(dtype="float64")
            n = len(pdf)
            jac = np.zeros((n, d))
            hess = np.zeros((n, d, d))
            for th in theta_arr:
                for i in range(d):
                    g = np.full(n, th[1 + i])
                    for j in range(d):
                        a, b = min(i, j), max(i, j)
                        coef = th[quad_idx[(a, b)]]
                        factor = 2.0 if i == j else 1.0
                        g = g + factor * coef * X[:, j]
                        hess[:, i, j] += factor * coef
                    jac[:, i] += g
            jac /= len(theta_arr)
            hess /= len(theta_arr)
            out = {id_col: pdf[id_col].to_numpy()}
            for c in carry:
                out[c] = pdf[c].to_numpy()
            out["jac"] = [list(row) for row in jac]
            out["hess"] = [[list(r) for r in h] for h in hess]
            yield pd.DataFrame(out)

    carry_schema = "".join(f", {c} DOUBLE" for c in carry)
    schema = (
        f"{id_col} BIGINT{carry_schema}, jac ARRAY<DOUBLE>, hess ARRAY<ARRAY<DOUBLE>>"
    )
    return points.select(*in_cols).mapInPandas(grads, schema)


def stub_predictions_sql_expr(n_models: int) -> str:
    """The DuckDB-oracle expression mirroring
    ``sources.generators.stub_predictions`` — kept adjacent to the
    models so the closed-form contract stays in one place."""
    from ..sources.generators import STUB_MODEL_PARAMS

    rows = ", ".join(
        f"({k}, {a!r}::DOUBLE, {b!r}::DOUBLE, {c!r}::DOUBLE)"
        for k, (a, b, c) in enumerate(STUB_MODEL_PARAMS[:n_models])
    )
    return f"(VALUES {rows}) AS models(model_id, a, b, c)"



# --------------------------------------------------------------------
# M6: sequence forecaster (history window → prediction window).
# The reference trains an LSTM (SDE_forecast_ActiveSampling.py:153-171);
# this container has no TensorFlow, so the default member is a
# closed-form multi-output linear ridge AR — same contract (windows in,
# pred array out), deterministic, oracle-friendly. A Keras LSTM can be
# slotted in via fit_lstm_forecaster when TF is installed.
# --------------------------------------------------------------------


def fit_linear_forecaster(
    train_windows: DataFrame,
    hist_col: str = "history",
    target_col: str = "target",
    ridge: float = 1e-6,
) -> list[list[float]]:
    """M6 (closed form): fit ``W ∈ R^{(h+1)×p}`` minimizing
    ``‖[1, hist]·W − target‖² + λ‖W‖²`` over the (small by design)
    training windows. The train set is collected to the driver exactly
    like the reference's model.fit consumes it (M4 contract: Spark does
    the heavy scoring; training data is ≤ a few hundred windows)."""
    import numpy as np

    rows = train_windows.select(hist_col, target_col).collect()
    H = np.array([r[hist_col] for r in rows], dtype="float64")
    Y = np.array([r[target_col] for r in rows], dtype="float64")
    Phi = np.column_stack([np.ones(len(H)), H])
    A = Phi.T @ Phi + ridge * np.eye(Phi.shape[1])
    W = np.linalg.solve(A, Phi.T @ Y)
    return W.tolist()


def predict_forecaster(
    windows: DataFrame,
    weights: list[list[float]],
    id_col: str = "window_id",
    hist_col: str = "history",
    out_col: str = "pred",
) -> DataFrame:
    """M6 inference: ``pred = [1, hist]·W`` as a pure Catalyst
    expression — the weight matrix unrolls into literals (h+1 ≤ ~16
    terms per output), so the full-pool forecast is whole-stage codegen
    with zero shuffle and no Python in the loop."""
    h = len(weights) - 1
    p = len(weights[0])
    hist = F.col(hist_col)
    preds = []
    for j in range(p):
        term = F.lit(float(weights[0][j]))
        for i in range(h):
            term = term + hist[i] * F.lit(float(weights[i + 1][j]))
        preds.append(term)
    return windows.withColumn(out_col, F.array(*preds))


def fit_lstm_forecaster(windows: DataFrame, **kwargs) -> dict:
    """M6 (reference network): Dense 4/8/16 → LSTM 32 → Dense 16/16 →
    Dense p, Adam lr=1e-2, MSE (SDE_forecast_ActiveSampling.py:153-171)
    — implemented in pure numpy (operators/lstm.py: hand-derived BPTT,
    numerically gradient-checked in tests/test_lstm.py), so the
    reference-exact architecture trains without TensorFlow. The linear
    forecaster above remains the fast deterministic stand-in behind
    the same windows→pred contract."""
    from .lstm import fit_lstm_forecaster_df

    return fit_lstm_forecaster_df(windows, **kwargs)


def predict_ensemble_stats(
    points: DataFrame,
    thetas: list[list[float]],
    feature_cols: list[str],
    id_col: str = "point_id",
    degree: int = 2,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """M2+M3 fused: per-point ensemble mean and population variance in
    the SAME ``mapInPandas`` pass that evaluates the members — zero
    shuffle, zero join.

    The long-format ``predict_ensemble`` → ``ensemble_stats`` path is
    the general contract (any model family, any reducer), but it costs
    a groupBy shuffle of the predictions table plus a join back to the
    pool. When the consumer only needs mean/var (the §3.1 scoring pass
    — by far the hottest path at scale), fusing the reduction into the
    scorer turns the whole M2→A5/A6 stage into one narrow map pass
    over the pool: at 1000 executors there is no exchange at all."""
    import numpy as np

    theta_arr = [np.asarray(t, dtype="float64") for t in thetas]
    f_cols = list(feature_cols)
    carry = [c for c in (carry_cols or []) if c != id_col]
    in_cols = [id_col, *dict.fromkeys([*f_cols, *carry])]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = pdf[f_cols].to_numpy(dtype="float64")
            preds = np.stack([predict_poly(X, th, degree) for th in theta_arr])
            out = {id_col: pdf[id_col].to_numpy()}
            for c in carry:
                out[c] = pdf[c].to_numpy()
            out["y_mean"] = preds.mean(axis=0)
            out["y_var"] = preds.var(axis=0)  # ddof=0, matching np.var/A6
            yield pd.DataFrame(out)

    carry_schema = "".join(f", {c} DOUBLE" for c in carry)
    schema = f"{id_col} BIGINT{carry_schema}, y_mean DOUBLE, y_var DOUBLE"
    return points.select(*in_cols).mapInPandas(score, schema)
