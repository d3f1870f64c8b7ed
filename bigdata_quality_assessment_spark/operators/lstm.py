"""Pure-numpy LSTM sequence forecaster — the reference's M6 network
(SDE_forecast_ActiveSampling.py:153-171), reproduced without TensorFlow.

Architecture (faithful layer-for-layer; note every Dense in the
reference has NO activation — the LSTM is the only nonlinearity):

    Input(history, 1)
      → Dense(4) → Dense(8) → Dense(16)      (per-timestep, linear)
      → LSTM(32)                             (tanh / sigmoid gates)
      → Dense(16) → Dense(16) → Dense(pred)  (linear head)

Keras defaults mirrored: Glorot-uniform kernels, orthogonal recurrent
kernel, unit forget-gate bias, gate order (i, f, c, o), Adam
β₁=0.9 β₂=0.999 ε=1e-7, MSE loss, shuffled mini-batches (the reference
trains with ``batch_size=16, lr=1e-2``).

Training runs on the DRIVER over the distilled window set (the
reference collects it into ``model.fit`` identically); inference ships
the weight dict inside a ``mapInPandas`` closure — same contract as
``predict_forecaster`` for the linear stand-in in models.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def _glorot(rng, fan_in, fan_out):
    import numpy as np

    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-limit, limit, size=(fan_in, fan_out))


def _orthogonal(rng, n):
    import numpy as np

    a = rng.standard_normal((n, n))
    q, r = np.linalg.qr(a)
    return q * np.sign(np.diag(r))


def init_lstm_forecaster(
    history: int,
    prediction: int,
    embed_dims: tuple[int, ...] = (4, 8, 16),
    units: int = 32,
    head_dims: tuple[int, ...] = (16, 16),
    seed: int = 42,
):
    import numpy as np

    rng = np.random.RandomState(seed)
    p: dict = {"meta": (history, prediction, embed_dims, units, head_dims)}
    dims = [1, *embed_dims]
    p["embed"] = [
        (_glorot(rng, a, b), np.zeros(b)) for a, b in zip(dims[:-1], dims[1:])
    ]
    e = embed_dims[-1]
    p["Wx"] = _glorot(rng, e, 4 * units)
    p["Wh"] = np.concatenate([_orthogonal(rng, units) for _ in range(4)], axis=1)
    b = np.zeros(4 * units)
    b[units : 2 * units] = 1.0  # unit_forget_bias
    p["b"] = b
    hdims = [units, *head_dims, prediction]
    p["head"] = [
        (_glorot(rng, a, bo), np.zeros(bo)) for a, bo in zip(hdims[:-1], hdims[1:])
    ]
    return p


def _sigmoid(x):
    import numpy as np

    return 1.0 / (1.0 + np.exp(-x))


def _forward(p, X):
    """X: (n, T) scalars. Returns (pred, cache) — cache only what
    backprop needs."""
    import numpy as np

    n, T = X.shape
    _, _, embed_dims, units, _ = p["meta"]
    a = X[:, :, None]  # (n, T, 1)
    embed_acts = [a]
    for W, b in p["embed"]:
        a = a @ W + b
        embed_acts.append(a)
    xs = a  # (n, T, e)

    h = np.zeros((n, units))
    c = np.zeros((n, units))
    gates_cache = []
    for t in range(T):
        z = xs[:, t, :] @ p["Wx"] + h @ p["Wh"] + p["b"]
        i = _sigmoid(z[:, :units])
        f = _sigmoid(z[:, units : 2 * units])
        g = np.tanh(z[:, 2 * units : 3 * units])
        o = _sigmoid(z[:, 3 * units :])
        c_prev = c
        c = f * c_prev + i * g
        tc = np.tanh(c)
        h_prev = h
        h = o * tc
        gates_cache.append((i, f, g, o, c_prev, tc, h_prev))

    a = h
    head_acts = [a]
    for W, b in p["head"]:
        a = a @ W + b
        head_acts.append(a)
    cache = (X, embed_acts, xs, gates_cache, head_acts)
    return a, cache


def predict_lstm(p, X):
    import numpy as np

    pred, _ = _forward(p, np.asarray(X, dtype="float64"))
    return pred


def _backward(p, cache, dpred):
    import numpy as np

    X, embed_acts, xs, gates_cache, head_acts = cache
    n, T = X.shape
    _, _, _, units, _ = p["meta"]
    grads: dict = {}

    # linear head
    grads["head"] = []
    delta = dpred
    for li in range(len(p["head"]) - 1, -1, -1):
        W, _ = p["head"][li]
        grads["head"].append((head_acts[li].T @ delta, delta.sum(axis=0)))
        delta = delta @ W.T
    grads["head"].reverse()
    dh_next = delta  # gradient wrt final hidden state

    # BPTT
    dWx = np.zeros_like(p["Wx"])
    dWh = np.zeros_like(p["Wh"])
    db = np.zeros_like(p["b"])
    dxs = np.zeros_like(xs)
    dc_next = np.zeros((n, units))
    for t in range(T - 1, -1, -1):
        i, f, g, o, c_prev, tc, h_prev = gates_cache[t]
        dh = dh_next
        do = dh * tc
        dct = dh * o * (1.0 - tc * tc) + dc_next
        df = dct * c_prev
        di = dct * g
        dg = dct * i
        dz = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dWx += xs[:, t, :].T @ dz
        dWh += h_prev.T @ dz
        db += dz.sum(axis=0)
        dxs[:, t, :] = dz @ p["Wx"].T
        dh_next = dz @ p["Wh"].T
        dc_next = dct * f
    grads["Wx"], grads["Wh"], grads["b"] = dWx, dWh, db

    # per-timestep linear embedding
    grads["embed"] = []
    delta3 = dxs  # (n, T, e)
    for li in range(len(p["embed"]) - 1, -1, -1):
        W, _ = p["embed"][li]
        act = embed_acts[li]  # (n, T, in)
        gW = np.einsum("nti,ntj->ij", act, delta3)
        gb = delta3.sum(axis=(0, 1))
        grads["embed"].append((gW, gb))
        delta3 = delta3 @ W.T
    grads["embed"].reverse()
    return grads


def fit_lstm(
    X,
    Y,
    history: int | None = None,
    prediction: int | None = None,
    lr: float = 1e-2,
    epochs: int = 100,
    batch_size: int = 16,
    seed: int = 42,
    params: dict | None = None,
):
    """Train the forecaster with Adam on MSE. ``X``: (n, history),
    ``Y``: (n, prediction). Pass ``params`` to continue training an
    existing model (the reference's per-iteration ``model.fit`` retrain
    semantics, SDE_forecast_ActiveSampling.py:234)."""
    import numpy as np

    X = np.asarray(X, dtype="float64")
    Y = np.asarray(Y, dtype="float64")
    n, T = X.shape
    if params is None:
        params = init_lstm_forecaster(
            history or T, prediction or Y.shape[1], seed=seed
        )
    p = params

    flat_keys = ["Wx", "Wh", "b"]
    adam_m: dict = {}
    adam_v: dict = {}

    def _zeros_like_tree():
        import numpy as np

        return {
            "embed": [(np.zeros_like(W), np.zeros_like(b)) for W, b in p["embed"]],
            "head": [(np.zeros_like(W), np.zeros_like(b)) for W, b in p["head"]],
            **{k: np.zeros_like(p[k]) for k in flat_keys},
        }

    adam_m, adam_v = _zeros_like_tree(), _zeros_like_tree()
    b1, b2, eps = 0.9, 0.999, 1e-7
    rng = np.random.RandomState(seed + 13)
    step = 0

    def _adam_update(param, g, m, v):
        import numpy as np

        m[:] = b1 * m + (1 - b1) * g
        v[:] = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**step)
        vh = v / (1 - b2**step)
        param[:] = param - lr * mh / (np.sqrt(vh) + eps)

    for _ in range(epochs):
        order = rng.permutation(n)
        for s in range(0, n, batch_size):
            idx = order[s : s + batch_size]
            Xb, Yb = X[idx], Y[idx]
            pred, cache = _forward(p, Xb)
            dpred = (2.0 / pred.size) * (pred - Yb)
            grads = _backward(p, cache, dpred)
            step += 1
            for li, (gW, gb) in enumerate(grads["embed"]):
                _adam_update(p["embed"][li][0], gW, adam_m["embed"][li][0], adam_v["embed"][li][0])
                _adam_update(p["embed"][li][1], gb, adam_m["embed"][li][1], adam_v["embed"][li][1])
            for k in flat_keys:
                _adam_update(p[k], grads[k], adam_m[k], adam_v[k])
            for li, (gW, gb) in enumerate(grads["head"]):
                _adam_update(p["head"][li][0], gW, adam_m["head"][li][0], adam_v["head"][li][0])
                _adam_update(p["head"][li][1], gb, adam_m["head"][li][1], adam_v["head"][li][1])
    return p


def _params_to_lists(p: dict) -> dict:
    return {
        "meta": p["meta"],
        "embed": [(W.tolist(), b.tolist()) for W, b in p["embed"]],
        "head": [(W.tolist(), b.tolist()) for W, b in p["head"]],
        "Wx": p["Wx"].tolist(),
        "Wh": p["Wh"].tolist(),
        "b": p["b"].tolist(),
    }


def _params_from_lists(d: dict) -> dict:
    import numpy as np

    return {
        "meta": tuple(d["meta"]),
        "embed": [(np.asarray(W), np.asarray(b)) for W, b in d["embed"]],
        "head": [(np.asarray(W), np.asarray(b)) for W, b in d["head"]],
        "Wx": np.asarray(d["Wx"]),
        "Wh": np.asarray(d["Wh"]),
        "b": np.asarray(d["b"]),
    }


def fit_lstm_tf(
    X,
    Y,
    lr: float = 1e-2,
    epochs: int = 100,
    batch_size: int = 16,
    seed: int = 42,
):
    """The OPTIONAL TensorFlow/Keras M6 fit — the reference's actual
    model (SDE_forecast_ActiveSampling.py:153-171: per-timestep linear
    Dense 4→8→16, LSTM(32), linear head 16→16→pred, Adam + MSE),
    built and trained in Keras where tensorflow is importable, then
    EXPORTED into the numpy twin's weight dict so :func:`predict_lstm`
    and the Arrow inference closure consume either backend's output.
    Keras stores LSTM weights as (kernel, recurrent_kernel, bias) with
    gate order (i, f, c, o) — exactly the twin's (Wx, Wh, b) layout,
    so the export is a reshape-free copy. Raises ImportError without
    tensorflow (this container); NOT bit-pinned — the parity contract
    is fit quality (tests/test_lstm.py, skipped without TF)."""
    try:
        from tensorflow import keras
        from tensorflow.keras.utils import set_random_seed
    except ImportError as e:  # pragma: no cover - exercised via skip
        raise ImportError(
            "backend='tf' requires tensorflow; use the default numpy "
            "BPTT twin (fit_lstm)"
        ) from e
    import numpy as np

    X = np.asarray(X, dtype="float64")
    Y = np.asarray(Y, dtype="float64")
    n, T = X.shape
    pred = Y.shape[1]
    set_random_seed(seed)
    model = keras.Sequential(
        [keras.layers.Input(shape=(T, 1))]
        + [keras.layers.Dense(u) for u in (4, 8, 16)]  # linear, per-step
        + [keras.layers.LSTM(32)]
        + [keras.layers.Dense(u) for u in (16, 16)]
        + [keras.layers.Dense(pred)]
    )
    model.compile(
        optimizer=keras.optimizers.Adam(learning_rate=lr),
        loss=keras.losses.MeanSquaredError(),
    )
    model.fit(
        X[:, :, None], Y, epochs=epochs, batch_size=batch_size, verbose=0
    )
    layers = model.layers
    embed = [
        (np.asarray(W, dtype="float64"), np.asarray(b, dtype="float64"))
        for W, b in (lyr.get_weights() for lyr in layers[:3])
    ]
    Wx, Wh, b = (np.asarray(a, dtype="float64") for a in layers[3].get_weights())
    head = [
        (np.asarray(W, dtype="float64"), np.asarray(b_, dtype="float64"))
        for W, b_ in (lyr.get_weights() for lyr in layers[4:])
    ]
    return {
        "meta": (T, pred, (4, 8, 16), 32, (16, 16)),
        "embed": embed,
        "head": head,
        "Wx": Wx,
        "Wh": Wh,
        "b": b,
    }


def fit_lstm_forecaster_df(
    windows: DataFrame,
    lr: float = 1e-2,
    epochs: int = 100,
    batch_size: int = 16,
    seed: int = 42,
    params: dict | None = None,
    backend: str = "numpy",
) -> dict:
    """M6 train on a windows frame (``history``/``target`` array
    columns; driver-sized distilled set by design). Returns a
    serializable weight dict. ``backend='tf'`` (opt-in, requires
    tensorflow) runs the reference's Keras fit via :func:`fit_lstm_tf`
    — continuation training (``params``) stays numpy-only."""
    rows = windows.select("history", "target").collect()
    X = [list(r["history"]) for r in rows]
    Y = [list(r["target"]) for r in rows]
    if backend == "tf":
        if params is not None:
            raise ValueError(
                "continuation training (params) is numpy-only — the TF "
                "export drops optimizer state"
            )
        return _params_to_lists(
            fit_lstm_tf(
                X, Y, lr=lr, epochs=epochs, batch_size=batch_size, seed=seed
            )
        )
    if backend != "numpy":
        raise ValueError(f"backend must be 'numpy' or 'tf', got {backend!r}")
    fitted = fit_lstm(
        X, Y, lr=lr, epochs=epochs, batch_size=batch_size, seed=seed,
        params=_params_from_lists(params) if params is not None else None,
    )
    return _params_to_lists(fitted)


def predict_lstm_forecaster(windows: DataFrame, params: dict) -> DataFrame:
    """M6 inference: one ``mapInPandas`` pass, weights in the closure —
    same (window_id, history, target, pred) contract as the linear
    ``predict_forecaster``."""
    import pandas as pd

    cols = [c for c in windows.columns if c in ("window_id", "history", "target")]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        p = _params_from_lists(params)
        for pdf in batches:
            X = np.array([list(h) for h in pdf["history"]], dtype="float64")
            pred = predict_lstm(p, X)
            out = {c: pdf[c] for c in cols}
            out["pred"] = [list(row) for row in pred]
            yield pd.DataFrame(out)

    schema = (
        "window_id BIGINT, history ARRAY<DOUBLE>, target ARRAY<DOUBLE>, "
        "pred ARRAY<DOUBLE>"
    )
    return windows.select(*cols).mapInPandas(run, schema)
