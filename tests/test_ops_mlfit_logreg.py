"""logistic_fit: NumPy GD parity and learning sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hudi_utility_spark.ops.mlfit import logistic_fit


def _numpy_gd(X, y, iters, lr, q):
    w = np.zeros(X.shape[1] + 1)
    n = len(y)
    for _ in range(iters):
        z = w[0] + X @ w[1:]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.concatenate([[err.sum()], err @ X])
        w = np.round(w - lr * g / n, q)
    return w


def test_logistic_fit_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(int)
    rows = [(float(a), float(b), int(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")

    got = logistic_fit(df, ["x1", "x2"], "y", iters=4, lr=0.3, round_to=6)
    want = _numpy_gd(X, y, iters=4, lr=0.3, q=6)
    assert np.allclose(got, want, atol=1e-9), (got, want)


def test_logistic_fit_learns_the_signal(spark):
    """On linearly separable data the signal feature's weight grows
    positive and the loss decreases vs the zero model."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 1))
    y = (X[:, 0] > 0).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(t)) for (a,), t in zip(X, y)], "x1 double, y int"
    )
    w = logistic_fit(df, ["x1"], "y", iters=10, lr=1.0)
    assert w[1] > 0.5  # signal direction learned

    p = 1.0 / (1.0 + np.exp(-(w[0] + X[:, 0] * w[1])))
    eps = 1e-12
    loss = -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    base = -np.log(0.5)  # zero-weights model
    assert loss < base
