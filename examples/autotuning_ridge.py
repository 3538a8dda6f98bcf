"""Hyperparameter gradient descent through an optimization layer.

TPU-native rewrite of the reference's ``autotuning-ridge.jl`` example: ridge
regression ``min_w |Xw - y|^2 + alpha |w|^2`` is a QP in ``w`` whose solution
map is differentiable in ``alpha``; tune ``alpha`` by gradient descent on a
validation loss.
"""

import numpy as np

import jax
import jax.numpy as jnp

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffopt_tpu import QuadProgram, solve_qp


def ridge_fit(X, y, alpha):
    """Solve ridge regression as an unconstrained QP layer (differentiable
    in alpha through the KKT system)."""
    n = X.shape[1]
    qp = QuadProgram(
        Q=2 * (X.T @ X + alpha * jnp.eye(n, dtype=X.dtype)),
        q=-2 * X.T @ y,
        A=jnp.zeros((0, n), X.dtype),
        b=jnp.zeros((0,), X.dtype),
        G=jnp.zeros((0, n), X.dtype),
        h=jnp.zeros((0,), X.dtype),
    )
    return solve_qp(qp).z


def autotune(steps=100, lr=5e-2, seed=0):
    rng = np.random.default_rng(seed)
    N, n = 120, 8
    w_true = rng.normal(size=n)
    X = rng.normal(size=(N, n))
    y = X @ w_true + 0.5 * rng.normal(size=N)
    Xtr, ytr = jnp.asarray(X[:80]), jnp.asarray(y[:80])
    Xva, yva = jnp.asarray(X[80:]), jnp.asarray(y[80:])

    def val_loss(log_alpha):
        w = ridge_fit(Xtr, ytr, jnp.exp(log_alpha))
        return jnp.mean((Xva @ w - yva) ** 2)

    g = jax.jit(jax.value_and_grad(val_loss))
    la = jnp.asarray(0.0)
    hist = []
    for _ in range(steps):
        v, dv = g(la)
        la = la - lr * dv
        hist.append((float(jnp.exp(la)), float(v)))
    return hist


if __name__ == "__main__":
    hist = autotune()
    print(f"alpha: {hist[0][0]:.4f} -> {hist[-1][0]:.4f}; "
          f"val loss {hist[0][1]:.4f} -> {hist[-1][1]:.4f}")
