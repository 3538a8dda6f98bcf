"""Optimization layers in neural networks — the framework's L6 story.

TPU-native rewrites of the reference's ML-integration examples
(``/root/reference/docs/src/examples/custom-relu.jl`` — a QP-backed ReLU
trained inside a Flux network — and ``polyhedral_project.jl`` — a learnable
polyhedral projection layer). Because ``solve_qp`` carries a ``custom_vjp``,
the layers drop straight into Flax/Optax training loops; no ChainRules
machinery is needed.

Run: ``python examples/qp_layers.py`` (CPU or TPU).
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffopt_tpu import QuadProgram, solve_qp


def qp_relu(y):
    """ReLU as a QP layer: argmin_x 1/2|x - y|^2 s.t. x >= 0
    (custom-relu.jl:25-61). Differentiable through the KKT system — the
    gradient is the active-set mask, recovered implicitly, not by autodiff
    through solver iterations."""
    n = y.shape[-1]
    qp = QuadProgram(
        Q=jnp.eye(n, dtype=y.dtype),
        q=-y,
        A=jnp.zeros((0, n), y.dtype),
        b=jnp.zeros((0,), y.dtype),
        G=-jnp.eye(n, dtype=y.dtype),
        h=jnp.zeros((n,), y.dtype),
    )
    return solve_qp(qp).z


def polyhedral_project(y, G, h):
    """Projection onto {x : Gx <= h} as a differentiable layer
    (polyhedral_project.jl). Gradients flow to y AND to the polytope (G, h)."""
    n = y.shape[-1]
    qp = QuadProgram(
        Q=jnp.eye(n, dtype=y.dtype),
        q=-y,
        A=jnp.zeros((0, n), y.dtype),
        b=jnp.zeros((0,), y.dtype),
        G=G,
        h=h,
    )
    return solve_qp(qp).z


def train_qp_relu_mlp(steps=60, seed=0):
    """Two-layer MLP with the QP-ReLU activation on a synthetic regression
    task; returns the loss trajectory."""
    rng = np.random.default_rng(seed)
    n_in, n_hidden, n_out, N = 4, 8, 1, 256
    X = rng.normal(size=(N, n_in))
    w_true = rng.normal(size=(n_in,))
    Y = np.maximum(X @ w_true, 0.0)[:, None]

    params = {
        "W1": jnp.asarray(rng.normal(size=(n_in, n_hidden)) * 0.5),
        "b1": jnp.zeros(n_hidden),
        "W2": jnp.asarray(rng.normal(size=(n_hidden, n_out)) * 0.5),
        "b2": jnp.zeros(n_out),
    }
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    def forward(params, x):
        hpre = x @ params["W1"] + params["b1"]
        hact = jax.vmap(qp_relu)(hpre)  # batched QP layer
        return hact @ params["W2"] + params["b2"]

    def loss_fn(params):
        return jnp.mean((forward(params, Xj) - Yj) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    losses = []

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return losses


def learn_polytope(steps=80, seed=1):
    """Learn (G, h) so that projection onto the polytope matches target
    points: gradients w.r.t. constraint data through the QP layer."""
    rng = np.random.default_rng(seed)
    n, m, N = 2, 4, 64
    Y = rng.normal(size=(N, n)) * 2.0
    # target: projection onto the unit box
    T = np.clip(Y, -1.0, 1.0)
    G0 = jnp.asarray(np.vstack([np.eye(n), -np.eye(n)]) + 0.1 * rng.normal(size=(2 * n, n)))
    h0 = jnp.asarray(np.full(2 * n, 1.5))
    params = {"G": G0, "h": h0}
    Yj, Tj = jnp.asarray(Y), jnp.asarray(T)

    def loss_fn(params):
        proj = jax.vmap(lambda y: polyhedral_project(y, params["G"], params["h"]))(Yj)
        return jnp.mean((proj - Tj) ** 2)

    opt = optax.adam(5e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return losses


if __name__ == "__main__":
    losses = train_qp_relu_mlp()
    print(f"QP-ReLU MLP: loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    losses = learn_polytope()
    print(f"Polytope learning: loss {losses[0]:.4f} -> {losses[-1]:.4f}")
