"""Sensitivity-analysis examples — TPU-native rewrites of the reference's
literate docs (``/root/reference/docs/src/examples/sensitivity-analysis-svm.jl``,
``sensitivity-analysis-ridge.jl``, ``thermal dispatch``): solve a program,
then ask "how does the solution move when the data moves?" via the
forward/reverse verbs.
"""

import numpy as np

import jax
import jax.numpy as jnp

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffopt_tpu import (
    QuadProgram,
    QPTangent,
    forward_differentiate,
    solve_qp,
)
from diffopt_tpu.solvers import qp as qpsolver


def svm_hyperplane_sensitivity(N=30, seed=0):
    """Soft-margin linear SVM as a QP; returns d(w)/d(eps) for a perturbation
    of every sample along its label direction (the reference example's
    experiment: how the separating hyperplane reacts to data movement).

    QP (variables [w (d,), b, xi (N,)]):
        min 1/2 |w|^2 + C sum xi
        s.t. y_i (w'x_i + b) >= 1 - xi_i,   xi >= 0
    """
    rng = np.random.default_rng(seed)
    d = 2
    X = np.vstack(
        [rng.normal(size=(N // 2, d)) + 2.0, rng.normal(size=(N // 2, d)) - 2.0]
    )
    y = np.concatenate([np.ones(N // 2), -np.ones(N // 2)])
    C = 1.0

    nv = d + 1 + N  # w, b, xi
    Q = np.zeros((nv, nv))
    Q[:d, :d] = np.eye(d)
    q = np.concatenate([np.zeros(d + 1), C * np.ones(N)])
    # -y_i(w'x_i + b) - xi_i <= -1 ; -xi <= 0
    G1 = np.hstack([-y[:, None] * X, -y[:, None], -np.eye(N)])
    G2 = np.hstack([np.zeros((N, d + 1)), -np.eye(N)])
    G = np.vstack([G1, G2])
    h = np.concatenate([-np.ones(N), np.zeros(N)])
    qp = QuadProgram.make(Q=Q, q=q, G=G, h=h)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    w = np.asarray(sol.z[:d])

    # perturb X_i -> X_i + eps * y_i * u (u fixed direction): dG1 rows change
    u = np.array([1.0, 0.0])
    dG = np.zeros_like(G)
    dG[:N, :d] = -y[:, None] * (y[:, None] * u)  # = -u broadcast
    dqp = QPTangent(
        dQ=jnp.zeros_like(qp.Q),
        dq=jnp.zeros_like(qp.q),
        dA=jnp.zeros_like(qp.A),
        db=jnp.zeros_like(qp.b),
        dG=jnp.asarray(dG),
        dh=jnp.zeros_like(qp.h),
    )
    fwd = forward_differentiate(qp, sol, dqp, method="lstsq")
    dw = np.asarray(fwd.dz[:d])
    return w, dw


def economic_dispatch_prices(demand=10.0):
    """Thermal economic dispatch LP: two generators with costs/limits; the
    equality dual is the marginal price, and d(price)/d(demand) and
    d(dispatch)/d(demand) come from the sensitivity system."""
    costs = jnp.array([1.0, 3.0])
    gmax = jnp.array([6.0, 10.0])

    def build(dem):
        # min c'g  s.t. sum g = dem, 0 <= g <= gmax
        return QuadProgram.make(
            q=costs,
            A=jnp.ones((1, 2)),
            b=dem.reshape(1),
            G=jnp.concatenate([jnp.eye(2), -jnp.eye(2)]),
            h=jnp.concatenate([gmax, jnp.zeros(2)]),
        )

    qp = build(jnp.asarray(demand))
    sol, info = qpsolver.solve(qp)
    price = -float(sol.nu[0])  # AK17 nu is negated MOI dual; price = MOI dual

    # d(dispatch)/d(demand) via the parameter chain rule
    _, dsol = jax.jvp(
        lambda dm: solve_qp(build(dm), method="lstsq", mode="jvp").z,
        (jnp.asarray(demand),),
        (jnp.asarray(1.0),),
    )
    return np.asarray(sol.z), price, np.asarray(dsol)


if __name__ == "__main__":
    w, dw = svm_hyperplane_sensitivity()
    print("SVM w:", w.round(4), " dw/deps:", dw.round(4))
    g, price, dg = economic_dispatch_prices()
    print("dispatch:", g.round(4), " price:", price, " dg/ddemand:", dg.round(4))
