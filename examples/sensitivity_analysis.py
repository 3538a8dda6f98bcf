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


def matrix_inversion_manual_check():
    """Reference ``matrix-inversion-manual.jl``: QP with Q=[[4,1],[1,2]],
    q=[1,1], G=[1,1], h=-1. x* = (-0.25, -0.75), AK17 lam* = 0.75 (MOI dual
    -0.75). Compare dx/dh from the framework against the hand-built AK17
    eq.(6) system."""
    Q = np.array([[4.0, 1.0], [1.0, 2.0]])
    q = np.array([1.0, 1.0])
    G = np.array([[1.0, 1.0]])
    h = np.array([-1.0])
    qp = QuadProgram.make(Q=Q, q=q, G=G, h=h)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)

    # hand-built eq (6): [Q G'; lam G, Gz-h][dx; dlam] = [0; lam dh]
    lam = float(sol.lam[0])
    z = np.asarray(sol.z)
    Mh = np.block([
        [Q, G.T],
        [lam * G, (G @ z - h).reshape(1, 1)],
    ])
    rhs = np.array([0.0, 0.0, lam * 1.0])
    manual = np.linalg.solve(Mh, rhs)[:2]

    dqp = QPTangent.zeros_like(qp)
    dqp = QPTangent(dQ=dqp.dQ, dq=dqp.dq, dA=dqp.dA, db=dqp.db, dG=dqp.dG,
                    dh=jnp.array([1.0]))
    fwd = forward_differentiate(qp, sol, dqp)
    return np.asarray(sol.z), manual, np.asarray(fwd.dz)


def ridge_data_sensitivity(N=40, seed=7):
    """Reference ``sensitivity-analysis-ridge.jl``: fit y ~ w x + b by ridge
    regression (as an equality-constrained QP over (w, b, e)) and compute the
    sensitivity d(w)/d(y_i) of the slope to each data point."""
    rng = np.random.default_rng(seed)
    w_true, b_true = 2.0, 0.5
    X = rng.normal(size=N)
    Y = w_true * X + b_true + 0.3 * rng.normal(size=N)
    alpha = 0.1

    # vars: [w, b, e_1..e_N]; min e'e + alpha(w^2+b^2) s.t. e_i = y_i - w x_i - b
    nv = 2 + N
    Qm = np.zeros((nv, nv))
    Qm[0, 0] = Qm[1, 1] = 2 * alpha
    Qm[2:, 2:] = 2 * np.eye(N)
    A = np.zeros((N, nv))
    A[:, 0] = X
    A[:, 1] = 1.0
    A[:, 2:] = np.eye(N)
    qp = QuadProgram.make(Q=Qm, q=np.zeros(nv), A=A, b=Y)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)

    # d(w)/d(y_i): forward diff with db = e_i, batched over i via vmap
    def dw_for(i):
        db = jnp.zeros(N).at[i].set(1.0)
        dqp = QPTangent(
            dQ=jnp.zeros((nv, nv)), dq=jnp.zeros(nv), dA=jnp.zeros((N, nv)),
            db=db, dG=jnp.zeros((0, nv)), dh=jnp.zeros(0),
        )
        return forward_differentiate(qp, sol, dqp).dz[0]

    dw = jax.vmap(dw_for)(jnp.arange(N))
    return float(sol.z[0]), float(sol.z[1]), np.asarray(dw), X


if __name__ == "__main__":
    w, dw = svm_hyperplane_sensitivity()
    print("SVM w:", w.round(4), " dw/deps:", dw.round(4))
    g, price, dg = economic_dispatch_prices()
    print("dispatch:", g.round(4), " price:", price, " dg/ddemand:", dg.round(4))
    z, manual, fw = matrix_inversion_manual_check()
    print("manual vs framework dz:", manual.round(6), fw.round(6))
    w, b, dw, X = ridge_data_sensitivity()
    print(f"ridge fit w={w:.3f} b={b:.3f}; max |dw/dy| = {abs(dw).max():.4f}")
