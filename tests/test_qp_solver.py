"""Embedded PDIP QP/LP solver correctness (the forward pass the reference
delegates to HiGHS/Ipopt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import QuadProgram
from diffopt_tpu.solvers import qp as qpsolver
from diffopt_tpu.ops.kkt import kkt_residual
from diffopt_tpu.ir import QPSolution


def test_simple_lp():
    # min 2x s.t. x >= 3  ->  -x <= -3  (reference README.md:106-123)
    qp = QuadProgram.make(q=[2.0], G=[[-1.0]], h=[-3.0])
    sol, info = qpsolver.solve(qp)
    assert info.converged
    np.testing.assert_allclose(sol.z, [3.0], atol=1e-7)
    # stationarity: q + G'lam = 0 -> lam = 2
    np.testing.assert_allclose(sol.lam, [2.0], atol=1e-7)


def test_simple_qp_eq_ineq():
    # min x^2 + y^2  s.t. x + y = 1, x <= 0.3
    qp = QuadProgram.make(
        Q=[[2.0, 0.0], [0.0, 2.0]],
        q=[0.0, 0.0],
        A=[[1.0, 1.0]],
        b=[1.0],
        G=[[1.0, 0.0]],
        h=[0.3],
    )
    sol, info = qpsolver.solve(qp)
    assert info.converged
    np.testing.assert_allclose(sol.z, [0.3, 0.7], atol=1e-7)
    # KKT: 2x + lam + nu = 0; 2y + nu = 0 -> nu = -1.4, lam = 0.8
    np.testing.assert_allclose(sol.nu, [-1.4], atol=1e-7)
    np.testing.assert_allclose(sol.lam, [0.8], atol=1e-7)


def test_inactive_constraint_zero_dual():
    qp = QuadProgram.make(
        Q=[[2.0, 0.0], [0.0, 2.0]],
        q=[-2.0, -2.0],
        G=[[1.0, 0.0]],
        h=[10.0],  # far from active
    )
    sol, info = qpsolver.solve(qp)
    assert info.converged
    np.testing.assert_allclose(sol.z, [1.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(sol.lam, [0.0], atol=1e-7)


def test_random_qps_kkt_residual():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n, m, p = 12, 8, 4
        L = rng.normal(size=(n, n))
        Q = L @ L.T + n * np.eye(n)
        qp = QuadProgram.make(
            Q=Q,
            q=rng.normal(size=n),
            A=rng.normal(size=(p, n)),
            b=rng.normal(size=p),
            G=rng.normal(size=(m, n)),
            h=rng.normal(size=m) + 2.0,
        )
        sol, info = qpsolver.solve(qp)
        assert bool(info.converged), (info.primal_residual, info.dual_residual)
        res = kkt_residual(qp, sol)
        assert np.linalg.norm(res) < 1e-7
        assert np.all(np.asarray(sol.lam) >= -1e-9)


def test_batched_solve():
    rng = np.random.default_rng(1)
    B, n, m = 16, 6, 4
    L = rng.normal(size=(B, n, n))
    Q = jnp.asarray(L @ np.transpose(L, (0, 2, 1)) + 5 * np.eye(n))
    qp = QuadProgram(
        Q=Q,
        q=jnp.asarray(rng.normal(size=(B, n))),
        A=jnp.zeros((B, 0, n)),
        b=jnp.zeros((B, 0)),
        G=jnp.asarray(rng.normal(size=(B, m, n))),
        h=jnp.asarray(rng.normal(size=(B, m)) + 1.0),
    )
    sol, info = qpsolver.solve_batched(qp)
    assert np.all(np.asarray(info.converged))
    res = jax.vmap(kkt_residual)(qp, sol)
    assert float(jnp.max(jnp.linalg.norm(res, axis=-1))) < 1e-7


def test_golden_problem_solves():
    import pathlib

    d = pathlib.Path(__file__).parent / "data"
    Q = np.loadtxt(d / "P.txt")
    q = np.loadtxt(d / "q.txt")
    G = np.loadtxt(d / "G.txt")
    h = np.loadtxt(d / "h.txt")
    A = np.loadtxt(d / "A.txt")
    b = np.loadtxt(d / "b.txt")
    qp = QuadProgram.make(Q=Q, q=q, A=A, b=b, G=G, h=h)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    assert float(jnp.linalg.norm(kkt_residual(qp, sol))) < 1e-6
