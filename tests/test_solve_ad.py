"""AD integration: solve_qp / solve_conic under jax.grad / jax.jvp — the
framework's replacement for the reference's ChainRules frule/rrule examples
(``/root/reference/docs/src/examples/chainrules_unit.jl``)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffopt_tpu import (
    ConeProgram,
    ConeSpec,
    QuadProgram,
    solve_conic,
    solve_qp,
)
from diffopt_tpu import forward_differentiate, reverse_differentiate
from diffopt_tpu.ir import QPTangent
from diffopt_tpu.solvers import qp as qpsolver


def _qp(rng, n=6, m=4, p=2):
    L = rng.normal(size=(n, n))
    return QuadProgram.make(
        Q=L @ L.T + n * np.eye(n),
        q=rng.normal(size=n),
        A=rng.normal(size=(p, n)),
        b=rng.normal(size=p),
        G=rng.normal(size=(m, n)),
        h=rng.normal(size=m) + 1.0,
    )


def test_grad_through_solve_qp():
    rng = np.random.default_rng(21)
    qp = _qp(rng)

    def loss(qp):
        sol = solve_qp(qp)
        return jnp.sum(sol.z**2)

    g = jax.grad(loss)(qp)
    # compare against the explicit reverse verb with seed 2z
    sol, _ = qpsolver.solve(qp)
    rev = reverse_differentiate(qp, sol, dz=2 * sol.z)
    np.testing.assert_allclose(g.q, rev.dq, atol=1e-8)
    np.testing.assert_allclose(g.h, rev.dh, atol=1e-8)
    np.testing.assert_allclose(g.b, rev.db, atol=1e-8)
    np.testing.assert_allclose(g.Q, rev.dQ, atol=1e-8)


def test_jvp_through_solve_qp():
    rng = np.random.default_rng(22)
    qp = _qp(rng)
    dq = jnp.asarray(rng.normal(size=qp.q.shape))
    tangent = QuadProgram(
        Q=jnp.zeros_like(qp.Q),
        q=dq,
        A=jnp.zeros_like(qp.A),
        b=jnp.zeros_like(qp.b),
        G=jnp.zeros_like(qp.G),
        h=jnp.zeros_like(qp.h),
    )
    sol, dsol = jax.jvp(lambda q_: solve_qp(q_, mode="jvp"), (qp,), (tangent,))
    ref_sol, _ = qpsolver.solve(qp)
    fwd = forward_differentiate(
        qp,
        ref_sol,
        QPTangent(
            dQ=tangent.Q, dq=dq, dA=tangent.A, db=tangent.b, dG=tangent.G, dh=tangent.h
        ),
    )
    np.testing.assert_allclose(dsol.z, fwd.dz, atol=1e-8)
    np.testing.assert_allclose(dsol.lam, fwd.dlam, atol=1e-8)


def test_grad_through_solve_conic():
    """d(c'x*)/db should equal -y* for a conic program (standard LP duality
    sensitivity) — checks the custom_vjp wiring end-to-end."""
    rng = np.random.default_rng(23)
    n, m = 3, 5
    cones = ConeSpec([("nonneg", m)])
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    sstar = np.array([0.0, 0.0, 0.0, 1.0, 2.0])
    ystar = np.array([1.0, 2.0, 1.5, 0.0, 0.0])
    b = A @ xstar + sstar
    c = -A.T @ ystar
    cp = ConeProgram(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones)

    def objective(cp):
        sol = solve_conic(cp, max_iters=60000, tol=1e-11)
        return jnp.dot(cp.c, sol.x)

    g = jax.grad(objective)(cp)
    sol = solve_conic(cp, max_iters=60000, tol=1e-11)
    # For min c'x s.t. Ax+s=b with dual stationarity A'y = -c (Lagrangian
    # c'x + y'(Ax + s - b)): envelope theorem gives d(opt)/db = -y*.
    # Verified against central finite differences of the ADMM solver.
    np.testing.assert_allclose(g.b, -sol.y, atol=1e-5, rtol=1e-5)
