"""NT-scaled conic interior-point solver vs the DR/ADMM oracle.

The reference delegates conic solving to SCS (``moi_wrapper.jl:483-487``);
we own two embedded solvers and cross-check them: the general DR splitting
(``solvers/conic.py``) is the oracle for the symmetric-cone IPM
(``solvers/conic_ipm.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffopt_tpu import ConeProgram, ConeSpec, solve_conic
from diffopt_tpu.solvers import conic as dr
from diffopt_tpu.solvers import conic_ipm as ipm


def _socp(seed=0, n=8, k=9):
    """Strictly feasible, bounded SOCP: min c'x s.t. ||Fx-g|| <= e'x + f."""
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(k, n))
    g = rng.normal(size=k)
    e = rng.normal(size=n)
    e *= 0.5 * np.linalg.svd(F, compute_uv=False)[-1] / np.linalg.norm(e)
    f = np.linalg.norm(g) + 1.0
    c = rng.normal(size=n)
    A = np.concatenate([-e[None, :], -F], axis=0)
    b = np.concatenate([[f], -g])
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("soc", k + 1)]),
    )


def test_socp_matches_dr_oracle():
    cp = _socp()
    sol_dr, info_dr = dr.solve(cp, max_iters=60000, tol=1e-11)
    sol, info = ipm.solve(cp)
    assert bool(info.converged) and bool(info_dr.converged)
    assert int(info.iterations) <= 25
    # DR's own first-order tail error (~1e-6 after 6e4 iters) dominates
    np.testing.assert_allclose(sol.x, sol_dr.x, atol=2e-5)
    np.testing.assert_allclose(sol.y, sol_dr.y, atol=2e-5)
    np.testing.assert_allclose(sol.s, sol_dr.s, atol=2e-5)
    # KKT at the IPM solution: Ax + s = b, A'y + c = 0, s.y = 0
    np.testing.assert_allclose(cp.A @ sol.x + sol.s, cp.b, atol=1e-8)
    np.testing.assert_allclose(cp.A.T @ sol.y, -cp.c, atol=1e-8)
    assert abs(float(jnp.dot(sol.s, sol.y))) < 1e-7


def test_lp_mixed_cones_matches_dr():
    """zero + nonneg + nonpos rows (the row-transform's sign flips)."""
    rng = np.random.default_rng(3)
    n = 6
    A1 = rng.normal(size=(2, n))
    x_feas = rng.uniform(1, 2, n)
    b1 = A1 @ x_feas
    A2 = -np.eye(n)  # x >= 0
    b2 = np.zeros(n)
    A3 = -np.eye(3, n)  # b3 - (-x) in nonpos  <=>  x <= -b3... sign-flip block
    b3 = -(x_feas[:3] + 1.0)
    A = np.concatenate([A1, A2, A3], axis=0)
    b = np.concatenate([b1, b2, b3])
    c = rng.normal(size=n)
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("zero", 2), ("nonneg", n), ("nonpos", 3)]),
    )
    sol_dr, info_dr = dr.solve(cp, max_iters=60000, tol=1e-11)
    sol, info = ipm.solve(cp)
    assert bool(info.converged) and bool(info_dr.converged)
    np.testing.assert_allclose(sol.x, sol_dr.x, atol=1e-7)
    np.testing.assert_allclose(sol.y, sol_dr.y, atol=1e-7)


def test_rsoc_matches_dr():
    """min c'x s.t. ||Fx - g||^2 <= 2 (e'x + f) * 1 via an rsoc block."""
    rng = np.random.default_rng(5)
    n, k = 6, 7
    F = rng.normal(size=(k, n))
    g = rng.normal(size=k)
    e = rng.normal(size=n) * 0.3
    f = 0.5 * np.dot(g, g) + 1.0  # 2*f*1 > ||g||^2: strictly feasible at 0
    c = rng.normal(size=n)
    A = np.concatenate([-e[None, :], np.zeros((1, n)), -F], axis=0)
    b = np.concatenate([[f], [1.0], -g])
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("rsoc", k + 2)]),
    )
    sol_dr, info_dr = dr.solve(cp, max_iters=60000, tol=1e-11)
    # this instance's dual is sensitive (~sqrt(gap) error amplification):
    # matching DR-at-1e-11 to 2e-5 needs the IPM driven past its 1e-9
    # default too
    sol, info = ipm.solve(cp, tol=1e-11)
    assert bool(info.converged) and bool(info_dr.converged)
    np.testing.assert_allclose(sol.x, sol_dr.x, atol=2e-5)
    np.testing.assert_allclose(sol.y, sol_dr.y, atol=2e-5)
    np.testing.assert_allclose(cp.A @ sol.x + sol.s, cp.b, atol=1e-8)
    np.testing.assert_allclose(cp.A.T @ sol.y, -cp.c, atol=1e-8)


def test_infeasible_reports_not_converged():
    # ||x - g|| <= -1 is empty
    n = 3
    A = np.concatenate([np.zeros((1, n)), -np.eye(n)], axis=0)
    b = np.concatenate([[-1.0], np.ones(n)])
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(np.ones(n)),
        cones=ConeSpec([("soc", n + 1)]),
    )
    _, info = ipm.solve(cp)
    assert not bool(info.converged)


def test_batched_jit_convergence():
    cps = [_socp(seed=100 + i) for i in range(8)]
    cp = jax.tree.map(lambda *xs: jnp.stack(xs), *cps)
    cp = ConeProgram(A=cp.A, b=cp.b, c=cp.c, cones=cps[0].cones)
    sol, info = jax.jit(ipm.solve_batched)(cp)
    assert bool(jnp.all(info.converged))
    assert int(jnp.max(info.iterations)) <= 25
    for i in range(8):
        sdr, _ = dr.solve(jax.tree.map(lambda x: x[i], cp), max_iters=60000, tol=1e-11)
        np.testing.assert_allclose(sol.x[i], sdr.x, atol=2e-5, rtol=1e-5)


def test_solve_conic_auto_gradients_match_dr():
    """The AD entry point with solver='auto' (-> IPM) must give the same
    gradients as solver='dr': differentiation is implicit, solver-agnostic."""
    cp = _socp(seed=7)

    def loss(cp, solver):
        # polish both solved points onto the HSDE residual manifold so the
        # comparison measures the DIFFERENTIATION (solver-agnostic), not the
        # two solvers' independent ~1e-6 terminal solution noise, which the
        # implicit-diff linear systems amplify ~10x
        sol = solve_conic(
            cp, max_iters=60000, tol=1e-11, solver=solver, polish=2
        )
        return jnp.sum(sol.x**2) + jnp.sum(sol.y * sol.s)

    g_auto = jax.grad(lambda c: loss(c, "auto"))(cp)
    g_dr = jax.grad(lambda c: loss(c, "dr"))(cp)
    np.testing.assert_allclose(g_auto.A, g_dr.A, atol=1e-9)
    np.testing.assert_allclose(g_auto.b, g_dr.b, atol=1e-9)
    np.testing.assert_allclose(g_auto.c, g_dr.c, atol=1e-9)


def test_unsupported_cones_raise():
    cp = ConeProgram(
        A=jnp.zeros((3, 2)), b=jnp.ones(3), c=jnp.ones(2),
        cones=ConeSpec([("exp", 3)]),
    )
    with pytest.raises(ValueError, match="zero/nonneg/nonpos/soc/rsoc"):
        ipm.solve(cp)
