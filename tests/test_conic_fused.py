"""Fused single-kernel conic IPM (ops/pallas/conic_pdip.py, interpret mode on
CPU) vs the vmapped XLA IPM oracle, plus the solve_conic_batched AD entry."""

import numpy as np

import jax
import jax.numpy as jnp

from diffopt_tpu import ConeProgram, ConeSpec, solve_conic, solve_conic_batched
from diffopt_tpu.solvers import conic_ipm as ipm


def _socp_batch(B, n=8, k=9, seed=0):
    rng = np.random.default_rng(seed)
    F = rng.normal(size=(B, k, n))
    U, S, Vt = np.linalg.svd(F, full_matrices=False)
    F = (U * np.clip(S, 1.0, 2.0)[:, None, :]) @ Vt
    g = rng.normal(size=(B, k))
    e = rng.normal(size=(B, n))
    e *= (0.5 / np.linalg.norm(e, axis=1))[:, None]
    f = np.linalg.norm(g, axis=1, keepdims=True) + 1.0
    c = rng.normal(size=(B, n))
    A = np.concatenate([-e[:, None, :], -F], axis=1)
    b = np.concatenate([f, -g], axis=1)
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("soc", k + 1)]),
    )


def test_fused_soc_matches_xla_ipm():
    cp = _socp_batch(8)
    s_f, i_f = ipm.solve_batched_fused(cp)
    s_x, i_x = ipm.solve_batched(cp)
    assert bool(jnp.all(i_f.converged)) and bool(jnp.all(i_x.converged))
    np.testing.assert_allclose(s_f.x, s_x.x, atol=1e-6)
    np.testing.assert_allclose(s_f.y, s_x.y, atol=1e-4)
    np.testing.assert_allclose(s_f.s, s_x.s, atol=1e-6)
    # KKT at the fused solutions
    Ax_s = jnp.einsum("bij,bj->bi", cp.A, s_f.x) + s_f.s
    np.testing.assert_allclose(Ax_s, cp.b, atol=1e-7)
    Aty = jnp.einsum("bij,bi->bj", cp.A, s_f.y)
    np.testing.assert_allclose(Aty, -cp.c, atol=1e-7)


def test_fused_mixed_cones_matches_xla_ipm():
    """zero + nonneg + soc rows (equalities and the polyhedral block)."""
    rng = np.random.default_rng(3)
    B, n, k = 8, 6, 5
    A1 = rng.normal(size=(B, 2, n))
    xf = rng.uniform(1, 2, (B, n))
    b1 = np.einsum("bij,bj->bi", A1, xf)
    A2 = -np.tile(np.eye(n)[None], (B, 1, 1))
    b2 = np.zeros((B, n))
    F = rng.normal(size=(B, k, n)) * 0.4
    g = np.einsum("bij,bj->bi", F, xf)
    e2 = rng.normal(size=(B, n)) * 0.1
    f2 = np.abs(rng.normal(size=(B, 1))) + 2.0
    A3 = np.concatenate([-e2[:, None, :], -F], axis=1)
    b3 = np.concatenate([f2, -g], axis=1)
    cp = ConeProgram(
        A=jnp.asarray(np.concatenate([A1, A2, A3], axis=1)),
        b=jnp.asarray(np.concatenate([b1, b2, b3], axis=1)),
        c=jnp.asarray(rng.normal(size=(B, n))),
        cones=ConeSpec([("zero", 2), ("nonneg", n), ("soc", k + 1)]),
    )
    s_f, i_f = ipm.solve_batched_fused(cp)
    s_x, i_x = ipm.solve_batched(cp)
    assert bool(jnp.all(i_f.converged)) and bool(jnp.all(i_x.converged))
    np.testing.assert_allclose(s_f.x, s_x.x, atol=1e-6)
    np.testing.assert_allclose(s_f.y, s_x.y, atol=1e-5)


def test_fused_fallback_unsupported():
    """exp-cone programs route through solve_batched_fused to the
    nonsymmetric-cone PDIPM (not a ValueError): batched entropy program,
    one instance."""
    import sys, pathlib as _pl

    sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
    from test_exp_cone_program import _entropy_program

    cp1 = _entropy_program(k=2)
    cp = ConeProgram(
        A=cp1.A[None], b=cp1.b[None], c=cp1.c[None], cones=cp1.cones
    )
    assert not ipm.supports(cp.cones)
    sol, info = ipm.solve_batched_fused(cp, max_iters=20000, tol=1e-9)
    assert bool(jnp.all(info.converged))
    # entropy max over the simplex: uniform distribution
    np.testing.assert_allclose(sol.x[0, :2], 0.5, atol=1e-6)


def test_solve_conic_batched_gradients_match_unbatched():
    cp = _socp_batch(4, seed=11)

    def loss_batched(cp):
        sol = solve_conic_batched(cp, tol=1e-10)
        return jnp.sum(sol.x**2)

    def loss_ref(cp):
        sol = jax.vmap(
            lambda A, b, c: solve_conic(
                ConeProgram(A=A, b=b, c=c, cones=cp.cones),
                tol=1e-10, method="lstsq", solver="ipm",
            )
        )(cp.A, cp.b, cp.c)
        return jnp.sum(sol.x**2)

    g1 = jax.grad(loss_batched)(cp)
    g2 = jax.grad(loss_ref)(cp)
    # both sides differentiate implicitly at their own solver's solution;
    # the residual solve-tolerance difference dominates
    np.testing.assert_allclose(g1.A, g2.A, atol=1e-4)
    np.testing.assert_allclose(g1.b, g2.b, atol=1e-4)
    np.testing.assert_allclose(g1.c, g2.c, atol=1e-4)


def test_fused_reports_per_instance_iterations():
    cp = _socp_batch(8, seed=21)
    _, info = ipm.solve_batched_fused(cp)
    it = np.asarray(info.iterations)
    assert it.min() >= 1
    assert len(set(it.tolist())) > 1  # per-instance counts, not one per tile
    # residual fields are split (not one combined error in both slots)
    assert not np.array_equal(
        np.asarray(info.primal_residual), np.asarray(info.dual_residual)
    )
