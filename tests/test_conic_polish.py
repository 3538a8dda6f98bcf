"""Conic solution refinement (HSDE Newton polish) and the f32 gradient
accuracy it buys (round-1 verdict item 1: conic gradients sat at ~3.1e-4 —
the f32 complementarity floor — vs the 1e-6 bar the QP path meets via
``qp_polish``)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff, solve_conic
from diffopt_tpu.conic_diff import refine_solution, residual_map
from diffopt_tpu.ir import ConeSolution
from diffopt_tpu.solvers import conic_ipm


def _socp(rng, n=4, dtype=jnp.float64):
    """Strictly feasible SOCP with nonneg + soc rows and a bounded optimum."""
    cones = ConeSpec([("zero", 1), ("nonneg", 3), ("soc", 4)])
    m = cones.total_dim
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    v = rng.normal(size=3)
    sstar = np.concatenate(
        [np.zeros(1), np.abs(rng.normal(size=3)) + 0.2,
         np.concatenate([[np.linalg.norm(v) + 0.4], v])]
    )
    w = rng.normal(size=3) * 0.1
    ystar = np.concatenate(
        [rng.normal(size=1), np.abs(rng.normal(size=3)) + 0.2,
         np.concatenate([[np.linalg.norm(w) + 0.3], w])]
    )
    return ConeProgram(
        A=jnp.asarray(A, dtype),
        b=jnp.asarray(A @ xstar + sstar, dtype),
        c=jnp.asarray(-A.T @ ystar, dtype),
        cones=cones,
    )


def test_refinement_reduces_residual_from_perturbed_point():
    rng = np.random.default_rng(0)
    cp = _socp(rng)
    sol, info = conic_ipm.solve(cp, tol=1e-11)
    assert bool(info.converged)
    # corrupt the solution by ~1e-4 (the f32 complementarity floor scale)
    noisy = ConeSolution(
        x=sol.x + 1e-4 * jnp.asarray(rng.normal(size=cp.num_vars)),
        y=sol.y + 1e-4 * jnp.asarray(rng.normal(size=cp.num_rows)),
        s=sol.s + 1e-4 * jnp.asarray(rng.normal(size=cp.num_rows)),
    )
    r0 = float(jnp.linalg.norm(residual_map(cp, noisy)))
    ref = refine_solution(cp, noisy, steps=2)
    r1 = float(jnp.linalg.norm(residual_map(cp, ref)))
    assert r1 < 1e-4 * r0  # Newton: two steps from 1e-4 land near roundoff
    np.testing.assert_allclose(ref.x, sol.x, atol=1e-9)
    np.testing.assert_allclose(ref.y, sol.y, atol=1e-9)


def test_refinement_guard_keeps_good_points():
    """At an already-converged point the guarded steps must not move it."""
    rng = np.random.default_rng(1)
    cp = _socp(rng)
    sol, _ = conic_ipm.solve(cp, tol=1e-12)
    ref = refine_solution(cp, sol, steps=2)
    np.testing.assert_allclose(ref.x, sol.x, atol=1e-8)


def test_f32_conic_gradients_hit_1e5_with_polish():
    """f32 solve + polish must deliver conic gradients with MEDIAN relative
    error <= 1e-5 vs the f64 oracle over a small instance zoo, and never
    worse than 1e-4 (round-1: 3.1e-4 median without polish — the f32
    complementarity floor)."""

    def loss(cp, **kw):
        sol = solve_conic(cp, **kw)
        return jnp.sum(sol.x**2)

    errs, errs_raw = [], []
    for seed in (2, 3, 4, 5, 6):
        rng = np.random.default_rng(seed)
        cp64 = _socp(rng, dtype=jnp.float64)
        cp32 = jax.tree.map(lambda a: a.astype(jnp.float32), cp64)
        cp32 = ConeProgram(A=cp32.A, b=cp32.b, c=cp32.c, cones=cp64.cones)
        g64 = jax.grad(loss)(cp64)
        g32 = jax.grad(loss)(cp32)
        g32_raw = jax.grad(lambda c: loss(c, polish=0))(cp32)
        scale = max(1.0, float(jnp.max(jnp.abs(g64.b))))
        errs.append(
            float(jnp.max(jnp.abs(g32.b.astype(jnp.float64) - g64.b))) / scale
        )
        errs_raw.append(
            float(jnp.max(jnp.abs(g32_raw.b.astype(jnp.float64) - g64.b)))
            / scale
        )
    assert float(np.median(errs)) < 1e-5, errs
    assert max(errs) < 1e-4, errs
    # polish must not make the aggregate worse than the raw solve
    assert float(np.median(errs)) <= float(np.median(errs_raw)) + 1e-12


def test_f32_jvp_vjp_adjoint_identity_after_polish():
    rng = np.random.default_rng(5)
    cp64 = _socp(rng)
    cp = jax.tree.map(lambda a: a.astype(jnp.float32), cp64)
    cp = ConeProgram(A=cp.A, b=cp.b, c=cp.c, cones=cp64.cones)

    db = jnp.asarray(rng.normal(size=cp.num_rows), jnp.float32)
    seed = jnp.asarray(rng.normal(size=cp.num_vars), jnp.float32)

    dcp = ConeTangent(dA=jnp.zeros_like(cp.A), db=db, dc=jnp.zeros_like(cp.c))
    sol, _ = conic_ipm.solve(cp)
    sol = refine_solution(cp, sol, steps=2)
    # refine the M-solves too: the adjoint identity <JVP(d), s> = <d, VJP(s)>
    # holds to the accuracy of the two least-squares solves, and an
    # unrefined f32 normal-equations solve leaves ~1e-4 of it on the table
    fwd = conic_diff.forward_differentiate(cp, sol, dcp, refine_iters=2)
    rev = conic_diff.reverse_differentiate(cp, sol, seed, refine_iters=2)
    lhs = float(jnp.dot(fwd.dx, seed))
    rhs = float(jnp.sum(rev.db * db))
    assert abs(lhs - rhs) < 1e-4 * (1 + abs(lhs))
