"""Conic solver + homogeneous-embedding differentiation, cross-checked against
the diffcp-validated literals embedded in the reference tests
(``/root/reference/test/conic_program.jl``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import ConeProgram, ConeSolution, ConeSpec, ConeTangent
from diffopt_tpu import conic_diff
from diffopt_tpu.solvers import conic as conicsolver

SQ2 = float(np.sqrt(2.0))
ATOL = RTOL = 2e-4  # reference tolerances, test/conic_program.jl:15-16


def _socp_program():
    """Reference ``_test_simple_socp(eq_vec=true)`` (conic_program.jl:29-116):

        min x  s.t.  y >= 1/sqrt2,  x^2 + y^2 <= 1
    conic rows (Zeros(1) | Nonneg(1) | SOC(3)) over vars (x, y, t):
        row1: 1 - t      in {0}
        row2: y - 1/sqrt2 in R+
        rows3-5: (t, x, y) in SOC3
    with Ax + s = b: A = -F, b = const of each row function.
    """
    A = jnp.array(
        [
            [0.0, 0.0, 1.0],
            [0.0, -1.0, 0.0],
            [0.0, 0.0, -1.0],
            [-1.0, 0.0, 0.0],
            [0.0, -1.0, 0.0],
        ]
    )
    b = jnp.array([1.0, -1 / SQ2, 0.0, 0.0, 0.0])
    c = jnp.array([1.0, 0.0, 0.0])
    cones = ConeSpec([("zero", 1), ("nonneg", 1), ("soc", 3)])
    return ConeProgram(A=A, b=b, c=c, cones=cones)


def _socp_reference_solution():
    x = jnp.array([-1 / SQ2, 1 / SQ2, 1.0])
    s = jnp.array([0.0, 0.0, 1.0, -1 / SQ2, 1 / SQ2])
    y = jnp.array([SQ2, 1.0, SQ2, 1.0, -1.0])
    return ConeSolution(x=x, y=y, s=s)


def test_socp_solver_matches_reference():
    cp = _socp_program()
    sol, info = conicsolver.solve(cp, max_iters=20000, tol=1e-10)
    ref = _socp_reference_solution()
    np.testing.assert_allclose(sol.x, ref.x, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(sol.s, ref.s, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(sol.y, ref.y, atol=ATOL, rtol=RTOL)
    assert bool(info.converged)


def test_socp_forward_matches_diffcp():
    """Perturbations from conic_program.jl:70-91; expected ForwardVariablePrimal
    [x, y, t] = [1.12132144, 1/sqrt2, 1/sqrt2] (conic_program.jl:107-111)."""
    cp = _socp_program()
    sol = _socp_reference_solution()
    # The reference (and the diffcp notebook it cross-checks) interprets seed
    # function coefficients in the geometric A-orientation of Ax + s = b:
    # "ceq gets 1.0x" etc. means dA entries +1 at (row1,x),(row2,y),(row3,t).
    # (Since func = b - Ax, this is the *negative* of the function-coefficient
    # perturbation — verified by finite differences on the ADMM solver.)
    dA = jnp.zeros((5, 3)).at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
    dcp = ConeTangent(dA=dA, db=jnp.zeros(5), dc=jnp.zeros(3))
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    np.testing.assert_allclose(
        fwd.dx, [1.12132144, 1 / SQ2, 1 / SQ2], atol=ATOL, rtol=RTOL
    )


def _psd_program():
    """Reference ``test_simple_psd`` (conic_program.jl:134-190):
    min X11 + X22 s.t. X21 = 1, X (2x2) PSD. Vars (X11, X21, X22).
    Rows: Zeros(1): X21 - 1 in {0};  PSD svec(2): (X11, sqrt2 X21, X22).
    With func = b - Ax: A = -func coeffs, b = func consts."""
    A = jnp.array(
        [
            [0.0, -1.0, 0.0],
            [-1.0, 0.0, 0.0],
            [0.0, -SQ2, 0.0],
            [0.0, 0.0, -1.0],
        ]
    )
    b = jnp.array([-1.0, 0.0, 0.0, 0.0])
    c = jnp.array([1.0, 0.0, 1.0])
    cones = ConeSpec([("zero", 1), ("psd", 3)])
    return ConeProgram(A=A, b=b, c=c, cones=cones)


def test_psd_solver_and_forward():
    cp = _psd_program()
    sol, info = conicsolver.solve(cp, max_iters=20000, tol=1e-10)
    assert bool(info.converged)
    np.testing.assert_allclose(sol.x, np.ones(3), atol=ATOL, rtol=RTOL)
    # MOI-coordinate expectations s=[0; 1,1,1], y=[2; 1,-1,1]
    # (conic_program.jl:171-172) converted to svec for the PSD rows.
    np.testing.assert_allclose(sol.s, [0.0, 1.0, SQ2, 1.0], atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(sol.y, [2.0, 1.0, -SQ2, 1.0], atol=ATOL, rtol=RTOL)

    # changing the constant of the Zeros row: db = [1,0,0,0] -> dx = -ones
    # (conic_program.jl:173-189)
    dcp = ConeTangent(
        dA=jnp.zeros((4, 3)), db=jnp.zeros(4).at[0].set(1.0), dc=jnp.zeros(3)
    )
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    np.testing.assert_allclose(fwd.dx, -np.ones(3), atol=ATOL, rtol=RTOL)

    # zero perturbation => zero sensitivity (conic_program.jl:352-375)
    zero = ConeTangent.zeros_like(cp)
    fwd0 = conic_diff.forward_differentiate(cp, sol, zero)
    np.testing.assert_allclose(fwd0.dx, 0.0, atol=1e-10)


def test_conic_adjoint_identity():
    """<fwd(dData), seed> == <dData, rev(seed)> on a random LP-cone program."""
    rng = np.random.default_rng(5)
    n, m = 4, 6
    cones = ConeSpec([("zero", 2), ("nonneg", 4)])
    # build a feasible bounded program: pick x*, s* in K, y* in K*
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    sstar = np.concatenate([np.zeros(2), rng.uniform(0.5, 1.5, 4)])
    b = A @ xstar + sstar
    ystar = np.concatenate([rng.normal(size=2), rng.uniform(0.5, 1.5, 4)])
    c = -A.T @ ystar
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones
    )
    sol, info = conicsolver.solve(cp, max_iters=40000, tol=1e-11)
    assert bool(info.converged), (info.primal_residual, info.dual_residual, info.gap)

    dA = jnp.asarray(rng.normal(size=(m, n)))
    db = jnp.asarray(rng.normal(size=m))
    dc = jnp.asarray(rng.normal(size=n))
    seed = jnp.asarray(rng.normal(size=n))

    fwd = conic_diff.forward_differentiate(cp, sol, ConeTangent(dA=dA, db=db, dc=dc))
    rev = conic_diff.reverse_differentiate(cp, sol, dx=seed)
    lhs = float(jnp.dot(fwd.dx, seed))
    rhs = float(jnp.sum(dA * rev.dA) + jnp.dot(db, rev.db) + jnp.dot(dc, rev.dc))
    assert abs(lhs - rhs) < 1e-5 * max(1.0, abs(lhs))


def test_conic_forward_vs_finite_differences():
    """JVP vs finite differences of the ADMM solver on a strictly
    complementary nonneg-cone program."""
    rng = np.random.default_rng(9)
    n, m = 3, 5
    cones = ConeSpec([("nonneg", m)])
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    sstar = np.array([0.0, 0.0, 0.0, 1.0, 2.0])
    ystar = np.array([1.0, 2.0, 1.5, 0.0, 0.0])
    b = A @ xstar + sstar
    c = -A.T @ ystar
    cp = ConeProgram(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones)
    sol, info = conicsolver.solve(cp, max_iters=60000, tol=1e-11)
    assert bool(info.converged)

    db = jnp.asarray(rng.normal(size=m))
    dcp = ConeTangent(dA=jnp.zeros((m, n)), db=db, dc=jnp.zeros(n))
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)

    eps = 1e-5
    solp, _ = conicsolver.solve(
        ConeProgram(A=cp.A, b=cp.b + eps * db, c=cp.c, cones=cones),
        max_iters=60000,
        tol=1e-11,
    )
    solm, _ = conicsolver.solve(
        ConeProgram(A=cp.A, b=cp.b - eps * db, c=cp.c, cones=cones),
        max_iters=60000,
        tol=1e-11,
    )
    fd = (solp.x - solm.x) / (2 * eps)
    np.testing.assert_allclose(fwd.dx, fd, atol=5e-4, rtol=5e-4)
