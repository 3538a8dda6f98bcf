"""PSD-heavy conic parity tests ported from the reference
(``test/conic_program.jl``): the _psd3test single-variable SDP and the psdt2
mixed PSD+nonneg program, with diffcp-cross-checked expected sensitivities.
MOI-triangle data is converted to this framework's svec rows."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff
from diffopt_tpu.cones import moi_tri_seed_to_svec, moi_tri_to_svec
from diffopt_tpu.solvers import conic as conicsolver

SQ2 = float(np.sqrt(2.0))
ATOL = RTOL = 2e-4


def test_simple_psd3():
    """``test_differentiating_a_simple_psd`` (conic_program.jl:581-646):
    min x s.t. [[x,1,1],[1,x,1],[1,1,x]] PSD. x* = 1; perturbing the
    constraint constants by ones(6) (MOI triangle) gives dx = -0.5."""
    # svec rows of func (x,1,x,1,1,x) [MOI tri order]: coeffs on x at diag
    # positions 0,2,5; constants sqrt2 at off-diag positions 1,3,4
    A = jnp.array([[-1.0], [0.0], [-1.0], [0.0], [0.0], [-1.0]])
    b = jnp.array([0.0, SQ2, 0.0, SQ2, SQ2, 0.0])
    c = jnp.array([1.0])
    cp = ConeProgram(A=A, b=b, c=c, cones=ConeSpec([("psd", 6)]))
    sol, info = conicsolver.solve(cp, max_iters=40000, tol=1e-10)
    assert bool(info.converged)
    np.testing.assert_allclose(sol.x, [1.0], atol=ATOL)
    # MOI-tri expectations s = ones(6), y = (1/3,-1/6,1/3,-1/6,-1/6,1/3)
    np.testing.assert_allclose(
        sol.s, moi_tri_to_svec(jnp.ones(6)), atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        sol.y,
        moi_tri_to_svec(jnp.array([1 / 3, -1 / 6, 1 / 3, -1 / 6, -1 / 6, 1 / 3])),
        atol=ATOL,
        rtol=RTOL,
    )

    # db = ones(6) on MOI triangle rows under the symmetric-half convention
    # (off-diag seed counts half in each mirrored entry; verified against
    # finite differences of the corresponding matrix perturbation)
    dcp = ConeTangent(
        dA=jnp.zeros_like(A), db=moi_tri_seed_to_svec(jnp.ones(6)), dc=jnp.zeros(1)
    )
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    np.testing.assert_allclose(fwd.dx, [-0.5], atol=1e-2)

    # dc = 1 alone -> dx = 0 (degenerate objective direction)
    dcp2 = ConeTangent(dA=jnp.zeros_like(A), db=jnp.zeros(6), dc=jnp.ones(1))
    fwd2 = conic_diff.forward_differentiate(cp, sol, dcp2)
    np.testing.assert_allclose(fwd2.dx, [0.0], atol=1e-2)


def _psdt2_program():
    """``test_differentiating_conic_with_PSD_and_POS_constraints``
    (conic_program.jl:378-579): 7 vars, max x7, rows
    [nonneg(1): eta - sum(x1..6); nonneg(6): x1..6; zero(1): 0;
    psd tri(2) -> svec(3)] with the delta/alpha coefficient pattern."""
    eta, alpha, delta = 10.0, 0.8, 0.9
    nv = 7
    # c3 triangle rows (MOI tri order (11),(12),(22)) as func coefficients
    F3 = np.zeros((3, nv))
    F3[0, :7] = [delta / 2, alpha, delta, delta / 4, delta / 8, 0.0, -1.0]
    for var, coef in zip(
        [0, 1, 2, 4, 5], [-delta / (2 * SQ2), -delta / 4, 0.0, -delta / (8 * SQ2), 0.0]
    ):
        F3[1, var] += coef
    for var, coef in zip(
        [0, 1, 2, 4, 5, 6], [delta / 2, delta - alpha, 0.0, delta / 8, delta / 4, -1.0]
    ):
        F3[2, var] += coef
    # svec scaling of the off-diagonal row (row index 1)
    F3s = F3.copy()
    F3s[1] *= SQ2

    F1 = np.zeros((1, nv))
    F1[0, :6] = -1.0
    b1 = np.array([eta])
    F2 = np.eye(6, nv)
    b2 = np.zeros(6)
    F4 = np.zeros((1, nv))
    b4 = np.array([0.0])

    A = np.vstack([-F1, -F2, -F4, -F3s])
    b = np.concatenate([b1, b2, b4, np.zeros(3)])
    c = np.zeros(nv)
    c[6] = -1.0  # MAX x7 -> min -x7
    cones = ConeSpec([("nonneg", 1), ("nonneg", 6), ("zero", 1), ("psd", 3)])
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones
    )


def test_psdt2_solution():
    cp = _psdt2_program()
    sol, info = conicsolver.solve(cp, max_iters=60000, tol=1e-10)
    assert bool(info.converged)
    np.testing.assert_allclose(
        sol.x,
        [20 / 3.0, 0.0, 10 / 3.0, 0.0, 0.0, 0.0, 1.90192379],
        atol=1e-4,
        rtol=1e-4,
    )
    # reference layout is [c1, zeros, c2, psd] (conic_program.jl:491-516);
    # ours is [c1, c2, zero, psd] — remap its s/y literals accordingly.
    np.testing.assert_allclose(sol.s[0], 0.0, atol=1e-4)
    np.testing.assert_allclose(
        sol.s[1:7], [20 / 3.0, 0.0, 10 / 3.0, 0.0, 0.0, 0.0], atol=1e-4
    )
    np.testing.assert_allclose(sol.s[7], 0.0, atol=1e-4)
    np.testing.assert_allclose(
        sol.s[8:],
        moi_tri_to_svec(jnp.array([4.09807621, -2.12132, 1.09807621])),
        atol=1e-3,
        rtol=1e-3,
    )
    # reference y layout is [zeros, c1, c2, psd]; ours [c1, c2, zero, psd]
    np.testing.assert_allclose(sol.y[0], 0.19019238, atol=1e-4)
    np.testing.assert_allclose(
        sol.y[1:7],
        [0.0, 0.12597667, 0.0, 0.14264428, 0.14264428, 0.01274047],
        atol=1e-4,
        rtol=1e-3,
    )
    np.testing.assert_allclose(sol.y[7], 0.0, atol=1e-4)
    np.testing.assert_allclose(
        sol.y[8:],
        moi_tri_to_svec(jnp.array([0.21132487, 0.408248, 0.78867513])),
        atol=1e-3,
        rtol=1e-3,
    )


def test_psdt2_forward_all_ones():
    """Seed dA = ones(11,7), db = ones(11), dc = ones(7) (A/b orientation,
    diffcp notebook): expected dx from the reference (atol 0.3, rtol 0.01,
    conic_program.jl:517-526). The MOI-triangle seed rows scale by sqrt2 on
    the off-diagonal svec row."""
    cp = _psdt2_program()
    sol, info = conicsolver.solve(cp, max_iters=60000, tol=1e-10)
    assert bool(info.converged)
    dA = np.ones((11, 7))
    db = np.ones(11)
    # psd off-diag row (our row index 9): symmetric-half seed convention
    dA[9] *= SQ2 / 2
    db[9] *= SQ2 / 2
    # MAX objective: the user seed "ones(7)" applies to the max objective;
    # min-form dc = -ones
    dc = -np.ones(7)
    dcp = ConeTangent(
        dA=jnp.asarray(dA), db=jnp.asarray(db), dc=jnp.asarray(dc)
    )
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    expected = np.array(
        [-39.6066, 10.8953, -14.9189, 10.9054, 10.883, 10.9118, -21.7508]
    )
    np.testing.assert_allclose(fwd.dx, expected, atol=0.3, rtol=0.01)
