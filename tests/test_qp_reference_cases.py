"""Analytic QP cases ported from ``/root/reference/test/quadratic_program.jl``
with their qpth/CVXPYLayers-validated expected gradients (reference ATOL/RTOL
= 2e-4; we hold 1e-4). Harness mapping: dQb/dqb/dGb/dAb are our reverse
tangents directly; dhb/dbb are set-constant tangents = our dh/db."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import (
    QPTangent,
    QuadProgram,
    forward_differentiate,
    reverse_differentiate,
)
from diffopt_tpu.solvers import qp as qpsolver

ATOL = 1e-4


def _solve(qp):
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    return sol


def test_trivial_qp_1():
    """``test_differentiating_trivial_qp_1``: z = (-0.25, -0.75), seed ones
    -> dhb = ones(1)."""
    qp = QuadProgram.make(
        Q=[[4.0, 1.0], [1.0, 2.0]], q=[1.0, 1.0], G=[[1.0, 1.0]], h=[-1.0]
    )
    sol = _solve(qp)
    np.testing.assert_allclose(sol.z, [-0.25, -0.75], atol=ATOL)
    rev = reverse_differentiate(qp, sol, dz=jnp.ones(2))
    np.testing.assert_allclose(rev.dh, [1.0], atol=ATOL)


def test_osqp_example_forward():
    """``test_forward_on_trivial_QP`` (OSQP docs example): z = (0.3, 0.7)."""
    qp = QuadProgram.make(
        Q=[[4.0, 1.0], [1.0, 2.0]],
        q=[1.0, 1.0],
        G=[
            [1.0, 1.0], [1.0, 0.0], [0.0, 1.0],
            [-1.0, -1.0], [-1.0, 0.0], [0.0, -1.0],
        ],
        h=[1.0, 0.7, 0.7, -1.0, 0.0, 0.0],
    )
    sol = _solve(qp)
    np.testing.assert_allclose(sol.z, [0.3, 0.7], atol=ATOL)
    dqp = QPTangent(
        dQ=jnp.array([[1.0, -1.0], [-1.0, 1.0]]),
        dq=jnp.array([1.0, -1.0]),
        dA=jnp.zeros((0, 2)),
        db=jnp.zeros(0),
        dG=jnp.ones((6, 2)),
        dh=jnp.ones(6),
    )
    fwd = forward_differentiate(qp, sol, dqp, method="lstsq")

    # value check vs a finite-difference oracle along the seed direction
    # (the reference harness validates this case through its AK17 eq.(6)
    # identities, test/utils.jl:236-261 — FD is the equivalent oracle here)
    eps = 1e-6

    def z_of(t):
        qp_t = QuadProgram.make(
            Q=qp.Q + t * dqp.dQ, q=qp.q + t * dqp.dq,
            G=qp.G + t * dqp.dG, h=qp.h + t * dqp.dh,
        )
        return np.asarray(_solve(qp_t).z)

    fd = (z_of(eps) - z_of(-eps)) / (2 * eps)
    np.testing.assert_allclose(fwd.dz, fd, atol=1e-4)

    # the reference harness's scalar-product invariance (test/utils.jl:
    # 328-343): <dz_fwd, dzb> == sum of <forward seeds, reverse outputs>
    dzb = jnp.ones(2)
    rev = reverse_differentiate(qp, sol, dzb, method="lstsq")
    lhs = float(jnp.dot(fwd.dz, dzb))
    rhs = float(
        jnp.sum(rev.dQ * dqp.dQ) + jnp.dot(rev.dq, dqp.dq)
        + jnp.sum(rev.dG * dqp.dG) + jnp.dot(rev.dh, dqp.dh)
    )
    assert abs(lhs - rhs) < 1e-7 * (1 + abs(lhs))


def test_quadprog_mixed_case():
    """``test_differentiating_qp_with_inequality_and_equality_constraints``
    (MathWorks quadprog example, qpth-validated): z = (0, 0.5, 0);
    reverse seed ones -> dAb = [0, -0.5, 0], dbb = [1], all else zero."""
    qp = QuadProgram.make(
        Q=[
            [1.0, -1.0, 1.0],
            [-1.0, 2.0, -2.0],
            [1.0, -2.0, 4.0],
        ],
        q=[2.0, -3.0, 1.0],
        G=[
            [0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0],
            [0.0, 0.0, -1.0], [0.0, -1.0, 0.0], [-1.0, 0.0, 0.0],
        ],
        h=[1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
        A=[[1.0, 1.0, 1.0]],
        b=[0.5],
    )
    sol = _solve(qp)
    np.testing.assert_allclose(sol.z, [0.0, 0.5, 0.0], atol=ATOL)
    rev = reverse_differentiate(qp, sol, dz=jnp.ones(3))
    np.testing.assert_allclose(rev.dQ, np.zeros((3, 3)), atol=ATOL)
    np.testing.assert_allclose(rev.dq, np.zeros(3), atol=ATOL)
    np.testing.assert_allclose(rev.dG, np.zeros((6, 3)), atol=2e-4)
    np.testing.assert_allclose(rev.dh, np.zeros(6), atol=ATOL)
    np.testing.assert_allclose(rev.dA, [[0.0, -0.5, 0.0]], atol=ATOL)
    np.testing.assert_allclose(rev.db, [1.0], atol=ATOL)


def test_moi_examples_1_qpth():
    """``test_differentiating_moi_examples_1`` with the qpth/CVXPYLayers
    notebook literals: reverse seed ones -> full (dQ, dq, dG, dh)."""
    qp = QuadProgram.make(
        Q=[
            [2.0, 1.0, 0.0],
            [1.0, 2.0, 1.0],
            [0.0, 1.0, 2.0],
        ],
        q=np.zeros(3),
        G=[[-1.0, -2.0, -3.0], [-1.0, -1.0, 0.0]],
        h=[-4.0, -1.0],
    )
    sol = _solve(qp)
    rev = reverse_differentiate(qp, sol, dz=jnp.ones(3))
    dQ = np.array(
        [
            [-0.12244895, 0.01530609, -0.11224488],
            [0.01530609, 0.09183674, 0.07653058],
            [-0.11224488, 0.07653058, -0.06122449],
        ]
    )
    dq = np.array([-0.2142857, 0.21428567, -0.07142857])
    dG = np.array(
        [
            [0.05102692, 0.30612244, 0.25510856],
            [0.06120519, 0.36734693, 0.30610315],
        ]
    )
    dh = np.array([-0.35714284, -0.4285714])
    np.testing.assert_allclose(rev.dQ, dQ, atol=ATOL)
    np.testing.assert_allclose(rev.dq, dq, atol=ATOL)
    np.testing.assert_allclose(rev.dG, dG, atol=ATOL)
    np.testing.assert_allclose(rev.dh, dh, atol=ATOL)


def test_moi_examples_2_qpth():
    """``test_differentiating_moi_examples_2``: nonhomogeneous QP with eq +
    bounds; seed (1.3, 0.5); full forward AND reverse expected values, incl.
    the AK17 duals (lam = 0, nu = -2.75) and dzf = (1.4875, -0.075)."""
    qp = QuadProgram.make(
        Q=[[4.0, 1.0], [1.0, 2.0]],
        q=[1.0, 1.0],
        G=[[-1.0, 0.0], [0.0, -1.0]],
        h=[0.0, 0.0],
        A=[[1.0, 1.0]],
        b=[1.0],
    )
    sol = _solve(qp)
    np.testing.assert_allclose(sol.z, [0.25, 0.75], atol=ATOL)
    np.testing.assert_allclose(sol.lam, np.zeros(2), atol=ATOL)
    np.testing.assert_allclose(sol.nu, [-2.75], atol=ATOL)

    dQ = np.array([[-0.05, -0.05], [-0.05, 0.15]])
    dq = np.array([-0.2, 0.2])
    dA = np.array([[0.375, -1.075]])
    db = np.array([0.7])

    rev = reverse_differentiate(qp, sol, dz=jnp.array([1.3, 0.5]))
    np.testing.assert_allclose(rev.dQ, dQ, atol=ATOL)
    np.testing.assert_allclose(rev.dq, dq, atol=ATOL)
    np.testing.assert_allclose(rev.dG, np.zeros((2, 2)), atol=ATOL)
    np.testing.assert_allclose(rev.dh, np.zeros(2), atol=ATOL)
    np.testing.assert_allclose(rev.dA, dA, atol=ATOL)
    np.testing.assert_allclose(rev.db, db, atol=ATOL)

    fwd = forward_differentiate(
        qp,
        sol,
        QPTangent(
            dQ=jnp.asarray(dQ), dq=jnp.asarray(dq), dA=jnp.asarray(dA),
            db=jnp.asarray(db), dG=jnp.zeros((2, 2)), dh=jnp.zeros(2),
        ),
    )
    np.testing.assert_allclose(fwd.dz, [1.4875, -0.075], atol=ATOL)
    np.testing.assert_allclose(fwd.dlam, np.zeros(2), atol=ATOL)
