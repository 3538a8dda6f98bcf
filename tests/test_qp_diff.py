"""QP implicit differentiation vs the reference's golden files and the AK17
identities used by the reference harness (``/root/reference/test/utils.jl``).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import (
    QPSolution,
    QPTangent,
    QuadProgram,
    forward_differentiate,
    reverse_differentiate,
)
from diffopt_tpu.solvers import qp as qpsolver

DATA = pathlib.Path(__file__).parent / "data"


def _load_golden():
    mats = {k: np.loadtxt(DATA / f"{k}.txt") for k in
            ["P", "q", "G", "h", "A", "b", "dP", "dq", "dG", "dh", "dA", "db"]}
    return mats


def test_golden_reverse_gradients():
    """Reference ``test_differentiating_non_trivial_convex_qp_moi``
    (``test/quadratic_program.jl:295-350``): 10 vars, 25 ineqs, 10 eqs, seed
    dl/dz = ones; gradients must match golden files at atol/rtol 1e-3."""
    m = _load_golden()
    qp = QuadProgram.make(Q=m["P"], q=m["q"], A=m["A"], b=m["b"], G=m["G"], h=m["h"])
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)

    grads = reverse_differentiate(qp, sol, dz=jnp.ones(10))
    np.testing.assert_allclose(grads.dq, m["dq"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(grads.dh, m["dh"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(grads.db, m["db"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(grads.dQ, m["dP"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(grads.dG, m["dG"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(grads.dA, m["dA"], atol=1e-3, rtol=1e-3)


def _random_qp(rng, n=8, m=5, p=3):
    L = rng.normal(size=(n, n))
    return QuadProgram.make(
        Q=L @ L.T + n * np.eye(n),
        q=rng.normal(size=n),
        A=rng.normal(size=(p, n)),
        b=rng.normal(size=p),
        G=rng.normal(size=(m, n)),
        h=rng.normal(size=m) + 1.0,
    )


def _random_tangent(rng, qp):
    dQr = rng.normal(size=qp.Q.shape)
    return QPTangent(
        dQ=jnp.asarray((dQr + dQr.T) / 2),
        dq=jnp.asarray(rng.normal(size=qp.q.shape)),
        dA=jnp.asarray(rng.normal(size=qp.A.shape)),
        db=jnp.asarray(rng.normal(size=qp.b.shape)),
        dG=jnp.asarray(rng.normal(size=qp.G.shape)),
        dh=jnp.asarray(rng.normal(size=qp.h.shape)),
    )


def test_adjoint_identity():
    """<JVP(dData), seed> == <dData, VJP(seed)> — the scalar-product invariance
    the reference harness checks at three levels (``test/utils.jl:328-343``)."""
    rng = np.random.default_rng(7)
    for _ in range(4):
        qp = _random_qp(rng)
        sol, info = qpsolver.solve(qp)
        assert bool(info.converged)
        dqp = _random_tangent(rng, qp)
        seed = jnp.asarray(rng.normal(size=qp.q.shape))

        fwd = forward_differentiate(qp, sol, dqp)
        rev = reverse_differentiate(qp, sol, dz=seed)

        lhs = float(jnp.dot(fwd.dz, seed))
        rhs = float(
            jnp.sum(dqp.dQ * rev.dQ)
            + jnp.dot(dqp.dq, rev.dq)
            + jnp.sum(dqp.dA * rev.dA)
            + jnp.dot(dqp.db, rev.db)
            + jnp.sum(dqp.dG * rev.dG)
            + jnp.dot(dqp.dh, rev.dh)
        )
        assert abs(lhs - rhs) < 1e-6 * max(1.0, abs(lhs))


def test_forward_matches_finite_differences():
    """JVP vs central finite differences of the solver itself."""
    rng = np.random.default_rng(3)
    qp = _random_qp(rng, n=6, m=4, p=2)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    dqp = _random_tangent(rng, qp)

    fwd = forward_differentiate(qp, sol, dqp)

    eps = 1e-6

    def perturbed(sign):
        return QuadProgram(
            Q=qp.Q + sign * eps * dqp.dQ,
            q=qp.q + sign * eps * dqp.dq,
            A=qp.A + sign * eps * dqp.dA,
            b=qp.b + sign * eps * dqp.db,
            G=qp.G + sign * eps * dqp.dG,
            h=qp.h + sign * eps * dqp.dh,
        )

    zp, _ = qpsolver.solve(perturbed(+1))
    zm, _ = qpsolver.solve(perturbed(-1))
    fd_dz = (zp.z - zm.z) / (2 * eps)
    fd_dlam = (zp.lam - zm.lam) / (2 * eps)
    fd_dnu = (zp.nu - zm.nu) / (2 * eps)
    np.testing.assert_allclose(fwd.dz, fd_dz, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(fwd.dlam, fd_dlam, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(fwd.dnu, fd_dnu, atol=1e-4, rtol=1e-4)


def test_ak17_eq6_residual():
    """The forward tangents satisfy AK17 eq. (6):
    Q dz + G'dlam + A'dnu = -(dQ z + dq + dG'lam + dA'nu), etc.
    (reference checks, ``test/utils.jl:314-326``)."""
    rng = np.random.default_rng(11)
    qp = _random_qp(rng)
    sol, info = qpsolver.solve(qp)
    dqp = _random_tangent(rng, qp)
    fwd = forward_differentiate(qp, sol, dqp)
    z, lam, nu = sol.z, sol.lam, sol.nu

    grad_z_f = dqp.dQ @ z + dqp.dq + dqp.dG.T @ lam + dqp.dA.T @ nu
    np.testing.assert_allclose(
        qp.Q @ fwd.dz + qp.G.T @ fwd.dlam + qp.A.T @ fwd.dnu,
        -grad_z_f,
        atol=1e-7,
    )
    grad_lam_f = lam * (dqp.dG @ z - dqp.dh)
    np.testing.assert_allclose(
        (qp.G @ z - qp.h) * fwd.dlam + lam * (qp.G @ fwd.dz), -grad_lam_f, atol=1e-7
    )
    grad_nu_f = dqp.dA @ z - dqp.db
    np.testing.assert_allclose(qp.A @ fwd.dz, -grad_nu_f, atol=1e-7)


def test_ak17_eq7_eq8_reverse():
    """Reverse-mode identities (``test/utils.jl:236-261``): with
    grad_z = dq_b, grad_nu = -db_b, grad_lam = -dh_b ./ lam,
    eq (8): dQ_b = (grad_z z' + z grad_z')/2, dA_b = grad_nu z' + nu grad_z',
    dG_b = diag(lam) grad_lam z' + lam grad_z';
    eq (7): -(Q grad_z + G'(lam.*grad_lam) + A'grad_nu) = seed."""
    rng = np.random.default_rng(13)
    qp = _random_qp(rng)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    seed = jnp.asarray(rng.normal(size=qp.q.shape))
    rev = reverse_differentiate(qp, sol, dz=seed)
    z, lam, nu = np.asarray(sol.z), np.asarray(sol.lam), np.asarray(sol.nu)

    grad_z = np.asarray(rev.dq)
    grad_nu = -np.asarray(rev.db)
    active = np.abs(lam) > 1e-7
    grad_lam = np.where(active, -np.asarray(rev.dh) / np.where(active, lam, 1.0), 0.0)

    np.testing.assert_allclose(
        rev.dQ, (np.outer(grad_z, z) + np.outer(z, grad_z)) / 2, atol=1e-7
    )
    np.testing.assert_allclose(
        rev.dA, np.outer(grad_nu, z) + np.outer(nu, grad_z), atol=1e-7
    )
    # eq (7) stationarity of the adjoint system
    np.testing.assert_allclose(
        -(qp.Q @ grad_z + qp.G.T @ (lam * grad_lam) + qp.A.T @ grad_nu),
        seed,
        atol=1e-6,
    )


def test_lp_inactive_gradient_zero():
    """LP with an inactive constraint: its gradient must be 0
    (``test/linear_program.jl:31-49,223-246``)."""
    # min -x - y s.t. x + y <= 1, x <= 10 (inactive), x,y >= 0 as G rows
    qp = QuadProgram.make(
        q=[-1.0, -1.0],
        G=[[1.0, 1.0], [1.0, 0.0], [-1.0, 0.0], [0.0, -1.0]],
        h=[1.0, 10.0, 0.0, 0.0],
    )
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    rev = reverse_differentiate(qp, sol, dz=jnp.ones(2), method="lstsq")
    # Row 1 (x <= 10) is inactive: zero sensitivity everywhere in that row
    np.testing.assert_allclose(rev.dG[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(rev.dh[1], 0.0, atol=1e-5)


def test_readme_lp_reverse():
    """README example (``README.md:106-123``): min 2x s.t. x >= 3.
    Reverse seed dz=1 gives d(cons function): coefficient -3, constant -1
    in the GreaterThan orientation; in our Gz<=h orientation (G=-1, h=-3):
    x*(G,h) = h/G so dx/dh = -1 (seed 1 -> dh=-1) and dx/dG = -h/G^2 = 3."""
    qp = QuadProgram.make(q=[2.0], G=[[-1.0]], h=[-3.0])
    sol, info = qpsolver.solve(qp)
    rev = reverse_differentiate(qp, sol, dz=jnp.ones(1), method="lstsq")
    np.testing.assert_allclose(rev.dG, [[3.0]], atol=1e-6)
    np.testing.assert_allclose(rev.dh, [-1.0], atol=1e-6)
