"""Parameter layer (POI equivalent) + bridge rewrites."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import ConeProgram, ConeSpec, QuadProgram, solve_conic
from diffopt_tpu import bridges
from diffopt_tpu.parameters import ParametricProgram


def _readme_layer():
    """README example (``README.md:36-99``): min 2x s.t. pc*x >= 3p with
    theta = (p, pc). x*(p, pc) = 3p/pc."""

    def build(theta):
        p, pc = theta[0], theta[1]
        return QuadProgram.make(
            q=jnp.array([2.0]),
            G=(-pc).reshape(1, 1),
            h=(-3.0 * p).reshape(1),
        )

    return ParametricProgram(build, kind="qp", method="lstsq")


def test_readme_forward_p():
    layer = _readme_layer()
    theta = jnp.array([4.0, 2.0])
    sol = layer.solve(theta)
    np.testing.assert_allclose(sol.z, [6.0], atol=1e-7)
    # direction dp = 3.0: dx = 3/pc * dp = 4.5
    dsol = layer.forward_differentiate(theta, jnp.array([3.0, 0.0]))
    np.testing.assert_allclose(dsol.z, [4.5], atol=1e-6)


def test_readme_forward_pc():
    layer = _readme_layer()
    theta = jnp.array([2.0, 6.0])  # updated values from the README
    dsol = layer.forward_differentiate(theta, jnp.array([0.0, 10.0]))
    # dx/dpc = -3p/pc^2 -> 10 * (-6/36) = -5/3
    np.testing.assert_allclose(dsol.z, [10.0 * (-3 * 2.0 / 36.0)], atol=1e-6)


def test_readme_reverse():
    layer = _readme_layer()
    theta = jnp.array([2.0, 6.0])
    dtheta = layer.reverse_differentiate(theta, dz=jnp.array([10.0]))
    np.testing.assert_allclose(dtheta[0], 10.0 * 3 / 6.0, atol=1e-6)
    np.testing.assert_allclose(dtheta[1], -10.0 * 3 * 2.0 / 36.0, atol=1e-6)


def test_quadratic_parameter_rhs():
    """Quadratic-in-parameter RHS (cf. ``test/parameters.jl:317-444``):
    min x^2 s.t. x >= p^2 + 3p -> dx/dp = 2p + 3 at the active solution."""

    def build(theta):
        p = theta[0]
        return QuadProgram.make(
            Q=jnp.array([[2.0]]),
            q=jnp.array([0.0]),
            G=jnp.array([[-1.0]]),
            h=(-(p**2) - 3 * p).reshape(1),
        )

    layer = ParametricProgram(build, kind="qp")
    theta = jnp.array([2.0])
    sol = layer.solve(theta)
    np.testing.assert_allclose(sol.z, [10.0], atol=1e-6)
    dsol = layer.forward_differentiate(theta, jnp.array([1.0]))
    np.testing.assert_allclose(dsol.z, [2 * 2.0 + 3.0], atol=1e-5)


def test_bilinear_parameter_coefficient():
    """Parameter multiplying a variable coefficient AND appearing quadratically
    (p*pc product rule, ``parameters.jl:147-203``): p*x >= p^2 ->
    x* = p, dx/dp = 1."""

    def build(theta):
        p = theta[0]
        return QuadProgram.make(
            Q=jnp.array([[2.0]]),
            q=jnp.array([0.0]),
            G=(-p).reshape(1, 1),
            h=(-(p**2)).reshape(1),
        )

    layer = ParametricProgram(build, kind="qp")
    theta = jnp.array([3.0])
    sol = layer.solve(theta)
    np.testing.assert_allclose(sol.z, [3.0], atol=1e-6)
    dsol = layer.forward_differentiate(theta, jnp.array([1.0]))
    np.testing.assert_allclose(dsol.z, [1.0], atol=1e-5)


# ---------------------------------------------------------------------------
# bridges
# ---------------------------------------------------------------------------


def test_dU_from_dQ_identity():
    """dU solves dQ = dU'U + U'dU and is upper triangular
    (``bridges.jl:270-323``; zero-allocation tests ``test/bridges.jl:49-105``)."""
    rng = np.random.default_rng(0)
    n = 6
    Lr = rng.normal(size=(n, n))
    Q = Lr @ Lr.T + n * np.eye(n)
    U = jnp.asarray(np.linalg.cholesky(Q).T)
    dQr = rng.normal(size=(n, n))
    dQ = jnp.asarray((dQr + dQr.T) / 2)
    dU = bridges.dU_from_dQ(dQ, U)
    np.testing.assert_allclose(np.tril(np.asarray(dU), -1), 0.0, atol=1e-12)
    np.testing.assert_allclose(dU.T @ U + U.T @ dU, dQ, atol=1e-9)


def test_dQ_from_dU_identity():
    """dQ symmetric and triu(dU) == 2 triu(U dQ) (``bridges.jl:224-268``)."""
    rng = np.random.default_rng(1)
    n = 5
    Lr = rng.normal(size=(n, n))
    Q = Lr @ Lr.T + n * np.eye(n)
    U = jnp.asarray(np.linalg.cholesky(Q).T)
    dU = jnp.asarray(np.triu(rng.normal(size=(n, n))))
    dQ = bridges.dQ_from_dU(dU, U)
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(dQ).T, atol=1e-12)
    np.testing.assert_allclose(
        np.triu(np.asarray(dU)), 2 * np.triu(np.asarray(U @ dQ)), atol=1e-9
    )


def test_quad_to_soc_roundtrip():
    """Ball-constrained LP via the quad->SOC bridge: min c'x s.t.
    1/2|x|^2 <= r has x* = -c sqrt(2r)/|c|; gradient dx*/dr checked through
    jax.jacfwd of the fully composed (bridge + conic solve) map."""
    c = jnp.array([1.0, 2.0, -1.0])
    n = 3
    Q = jnp.eye(n)
    a = jnp.zeros(n)

    def solve_ball(r):
        A_rows, b_rows, spec = bridges.quad_constraint_to_soc(Q, a, -r)
        cp = ConeProgram(A=A_rows, b=b_rows, c=c, cones=spec)
        return solve_conic(cp, max_iters=40000, tol=1e-11, mode="jvp").x

    r0 = jnp.asarray(0.5)
    x = solve_ball(r0)
    nc = float(jnp.linalg.norm(c))
    expect = -np.sqrt(2 * 0.5) * np.asarray(c) / nc
    np.testing.assert_allclose(x, expect, atol=1e-5)

    dx_dr = jax.jacfwd(solve_ball)(r0)
    expect_d = -np.asarray(c) / (nc * np.sqrt(2 * 0.5))
    np.testing.assert_allclose(dx_dr, expect_d, atol=1e-4)


def test_qp_to_cone_lowering():
    """LP solved through the conic lowering equals the QP-path solution."""
    from diffopt_tpu.solvers import conic as conicsolver
    from diffopt_tpu.solvers import qp as qpsolver

    qp = QuadProgram.make(
        q=[-1.0, -2.0],
        G=[[1.0, 1.0], [1.0, 0.0], [-1.0, 0.0], [0.0, -1.0]],
        h=[1.0, 0.8, 0.0, 0.0],
    )
    sol_qp, info_qp = qpsolver.solve(qp)
    cp = bridges.qp_to_cone(qp)
    sol_cp, info_cp = conicsolver.solve(cp, max_iters=40000, tol=1e-11)
    assert bool(info_qp.converged) and bool(info_cp.converged)
    np.testing.assert_allclose(sol_cp.x, sol_qp.z, atol=1e-6)
    # conic dual y on nonneg rows == QP lam
    np.testing.assert_allclose(sol_cp.y[0:], sol_qp.lam, atol=1e-6)


def test_conic_vector_rhs_parameters():
    """Vector-RHS conic parameters (reference test/parameters.jl:103-152):
    parameters appearing in conic constraint constants, differentiated
    through the ParametricProgram conic path."""
    from diffopt_tpu.parameters import ParametricProgram

    # min x1 + x2 s.t. (x1 - p1, x2 - p2) in R+^2  -> x = p, dx/dp = I
    def build(theta):
        A = -jnp.eye(2)
        b = -theta
        c = jnp.ones(2)
        return ConeProgram(A=A, b=b, c=c, cones=ConeSpec([("nonneg", 2)]))

    layer = ParametricProgram(
        build, kind="conic", max_iters=40000, tol=1e-11, method="lstsq"
    )
    theta = jnp.array([1.5, -0.5])
    sol = layer.solve(theta)
    np.testing.assert_allclose(sol.x, theta, atol=1e-6)
    dsol = layer.forward_differentiate(theta, jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(dsol.x, [1.0, 2.0], atol=1e-5)
    dtheta = layer.reverse_differentiate(theta, dx=jnp.array([3.0, 4.0]))
    np.testing.assert_allclose(dtheta, [3.0, 4.0], atol=1e-5)


def test_conic_soc_parameter_radius():
    """Parameter in an SOC radius: min -x1 s.t. (p, x1, x2) in SOC ->
    x1 = p, dx1/dp = 1."""
    from diffopt_tpu.parameters import ParametricProgram

    def build(theta):
        p = theta[0]
        # rows (p, x1, x2): A = -coeffs, b = const
        A = jnp.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
        b = jnp.concatenate([p.reshape(1), jnp.zeros(2)])
        c = jnp.array([-1.0, 0.0])
        return ConeProgram(A=A, b=b, c=c, cones=ConeSpec([("soc", 3)]))

    layer = ParametricProgram(
        build, kind="conic", max_iters=40000, tol=1e-11, method="lstsq"
    )
    theta = jnp.array([2.0])
    sol = layer.solve(theta)
    np.testing.assert_allclose(sol.x[0], 2.0, atol=1e-5)
    dsol = layer.forward_differentiate(theta, jnp.array([1.0]))
    np.testing.assert_allclose(dsol.x[0], 1.0, atol=1e-4)
