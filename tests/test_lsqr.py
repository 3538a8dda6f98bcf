"""Matrix-free LSQR + the conic lsqr path."""

import jax
import jax.numpy as jnp
import numpy as np

from diffopt_tpu.ops.lsqr import lsqr, lsqr_dense


def test_lsqr_square_nonsingular():
    rng = np.random.default_rng(0)
    n = 20
    M = jnp.asarray(rng.normal(size=(n, n)) + 3 * np.eye(n))
    x_true = jnp.asarray(rng.normal(size=n))
    b = M @ x_true
    res = lsqr_dense(M, b, max_iters=400)
    np.testing.assert_allclose(res.x, x_true, atol=1e-8)


def test_lsqr_singular_least_squares():
    """Singular system: must return a least-squares solution (the LP-KKT case
    the reference routes to lsqr, QuadraticProgram.jl:333-335)."""
    rng = np.random.default_rng(1)
    n, r = 12, 7
    B = rng.normal(size=(n, r))
    M = jnp.asarray(B @ rng.normal(size=(r, n)))  # rank r
    b = jnp.asarray(rng.normal(size=n))
    res = lsqr_dense(M, b, max_iters=800)
    # optimality: M'(Mx - b) == 0
    grad = M.T @ (M @ res.x - b)
    assert float(jnp.linalg.norm(grad)) < 1e-8


def test_lsqr_zero_rhs():
    M = jnp.eye(4)
    res = lsqr_dense(M, jnp.zeros(4))
    np.testing.assert_allclose(res.x, 0.0)
    assert int(res.iterations) == 0


def test_conic_lsqr_path_matches_dense():
    """forward/reverse with method='lsqr' (matrix-free operator) must agree
    with the dense lstsq path."""
    from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff
    from diffopt_tpu.solvers import conic as conicsolver

    rng = np.random.default_rng(5)
    n, m = 4, 7
    cones = ConeSpec([("zero", 2), ("nonneg", 2), ("soc", 3)])
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    sstar = np.concatenate([np.zeros(2), [0.0, 1.2], [2.0, 1.0, 1.0]])
    ystar = np.concatenate([rng.normal(size=2), [1.3, 0.0], [1.5, -0.9, -0.8]])
    b = A @ xstar + sstar
    c = -A.T @ ystar
    cp = ConeProgram(A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones)
    sol, info = conicsolver.solve(cp, max_iters=60000, tol=1e-11)
    assert bool(info.converged)

    dcp = ConeTangent(
        dA=jnp.asarray(rng.normal(size=(m, n))),
        db=jnp.asarray(rng.normal(size=m)),
        dc=jnp.asarray(rng.normal(size=n)),
    )
    f_dense = conic_diff.forward_differentiate(cp, sol, dcp, method="lstsq")
    f_iter = conic_diff.forward_differentiate(cp, sol, dcp, method="lsqr")
    np.testing.assert_allclose(f_iter.dx, f_dense.dx, atol=1e-6)

    seed = jnp.asarray(rng.normal(size=n))
    r_dense = conic_diff.reverse_differentiate(cp, sol, dx=seed, method="lstsq")
    r_iter = conic_diff.reverse_differentiate(cp, sol, dx=seed, method="lsqr")
    np.testing.assert_allclose(r_iter.db, r_dense.db, atol=1e-6)
    np.testing.assert_allclose(r_iter.dA, r_dense.dA, atol=1e-6)
