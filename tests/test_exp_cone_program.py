"""Exponential-cone program end-to-end: solve + differentiate.

Entropy maximization: max -sum(x log x) s.t. sum x = 1  has solution
x_i = 1/k. Conic form with exp cones:
    max sum t_i  s.t. (t_i, x_i, 1) in K_exp (t <= x log(1/x) = -x log x)
i.e. min -sum t. Variables [x (k), t (k)].
Rows: zero(1): sum x - 1 in {0}; per i: (t_i, x_i, 1) in K_exp, written as
func rows ((u,v,w) = (-t_i?, ...)). K_exp = cl{(a,b,c): b>0, b e^{a/b} <= c}:
(t, x, 1): need x e^{t/x} <= 1  <=> t <= -x log x. So the cone rows are
(t_i, x_i, 1) in K_exp with func = (t_i, x_i, 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff
from diffopt_tpu.solvers import conic as conicsolver


def _entropy_program(k=3, weights=None):
    """max sum_i w_i... here plain entropy: vars [x(k), t(k)], min -sum t."""
    nv = 2 * k
    rows = 1 + 3 * k
    A = np.zeros((rows, nv))
    b = np.zeros(rows)
    # row 0: sum x - 1 in {0}: func coeffs x: 1 -> A = -coeffs, b = -const
    A[0, :k] = -1.0
    b[0] = 1.0
    # func = b - Ax with our convention: s = b - Ax; want s = sum x - 1?
    # s must equal the func value: sum x - 1 -> A row = -1's, b = -1
    b[0] = -1.0
    A[0, :k] = -1.0
    for i in range(k):
        r = 1 + 3 * i
        # rows (t_i, x_i, 1): A = -coeffs, b = const
        A[r, k + i] = -1.0
        A[r + 1, i] = -1.0
        b[r + 2] = 1.0
    c = np.concatenate([np.zeros(k), -np.ones(k)])
    cones = ConeSpec([("zero", 1)] + [("exp", 3)] * k)
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones
    )


def test_entropy_maximization():
    k = 3
    cp = _entropy_program(k)
    sol, info = conicsolver.solve(cp, max_iters=40000, tol=1e-9)
    assert bool(info.converged), (info.primal_residual, info.dual_residual)
    x = np.asarray(sol.x[:k])
    t = np.asarray(sol.x[k:])
    np.testing.assert_allclose(x, 1.0 / k, atol=1e-5)
    np.testing.assert_allclose(t, -(1.0 / k) * np.log(1.0 / k), atol=1e-5)


def test_entropy_sensitivity_fd():
    """Perturb the simplex RHS: sum x = 1 + eps -> x_i = (1+eps)/k.
    dx/deps = 1/k via the exp-cone implicit diff, checked against fd."""
    k = 3
    cp = _entropy_program(k)
    sol, info = conicsolver.solve(cp, max_iters=60000, tol=1e-10)
    assert bool(info.converged)

    db = jnp.zeros(cp.num_rows).at[0].set(-1.0)  # b0 = -(1+eps)
    dcp = ConeTangent(dA=jnp.zeros_like(cp.A), db=db, dc=jnp.zeros_like(cp.c))
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)

    eps = 1e-5
    cp_p = ConeProgram(A=cp.A, b=cp.b + eps * db, c=cp.c, cones=cp.cones)
    cp_m = ConeProgram(A=cp.A, b=cp.b - eps * db, c=cp.c, cones=cp.cones)
    sp, _ = conicsolver.solve(cp_p, max_iters=60000, tol=1e-10)
    sm, _ = conicsolver.solve(cp_m, max_iters=60000, tol=1e-10)
    fd = (sp.x - sm.x) / (2 * eps)
    np.testing.assert_allclose(fwd.dx[:k], fd[:k], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fwd.dx[:k]), 1.0 / k, atol=1e-4)
