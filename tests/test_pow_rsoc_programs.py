"""Power-cone and rotated-SOC programs end-to-end: embedded solve +
implicit differentiation, checked against analytic solutions/sensitivities.

The reference supports these sets through MathOptSetDistances' generic
projections (``/root/reference/src/diff_opt.jl:483-519``); here they are
first-class ConeSpec kinds.
"""

import jax.numpy as jnp
import numpy as np

from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff
from diffopt_tpu.solvers import conic as conicsolver


def _geomean_program(a=0.3):
    """max x^a y^(1-a) s.t. x + y = 1  ==  min -t s.t. (x,y,t) in K_pow(a),
    x+y=1. Optimum: x=a, y=1-a, t=a^a (1-a)^(1-a). Vars [x, y, t].
    Rows (s = b - Az): zero(1) s=x+y-1 -> A=[-1,-1,0], b=-1;
    pow(3) s=(x,y,t) -> A=-I, b=0."""
    A = np.zeros((4, 3))
    b = np.zeros(4)
    A[0, 0] = A[0, 1] = -1.0
    b[0] = -1.0
    A[1:, :] = -np.eye(3)
    c = np.array([0.0, 0.0, -1.0])
    cones = ConeSpec([("zero", 1), ("pow", 3, a)])
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones
    )


def test_geomean_power_cone_solve_and_diff():
    a = 0.3
    cp = _geomean_program(a)
    sol, info = conicsolver.solve(cp, max_iters=60000, tol=1e-10)
    assert bool(info.converged), (info.primal_residual, info.dual_residual)
    t_star = a**a * (1 - a) ** (1 - a)
    np.testing.assert_allclose(np.asarray(sol.x), [a, 1 - a, t_star], atol=1e-6)

    # sensitivity wrt the simplex RHS: x+y = 1+eps scales the optimum
    # linearly (cone is scale-invariant): dx/deps = a, dy/deps = 1-a,
    # dt/deps = t_star. Row 0 encodes b0 = -(1+eps).
    db = jnp.zeros(cp.num_rows).at[0].set(-1.0)
    dcp = ConeTangent(dA=jnp.zeros_like(cp.A), db=db, dc=jnp.zeros_like(cp.c))
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    np.testing.assert_allclose(
        np.asarray(fwd.dx), [a, 1 - a, t_star], atol=1e-5
    )

    # reverse mode: adjoint of sum(x) wrt b must match <dx/db0, ones> on
    # the same row (true-adjoint M^T path)
    rev = conic_diff.reverse_differentiate(
        cp, sol, dx=jnp.ones(3), dy=jnp.zeros(cp.num_rows)
    )
    lhs = float(jnp.dot(rev.db, db))
    rhs = float(jnp.sum(fwd.dx))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def _rsoc_program(p=2.0):
    """max x s.t. (1, u, x) in K_rsoc (x^2 <= 2u), u <= p. Vars [x, u].
    Optimum: u=p, x=sqrt(2p). Rows: rsoc(3) s=(1,u,x); nonneg(1) s=p-u."""
    A = np.array(
        [
            [0.0, 0.0],
            [0.0, -1.0],
            [-1.0, 0.0],
            [0.0, 1.0],
        ]
    )
    b = np.array([1.0, 0.0, 0.0, p])
    c = np.array([-1.0, 0.0])
    cones = ConeSpec([("rsoc", 3), ("nonneg", 1)])
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c), cones=cones
    )


def test_rsoc_program_solve_and_diff():
    p = 2.0
    cp = _rsoc_program(p)
    sol, info = conicsolver.solve(cp, max_iters=40000, tol=1e-10)
    assert bool(info.converged)
    np.testing.assert_allclose(
        np.asarray(sol.x), [np.sqrt(2 * p), p], atol=1e-7
    )

    # dx*/dp: x* = sqrt(2p) -> 1/sqrt(2p); du*/dp = 1. Perturb row 3's b.
    db = jnp.zeros(cp.num_rows).at[3].set(1.0)
    dcp = ConeTangent(dA=jnp.zeros_like(cp.A), db=db, dc=jnp.zeros_like(cp.c))
    fwd = conic_diff.forward_differentiate(cp, sol, dcp)
    np.testing.assert_allclose(
        np.asarray(fwd.dx), [1.0 / np.sqrt(2 * p), 1.0], atol=1e-6
    )
