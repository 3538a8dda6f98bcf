"""Embedded interior-point NLP solver + end-to-end solve->differentiate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu.nlp_diff import (
    NLPProblem,
    NLPSolution,
    forward_differentiate,
    solution_jacobian,
)
from diffopt_tpu.solvers import nlp as nlpsolver


def test_simple_bound_qp():
    # min x^2 s.t. x >= p, x >= 2 at p = 2.1 -> x = 2.1, y = (4.2, 0)
    nlp = NLPProblem(
        objective=lambda x, p: x[0] ** 2,
        constraints=lambda x, p: jnp.array([x[0] - p[0], x[0] - 2.0]),
        kinds=("geq", "geq"),
        n=1,
    )
    p = jnp.array([2.1])
    sol, info = nlpsolver.solve(nlp, p)
    assert bool(info.converged), info
    np.testing.assert_allclose(sol.x, [2.1], atol=1e-6)
    np.testing.assert_allclose(sol.y, [4.2, 0.0], atol=1e-5)


def test_sipopt_solution():
    """min sum(x^2) s.t. 6x1+3x2+2x3 = p1, p2 x1 + x2 - x3 = 1, x >= 0."""
    nlp = NLPProblem(
        objective=lambda x, p: jnp.sum(x**2),
        constraints=lambda x, p: jnp.array(
            [
                6 * x[0] + 3 * x[1] + 2 * x[2] - p[0],
                p[1] * x[0] + x[1] - x[2] - 1.0,
            ]
        ),
        kinds=("eq", "eq"),
        n=3,
        lb=[0.0, 0.0, 0.0],
    )
    p = jnp.array([4.5, 1.0])
    sol, info = nlpsolver.solve(nlp, p, x0=jnp.array([1.0, 1.0, 1.0]))
    assert bool(info.converged), info
    np.testing.assert_allclose(sol.x, [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(sol.y, [0.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(sol.zL, [0.0, 0.0, 1.0], atol=1e-5)

    # end-to-end: solver output feeds the sensitivity rule; analytic Jacobian
    jac = solution_jacobian(nlp, sol, p)
    np.testing.assert_allclose(
        jac.dx, [[1 / 3, 1 / 2], [-1 / 3, -1.0], [0.0, 0.0]], atol=1e-5
    )


def test_softmax_max_sense():
    """max p.y - sum(y log y) s.t. sum(y)=1, y >= 0 -> y = softmax(p)."""
    k = 4
    pv = np.linspace(0.5, 2.0, k)
    s = np.exp(pv) / np.sum(np.exp(pv))
    nlp = NLPProblem(
        objective=lambda x, p: jnp.dot(p, x) - jnp.sum(x * jnp.log(x)),
        constraints=lambda x, p: jnp.array([jnp.sum(x) - 1.0]),
        kinds=("eq",),
        n=k,
        lb=np.zeros(k),
        sense="max",
    )
    p = jnp.asarray(pv)
    sol, info = nlpsolver.solve(nlp, p, x0=jnp.full(k, 1.0 / k))
    assert bool(info.converged), info
    np.testing.assert_allclose(sol.x, s, atol=1e-6)

    jac = solution_jacobian(nlp, sol, p)
    np.testing.assert_allclose(jac.dx, np.diag(s) - np.outer(s, s), atol=1e-5)


def test_rosenbrock_constrained():
    """Reference model zoo problem (nlp_problems.jl:10-26): min (1-x1)^2 +
    p3 (x2 - x1^2)^2 s.t. x1^2 <= p1, p1*(x1+x2)^2 <= p2... using the JuMP
    Hessian-tutorial NLP with (p, p2, p3) = (1, 2, 100)."""
    nlp = NLPProblem(
        objective=lambda x, p: (1 - x[0]) ** 2 + p[2] * (x[1] - x[0] ** 2) ** 2,
        constraints=lambda x, p: jnp.array(
            [x[0] ** 2 - p[0], p[0] * (x[0] + x[1]) ** 2 - p[1]]
        ),
        kinds=("leq", "leq"),
        n=2,
    )
    p = jnp.array([1.0, 2.0, 100.0])
    sol, info = nlpsolver.solve(nlp, p, x0=jnp.array([0.5, 0.5]))
    assert bool(info.converged), info
    # unconstrained optimum (1,1) is feasible here: x1^2=1<=1 (active at
    # boundary), (x1+x2)^2=4 > 2 -> second constraint active; solve via scipy
    import scipy.optimize as so

    res = so.minimize(
        lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
        [0.5, 0.5],
        constraints=[
            {"type": "ineq", "fun": lambda x: 1 - x[0] ** 2},
            {"type": "ineq", "fun": lambda x: 2 - (x[0] + x[1]) ** 2},
        ],
        method="SLSQP",
        tol=1e-12,
    )
    np.testing.assert_allclose(sol.x, res.x, atol=1e-5)

    # finite-difference check of the sensitivity wrt p2
    eps = 1e-6

    def solve_at(p2):
        res = so.minimize(
            lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
            [0.5, 0.5],
            constraints=[
                {"type": "ineq", "fun": lambda x: 1 - x[0] ** 2},
                {"type": "ineq", "fun": lambda x: p2 - (x[0] + x[1]) ** 2},
            ],
            method="SLSQP",
            tol=1e-14,
        )
        return res.x

    fd = (solve_at(2 + eps) - solve_at(2 - eps)) / (2 * eps)
    fwd = forward_differentiate(nlp, sol, p, jnp.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(fwd.dx, fd, atol=1e-4, rtol=1e-3)


def test_max_sense_leq():
    # max x s.t. x <= p, x <= 2 at p = 1.5
    nlp = NLPProblem(
        objective=lambda x, p: x[0],
        constraints=lambda x, p: jnp.array([x[0] - p[0], x[0] - 2.0]),
        kinds=("leq", "leq"),
        n=1,
        sense="max",
    )
    p = jnp.array([1.5])
    sol, info = nlpsolver.solve(nlp, p)
    assert bool(info.converged), info
    np.testing.assert_allclose(sol.x, [1.5], atol=1e-6)
    # leq duals are <= 0 regardless of sense (stationarity of f - sigma*y*c:
    # 1 + y = 0 for Max) — the reference's convention, nlp_utilities.jl:219-266
    np.testing.assert_allclose(sol.y, [-1.0, 0.0], atol=1e-5)


def test_nonconvex_from_bad_start():
    """Nonconvex Rosenbrock-style NLP (reference nlp_problems.jl:10-26 with
    p3=100) solved from the reference's deliberately bad start (-1, -2)."""
    nlp = NLPProblem(
        objective=lambda x, p: (1 - x[0]) ** 2 + p[2] * (x[1] - x[0] ** 2) ** 2,
        constraints=lambda x, p: jnp.array(
            [x[0] ** 2 - p[0], p[0] * (x[0] + x[1]) ** 2 - p[1]]
        ),
        kinds=("leq", "leq"),
        n=2,
    )
    p = jnp.array([1.0, 2.0, 100.0])
    sol, info = nlpsolver.solve(nlp, p, x0=jnp.array([-1.0, -2.0]), max_iters=200)
    assert bool(info.converged), info
    # compare against SLSQP from the same start
    import scipy.optimize as so

    res = so.minimize(
        lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
        [-1.0, -2.0],
        constraints=[
            {"type": "ineq", "fun": lambda x: 1 - x[0] ** 2},
            {"type": "ineq", "fun": lambda x: 2 - (x[0] + x[1]) ** 2},
        ],
        method="SLSQP",
        tol=1e-12,
    )
    # both should find a KKT point with similar objective
    f_ours = float((1 - sol.x[0]) ** 2 + 100 * (sol.x[1] - sol.x[0] ** 2) ** 2)
    assert f_ours <= res.fun + 1e-4, (f_ours, res.fun, np.asarray(sol.x), res.x)


def test_circle_fit_geometric_median():
    """Smoothed geometric median with an (inactive) radius cap. Smoothing
    1e-4 keeps the Hessian bounded (~1e2); the 1e-8 variant has ~1e4
    curvature spikes at data points and stalls any Newton-type method."""
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(6, 2))

    def obj(x, p):
        d2 = jnp.sum((pts - x[None, :]) ** 2, axis=1)
        return jnp.sum(jnp.sqrt(d2 + 1e-4))

    nlp = NLPProblem(
        objective=obj,
        constraints=lambda x, p: jnp.array([jnp.sum(x**2) - p[0]]),
        kinds=("leq",),
        n=2,
    )
    p = jnp.array([25.0])  # inactive cap
    sol, info = nlpsolver.solve(nlp, p, x0=jnp.zeros(2))
    assert bool(info.converged)
    import scipy.optimize as so

    ref = so.minimize(lambda x: float(obj(jnp.asarray(x), p)), [0.0, 0.0], tol=1e-12)
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-4)
