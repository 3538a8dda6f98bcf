"""NLP KKT sensitivity vs the reference's analytic cases
(``/root/reference/test/nlp_program.jl:334-416`` and
``test/data/nlp_problems.jl``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu.nlp_diff import (
    NLPProblem,
    NLPSolution,
    forward_differentiate,
    reverse_differentiate,
    solution_jacobian,
)

ATOL = 1e-6


def test_geq_impact():
    """model_1 at p=2.1 ("geq impact"): min x^2 s.t. x>=p, x>=2.
    dp=0.2 -> dx=0.2, dy=[0.4, 0]."""
    nlp = NLPProblem(
        objective=lambda x, p: x[0] ** 2,
        constraints=lambda x, p: jnp.array([x[0] - p[0], x[0] - 2.0]),
        kinds=("geq", "geq"),
        n=1,
    )
    p = jnp.array([2.1])
    sol = NLPSolution(
        x=jnp.array([2.1]),
        y=jnp.array([4.2, 0.0]),
        zL=jnp.zeros(1),
        zU=jnp.zeros(1),
    )
    fwd = forward_differentiate(nlp, sol, p, jnp.array([0.2]))
    assert not bool(fwd.singular)
    np.testing.assert_allclose(fwd.dx, [0.2], atol=ATOL)
    np.testing.assert_allclose(fwd.dy, [0.4, 0.0], atol=ATOL)


def test_geq_no_impact():
    """model_1 at p=1.5: the x>=2 constraint pins x; dx=dy=0."""
    nlp = NLPProblem(
        objective=lambda x, p: x[0] ** 2,
        constraints=lambda x, p: jnp.array([x[0] - p[0], x[0] - 2.0]),
        kinds=("geq", "geq"),
        n=1,
    )
    p = jnp.array([1.5])
    sol = NLPSolution(
        x=jnp.array([2.0]), y=jnp.array([0.0, 4.0]), zL=jnp.zeros(1), zU=jnp.zeros(1)
    )
    fwd = forward_differentiate(nlp, sol, p, jnp.array([0.2]))
    np.testing.assert_allclose(fwd.dx, [0.0], atol=ATOL)
    np.testing.assert_allclose(fwd.dy, [0.0, 0.0], atol=ATOL)


def test_geq_bound_impact():
    """model_2 at p=2.1 ("geq bound impact"): min x^2 s.t. x>=p with variable
    bound x>=2. dp=0.2 -> dx=0.2, dy=[0.4], dzL=[0]."""
    nlp = NLPProblem(
        objective=lambda x, p: x[0] ** 2,
        constraints=lambda x, p: jnp.array([x[0] - p[0]]),
        kinds=("geq",),
        n=1,
        lb=[2.0],
    )
    p = jnp.array([2.1])
    sol = NLPSolution(
        x=jnp.array([2.1]), y=jnp.array([4.2]), zL=jnp.zeros(1), zU=jnp.zeros(1)
    )
    fwd = forward_differentiate(nlp, sol, p, jnp.array([0.2]))
    np.testing.assert_allclose(fwd.dx, [0.2], atol=ATOL)
    np.testing.assert_allclose(fwd.dy, [0.4], atol=ATOL)
    np.testing.assert_allclose(fwd.dzL, [0.0], atol=ATOL)


def test_leq_impact_max():
    """model_4 at p=1.5 ("leq impact max"): max x s.t. x<=p, x<=2.
    dp=0.2 -> dx=0.2, dy=[0, 0] (dual constant at 1)."""
    nlp = NLPProblem(
        objective=lambda x, p: x[0],
        constraints=lambda x, p: jnp.array([x[0] - p[0], x[0] - 2.0]),
        kinds=("leq", "leq"),
        n=1,
        sense="max",
    )
    p = jnp.array([1.5])
    # leq dual <= 0 in both senses (stationarity of f - sigma*y*c); active
    # con1 dual = -1
    sol = NLPSolution(
        x=jnp.array([1.5]), y=jnp.array([-1.0, 0.0]), zL=jnp.zeros(1), zU=jnp.zeros(1)
    )
    fwd = forward_differentiate(nlp, sol, p, jnp.array([0.2]))
    np.testing.assert_allclose(fwd.dx, [0.2], atol=ATOL)
    np.testing.assert_allclose(fwd.dy, [0.0, 0.0], atol=ATOL)


def test_sipopt_example():
    """sIpopt paper example (nlp_problems.jl:34-48): min sum(x^2) s.t.
    6x1+3x2+2x3 = p1, p2*x1+x2-x3 = 1, x >= 0 at p=(4.5, 1).
    Active set {eq1, eq2, x3=0} gives the analytic Jacobian
    dx/dp = [[1/3, 1/2], [-1/3, -1], [0, 0]]."""
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
    sol = NLPSolution(
        x=jnp.array([0.5, 0.5, 0.0]),
        y=jnp.array([0.0, 1.0]),
        zL=jnp.array([0.0, 0.0, 1.0]),
        zU=jnp.zeros(3),
    )
    jac = solution_jacobian(nlp, sol, p)
    assert not bool(jac.singular)
    np.testing.assert_allclose(
        jac.dx, [[1 / 3, 1 / 2], [-1 / 3, -1.0], [0.0, 0.0]], atol=1e-6
    )


def test_softmax_entropy_jacobian():
    """Softmax model (nlp_problems.jl:146-166): max p.y - sum(y log y) s.t.
    sum(y)=1, y<=1, y>=0 has closed form y* = softmax(p); the sensitivity must
    equal the softmax Jacobian diag(s) - s s'."""
    k = 5
    pv = np.linspace(1.0, 2.0, k)
    s = np.exp(pv) / np.sum(np.exp(pv))

    def obj(x, p):
        return jnp.dot(p, x) - jnp.sum(x * jnp.log(x))

    def cons(x, p):
        return jnp.concatenate([jnp.array([jnp.sum(x) - 1.0]), x - 1.0])

    nlp = NLPProblem(
        objective=obj,
        constraints=cons,
        kinds=("eq",) + ("leq",) * k,
        n=k,
        lb=np.zeros(k),
        sense="max",
    )
    p = jnp.asarray(pv)
    # stationarity of f - sigma*y*c (Max: f + y*c): p - log x - 1 + y = 0 at
    # x = softmax(p) gives y = 1 - logsumexp(p)
    y_eq = float(1.0 - np.log(np.sum(np.exp(pv))))
    sol = NLPSolution(
        x=jnp.asarray(s),
        y=jnp.concatenate([jnp.array([y_eq]), jnp.zeros(k)]),
        zL=jnp.zeros(k),
        zU=jnp.zeros(k),
    )
    jac = solution_jacobian(nlp, sol, p)
    expected = np.diag(s) - np.outer(s, s)
    np.testing.assert_allclose(jac.dx, expected, atol=1e-7)


def test_forward_reverse_adjoint():
    """<forward(dp), seed> == <dp, reverse(seed)> on the sIpopt example."""
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
    sol = NLPSolution(
        x=jnp.array([0.5, 0.5, 0.0]),
        y=jnp.array([0.0, 1.0]),
        zL=jnp.array([0.0, 0.0, 1.0]),
        zU=jnp.zeros(3),
    )
    rng = np.random.default_rng(3)
    dp = jnp.asarray(rng.normal(size=2))
    seed_x = jnp.asarray(rng.normal(size=3))
    seed_y = jnp.asarray(rng.normal(size=2))

    fwd = forward_differentiate(nlp, sol, p, dp)
    rev = reverse_differentiate(nlp, sol, p, dx=seed_x, dy=seed_y)
    lhs = float(jnp.dot(fwd.dx, seed_x) + jnp.dot(fwd.dy, seed_y))
    rhs = float(jnp.dot(dp, rev))
    assert abs(lhs - rhs) < 1e-8 * max(1.0, abs(lhs))


def test_inertia_correction_on_singular_kkt():
    """Reference inertia-correction test (nlp_program.jl:767-795): a
    degenerate problem with a singular KKT matrix must still produce finite
    sensitivities via the diagonal-shift loop (min x^2 with duplicated
    constraint rows)."""
    nlp = NLPProblem(
        objective=lambda x, p: x[0] ** 2,
        constraints=lambda x, p: jnp.array([x[0] - p[0], x[0] - p[0]]),
        kinds=("geq", "geq"),
        n=1,
    )
    p = jnp.array([2.0])
    sol = NLPSolution(
        x=jnp.array([2.0]), y=jnp.array([2.0, 2.0]), zL=jnp.zeros(1), zU=jnp.zeros(1)
    )
    fwd = forward_differentiate(nlp, sol, p, jnp.array([1.0]))
    assert np.all(np.isfinite(np.asarray(fwd.dx)))
    assert np.all(np.isfinite(np.asarray(fwd.dy)))


def test_nonlinear_constraint_fd():
    """Nonlinear program vs finite differences through the analytic solution
    map: min (x1-1)^2 + (x2-p1)^2 s.t. x1 * x2 = p2 (eq)."""

    def solve_analytic(p1, p2):
        # stationarity: 2(x1-1) - y x2 = 0 ; 2(x2-p1) - y x1 = 0 ; x1 x2 = p2
        import scipy.optimize as so

        def F(v):
            x1, x2, y = v
            return [
                2 * (x1 - 1) - y * x2,
                2 * (x2 - p1) - y * x1,
                x1 * x2 - p2,
            ]

        v = so.fsolve(F, [1.0, 1.0, 0.0], full_output=False)
        return np.asarray(v)

    p1, p2 = 2.0, 1.5
    x1, x2, ym = solve_analytic(p1, p2)
    # internal mu solves 2(x-..) - mu*grad c... with L = f - y c (min):
    # residual used above is grad f - y grad c -> y_jump = ym
    nlp = NLPProblem(
        objective=lambda x, p: (x[0] - 1) ** 2 + (x[1] - p[0]) ** 2,
        constraints=lambda x, p: jnp.array([x[0] * x[1] - p[1]]),
        kinds=("eq",),
        n=2,
    )
    p = jnp.array([p1, p2])
    sol = NLPSolution(
        x=jnp.array([x1, x2]), y=jnp.array([ym]), zL=jnp.zeros(2), zU=jnp.zeros(2)
    )
    jac = solution_jacobian(nlp, sol, p)

    eps = 1e-6
    for j, (dp1, dp2) in enumerate([(eps, 0.0), (0.0, eps)]):
        vp = solve_analytic(p1 + dp1, p2 + dp2)
        vm = solve_analytic(p1 - dp1, p2 - dp2)
        fd = (vp[:2] - vm[:2]) / (2 * eps)
        np.testing.assert_allclose(jac.dx[:, j], fd, atol=1e-5, rtol=1e-5)


def test_nlp_vmap_and_jit():
    """The sensitivity rules are jit/vmap transformable: batch over parameter
    vectors of the sIpopt example with per-instance solutions."""
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
    from diffopt_tpu.solvers import nlp as nlpsolver

    p_batch = jnp.array([[4.5, 1.0], [4.8, 1.0], [4.2, 1.0]])

    def solve_and_sens(p):
        sol, _ = nlpsolver.solve(nlp, p, x0=jnp.array([1.0, 1.0, 1.0]))
        return solution_jacobian(nlp, sol, p).dx

    jacs = jax.jit(jax.vmap(solve_and_sens))(p_batch)
    # active set is the same across this batch: x3=0, both eqs active;
    # analytic: x1 = (p1-3)/3 and dx/dp = [[1/3, x1], [-1/3, -2 x1], [0, 0]]
    for i in range(3):
        x1 = (float(p_batch[i, 0]) - 3.0) / 3.0
        np.testing.assert_allclose(
            jacs[i], [[1 / 3, x1], [-1 / 3, -2 * x1], [0.0, 0.0]], atol=1e-4
        )
