"""NLP problem zoo x finite-difference oracle sweep.

TPU-native analogue of the reference's FiniteDiff comparison over its problem
zoo (``/root/reference/test/nlp_program.jl:602-642``, zoo at
``test/data/nlp_problems.jl:10-345``): each entry is solved with the embedded
interior-point solver, the full sensitivity Jacobian is computed through the
KKT factorization, and every column is compared against central differences
of the solve map p -> (x*(p), y*(p)). Covers the same feature matrix —
inequality/equality mixes, active variable bounds, nonconvex objectives,
trigonometric constraints, multi-parameter coupling, Min and Max senses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu.nlp_diff import NLPProblem, solution_jacobian
from diffopt_tpu.solvers import nlp as nlpsolver

ATOL = 2e-4
EPS = 1e-6


def _zoo():
    inf = np.inf
    zoo = []

    # 1. convex QP-like, one active inequality (jump_model_1 flavour)
    zoo.append(
        (
            "active-ineq",
            NLPProblem(
                objective=lambda x, p: x[0] ** 2 + x[1] ** 2,
                constraints=lambda x, p: jnp.array([x[0] + x[1] - p[0]]),
                kinds=("geq",),
                n=2,
            ),
            np.array([1.5]),
            "min",
        )
    )

    # 2. nonconvex objective, parameter in the objective (model_7 g=sin flavour)
    zoo.append(
        (
            "nonconvex-sin-obj",
            NLPProblem(
                objective=lambda x, p: x[0] ** 2 - 0.5 * jnp.sin(x[0]) + p[0] * x[0],
                constraints=None,
                kinds=(),
                n=1,
            ),
            np.array([0.7]),
            "min",
        )
    )

    # 3. equality-constrained, two params (sipopt flavour)
    zoo.append(
        (
            "equality-2p",
            NLPProblem(
                objective=lambda x, p: (x[0] - 1.0) ** 2 + (x[1] - 2.0) ** 2,
                constraints=lambda x, p: jnp.array(
                    [x[0] + x[1] - p[0], x[0] - x[1] - p[1]]
                ),
                kinds=("eq", "eq"),
                n=2,
            ),
            np.array([2.0, 0.3]),
            "min",
        )
    )

    # 4. active upper bound (bounds-as-bounds flavour)
    zoo.append(
        (
            "active-ub",
            NLPProblem(
                objective=lambda x, p: (x[0] - p[0]) ** 2 + 0.1 * x[0] ** 4,
                constraints=None,
                kinds=(),
                n=1,
                lb=np.array([-inf]),
                ub=np.array([1.0]),
            ),
            np.array([3.0]),
            "min",
        )
    )

    # 5. trigonometric inequality constraint (model_7 flavour)
    zoo.append(
        (
            "sin-constraint",
            NLPProblem(
                objective=lambda x, p: (x[0] - 2.0) ** 2,
                constraints=lambda x, p: jnp.array([jnp.sin(x[0]) - p[0]]),
                kinds=("leq",),
                n=1,
            ),
            np.array([0.5]),
            "min",
        )
    )

    # 6. Max sense with inequality (ismin=false flavour)
    zoo.append(
        (
            "max-sense",
            NLPProblem(
                objective=lambda x, p: -((x[0] - p[0]) ** 2) - (x[1] - 1.0) ** 2,
                constraints=lambda x, p: jnp.array([x[0] + x[1] - 1.0]),
                kinds=("leq",),
                n=2,
                sense="max",
            ),
            np.array([2.0]),
            "max",
        )
    )

    # 6b. Max sense with a NONLINEAR active constraint: locks the Lagrangian
    #     Hessian sign under Max (max -(x-3)^2 s.t. x^2 <= p: x* = sqrt(p),
    #     y* = 1 - 3/sqrt(p) <= 0, dy/dp = (3/2) p^(-3/2))
    zoo.append(
        (
            "max-nonlinear-con",
            NLPProblem(
                objective=lambda x, p: -((x[0] - 3.0) ** 2),
                constraints=lambda x, p: jnp.array([x[0] ** 2 - p[0]]),
                kinds=("leq",),
                n=1,
                sense="max",
            ),
            np.array([4.0]),
            "max",
        )
    )

    # 7. multi-parameter coupling: params in coefficients AND rhs
    #    (nonlinear_model_2 flavour)
    zoo.append(
        (
            "coef-and-rhs",
            NLPProblem(
                objective=lambda x, p: p[0] * x[0] ** 2 + x[1] ** 2 + x[0] * x[1],
                constraints=lambda x, p: jnp.array(
                    [x[0] + p[1] * x[1] - p[2], x[0] - 0.1]
                ),
                kinds=("eq", "geq"),
                n=2,
            ),
            np.array([2.0, 0.5, 1.0]),
            "min",
        )
    )

    # 8. exp/log mixture with an inactive constraint (zero-gradient row):
    #    interior optimum x1* = sqrt(10 p), x0* from exp(x0) + 2(x0-0.2) = 0;
    #    x0+x1 ~ 3.4 << 10 so the constraint row must get zero sensitivity
    zoo.append(
        (
            "exp-log-inactive",
            NLPProblem(
                objective=lambda x, p: jnp.exp(x[0])
                + (x[0] - 0.2) ** 2
                - p[0] * jnp.log(x[1])
                + x[1] ** 2 / 20.0,
                constraints=lambda x, p: jnp.array([x[0] + x[1] - 10.0]),
                kinds=("leq",),
                n=2,
                lb=np.array([-inf, 1e-3]),
                ub=np.array([inf, inf]),
            ),
            np.array([1.3]),
            "min",
        )
    )

    return zoo


def _solve(nlp, p):
    sol, info = nlpsolver.solve(nlp, jnp.asarray(p), max_iters=200, tol=1e-11)
    assert bool(info.converged), f"solver failed at p={p}"
    return sol


@pytest.mark.parametrize("name,nlp,p,sense", _zoo(), ids=[z[0] for z in _zoo()])
def test_zoo_jacobian_vs_finite_differences(name, nlp, p, sense):
    sol = _solve(nlp, p)
    jac = solution_jacobian(nlp, sol, jnp.asarray(p))
    assert not bool(jac.singular)

    num_p = len(p)
    for j in range(num_p):
        dp = np.zeros(num_p)
        dp[j] = EPS
        sp = _solve(nlp, p + dp)
        sm = _solve(nlp, p - dp)
        fd_x = (np.asarray(sp.x) - np.asarray(sm.x)) / (2 * EPS)
        np.testing.assert_allclose(
            np.asarray(jac.dx[..., j]), fd_x, atol=ATOL,
            err_msg=f"{name}: dx/dp[{j}]",
        )
        # dual sensitivities (ForwardConstraintDual parity) against fd of y
        fd_y = (np.asarray(sp.y) - np.asarray(sm.y)) / (2 * EPS)
        np.testing.assert_allclose(
            np.asarray(jac.dy[..., j]), fd_y, atol=5e-3,
            err_msg=f"{name}: dy/dp[{j}]",
        )
