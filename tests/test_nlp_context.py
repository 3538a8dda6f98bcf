"""NLPDiffContext: solve-once / factorize-once / differentiate-many for the
NLP backend (the reference reuses its cached KKT factorization across
``forward/reverse_differentiate!`` calls — ``NonLinearProgram.jl:436-443``;
round-1 verdict flagged the context family's missing NLP member)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import NLPDiffContext, NotSolvedError
from diffopt_tpu.nlp_diff import (
    NLPProblem,
    forward_differentiate,
    reverse_differentiate,
    solution_jacobian,
)


def _sipopt_problem():
    """The sIpopt example (reference ``nlp_problems.jl:34-48``): three vars,
    two equality constraints, parameterized objective + RHS."""
    return NLPProblem(
        objective=lambda x, p: x[0] ** 2 + x[1] ** 2 + x[0] * x[1],
        constraints=lambda x, p: jnp.array(
            [
                6.0 * x[0] + 3.0 * x[1] + 2.0 * x[2] - p[0],
                p[1] * x[0] + x[1] - x[2] - 1.0,
            ]
        ),
        kinds=("eq", "eq"),
        n=3,
    )


def test_context_matches_one_shot_verbs():
    nlp = _sipopt_problem()
    p = jnp.array([5.0, 1.0])
    ctx = NLPDiffContext(nlp, p)
    assert bool(ctx.solve_info.converged)
    sol = ctx.sol

    dp = jnp.array([0.3, -0.1])
    fwd_ctx = ctx.forward(dp)
    fwd_ref = forward_differentiate(nlp, sol, p, dp)
    np.testing.assert_allclose(
        np.asarray(fwd_ctx.dx), np.asarray(fwd_ref.dx), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(fwd_ctx.dy), np.asarray(fwd_ref.dy), atol=1e-10
    )

    jac_ctx = ctx.jacobian()
    jac_ref = solution_jacobian(nlp, sol, p)
    np.testing.assert_allclose(
        np.asarray(jac_ctx.dx), np.asarray(jac_ref.dx), atol=1e-10
    )

    dx = jnp.array([1.0, -2.0, 0.5])
    rev_ctx = ctx.reverse(dx=dx)
    rev_ref = reverse_differentiate(nlp, sol, p, dx=dx)
    np.testing.assert_allclose(
        np.asarray(rev_ctx), np.asarray(rev_ref), atol=1e-10
    )

    # many-seed reuse: forward/reverse adjoint identity on fresh seeds
    dp2 = jnp.array([-0.05, 0.7])
    fwd2 = ctx.forward(dp2)
    lhs = float(jnp.dot(fwd2.dx, dx))
    rhs = float(jnp.dot(ctx.reverse(dx=dx), dp2))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9 * (1 + abs(lhs)))
    assert np.isfinite(ctx.differentiate_time_sec)


def test_context_rejects_unconverged():
    """Infeasible equalities: x - 1 = 0 and x - 2 = 0."""
    nlp = NLPProblem(
        objective=lambda x, p: x[0] ** 2,
        constraints=lambda x, p: jnp.array([x[0] - 1.0, x[0] - 2.0]),
        kinds=("eq", "eq"),
        n=1,
    )
    with pytest.raises(NotSolvedError):
        NLPDiffContext(nlp, jnp.zeros(1), solver_kwargs=dict(max_iters=30))
