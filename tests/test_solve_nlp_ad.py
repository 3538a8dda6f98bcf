"""NLP AD integration: ``solve_nlp`` under jax.grad/jacfwd/jit/vmap and the
``ParametricProgram(kind='nlp')`` front end.

Round-1 verdict item 2: the NLP backend must be reachable through the exact
same verbs and parameter layer as QP/conic (reference
``NonLinearProgram.jl:502-582`` + ``parameters.jl:283-301``) — a
``custom_vjp``/``custom_jvp`` solution map, not manual calls into
``nlp_diff``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import NLPProblem, ParametricProgram, solve_nlp
from diffopt_tpu import nlp_diff
from diffopt_tpu.solvers import nlp as nlpsolver


def _sipopt_nlp():
    """The sIpopt paper example (reference ``test/data/nlp_problems.jl:34-48``):
    min sum(x^2) s.t. 6x1+3x2+2x3 = p1, p2 x1 + x2 - x3 = 1, x >= 0."""
    return NLPProblem(
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


_P0 = jnp.array([4.5, 1.0])
_X0 = jnp.array([1.0, 1.0, 1.0])


def test_solve_nlp_grad_matches_reverse_verb_and_fd():
    nlp = _sipopt_nlp()

    def loss(p):
        sol = solve_nlp(nlp, p, _X0)
        return jnp.sum(sol.x**2) + jnp.dot(sol.y, sol.y)

    g = jax.grad(loss)(_P0)

    # manual verb route
    sol, info = nlpsolver.solve(nlp, _P0, _X0)
    assert bool(info.converged)
    dp = nlp_diff.reverse_differentiate(
        nlp, sol, _P0, dx=2 * sol.x, dy=2 * sol.y
    )
    np.testing.assert_allclose(g, dp, rtol=1e-6, atol=1e-9)

    # finite-difference oracle (the reference's FiniteDiff sweep,
    # test/nlp_program.jl:602-642)
    eps = 1e-6
    for i in range(2):
        e = np.zeros(2)
        e[i] = eps
        lp = float(loss(_P0 + e))
        lm = float(loss(_P0 - e))
        np.testing.assert_allclose(g[i], (lp - lm) / (2 * eps), atol=2e-4)


def test_solve_nlp_under_jit_and_vmap():
    nlp = _sipopt_nlp()

    def loss(p):
        sol = solve_nlp(nlp, p, _X0)
        return jnp.sum(sol.x**2)

    g_eager = jax.grad(loss)(_P0)
    g_jit = jax.jit(jax.grad(loss))(_P0)
    np.testing.assert_allclose(g_jit, g_eager, atol=1e-10)

    ps = jnp.stack([_P0, jnp.array([5.0, 1.2])])
    g_batch = jax.jit(jax.vmap(jax.grad(loss)))(ps)
    np.testing.assert_allclose(g_batch[0], g_eager, atol=1e-8)
    np.testing.assert_allclose(
        g_batch[1], jax.grad(loss)(ps[1]), atol=1e-8
    )


def test_solve_nlp_jacfwd_matches_solution_jacobian():
    nlp = _sipopt_nlp()

    jac = jax.jacfwd(lambda p: solve_nlp(nlp, p, _X0, mode="jvp").x)(_P0)

    sol, _ = nlpsolver.solve(nlp, _P0, _X0)
    full = nlp_diff.solution_jacobian(nlp, sol, _P0)
    np.testing.assert_allclose(jac, full.dx, rtol=1e-6, atol=1e-9)

    # dual sensitivities flow too (ForwardConstraintDual is NLP-only in the
    # reference — keep that scope)
    jac_y = jax.jacfwd(lambda p: solve_nlp(nlp, p, _X0, mode="jvp").y)(_P0)
    np.testing.assert_allclose(jac_y, full.dy, rtol=1e-6, atol=1e-9)


def test_parametric_program_nlp_kind():
    nlp = _sipopt_nlp()
    # theta -> p composition: p = [3*theta1, theta2^2] exercises the chain
    # rule through build (the POI layer role)
    layer = ParametricProgram(
        lambda th: jnp.array([3.0 * th[0], th[1] ** 2]), kind="nlp", nlp=nlp,
        x0=_X0,
    )
    theta = jnp.array([1.5, 1.0])

    sol = layer.solve(theta)
    ref, _ = nlpsolver.solve(nlp, jnp.array([4.5, 1.0]), _X0)
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-7)

    fwd = layer.forward_differentiate(theta, jnp.array([1.0, 0.0]))
    # d p / d theta1 = [3, 0]: compare against the verb with dp = [3, 0]
    verb = nlp_diff.forward_differentiate(nlp, ref, jnp.array([4.5, 1.0]),
                                          jnp.array([3.0, 0.0]))
    np.testing.assert_allclose(fwd.x, verb.dx, rtol=1e-6, atol=1e-9)

    dtheta = layer.reverse_differentiate(theta, dx=jnp.ones(3))
    dp = nlp_diff.reverse_differentiate(
        nlp, ref, jnp.array([4.5, 1.0]), dx=jnp.ones(3)
    )
    np.testing.assert_allclose(dtheta, jnp.array([3.0 * dp[0], 2.0 * dp[1]]),
                               rtol=1e-6, atol=1e-9)

    with pytest.raises(ValueError):
        ParametricProgram(lambda th: th, kind="nlp")  # missing nlp=
    with pytest.raises(ValueError):
        ParametricProgram(lambda th: th, kind="qp", nlp=nlp)


def test_nlp_layer_trains_with_optax():
    """An NLP layer drops into an Optax loop (reference examples role,
    ``custom-relu.jl:25-61``): tune p2 so the solution hits a target."""
    import optax

    nlp = _sipopt_nlp()
    target = jnp.array([0.45, 0.55, 0.05])

    def loss(theta):
        sol = solve_nlp(nlp, jnp.array([4.5, theta[0]]), _X0)
        return jnp.sum((sol.x - target) ** 2)

    theta = jnp.array([1.0])
    opt = optax.adam(5e-2)
    state = opt.init(theta)
    l0 = float(loss(theta))
    step = jax.jit(
        lambda th, st: (lambda g: opt.update(g, st, th))(jax.grad(loss)(th))
    )
    for _ in range(25):
        updates, state = step(theta, state)
        theta = optax.apply_updates(theta, updates)
    assert float(loss(theta)) < 0.5 * l0
