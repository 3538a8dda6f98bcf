"""Quadratic-objective epigraph bridge + both-backend QP harness (round-1
verdict item 3): every QP case must differentiate identically through the QP
KKT backend AND the conic homogeneous-embedding backend after the epigraph
RSOC lowering — the reference runs every harness case under both backends
(``test/utils.jl:369-377``; objective-slack bridge ``src/copy_dual.jl:103-109``,
``src/bridges.jl:6-21``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import QuadProgram, bridges, solve_qp
from diffopt_tpu.bridges import qp_to_cone, qp_via_conic
from diffopt_tpu.solvers import qp as qpsolver


def _rand_qp(seed, n=4, m=3, p=2):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(n, n))
    return QuadProgram.make(
        Q=L @ L.T + n * np.eye(n),
        q=rng.normal(size=n),
        A=rng.normal(size=(p, n)),
        b=rng.normal(size=p),
        G=rng.normal(size=(m, n)),
        h=rng.normal(size=m) + 1.0,
    )


def test_epigraph_lowering_solution_matches_qp():
    qp = _rand_qp(0)
    sol_qp, info = qpsolver.solve(qp, tol=1e-11)
    assert bool(info.converged)
    sol_cone = qp_via_conic(qp, tol=1e-11)
    np.testing.assert_allclose(sol_cone.z, sol_qp.z, atol=1e-6)
    np.testing.assert_allclose(sol_cone.lam, sol_qp.lam, atol=1e-5)
    np.testing.assert_allclose(sol_cone.nu, sol_qp.nu, atol=1e-5)


def test_lowering_objective_value():
    """c'x_tilde at the conic optimum equals the QP objective (t* = 1/2 x'Qx)."""
    qp = _rand_qp(1)
    cp = qp_to_cone(qp)
    from diffopt_tpu import solve_conic

    sol = solve_conic(cp, tol=1e-11)
    z = sol.x[:-1]
    obj_qp = 0.5 * z @ qp.Q @ z + qp.q @ z
    np.testing.assert_allclose(
        float(cp.c @ sol.x), float(obj_qp), atol=1e-7
    )
    # epigraph tight at the optimum
    np.testing.assert_allclose(float(sol.x[-1]), float(0.5 * z @ qp.Q @ z),
                               atol=1e-7)


@pytest.mark.parametrize("seed", [2, 3])
def test_both_backend_gradients_match(seed):
    """jax.grad of a scalar loss of z agrees between the QP KKT route and the
    conic route, for every data tensor (Q through the Cholesky calculus)."""
    qp = _rand_qp(seed)

    def loss_qp(qp):
        return jnp.sum(solve_qp(qp, tol=1e-11).z ** 2)

    def loss_cone(qp):
        return jnp.sum(qp_via_conic(qp, quadratic=True, tol=1e-11).z ** 2)

    g_qp = jax.grad(loss_qp)(qp)
    g_cone = jax.grad(loss_cone)(qp)
    for name in ("Q", "q", "A", "b", "G", "h"):
        a = np.asarray(getattr(g_cone, name))
        e = np.asarray(getattr(g_qp, name))
        scale = 1.0 + np.max(np.abs(e))
        np.testing.assert_allclose(a, e, atol=2e-5 * scale, err_msg=name)


def test_both_backend_golden_file_qp():
    """The reference's golden-file QP (10 vars, 25 ineq, 10 eq,
    ``test/quadratic_program.jl:295-350``) through BOTH backends: reverse
    gradients at the golden tolerance (1e-3) against the stored dq/dh."""
    import pathlib

    data = pathlib.Path(__file__).parent / "data"
    ld = lambda f: np.loadtxt(data / f)
    qp = QuadProgram.make(
        Q=ld("P.txt"), q=ld("q.txt"), A=ld("A.txt"), b=ld("b.txt"),
        G=ld("G.txt"), h=ld("h.txt"),
    )

    dq_exp, dh_exp = ld("dq.txt"), ld("dh.txt")

    def loss(qp, route):
        sol = (
            solve_qp(qp, tol=1e-11)
            if route == "qp"
            else qp_via_conic(qp, quadratic=True, tol=1e-11)
        )
        return jnp.dot(sol.z, jnp.ones(qp.num_vars))

    for route in ("qp", "conic"):
        g = jax.grad(lambda q: loss(q, route))(qp)
        np.testing.assert_allclose(g.q, dq_exp, atol=1e-3, rtol=1e-3,
                                   err_msg=route)
        np.testing.assert_allclose(g.h, dh_exp, atol=1e-3, rtol=1e-3,
                                   err_msg=route)


def test_quadratic_flag_required_under_jit():
    qp = _rand_qp(4)
    with pytest.raises(ValueError):
        jax.jit(lambda q: qp_to_cone(q).b)(qp)
    # explicit flag works under jit
    out = jax.jit(lambda q: qp_to_cone(q, quadratic=True).b)(qp)
    assert out.shape == (qp.num_eq + qp.num_ineq + qp.num_vars + 2,)


def test_psd_singular_q_lowering():
    """Semidefinite (singular) Q must lower via the eigh factorization
    instead of NaN'ing the Cholesky (reference: pivoted Cholesky handles
    PSD-singular Q, ``bridges.jl:90-98``); indefinite Q must raise."""
    n = 4
    rng = np.random.default_rng(7)
    V = rng.normal(size=(n, 2))
    Q = V @ V.T  # rank 2: PSD-singular
    qp = QuadProgram.make(
        Q=Q,
        q=rng.normal(size=n),
        G=np.vstack([np.eye(n), -np.eye(n)]),
        h=np.ones(2 * n),
    )
    cp = qp_to_cone(qp)
    U = -np.asarray(cp.A)[-n:, :n]
    np.testing.assert_allclose(U.T @ U, Q, atol=1e-12)
    assert np.all(np.isfinite(np.asarray(cp.A)))
    # the lowered program solves and matches the QP backend
    sol_qp, info = qpsolver.solve(qp, tol=1e-11)
    assert bool(info.converged)
    sol_cone = qp_via_conic(qp, tol=1e-11)
    np.testing.assert_allclose(sol_cone.z, sol_qp.z, atol=1e-6)

    Qi = np.diag(np.array([1.0, -1.0, 2.0, 3.0]))
    with pytest.raises(ValueError, match="indefinite"):
        qp_to_cone(
            QuadProgram.make(Q=Qi, q=np.zeros(4), G=np.eye(4), h=np.ones(4))
        )
