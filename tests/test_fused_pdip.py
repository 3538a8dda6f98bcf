"""Fused single-kernel Pallas PDIP path (``solve_qp_batched``): correctness
vs the staged solver, KKT residuals, and the custom VJP — the exact path the
headline bench exercises (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffopt_tpu import QuadProgram, solve_qp_batched
from diffopt_tpu.ops.kkt import kkt_residual
from diffopt_tpu.ops.pallas.pdip import solve_batched_fused
from diffopt_tpu.solvers import qp as qpsolver


def _random_batch(B, n, m, p, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(B, n, n))
    Q = L @ np.swapaxes(L, -1, -2) + n * np.eye(n)
    return QuadProgram(
        Q=jnp.asarray(Q),
        q=jnp.asarray(rng.normal(size=(B, n))),
        A=jnp.asarray(rng.normal(size=(B, p, n))),
        b=jnp.asarray(rng.normal(size=(B, p))),
        G=jnp.asarray(rng.normal(size=(B, m, n))),
        h=jnp.asarray(rng.normal(size=(B, m)) + 2.0),
    )


def test_fused_matches_staged_and_kkt():
    B, n, m, p = 16, 6, 4, 2
    qp = _random_batch(B, n, m, p)
    sol = solve_batched_fused(qp, max_iters=30)
    ref, _ = qpsolver.solve_batched(qp, max_iters=50)
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(ref.z), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sol.lam), np.asarray(ref.lam), atol=1e-6
    )
    # KKT residuals of the fused solution directly (stationarity +
    # complementarity + equality rows, then inequality feasibility)
    res = jax.vmap(kkt_residual)(qp, sol)
    assert float(jnp.max(jnp.abs(res))) < 1e-6
    viol = jnp.einsum("bij,bj->bi", qp.G, sol.z) - qp.h
    assert float(jnp.max(viol)) < 1e-6


def test_fused_vjp_matches_staged_grad():
    B, n, m, p = 8, 5, 3, 2
    qp = _random_batch(B, n, m, p, seed=3)

    def loss_fused(qp):
        sol = solve_qp_batched(qp, max_iters=30)
        return jnp.sum(sol.z**2)

    def loss_staged(qp):
        from diffopt_tpu import solve_qp

        sol = jax.vmap(lambda q: solve_qp(q, max_iters=50))(qp)
        return jnp.sum(sol.z**2)

    vf, gf = jax.value_and_grad(loss_fused)(qp)
    vs, gs = jax.value_and_grad(loss_staged)(qp)
    np.testing.assert_allclose(float(vf), float(vs), rtol=1e-8)
    for name in ("Q", "q", "A", "b", "G", "h"):
        np.testing.assert_allclose(
            np.asarray(getattr(gf, name)),
            np.asarray(getattr(gs, name)),
            atol=5e-5,
            err_msg=name,
        )


def test_active_set_polish_reduces_kkt_residual():
    """qp_polish removes the complementarity floor from an inexact solve
    (the f32-accuracy mechanism; exercised here in f64 with a loose tol)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from diffopt_tpu.ir import QuadProgram
    from diffopt_tpu.ops import kkt
    from diffopt_tpu.solvers import qp as qpsolver

    rng = np.random.default_rng(7)
    B, n, m, p = 8, 10, 6, 3
    L = rng.normal(size=(B, n, n))
    qp = QuadProgram(
        Q=jnp.asarray(L @ np.swapaxes(L, 1, 2) + n * np.eye(n)),
        q=jnp.asarray(rng.normal(size=(B, n))),
        A=jnp.asarray(rng.normal(size=(B, p, n))),
        b=jnp.asarray(rng.normal(size=(B, p))),
        G=jnp.asarray(rng.normal(size=(B, m, n))),
        h=jnp.asarray(rng.normal(size=(B, m)) + 2.0),
    )
    sol, _ = qpsolver.solve_batched(qp, tol=1e-4)  # deliberately loose
    pol = jax.vmap(lambda q, s: kkt.qp_polish(q, s))(qp, sol)
    res_old = jnp.max(jnp.abs(jax.vmap(kkt.kkt_residual)(qp, sol)), axis=-1)
    res_new = jnp.max(jnp.abs(jax.vmap(kkt.kkt_residual)(qp, pol)), axis=-1)
    assert bool(jnp.all(res_new <= res_old))
    assert float(jnp.median(res_new)) < 1e-2 * float(jnp.median(res_old))
    assert bool(jnp.all(pol.lam >= 0.0))
