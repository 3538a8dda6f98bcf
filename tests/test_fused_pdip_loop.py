"""The n > _UNROLL_MAX fused-QP envelope (masked ``lax.fori_loop`` Cholesky /
solve / H-formation variants in ``ops/pallas/pdip.py``): helper-level
equivalence against the unrolled forms, and the full fused solve + VJP at
n=100, m=48, p=24 vs the staged solver — BASELINE config 2's stated n<=100
envelope (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffopt_tpu import QuadProgram, solve_qp_batched
from diffopt_tpu.ops.kkt import kkt_residual
from diffopt_tpu.ops.pallas import pdip
from diffopt_tpu.ops.pallas.pdip import (
    LANE,
    _chol_solve_value,
    _chol_solve_value_loop,
    _chol_value,
    _chol_value_loop,
    solve_batched_fused,
)
from diffopt_tpu.solvers import qp as qpsolver


def _spd_value(n, lane=LANE, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(lane, n, n))
    H = L @ np.swapaxes(L, -1, -2) + n * np.eye(n)
    return jnp.asarray(np.moveaxis(H, 0, -1))  # (n, n, LANE)


def _in_kernel(fn, out_shape, *args):
    """Run a value-level kernel helper inside a pallas_call (the scratch-ref
    loop forms use pl.run_scoped, which only evaluates in a kernel context;
    interpret mode on CPU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(*refs):
        in_refs, o_ref = refs[:-1], refs[-1]
        o_ref[:] = fn(*[r[:] for r in in_refs])

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, args[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def test_chol_value_loop_matches_unrolled():
    n = 11
    Hv = _spd_value(n)
    Lu = _chol_value(Hv, n)
    Ll = _in_kernel(lambda H: _chol_value_loop(H, n), (n, n, LANE), Hv)
    np.testing.assert_allclose(np.asarray(Ll), np.asarray(Lu), atol=1e-10)


def test_chol_solve_value_loop_matches_unrolled():
    n, k = 9, 3
    Hv = _spd_value(n, seed=1)
    L = _chol_value(Hv, n)
    rng = np.random.default_rng(2)
    rhs = jnp.asarray(rng.normal(size=(n, k, LANE)))
    xu = _chol_solve_value(L, rhs, n)
    xl = _in_kernel(
        lambda L_, r_: _chol_solve_value_loop(L_, r_, n), (n, k, LANE), L, rhs
    )
    np.testing.assert_allclose(np.asarray(xl), np.asarray(xu), atol=1e-10)


def _random_batch(B, n, m, p, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(B, n, n)) / np.sqrt(n)
    Q = L @ np.swapaxes(L, -1, -2) + np.eye(n)
    return QuadProgram(
        Q=jnp.asarray(Q),
        q=jnp.asarray(rng.normal(size=(B, n))),
        A=jnp.asarray(rng.normal(size=(B, p, n)) / np.sqrt(n)),
        b=jnp.asarray(rng.normal(size=(B, p))),
        G=jnp.asarray(rng.normal(size=(B, m, n)) / np.sqrt(n)),
        h=jnp.asarray(rng.normal(size=(B, m)) + 2.0),
    )


def test_fused_loop_path_matches_staged_n100():
    """n=100 > _UNROLL_MAX=80 forces _chol_value_loop / _chol_solve_value_loop
    and m=48 > _UNROLL_MAX//2 forces the fori-loop H-builder — the exact code
    paths of the n in (80, 128] envelope, unverified before this test."""
    assert 100 > pdip._UNROLL_MAX and 48 > pdip._UNROLL_MAX // 2
    B, n, m, p = 4, 100, 48, 24
    qp = _random_batch(B, n, m, p, seed=5)
    sol = solve_batched_fused(qp, max_iters=35)
    ref, info = qpsolver.solve_batched(qp, max_iters=50)
    assert bool(jnp.all(info.converged))
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(ref.z), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sol.lam), np.asarray(ref.lam), atol=1e-6
    )
    res = jax.vmap(kkt_residual)(qp, sol)
    assert float(jnp.max(jnp.abs(res))) < 1e-6


def test_fused_loop_path_vjp_matches_staged_n100():
    B, n, m, p = 2, 100, 48, 24
    qp = _random_batch(B, n, m, p, seed=6)

    def loss_fused(qp):
        sol = solve_qp_batched(qp, max_iters=35)
        return jnp.sum(sol.z**2)

    def loss_staged(qp):
        from diffopt_tpu import solve_qp

        sol = jax.vmap(lambda q: solve_qp(q, max_iters=50))(qp)
        return jnp.sum(sol.z**2)

    vf, gf = jax.value_and_grad(loss_fused)(qp)
    vs, gs = jax.value_and_grad(loss_staged)(qp)
    np.testing.assert_allclose(float(vf), float(vs), rtol=1e-7)
    for name in ("Q", "q", "A", "b", "G", "h"):
        np.testing.assert_allclose(
            np.asarray(getattr(gf, name)),
            np.asarray(getattr(gs, name)),
            atol=5e-5,
            err_msg=name,
        )
