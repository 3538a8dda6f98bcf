"""Session API (cached factorization), config, and heterogeneous batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import QuadProgram, QPTangent
from diffopt_tpu.api import NotSolvedError, QPDiffContext
from diffopt_tpu.qp_diff import forward_differentiate, reverse_differentiate
from diffopt_tpu.solvers import qp as qpsolver
from diffopt_tpu.utils.batching import (
    bucket_by_shape,
    pad_and_stack,
    unpad_solution,
)


def _qp(rng, n=6, m=4, p=2):
    L = rng.normal(size=(n, n))
    return QuadProgram.make(
        Q=L @ L.T + n * np.eye(n),
        q=rng.normal(size=n),
        A=rng.normal(size=(p, n)),
        b=rng.normal(size=p),
        G=rng.normal(size=(m, n)),
        h=rng.normal(size=m) + 1.0,
    )


def test_context_matches_functional_verbs():
    rng = np.random.default_rng(0)
    qp = jax.tree.map(lambda x: x[None], _qp(rng))  # batch of 1
    ctx = QPDiffContext(qp)
    assert not np.isnan(ctx._factor_time_sec)

    dqp = QPTangent(
        dQ=jnp.zeros_like(qp.Q), dq=jnp.ones_like(qp.q),
        dA=jnp.zeros_like(qp.A), db=jnp.zeros_like(qp.b),
        dG=jnp.zeros_like(qp.G), dh=jnp.zeros_like(qp.h),
    )
    fwd = ctx.forward(dqp)
    ref = jax.vmap(lambda q, s, d: forward_differentiate(q, s, d, method="lu"))(
        qp, ctx.sol, dqp
    )
    np.testing.assert_allclose(fwd.dz, ref.dz, atol=1e-9)
    assert np.isfinite(ctx.differentiate_time_sec)  # DifferentiateTimeSec parity

    seed = jnp.ones_like(qp.q)
    rev = ctx.reverse(seed)
    ref_r = jax.vmap(lambda q, s, z: reverse_differentiate(q, s, z, method="lu"))(
        qp, ctx.sol, seed
    )
    np.testing.assert_allclose(rev.dq, ref_r.dq, atol=1e-9)
    np.testing.assert_allclose(rev.dh, ref_r.dh, atol=1e-9)

    # repeated differentiation reuses the factorization (no re-solve)
    rev2 = ctx.reverse(2 * seed)
    np.testing.assert_allclose(rev2.dq, 2 * np.asarray(ref_r.dq), atol=1e-9)


def test_context_refuses_infeasible():
    qp = QuadProgram.make(q=[1.0], G=[[1.0], [-1.0]], h=[1.0, -2.0])
    qp = jax.tree.map(lambda x: x[None], qp)
    with pytest.raises(NotSolvedError):
        QPDiffContext(qp)


def test_pad_and_stack_preserves_solutions():
    rng = np.random.default_rng(1)
    qps = [_qp(rng, n=4, m=2, p=1), _qp(rng, n=6, m=4, p=2), _qp(rng, n=5, m=3, p=0)]
    refs = [qpsolver.solve(q)[0] for q in qps]
    batched, dims = pad_and_stack(qps)
    sol, info = qpsolver.solve_batched(batched)
    assert bool(np.all(info.converged))
    outs = unpad_solution(sol, dims)
    for ref, out in zip(refs, outs):
        np.testing.assert_allclose(out.z, ref.z, atol=1e-6)
        np.testing.assert_allclose(out.lam, ref.lam, atol=1e-6)
        np.testing.assert_allclose(out.nu, ref.nu, atol=1e-6)


def test_bucketing():
    rng = np.random.default_rng(2)
    qps = [
        _qp(rng, n=4, m=2, p=1) for _ in range(3)
    ] + [_qp(rng, n=8, m=5, p=2) for _ in range(2)] + [
        _qp(rng, n=16, m=8, p=4)
    ]
    buckets = bucket_by_shape(qps, max_buckets=2)
    assert sum(len(v) for v in buckets.values()) == len(qps)
    for (n, m, p), idxs in buckets.items():
        for i in idxs:
            assert qps[i].num_vars <= n and qps[i].num_ineq <= m


def test_conic_context_matches_verbs():
    from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff
    from diffopt_tpu.api import ConicDiffContext

    rng = np.random.default_rng(11)
    n, m = 3, 5
    cones = ConeSpec([("nonneg", m)])
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    sstar = np.array([0.0, 0.0, 0.0, 1.0, 2.0])
    ystar = np.array([1.0, 2.0, 1.5, 0.0, 0.0])
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(A @ xstar + sstar),
        c=jnp.asarray(-A.T @ ystar), cones=cones,
    )
    ctx = ConicDiffContext(cp, solver_kwargs=dict(max_iters=60000, tol=1e-11))
    dcp = ConeTangent(
        dA=jnp.asarray(rng.normal(size=(m, n))),
        db=jnp.asarray(rng.normal(size=m)),
        dc=jnp.asarray(rng.normal(size=n)),
    )
    fwd = ctx.forward(dcp)
    ref = conic_diff.forward_differentiate(cp, ctx.sol, dcp, method="lstsq")
    np.testing.assert_allclose(fwd.dx, ref.dx, atol=1e-8)
    rev = ctx.reverse(jnp.ones(n))
    ref_r = conic_diff.reverse_differentiate(cp, ctx.sol, jnp.ones(n), method="lstsq")
    np.testing.assert_allclose(rev.db, ref_r.db, atol=1e-10)


def test_pad_and_stack_cones_preserves_solutions():
    """Heterogeneous conic batching: different nonneg counts and soc dims
    pad into one batch whose per-instance solutions match unpadded solves."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from diffopt_tpu import ConeProgram, ConeSpec
    from diffopt_tpu.solvers import conic_ipm as ipm
    from diffopt_tpu.utils.batching import (
        cone_pad_spec, pad_and_stack_cones, unpad_cone_solution,
    )

    rng = np.random.default_rng(9)
    n = 5

    def socp(k, n_nonneg, seed):
        r = np.random.default_rng(seed)
        F = r.normal(size=(k, n))
        U, S, Vt = np.linalg.svd(F, full_matrices=False)
        F = (U * np.clip(S, 1.0, 2.0)[None]) @ Vt
        g = r.normal(size=k)
        e = r.normal(size=n)
        e *= 0.4 / np.linalg.norm(e)
        blocks = []
        A_parts, b_parts = [], []
        if n_nonneg:
            A_parts.append(-np.eye(n_nonneg, n) - 10.0 * np.ones((n_nonneg, n)) * 0)
            b_parts.append(10.0 * np.ones(n_nonneg))  # x_i >= -10 (inactive-ish)
            blocks.append(("nonneg", n_nonneg))
        A_parts.append(np.concatenate([-e[None], -F]))
        b_parts.append(np.concatenate([[np.linalg.norm(g) + 1.0], -g]))
        blocks.append(("soc", k + 1))
        return ConeProgram(
            A=jnp.asarray(np.concatenate(A_parts)),
            b=jnp.asarray(np.concatenate(b_parts)),
            c=jnp.asarray(r.normal(size=n)),
            cones=ConeSpec(blocks),
        )

    cps = [socp(6, 2, 1), socp(4, 3, 2), socp(6, 3, 3)]
    # give every instance the same kind sequence (nonneg then soc)
    batched, specs = pad_and_stack_cones(cps)
    target = batched.cones
    assert target == cone_pad_spec([cp.cones for cp in cps])
    sol_b, info_b = ipm.solve_batched(batched)
    assert bool(jnp.all(info_b.converged))
    sols = unpad_cone_solution(sol_b, specs, target)
    for cp, s_pad in zip(cps, sols):
        s_ref, info = ipm.solve(cp)
        assert bool(info.converged)
        # identical programs but different IPM paths: tol*cond-level diff
        np.testing.assert_allclose(s_pad.x, s_ref.x, atol=1e-4)
        np.testing.assert_allclose(s_pad.y, s_ref.y, atol=1e-4)
        np.testing.assert_allclose(s_pad.s, s_ref.s, atol=1e-4)
