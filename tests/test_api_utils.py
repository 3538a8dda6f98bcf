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


def test_config_is_wired_and_scoped():
    """A non-default config must change solver behavior (the round-1 config
    dataclass was dead — SURVEY §5 mandates the reference's hard-coded
    tolerances become live knobs), and use_config must restore the previous
    config on exit."""
    import dataclasses

    from diffopt_tpu import solve_qp
    from diffopt_tpu.utils import DiffOptConfig, get_config, use_config

    rng = np.random.default_rng(3)
    qp = _qp(rng)

    z_full = np.asarray(solve_qp(qp).z)
    starved = dataclasses.replace(get_config(), qp_max_iters=1)
    with use_config(starved):
        assert get_config().qp_max_iters == 1
        z_starved = np.asarray(solve_qp(qp).z)
    assert get_config().qp_max_iters == DiffOptConfig().qp_max_iters
    # one IPM iteration cannot reach the optimum: the knob is live
    assert np.max(np.abs(z_full - z_starved)) > 1e-6

    # the embedded-solver check in the context honors the same knob
    with use_config(starved):
        with pytest.raises(NotSolvedError):
            QPDiffContext(jax.tree.map(lambda x: x[None], qp))

    # kkt_method knob routes the diff rules (observable: 'bogus' must raise)
    with use_config(dataclasses.replace(get_config(), kkt_method="bogus")):
        sol, _ = qpsolver.solve(qp)
        with pytest.raises(ValueError):
            reverse_differentiate(qp, sol, jnp.ones(qp.num_vars))


def test_config_inertia_knob_drives_nlp_factorization():
    """inertia_max_corrections=0 must make a singular KKT factorization give
    up immediately (singular=True, zero sensitivities) where the default
    config recovers via diagonal shifts."""
    import dataclasses

    from diffopt_tpu.nlp_diff import (
        NLPProblem,
        NLPSolution,
        forward_differentiate as nlp_fwd,
    )
    from diffopt_tpu.utils import get_config, use_config

    # degenerate: objective (x1 - p)^2 ignoring x2 -> singular Hessian block
    nlp = NLPProblem(
        objective=lambda x, p: (x[0] - p[0]) ** 2,
        constraints=None,
        kinds=(),
        n=2,
    )
    p = jnp.array([1.0])
    sol = NLPSolution(
        x=jnp.array([1.0, 0.0]), y=jnp.zeros(0), zL=jnp.zeros(2), zU=jnp.zeros(2)
    )
    out_default = nlp_fwd(nlp, sol, p, jnp.array([1.0]))
    assert not bool(out_default.singular)
    with use_config(
        dataclasses.replace(get_config(), inertia_max_corrections=0)
    ):
        out_none = nlp_fwd(nlp, sol, p, jnp.array([1.0]))
    assert bool(out_none.singular)
    np.testing.assert_allclose(out_none.dx, 0.0)


def test_conic_context_solver_override():
    """solver='dr' must route DR-only kwargs (alpha/check_every) without
    TypeError, and solver='ipm' must accept IPM kwargs — round-1 advice: the
    auto-dispatch made previously-valid DR kwargs raise."""
    from diffopt_tpu import ConeProgram, ConeSpec
    from diffopt_tpu.api import ConicDiffContext

    rng = np.random.default_rng(21)
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
    ctx_dr = ConicDiffContext(
        cp, solver="dr",
        solver_kwargs=dict(max_iters=60000, tol=1e-11, alpha=1.6, check_every=50),
    )
    ctx_ipm = ConicDiffContext(cp, solver="ipm", solver_kwargs=dict(tol=1e-11))
    np.testing.assert_allclose(ctx_dr.sol.x, ctx_ipm.sol.x, atol=1e-7)
    with pytest.raises(ValueError):
        ConicDiffContext(cp, solver="nope")


def test_context_functional_invalidation_semantics():
    """The reference invalidates its gradient cache on every model mutation
    (``model.diff = nothing``, semantics tested at
    ``test/conic_program.jl:649-790``). The functional analogue: a context is
    immutable — new data means a NEW context whose results match a fresh
    computation, while the stale context keeps answering for the OLD data."""
    from diffopt_tpu import ConeProgram, ConeSpec, conic_diff
    from diffopt_tpu.api import ConicDiffContext

    rng = np.random.default_rng(7)
    n, m = 3, 5
    cones = ConeSpec([("nonneg", m)])
    A = rng.normal(size=(m, n))
    xstar = rng.normal(size=n)
    sstar = np.array([0.0, 0.0, 0.0, 1.0, 2.0])
    ystar = np.array([1.0, 2.0, 1.5, 0.0, 0.0])
    cp1 = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(A @ xstar + sstar),
        c=jnp.asarray(-A.T @ ystar), cones=cones,
    )
    # "mutate" the program: scale A (same structure, different data). NB:
    # scaling b alone would NOT change the derivative — x(b) is piecewise
    # linear in b, so dx/db is locally constant in b and the "derivative
    # changed" assert below would be vacuous.
    cp2 = ConeProgram(A=1.5 * cp1.A, b=cp1.b, c=cp1.c, cones=cones)

    kw = dict(solver_kwargs=dict(tol=1e-11))
    ctx1 = ConicDiffContext(cp1, **kw)
    rev1 = ctx1.reverse(jnp.ones(n))

    ctx2 = ConicDiffContext(cp2, **kw)
    rev2 = ctx2.reverse(jnp.ones(n))
    fresh2 = conic_diff.reverse_differentiate(
        cp2, ctx2.sol, jnp.ones(n), method="lstsq"
    )
    np.testing.assert_allclose(rev2.db, fresh2.db, atol=1e-9)
    # data change must actually change the derivative (knob is live)
    assert float(jnp.max(jnp.abs(rev2.db - rev1.db))) > 1e-6

    # the stale context still answers for the OLD program, bit-for-bit
    rev1_again = ctx1.reverse(jnp.ones(n))
    np.testing.assert_allclose(rev1.db, rev1_again.db, atol=0.0)
