"""Schur-complement block reduction vs the monolithic KKT oracle, single
device and sharded over the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diffopt_tpu.ir import QPTangent
from diffopt_tpu.parallel.schur import (
    TwoStageQP,
    TwoStageSolution,
    to_monolithic,
    two_stage_forward_sensitivity,
)
from diffopt_tpu.qp_diff import forward_differentiate
from diffopt_tpu.solvers import qp as qpsolver


def _random_two_stage(S=8, n=4, m=3, p=2, c=3, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(S, n, n))
    Qs = L @ np.transpose(L, (0, 2, 1)) + n * np.eye(n)
    L0 = rng.normal(size=(c, c))
    ts = TwoStageQP(
        Qs=jnp.asarray(Qs),
        qs=jnp.asarray(rng.normal(size=(S, n))),
        As=jnp.asarray(rng.normal(size=(S, p, n))),
        bs=jnp.asarray(rng.normal(size=(S, p))),
        Gs=jnp.asarray(rng.normal(size=(S, m, n))),
        hs=jnp.asarray(rng.normal(size=(S, m)) + 2.0),
        Bs=jnp.asarray(rng.normal(size=(S, p, c))),
        Q0=jnp.asarray(L0 @ L0.T + c * np.eye(c)),
        q0=jnp.asarray(rng.normal(size=c)),
    )
    return ts


def _solve_monolithic(ts):
    S, n, m, p, c = ts.dims
    qp = to_monolithic(ts)
    sol, info = qpsolver.solve(qp)
    assert bool(info.converged)
    xs = sol.z[: S * n].reshape(S, n)
    z = sol.z[S * n :]
    lams = sol.lam.reshape(S, m)
    nus = sol.nu.reshape(S, p)
    return qp, sol, TwoStageSolution(xs=xs, lams=lams, nus=nus, z=z)


def _random_tangent(ts, seed=1):
    rng = np.random.default_rng(seed)
    S, n, m, p, c = ts.dims
    dQ = rng.normal(size=(S, n, n))
    dQ0 = rng.normal(size=(c, c))
    return TwoStageQP(
        Qs=jnp.asarray((dQ + np.transpose(dQ, (0, 2, 1))) / 2),
        qs=jnp.asarray(rng.normal(size=(S, n))),
        As=jnp.asarray(rng.normal(size=(S, p, n))),
        bs=jnp.asarray(rng.normal(size=(S, p))),
        Gs=jnp.asarray(rng.normal(size=(S, m, n))),
        hs=jnp.asarray(rng.normal(size=(S, m))),
        Bs=jnp.asarray(rng.normal(size=(S, p, c))),
        Q0=jnp.asarray((dQ0 + dQ0.T) / 2),
        q0=jnp.asarray(rng.normal(size=c)),
    )


def _monolithic_tangent(ts, dts):
    """Embed the two-stage tangent into the monolithic layout."""
    S, n, m, p, c = ts.dims
    mono_d = to_monolithic(dts)
    return QPTangent(
        dQ=mono_d.Q, dq=mono_d.q, dA=mono_d.A, db=mono_d.b, dG=mono_d.G, dh=mono_d.h
    )


def test_schur_matches_monolithic():
    ts = _random_two_stage()
    qp, sol_mono, sol_ts = _solve_monolithic(ts)
    dts = _random_tangent(ts)

    fwd_mono = forward_differentiate(qp, sol_mono, _monolithic_tangent(ts, dts))
    fwd_schur = two_stage_forward_sensitivity(ts, sol_ts, dts)

    S, n, m, p, c = ts.dims
    np.testing.assert_allclose(
        fwd_schur.xs.reshape(-1), fwd_mono.dz[: S * n], atol=1e-6
    )
    np.testing.assert_allclose(fwd_schur.z, fwd_mono.dz[S * n :], atol=1e-6)
    np.testing.assert_allclose(
        fwd_schur.lams.reshape(-1), fwd_mono.dlam, atol=1e-6
    )
    np.testing.assert_allclose(fwd_schur.nus.reshape(-1), fwd_mono.dnu, atol=1e-6)


def test_schur_sharded_matches_single_device():
    """shard_map over the 8-device virtual mesh: scenario shards per device,
    psum-reduced coupling; must equal the single-device result."""
    from diffopt_tpu.parallel import make_mesh

    ts = _random_two_stage(S=16)
    _, _, sol_ts = _solve_monolithic(ts)
    dts = _random_tangent(ts, seed=3)

    ref = two_stage_forward_sensitivity(ts, sol_ts, dts)

    mesh = make_mesh(8, axis_name="scen")
    spec_s = P("scen")
    shard = lambda x: P("scen", *([None] * (x.ndim - 1)))
    ts_spec = jax.tree.map(shard, ts)
    # coupling blocks are replicated
    ts_spec = TwoStageQP(
        Qs=ts_spec.Qs, qs=ts_spec.qs, As=ts_spec.As, bs=ts_spec.bs,
        Gs=ts_spec.Gs, hs=ts_spec.hs, Bs=ts_spec.Bs, Q0=P(), q0=P(),
    )
    sol_spec = TwoStageSolution(
        xs=P("scen"), lams=P("scen"), nus=P("scen"), z=P()
    )
    out_spec = TwoStageSolution(xs=P("scen"), lams=P("scen"), nus=P("scen"), z=P())

    fn = jax.shard_map(
        lambda t, s, d: two_stage_forward_sensitivity(t, s, d, axis_name="scen"),
        mesh=mesh,
        in_specs=(ts_spec, sol_spec, ts_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    out = jax.jit(fn)(ts, sol_ts, dts)
    np.testing.assert_allclose(out.xs, ref.xs, atol=1e-8)
    np.testing.assert_allclose(out.z, ref.z, atol=1e-8)
    np.testing.assert_allclose(out.lams, ref.lams, atol=1e-8)


def test_schur_reverse_adjoint_identity():
    """<fwd(dData), seeds> == <dData, rev(seeds)> for the coupled program."""
    rng = np.random.default_rng(7)
    ts = _random_two_stage(S=6)
    _, _, sol_ts = _solve_monolithic(ts)
    dts = _random_tangent(ts, seed=8)
    from diffopt_tpu.parallel.schur import two_stage_reverse_sensitivity

    S, n, m, p, c = ts.dims
    seed_x = jnp.asarray(rng.normal(size=(S, n)))
    seed_z = jnp.asarray(rng.normal(size=c))

    fwd = two_stage_forward_sensitivity(ts, sol_ts, dts)
    rev = two_stage_reverse_sensitivity(ts, sol_ts, seed_x, seed_z)

    lhs = float(jnp.sum(fwd.xs * seed_x) + jnp.dot(fwd.z, seed_z))
    rhs = float(
        sum(
            jnp.sum(getattr(dts, f) * getattr(rev, f))
            for f in ["Qs", "qs", "As", "bs", "Gs", "hs", "Bs", "Q0", "q0"]
        )
    )
    assert abs(lhs - rhs) < 1e-6 * max(1.0, abs(lhs)), (lhs, rhs)


def test_solve_two_stage_matches_monolithic():
    from diffopt_tpu.parallel.schur import solve_two_stage

    ts = _random_two_stage(S=6)
    _, _, sol_ref = _solve_monolithic(ts)
    sol, info = solve_two_stage(ts)
    assert bool(info.converged), (info.primal_residual, info.dual_residual)
    np.testing.assert_allclose(sol.xs, sol_ref.xs, atol=1e-6)
    np.testing.assert_allclose(sol.z, sol_ref.z, atol=1e-6)
    np.testing.assert_allclose(sol.lams, sol_ref.lams, atol=1e-6)
    np.testing.assert_allclose(sol.nus, sol_ref.nus, atol=1e-6)


def test_solve_two_stage_sharded():
    """End-to-end coupled solve under shard_map on the 8-device mesh."""
    from diffopt_tpu.parallel import make_mesh
    from diffopt_tpu.parallel.schur import solve_two_stage

    ts = _random_two_stage(S=16, seed=5)
    sol_ref, info_ref = solve_two_stage(ts)
    assert bool(info_ref.converged)

    mesh = make_mesh(8, axis_name="scen")
    shard = lambda x: P("scen", *([None] * (x.ndim - 1)))
    ts_spec = jax.tree.map(shard, ts)
    ts_spec = TwoStageQP(
        Qs=ts_spec.Qs, qs=ts_spec.qs, As=ts_spec.As, bs=ts_spec.bs,
        Gs=ts_spec.Gs, hs=ts_spec.hs, Bs=ts_spec.Bs, Q0=P(), q0=P(),
    )
    out_spec = (
        jax.tree.map(lambda _: P("scen"), sol_ref)._replace(z=P()),
        jax.tree.map(lambda _: P(), info_ref),
    )

    fn = jax.shard_map(
        lambda t: solve_two_stage(t, axis_name="scen"),
        mesh=mesh,
        in_specs=(ts_spec,),
        out_specs=out_spec,
        check_vma=False,
    )
    sol, info = jax.jit(fn)(ts)
    assert bool(info.converged)
    np.testing.assert_allclose(sol.xs, sol_ref.xs, atol=1e-7)
    np.testing.assert_allclose(sol.z, sol_ref.z, atol=1e-7)
