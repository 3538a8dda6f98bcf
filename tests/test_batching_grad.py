"""Gradient-correct heterogeneous batching (round-2 verdict item 6): padding
preserves not just *solutions* but *gradients* — differentiating a padded
batch and slicing to the original coordinates must equal per-instance
(loop-of-solves) gradients. This is the actual use case of
``pad_and_stack*`` (training over ragged instance sets; SURVEY.md §7
"Static shapes" mandate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import (
    ConeProgram,
    ConeSpec,
    QuadProgram,
    solve_conic,
    solve_qp,
)
from diffopt_tpu.cones import sym_to_svec
from diffopt_tpu.utils.batching import (
    pad_and_stack,
    pad_and_stack_cones,
    unpad_cone_solution,
    unpad_cone_tangent,
    unpad_solution,
    unpad_tangent,
)


def _ragged_qps(rng, dims):
    qps = []
    for n, m, p in dims:
        L = rng.normal(size=(n, n))
        qps.append(
            QuadProgram.make(
                Q=L @ L.T + n * np.eye(n),
                q=rng.normal(size=n),
                A=rng.normal(size=(p, n)),
                b=rng.normal(size=p),
                G=rng.normal(size=(m, n)),
                h=rng.normal(size=m) + 1.0,
            )
        )
    return qps


def test_padded_qp_batch_vjp_matches_per_instance():
    rng = np.random.default_rng(40)
    dims = [(4, 3, 2), (6, 2, 1), (5, 4, 0)]
    qps = _ragged_qps(rng, dims)
    ws = [jnp.asarray(rng.normal(size=n)) for n, _, _ in dims]

    def padded_loss(qps_tuple):
        batch, bdims = pad_and_stack(list(qps_tuple))
        sols = jax.vmap(solve_qp)(batch)
        total = 0.0
        for i, (n0, _, _) in enumerate(bdims):
            total = total + jnp.dot(ws[i], sols.z[i, :n0])
        return total

    g_pad = jax.grad(padded_loss)(tuple(qps))

    for i, qp in enumerate(qps):
        g_one = jax.grad(lambda q: jnp.dot(ws[i], solve_qp(q).z))(qp)
        np.testing.assert_allclose(g_pad[i].q, g_one.q, atol=1e-7)
        np.testing.assert_allclose(g_pad[i].h, g_one.h, atol=1e-7)
        np.testing.assert_allclose(g_pad[i].b, g_one.b, atol=1e-7)
        np.testing.assert_allclose(g_pad[i].Q, g_one.Q, atol=1e-7)
        np.testing.assert_allclose(g_pad[i].G, g_one.G, atol=1e-7)
        np.testing.assert_allclose(g_pad[i].A, g_one.A, atol=1e-7)


def test_padded_qp_batch_jvp_matches_per_instance():
    rng = np.random.default_rng(41)
    dims = [(4, 3, 2), (5, 2, 1)]
    qps = _ragged_qps(rng, dims)
    tans = [
        QuadProgram(
            Q=jnp.zeros_like(qp.Q),
            q=jnp.asarray(rng.normal(size=qp.q.shape)),
            A=jnp.zeros_like(qp.A),
            b=jnp.asarray(rng.normal(size=qp.b.shape)),
            G=jnp.zeros_like(qp.G),
            h=jnp.zeros_like(qp.h),
        )
        for qp in qps
    ]

    def padded_solve(qps_tuple):
        batch, bdims = pad_and_stack(list(qps_tuple))
        return jax.vmap(lambda q: solve_qp(q, mode="jvp"))(batch)

    sol_b, dsol_b = jax.jvp(padded_solve, (tuple(qps),), (tuple(tans),))
    for i, qp in enumerate(qps):
        n0, m0, p0 = dims[i]
        _, dsol_one = jax.jvp(
            lambda q: solve_qp(q, mode="jvp"), (qp,), (tans[i],)
        )
        np.testing.assert_allclose(dsol_b.z[i, :n0], dsol_one.z, atol=1e-7)
        np.testing.assert_allclose(
            dsol_b.lam[i, :m0], dsol_one.lam, atol=1e-7
        )
        # padded tangent coordinates are exactly zero (no leakage)
        np.testing.assert_allclose(dsol_b.z[i, n0:], 0.0, atol=1e-9)
        np.testing.assert_allclose(dsol_b.lam[i, m0:], 0.0, atol=1e-9)


def test_unpad_tangent_slices_reverse_verbs():
    """Explicit-verb workflow: reverse-differentiate the padded batch, then
    unpad_tangent — equal to per-instance reverse verbs."""
    from diffopt_tpu import reverse_differentiate
    from diffopt_tpu.solvers import qp as qpsolver

    rng = np.random.default_rng(42)
    dims = [(4, 3, 2), (6, 2, 1)]
    qps = _ragged_qps(rng, dims)
    batch, bdims = pad_and_stack(qps)
    sol, info = qpsolver.solve_batched(batch)
    assert bool(jnp.all(info.converged))
    seeds = [jnp.asarray(rng.normal(size=n)) for n, _, _ in dims]
    dz = jnp.stack(
        [
            jnp.zeros(batch.q.shape[-1]).at[: dims[i][0]].set(seeds[i])
            for i in range(len(qps))
        ]
    )
    rev_b = jax.vmap(lambda q, s, d: reverse_differentiate(q, s, dz=d))(
        batch, sol, dz
    )
    per = unpad_tangent(rev_b, bdims)
    for i, qp in enumerate(qps):
        sol_i, _ = qpsolver.solve(qp)
        rev_i = reverse_differentiate(qp, sol_i, dz=seeds[i])
        np.testing.assert_allclose(per[i].dq, rev_i.dq, atol=1e-7)
        np.testing.assert_allclose(per[i].dh, rev_i.dh, atol=1e-7)
        np.testing.assert_allclose(per[i].dG, rev_i.dG, atol=1e-7)


def _cone_programs(rng):
    """Two same-n conic instances with a shared kind prefix; the second
    appends exp + psd blocks, so padding the first appends strictly interior
    exp/psd blocks — the full-cone-family padding path."""
    n = 3
    # instance 1: zero(1) + nonneg(2) + soc(3)
    cones1 = ConeSpec([("zero", 1), ("nonneg", 2), ("soc", 3)])
    m1 = cones1.total_dim
    A1 = rng.normal(size=(m1, n))
    x1 = rng.normal(size=n)
    v = rng.normal(size=2)
    s1 = np.concatenate(
        [np.zeros(1), np.abs(rng.normal(size=2)) + 0.1,
         np.concatenate([[np.linalg.norm(v) + 0.5], v])]
    )
    w = rng.normal(size=2) * 0.1
    y1 = np.concatenate(
        [rng.normal(size=1), np.abs(rng.normal(size=2)) + 0.1,
         np.concatenate([[np.linalg.norm(w) + 0.3], w])]
    )
    cp1 = ConeProgram(
        A=jnp.asarray(A1), b=jnp.asarray(A1 @ x1 + s1),
        c=jnp.asarray(-A1.T @ y1), cones=cones1,
    )
    # instance 2: same prefix + exp(3) + psd(6)
    d = 3
    tri = d * (d + 1) // 2
    cones2 = ConeSpec(
        [("zero", 1), ("nonneg", 2), ("soc", 3), ("exp", 3), ("psd", tri)]
    )
    m2 = cones2.total_dim
    A2 = rng.normal(size=(m2, n))
    x2 = rng.normal(size=n)
    v2 = rng.normal(size=2)
    M2 = rng.normal(size=(d, d))
    s2 = np.concatenate(
        [np.zeros(1), np.abs(rng.normal(size=2)) + 0.1,
         np.concatenate([[np.linalg.norm(v2) + 0.5], v2]),
         [-0.5, 1.0, 2.0],  # strictly interior to K_exp: 1*e^{-0.5} < 2
         np.asarray(sym_to_svec(jnp.asarray(M2 @ M2.T + 0.5 * np.eye(d))))]
    )
    w2 = rng.normal(size=2) * 0.1
    Y2 = rng.normal(size=(d, d))
    # dual strictly interior: K_exp* point u<0, -u e^{v/u} < e w
    y2 = np.concatenate(
        [rng.normal(size=1), np.abs(rng.normal(size=2)) + 0.1,
         np.concatenate([[np.linalg.norm(w2) + 0.3], w2]),
         [-0.5, 0.2, 1.0],
         np.asarray(sym_to_svec(jnp.asarray(Y2 @ Y2.T + 0.3 * np.eye(d))))]
    )
    cp2 = ConeProgram(
        A=jnp.asarray(A2), b=jnp.asarray(A2 @ x2 + s2),
        c=jnp.asarray(-A2.T @ y2), cones=cones2,
    )
    return cp1, cp2


def test_padded_cone_batch_vjp_matches_per_instance():
    rng = np.random.default_rng(43)
    cp1, cp2 = _cone_programs(rng)
    cps = [cp1, cp2]
    ws = [jnp.asarray(rng.normal(size=3)) for _ in cps]

    def padded_loss(abc_tuple):
        rebuilt = [
            ConeProgram(A=A, b=b, c=c, cones=cp.cones)
            for (A, b, c), cp in zip(abc_tuple, cps)
        ]
        batch, specs = pad_and_stack_cones(rebuilt)
        sols = jax.vmap(
            lambda A, b, c: solve_conic(
                ConeProgram(A=A, b=b, c=c, cones=batch.cones)
            )
        )(batch.A, batch.b, batch.c)
        return sum(
            jnp.dot(ws[i], sols.x[i]) for i in range(len(cps))
        )

    args = tuple((cp.A, cp.b, cp.c) for cp in cps)
    g_pad = jax.grad(padded_loss)(args)

    for i, cp in enumerate(cps):
        g_one = jax.grad(
            lambda abc: jnp.dot(
                ws[i],
                solve_conic(
                    ConeProgram(
                        A=abc[0], b=abc[1], c=abc[2], cones=cp.cones
                    )
                ).x,
            )
        )((cp.A, cp.b, cp.c))
        np.testing.assert_allclose(g_pad[i][0], g_one[0], atol=5e-6)
        np.testing.assert_allclose(g_pad[i][1], g_one[1], atol=5e-6)
        np.testing.assert_allclose(g_pad[i][2], g_one[2], atol=5e-6)


def test_unpad_cone_tangent_slices_reverse_verbs():
    from diffopt_tpu import conic_diff
    from diffopt_tpu.solvers import conic_nsipm

    rng = np.random.default_rng(44)
    cp1, cp2 = _cone_programs(rng)
    batch, specs = pad_and_stack_cones([cp1, cp2])
    sols, infos = conic_nsipm.solve_batched(batch)
    assert bool(jnp.all(infos.converged))
    dx = jnp.asarray(rng.normal(size=(2, 3)))
    rev_b = jax.vmap(
        lambda A, b, c, x, y, s, d: conic_diff.reverse_differentiate(
            ConeProgram(A=A, b=b, c=c, cones=batch.cones),
            type(sols)(x=x, y=y, s=s), d,
        )
    )(batch.A, batch.b, batch.c, sols.x, sols.y, sols.s, dx)
    per = unpad_cone_tangent(rev_b, specs, batch.cones)
    for i, cp in enumerate([cp1, cp2]):
        sol_i, info_i = (
            conic_nsipm.solve(cp)
            if any(k in ("exp", "pow") for k, _, _ in cp.cones.blocks)
            else __import__(
                "diffopt_tpu.solvers.conic_ipm", fromlist=["solve"]
            ).solve(cp)
        )
        assert bool(info_i.converged)
        rev_i = conic_diff.reverse_differentiate(cp, sol_i, dx[i])
        np.testing.assert_allclose(per[i].db, rev_i.db, atol=5e-6)
        np.testing.assert_allclose(per[i].dc, rev_i.dc, atol=5e-6)
        np.testing.assert_allclose(per[i].dA, rev_i.dA, atol=5e-6)


def test_ragged_qps_train_under_optax():
    """A ragged list of parameterized QPs trains through pad_and_stack with
    gradients matching the loop-of-solves oracle (one optax step compared
    exactly, then loss decreases over a short loop)."""
    import optax

    rng = np.random.default_rng(45)
    dims = [(3, 2, 0), (4, 3, 0), (2, 2, 0)]
    base = _ragged_qps(rng, dims)
    targets = [jnp.asarray(rng.normal(size=n)) for n, _, _ in dims]
    theta0 = {
        "q": [jnp.asarray(rng.normal(size=n)) for n, _, _ in dims]
    }

    def loss_padded(theta):
        qps = [
            QuadProgram(
                Q=base[i].Q, q=theta["q"][i], A=base[i].A, b=base[i].b,
                G=base[i].G, h=base[i].h,
            )
            for i in range(len(base))
        ]
        batch, bdims = pad_and_stack(qps)
        sols = jax.vmap(solve_qp)(batch)
        return sum(
            jnp.sum((sols.z[i, : dims[i][0]] - targets[i]) ** 2)
            for i in range(len(base))
        )

    def loss_loop(theta):
        total = 0.0
        for i in range(len(base)):
            qp = QuadProgram(
                Q=base[i].Q, q=theta["q"][i], A=base[i].A, b=base[i].b,
                G=base[i].G, h=base[i].h,
            )
            total = total + jnp.sum(
                (solve_qp(qp).z - targets[i]) ** 2
            )
        return total

    g_pad = jax.grad(loss_padded)(theta0)
    g_loop = jax.grad(loss_loop)(theta0)
    for a, b in zip(g_pad["q"], g_loop["q"]):
        np.testing.assert_allclose(a, b, atol=1e-7)

    opt = optax.sgd(5e-2)
    state = opt.init(theta0)
    theta = theta0
    losses = []
    for _ in range(5):
        val, g = jax.value_and_grad(loss_padded)(theta)
        updates, state = opt.update(g, state)
        theta = optax.apply_updates(theta, updates)
        losses.append(float(val))
    assert losses[-1] < losses[0]
