"""PSD blocks in the fully-fused conic IPM kernel (round-2/3 verdict ask:
the fused kernel previously covered the polyhedral/soc family only and SDP
throughput sat 44x behind SOCP). Lanes-batched Jacobi eigh, NT matrix
geometric mean, symmetric-Kronecker W^2, Lyapunov jsolve, and scaled-space
step-to-boundary — all inside the single Pallas kernel (interpret mode
here; `entry()` Mosaic-gates it on TPU).

Side kept at 3: the unrolled rotation-concat chains compile superlinearly
on XLA:CPU (d=4 blows past 10 min; d=3 is ~40 s), while Mosaic compiles the
d=4 kernel in ~30 s on TPU (measured)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffopt_tpu import ConeProgram, ConeSpec, solve_conic, solve_conic_batched
from diffopt_tpu.cones import sym_to_svec
from diffopt_tpu.solvers import conic_ipm


def _sdp_batch(B=8, side=3, n=3, seed=0, dtype=jnp.float64):
    """min c'x s.t. svec(S0 + sum_i x_i G_i) in PSD, ||x|| <= 3 (soc row
    block) — the sdp_bench.py family with a strictly feasible interior."""
    rng = np.random.default_rng(seed)
    tri = side * (side + 1) // 2
    A_rows, b_rows = [], []
    for _ in range(B):
        L = rng.normal(size=(side, side))
        S0 = L @ L.T + side * np.eye(side)
        Gs = [
            (lambda M: (M + M.T) / 2)(rng.normal(size=(side, side)))
            for _ in range(n)
        ]
        b_psd = np.asarray(sym_to_svec(jnp.asarray(S0)))
        A_psd = -np.stack(
            [np.asarray(sym_to_svec(jnp.asarray(G))) for G in Gs], axis=1
        )
        A_soc = np.concatenate([np.zeros((1, n)), -np.eye(n)], axis=0)
        b_soc = np.concatenate([[3.0], np.zeros(n)])
        A_rows.append(np.concatenate([A_psd, A_soc], axis=0))
        b_rows.append(np.concatenate([b_psd, b_soc]))
    return ConeProgram(
        A=jnp.asarray(np.stack(A_rows), dtype),
        b=jnp.asarray(np.stack(b_rows), dtype),
        c=jnp.asarray(rng.normal(size=(B, n)), dtype),
        cones=ConeSpec([("psd", tri), ("soc", n + 1)]),
    )


def test_fused_psd_matches_xla_ipm():
    cp = _sdp_batch()
    solf, infof = conic_ipm.solve_batched_fused(cp)
    solx, infox = conic_ipm.solve_batched(cp)
    assert bool(jnp.all(infof.converged))
    assert bool(jnp.all(infox.converged))
    np.testing.assert_allclose(
        np.asarray(solf.x), np.asarray(solx.x), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(solf.y), np.asarray(solx.y), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(solf.s), np.asarray(solx.s), atol=1e-8
    )


def test_fused_psd_vjp_matches_unbatched():
    cp = _sdp_batch(B=4, seed=1)

    def loss_fused(cp):
        sol = solve_conic_batched(cp)
        return jnp.sum(sol.x**2)

    def loss_loop(cp):
        sol = jax.vmap(
            lambda A, b, c: solve_conic(
                ConeProgram(A=A, b=b, c=c, cones=cp.cones)
            )
        )(cp.A, cp.b, cp.c)
        return jnp.sum(sol.x**2)

    vf, gf = jax.value_and_grad(loss_fused)(cp)
    vl, gl = jax.value_and_grad(loss_loop)(cp)
    np.testing.assert_allclose(float(vf), float(vl), rtol=1e-9)
    for name in ("A", "b", "c"):
        np.testing.assert_allclose(
            np.asarray(getattr(gf, name)),
            np.asarray(getattr(gl, name)),
            atol=1e-6,
            err_msg=name,
        )


def test_fused_conic_loop_ldl_envelope_n80():
    """Newton systems past the unrolled-LDL' envelope (N > _LDL_UNROLL_MAX
    = 72) take the scratch-ref fori-loop LDL' (``_ldl_value_loop`` /
    ``_ldl_solve_refine_loop``) — the round-3 ask #7 cap raise (N <= 128,
    previously 64). A zero+nonneg+soc program sized to N = 80 must match
    the vmapped XLA IPM through the loop path (interpret mode)."""
    from diffopt_tpu.ops.pallas import conic_pdip

    rng = np.random.default_rng(2)
    B, n = 4, 16
    cones = ConeSpec([("zero", 4), ("nonneg", 40), ("soc", 10), ("soc", 10)])
    m = cones.total_dim
    N = n + m  # 16 + 64 = 80
    assert N > conic_pdip._LDL_UNROLL_MAX
    A_b, b_b, c_b = [], [], []
    for _ in range(B):
        A = rng.normal(size=(m, n)) / np.sqrt(n)
        xs = rng.normal(size=n)
        socs = []
        socy = []
        for d in (10, 10):
            v = rng.normal(size=d - 1)
            socs.append(np.concatenate([[np.linalg.norm(v) + 0.4], v]))
            w = rng.normal(size=d - 1) * 0.1
            socy.append(np.concatenate([[np.linalg.norm(w) + 0.3], w]))
        s_star = np.concatenate(
            [np.zeros(4), np.abs(rng.normal(size=40)) + 0.2] + socs
        )
        y_star = np.concatenate(
            [rng.normal(size=4), np.abs(rng.normal(size=40)) + 0.2] + socy
        )
        A_b.append(A)
        b_b.append(A @ xs + s_star)
        c_b.append(-A.T @ y_star)
    cp = ConeProgram(
        A=jnp.asarray(np.stack(A_b)),
        b=jnp.asarray(np.stack(b_b)),
        c=jnp.asarray(np.stack(c_b)),
        cones=cones,
    )
    solf, infof = conic_ipm.solve_batched_fused(cp)
    solx, infox = conic_ipm.solve_batched(cp)
    assert bool(jnp.all(infof.converged))
    assert bool(jnp.all(infox.converged))
    np.testing.assert_allclose(
        np.asarray(solf.x), np.asarray(solx.x), atol=1e-7
    )


@pytest.mark.slow
def test_fused_conic_loop_ldl_envelope_n128_cap_boundary():
    """The exact N = 128 gate boundary (`solve_batched_fused` admits
    N <= 128). This is the size where the original two-matrix-buffer
    substitution scratch hit 16.8 MB — past the ~16 MB scoped-vmem stack
    limit; the single-L' form (`_ldl_solve_refine_loop`) stays at ~8.5 MB.
    Interpret-mode here pins the algebra; `entry()`'s N = 90 loop batch
    Mosaic-gates the lowering on TPU."""
    from diffopt_tpu.ops.pallas import conic_pdip

    rng = np.random.default_rng(5)
    B, n = 4, 16
    soc_ds = (14, 14)
    cones = ConeSpec(
        [("zero", 4), ("nonneg", 80)] + [("soc", d) for d in soc_ds]
    )
    m = cones.total_dim
    N = n + m
    assert N == 128 > conic_pdip._LDL_UNROLL_MAX
    A_b, b_b, c_b = [], [], []
    for _ in range(B):
        A = rng.normal(size=(m, n)) / np.sqrt(n)
        xs = rng.normal(size=n)
        socs, socy = [], []
        for d in soc_ds:
            v = rng.normal(size=d - 1)
            socs.append(np.concatenate([[np.linalg.norm(v) + 0.4], v]))
            w = rng.normal(size=d - 1) * 0.1
            socy.append(np.concatenate([[np.linalg.norm(w) + 0.3], w]))
        s_star = np.concatenate(
            [np.zeros(4), np.abs(rng.normal(size=80)) + 0.2] + socs
        )
        y_star = np.concatenate(
            [rng.normal(size=4), np.abs(rng.normal(size=80)) + 0.2] + socy
        )
        A_b.append(A)
        b_b.append(A @ xs + s_star)
        c_b.append(-A.T @ y_star)
    cp = ConeProgram(
        A=jnp.asarray(np.stack(A_b)),
        b=jnp.asarray(np.stack(b_b)),
        c=jnp.asarray(np.stack(c_b)),
        cones=cones,
    )
    solf, infof = conic_ipm.solve_batched_fused(cp)
    solx, infox = conic_ipm.solve_batched(cp)
    assert bool(jnp.all(infof.converged))
    assert bool(jnp.all(infox.converged))
    np.testing.assert_allclose(
        np.asarray(solf.x), np.asarray(solx.x), atol=1e-7
    )


def test_fused_gate_psd_side4_routes_to_xla_off_tpu(monkeypatch):
    """Off-TPU the fused gate must cap psd sides at 3: XLA:CPU compiles the
    interpret-mode Jacobi rotation chains superlinearly (side 4 measured
    > 10 min — an effective hang), while the vmapped XLA IPM solves the
    same program in seconds. Poison the kernel entry to prove the route."""
    from diffopt_tpu.ops.pallas import conic_pdip

    assert conic_pdip._interpret()  # test env forces CPU

    def _boom(*a, **k):  # pragma: no cover - the assertion IS the route
        raise AssertionError(
            "fused kernel must not run interpret-mode psd side > 3"
        )

    monkeypatch.setattr(conic_pdip, "solve_tile_fused", _boom)
    cp = _sdp_batch(B=2, side=4, n=3)
    sol, info = conic_ipm.solve_batched_fused(cp)
    assert bool(jnp.all(info.converged))
