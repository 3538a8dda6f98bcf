"""The fused nonsymmetric-cone IPM kernel (``ops/pallas/ns_pdip.py``):
solution + VJP agreement against the vmapped XLA nsipm (round-3 verdict ask
#5 — the XLA path is dispatch/HBM-bound at ~49k exp solves+VJPs/s; the
kernel keeps the 128-lane tile in VMEM for all Newton iterations and line
searches). Interpret mode on CPU; ``entry()``-adjacent Mosaic coverage comes
from the TPU bench (benchmarks/exp_bench.py routes through this kernel)."""

import numpy as np

import jax
import jax.numpy as jnp

from diffopt_tpu import ConeProgram, ConeSpec, solve_conic, solve_conic_batched
from diffopt_tpu.solvers import conic_nsipm


def _entropy_batch(B=8, k=3, seed=0, dtype=jnp.float64):
    """max sum w_i t_i s.t. sum x = 1, (t_i, x_i, 1) in K_exp — the
    exp_bench.py family."""
    rng = np.random.default_rng(seed)
    nv = 2 * k
    rows = 1 + 3 * k
    A = np.zeros((rows, nv))
    b = np.zeros(rows)
    A[0, :k] = -1.0
    b[0] = -1.0
    for i in range(k):
        r = 1 + 3 * i
        A[r, k + i] = -1.0
        A[r + 1, i] = -1.0
        b[r + 2] = 1.0
    w = rng.uniform(0.5, 2.0, size=(B, k))
    c = np.concatenate([np.zeros((B, k)), -w], axis=1)
    cones = ConeSpec([("zero", 1)] + [("exp", 3)] * k)
    return ConeProgram(
        A=jnp.asarray(np.broadcast_to(A, (B,) + A.shape).copy(), dtype),
        b=jnp.asarray(np.broadcast_to(b, (B,) + b.shape).copy(), dtype),
        c=jnp.asarray(c, dtype),
        cones=cones,
    )


def _pow_batch(B=6, seed=3, dtype=jnp.float64):
    """Mixed nonneg + soc + pow/dual_pow program built from a known strictly
    feasible primal-dual pair (zero duality gap by construction)."""
    rng = np.random.default_rng(seed)
    cones = ConeSpec(
        [("zero", 1), ("nonneg", 2), ("soc", 3), ("pow", 3, 0.6),
         ("dual_pow", 3, 0.4)]
    )
    m, n = cones.total_dim, 4
    A_b, b_b, c_b = [], [], []
    for _ in range(B):
        A = rng.normal(size=(m, n))
        xs = rng.normal(size=n)

        def spow(al, dual):
            x = rng.uniform(0.8, 1.5)
            y = rng.uniform(0.8, 1.5)
            if dual:
                cap = (x / al) ** al * (y / (1 - al)) ** (1 - al)
            else:
                cap = x**al * y ** (1 - al)
            return np.array([x, y, rng.uniform(-0.5, 0.5) * cap])

        v = rng.normal(size=2)
        soc_s = np.concatenate([[np.linalg.norm(v) + 0.4], v])
        w2 = rng.normal(size=2) * 0.1
        soc_y = np.concatenate([[np.linalg.norm(w2) + 0.3], w2])
        s_star = np.concatenate(
            [np.zeros(1), np.abs(rng.normal(size=2)) + 0.2, soc_s,
             spow(0.6, False), spow(0.4, True)]
        )
        # dual of pow is dual_pow and vice versa
        y_star = np.concatenate(
            [rng.normal(size=1), np.abs(rng.normal(size=2)) + 0.2, soc_y,
             spow(0.6, True), spow(0.4, False)]
        )
        A_b.append(A)
        b_b.append(A @ xs + s_star)
        c_b.append(-A.T @ y_star)
    return ConeProgram(
        A=jnp.asarray(np.stack(A_b), dtype),
        b=jnp.asarray(np.stack(b_b), dtype),
        c=jnp.asarray(np.stack(c_b), dtype),
        cones=cones,
    )


def test_fused_ns_matches_xla_entropy():
    cp = _entropy_batch()
    solf, infof = conic_nsipm.solve_batched_fused(cp)
    solx, infox = conic_nsipm.solve_batched(cp)
    assert bool(jnp.all(infof.converged))
    assert bool(jnp.all(infox.converged))
    np.testing.assert_allclose(np.asarray(solf.x), np.asarray(solx.x), atol=5e-6)
    np.testing.assert_allclose(np.asarray(solf.y), np.asarray(solx.y), atol=5e-6)


def test_fused_ns_matches_xla_pow_mixed():
    cp = _pow_batch()
    solf, infof = conic_nsipm.solve_batched_fused(cp)
    solx, infox = conic_nsipm.solve_batched(cp)
    assert bool(jnp.all(infof.converged))
    assert bool(jnp.all(infox.converged))
    np.testing.assert_allclose(np.asarray(solf.x), np.asarray(solx.x), atol=5e-6)


def test_fused_ns_vjp_matches_unbatched():
    cp = _entropy_batch(B=4, seed=1)

    def loss_fused(cp):
        return jnp.sum(solve_conic_batched(cp).x ** 2)

    def loss_loop(cp):
        sol = jax.vmap(
            lambda A, b, c: solve_conic(
                ConeProgram(A=A, b=b, c=c, cones=cp.cones)
            )
        )(cp.A, cp.b, cp.c)
        return jnp.sum(sol.x**2)

    vf, gf = jax.value_and_grad(loss_fused)(cp)
    vl, gl = jax.value_and_grad(loss_loop)(cp)
    np.testing.assert_allclose(float(vf), float(vl), rtol=1e-7)
    for name in ("A", "b", "c"):
        np.testing.assert_allclose(
            np.asarray(getattr(gf, name)),
            np.asarray(getattr(gl, name)),
            atol=5e-6,
            err_msg=name,
        )


def test_ns_iteration_counts_regression_gate():
    """Iteration-count band on a fixed entropy batch (round-3 postmortem:
    c264648's line-search grid trim shipped with 'iteration counts
    unchanged' in the message and no gate — and flipped a convergence flag.
    If a future perf retune trades convergence for per-iteration speed,
    this fails instead of the 40-minute tier)."""
    cp = _entropy_batch(B=8, seed=0)
    _, info_f = conic_nsipm.solve_batched_fused(cp)
    _, info_x = conic_nsipm.solve_batched(cp)
    for name, info in (("fused", info_f), ("xla", info_x)):
        assert bool(jnp.all(info.converged)), name
        # measured: 15-18 its on this batch (both paths); band is 2x
        assert int(jnp.max(info.iterations)) <= 36, (
            name, np.asarray(info.iterations)
        )
