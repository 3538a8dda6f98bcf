"""Secondary benchmark: batched conic (SOCP) solves + VJPs per second.

BASELINE config 3. Not the driver's headline metric (see ../bench.py);
run directly: python benchmarks/conic_bench.py
"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def make_socp_batch(B, n=16, seed=0, dtype=jnp.float32):
    """Random SOCP batch ``min c'x s.t. ||Fx - g|| <= e'x + f`` that is
    certifiably strictly feasible (f = ||g|| + 1 > ||F 0 - g|| at x = 0) and
    bounded (||e|| scaled below sigma_min(F), so no recession direction
    increases the slack). An unconstrained-random family puts infeasible /
    unbounded instances in the batch, which benchmarks solver divergence
    instead of solves."""
    from diffopt_tpu import ConeProgram, ConeSpec

    rng = np.random.default_rng(seed)
    k = n  # SOC dim n+1
    F = rng.normal(size=(B, k, n)).astype(np.float32)
    # clamp F's spectrum to [1, 2]: a tiny sigma_min makes the optimum
    # near-unbounded (||x*|| ~ 1e3-1e9), which f32 cannot resolve — those
    # instances would benchmark divergence handling, not solves
    U, S, Vt = np.linalg.svd(F, full_matrices=False)
    F = (U * np.clip(S, 1.0, 2.0)[:, None, :]) @ Vt
    F = F.astype(np.float32)
    g = rng.normal(size=(B, k)).astype(np.float32)
    e = rng.normal(size=(B, n)).astype(np.float32)
    e *= (0.5 / np.maximum(np.linalg.norm(e, axis=1), 1e-30))[:, None]
    f = np.linalg.norm(g, axis=1, keepdims=True) + 1.0
    c = rng.normal(size=(B, n)).astype(np.float32)
    # rows: (e'x + f, Fx - g) in SOC(k+1): A = -coeffs, b = const
    A = np.concatenate([-e[:, None, :], -F], axis=1)
    b = np.concatenate([f.astype(np.float32), -g], axis=1)
    cones = ConeSpec([("soc", k + 1)])
    return ConeProgram(
        A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype), c=jnp.asarray(c, dtype),
        cones=cones,
    )


def main():
    from diffopt_tpu import solve_conic_batched

    B = 32768  # amortize dispatch + ~26ms tunnel latency (cf. ../bench.py)
    cp = make_socp_batch(B)

    def loss(cp):
        # fused single-kernel IPM + Pallas gram VJP
        sol = solve_conic_batched(cp, max_iters=50, tol=1e-5, method="gram")
        return jnp.sum(sol.x**2)

    @jax.jit
    def step(cp):
        # fold a gradient element into the sync scalar inside the jit: one
        # executable + one scalar transfer per timed call (each extra
        # float() pays a full ~26 ms tunnel round trip — cf. ../bench.py)
        val, g = jax.value_and_grad(loss)(cp)
        return val + g.b[0, 0], g

    val, g = step(cp)
    _ = float(val)

    # pre-build + block the perturbed inputs so their elementwise dispatches
    # don't leak into the timed window
    cps = [
        jax.tree.map(lambda x: x * (1 + np.float32(1e-7) * (i + 1)), cp)
        for i in range(3)
    ]
    jax.block_until_ready(cps)
    ts = []
    for cp2 in cps:
        t0 = time.perf_counter()
        sync, g = step(cp2)
        _ = float(sync)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        json.dumps(
            {
                "metric": "batched_socp_solve_vjp_per_sec_per_chip",
                "value": round(B / dt, 2),
                "unit": "instances/s",
            }
        )
    )


if __name__ == "__main__":
    main()
