"""Secondary benchmark: batched exponential-cone solves + VJPs per second
per chip.

Round 1 routed exp/pow programs through the ~20,000-iteration DR splitting;
this measures the nonsymmetric-cone PDIPM (``solvers/conic_nsipm.py``,
~10-30 Newton steps) on a batch of weighted entropy-maximization programs
(one zero row + k exp blocks each). Run directly:
python benchmarks/exp_bench.py
"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def make_entropy_batch(B, k=3, seed=0, dtype=jnp.float32):
    """max sum_i w_i t_i s.t. sum x = 1, (t_i, x_i, 1) in K_exp
    (t_i <= -x_i log x_i), random positive weights w per instance."""
    from diffopt_tpu import ConeProgram, ConeSpec

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
    w = rng.uniform(0.5, 2.0, size=(B, k)).astype(np.float32)
    c = np.concatenate([np.zeros((B, k), np.float32), -w], axis=1)
    cones = ConeSpec([("zero", 1)] + [("exp", 3)] * k)
    return ConeProgram(
        A=jnp.asarray(np.broadcast_to(A, (B,) + A.shape).copy(), dtype),
        b=jnp.asarray(np.broadcast_to(b, (B,) + b.shape).copy(), dtype),
        c=jnp.asarray(c, dtype),
        cones=cones,
    )


def main():
    from diffopt_tpu import solve_conic_batched

    # B amortizes the ~26 ms tunnel round-trip (at B=4096 the step is
    # ~0.14 s, so dispatch was ~19% of wall time)
    B = 16384
    cp = make_entropy_batch(B)

    def loss(cp):
        # fused single-kernel nonsymmetric IPM (ops/pallas/ns_pdip.py) +
        # batched gram reverse diff — the vmapped-XLA nsipm is
        # dispatch/HBM-bound (measured 49k/s vs 262k for the NT SOCP kernel)
        sol = solve_conic_batched(cp)
        return jnp.sum(sol.x**2)

    @jax.jit
    def step(cp):
        # single sync scalar forcing value + gradient: one executable, one
        # ~26 ms tunnel round trip per timed call (cf. ../bench.py)
        val, g = jax.value_and_grad(loss)(cp)
        return val + g.b[0, 0], g

    val, g = step(cp)
    _ = float(val)

    from diffopt_tpu.ir import ConeProgram

    cps = [
        ConeProgram(
            A=cp.A, b=cp.b, c=cp.c * (1 + np.float32(1e-6) * (i + 1)),
            cones=cp.cones,
        )
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
                "metric": "batched_expcone_solve_vjp_per_sec_per_chip",
                "value": round(B / dt, 2),
                "unit": "instances/s",
            }
        )
    )


if __name__ == "__main__":
    main()
