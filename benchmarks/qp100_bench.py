"""Secondary benchmark: batched n=100 QP forward solves per second.

BASELINE config 2's upper envelope ("batched dense QPs (n<=100)"): n=100,
m=48, p=24 routes the fused PDIP kernel through its n>80 scratch-ref loop
variants (``ops/pallas/pdip.py``: `_chol_value_loop` / `_chol_solve_value_loop`
/ the fori H-builder — dynamic row load/stores on a `pl.run_scoped` VMEM ref
instead of O(n²·LANE) one-hot extraction). Forward-only, matching the README
"QP at n=100 (forward)" row; per-instance cost target is <= 2x the n=64
headline shape. Not the driver's headline metric (see ../bench.py);
run directly: python benchmarks/qp100_bench.py
"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def make_batch(B, n, m, p, dtype=jnp.float32, seed=0):
    """Random strictly-feasible QP batch, generated on device (cf. ../bench.py:
    uploading hundreds of MB through the axon tunnel would dominate)."""
    from diffopt_tpu import QuadProgram

    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    L = jax.random.normal(ks[0], (B, n, n), dtype)
    Q = L @ jnp.swapaxes(L, -1, -2) + n * jnp.eye(n, dtype=dtype)
    return QuadProgram(
        Q=Q,
        q=jax.random.normal(ks[1], (B, n), dtype),
        A=jax.random.normal(ks[2], (B, p, n), dtype),
        b=jax.random.normal(ks[3], (B, p), dtype),
        G=jax.random.normal(ks[4], (B, m, n), dtype),
        h=jax.random.normal(ks[5], (B, m), dtype) + 2.0,
    )


def main():
    from diffopt_tpu.ops.pallas.pdip import solve_batched_fused

    # n=100 instances are ~2.4x the n=64 VMEM/FLOP footprint; B=8192 keeps
    # the ~26 ms tunnel round trip under ~5% of the timed window
    B, n, m, p = 8192, 100, 48, 24
    qp = make_batch(B, n, m, p)

    @jax.jit
    def step(qp):
        sol = solve_batched_fused(qp, max_iters=25)
        # sync scalar: one host transfer forces the whole solve (cf. ../bench.py)
        return jnp.sum(sol.z[:, 0]), sol

    val, _ = step(qp)
    _ = float(val)

    # vary inputs per call (the tunnel memoizes bit-identical executions);
    # pre-build + block the perturbed batches outside the timed window
    qps = [
        jax.tree.map(lambda x: x * (1 + np.float32(1e-7) * (i + 1)), qp)
        for i in range(3)
    ]
    jax.block_until_ready(qps)
    ts = []
    for q2 in qps:
        t0 = time.perf_counter()
        sync, _ = step(q2)
        _ = float(sync)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        json.dumps(
            {
                "metric": "batched_qp_n100_forward_solve_per_sec_per_chip",
                "value": round(B / dt, 2),
                "unit": "instances/s",
            }
        )
    )


if __name__ == "__main__":
    main()
