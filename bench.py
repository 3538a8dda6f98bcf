"""Headline benchmark: batched QP KKT solves + VJPs per second per chip.

BASELINE.json config 2 ("Batched dense QPs (n<=100) with full KKT
factorization and VJP, single chip"); north star is >= 1e4 solves+VJPs/s/chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs on whatever platform the environment provides (TPU via axon in the
driver; falls back to CPU transparently).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_batch(B, n, m, p, dtype=jnp.float32, seed=0):
    """Random strictly-feasible QP batch, generated ON DEVICE (uploading
    hundreds of MB through the axon tunnel would dominate the bench)."""
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
    from diffopt_tpu import solve_qp

    # B amortizes both on-chip dispatch and the ~26ms axon-tunnel round-trip
    # (measured); per-instance work is unchanged
    # (65536 with the 3 pre-built perturbed copies + gradients exhausts the
    # v5e's 16 GB HBM — measured)
    B, n, m, p = 32768, 64, 32, 16

    qp = make_batch(B, n, m, p)

    def loss(qp):
        from diffopt_tpu import solve_qp_batched

        sol = solve_qp_batched(qp, max_iters=25)  # fused Pallas PDIP + LDL VJP
        return jnp.sum(sol.z**2)

    @jax.jit
    def step(qp):
        val, g = jax.value_and_grad(loss)(qp)
        # fold a gradient element into the sync scalar INSIDE the jit: the
        # host then forces value + gradient with a single executable and a
        # single ~26 ms tunnel round trip
        return val + g.q[0, 0], g

    # warmup: force the (deferred, remote) compile + first execution with a
    # scalar host transfer — block_until_ready alone is not reliable over the
    # axon tunnel and the first transfer pays the AOT compile
    val, g = step(qp)
    _ = float(val)

    # vary the input every iteration (the tunnel memoizes executions with
    # bit-identical inputs) by perturbing ON DEVICE — uploading fresh host
    # batches through the tunnel would dominate wall time; sync each call
    # via ONE scalar host transfer that depends on both the value and the
    # gradient (each separate float() pays a full ~26 ms tunnel round trip)
    iters = 3
    qps = []
    for i in range(iters):
        eps = np.float32(1e-7) * (i + 1)
        qps.append(jax.tree.map(lambda x: x * (1 + eps), qp))
    jax.block_until_ready(qps)
    times = []
    for q_ in qps:
        t0 = time.perf_counter()
        sync, g = step(q_)
        _ = float(sync)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    throughput = B / dt
    baseline = 1e4  # north-star target, BASELINE.json
    print(
        json.dumps(
            {
                "metric": "batched_qp_kkt_solve_vjp_per_sec_per_chip",
                "value": round(throughput, 2),
                "unit": "instances/s",
                "vs_baseline": round(throughput / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
