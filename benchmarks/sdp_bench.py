"""Secondary benchmark: batched SDP solves + VJPs per second per chip.

BASELINE config 3 names "SOCP/SDP cones"; ``conic_bench.py`` covers SOCP via
the fused IPM — this covers the PSD-cone path (NT-scaled IPM forward with
matrix Jordan algebra / eigh scaling, ~10-15 Newton steps, gram implicit
diff; round 1 routed these through the 20,000-iteration DR splitting at
72.6/s). Family: nearest-PSD-matrix-style programs
``min c'x s.t. svec(C + sum_i x_i E_i) in PSD`` with a known strictly
feasible interior point. Run directly: python benchmarks/sdp_bench.py
"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def make_sdp_batch(B, side=4, n=3, seed=0, dtype=jnp.float32):
    """min c'x  s.t.  s = b - Ax in PSD(svec), where s represents
    svec(S0 + sum_i x_i G_i) with S0 strictly PD (so x = 0 is strictly
    feasible) and G_i random symmetric; c random. Bounded: the PSD constraint
    plus a trace penalty row keeps the feasible set compact via an extra
    nonneg row  t - e'x >= 0 ... simpler: add ||x||<=r as an SOC row block."""
    from diffopt_tpu import ConeProgram, ConeSpec
    from diffopt_tpu.cones import sym_to_svec

    rng = np.random.default_rng(seed)
    tri = side * (side + 1) // 2
    A_rows = []
    b_rows = []
    for bi in range(B):
        L = rng.normal(size=(side, side))
        S0 = L @ L.T + side * np.eye(side)
        Gs = []
        for _ in range(n):
            M = rng.normal(size=(side, side))
            Gs.append((M + M.T) / 2)
        # s = svec(S0) + sum_i x_i svec(G_i) = b - A x
        b_psd = np.asarray(sym_to_svec(jnp.asarray(S0)))
        A_psd = -np.stack([np.asarray(sym_to_svec(jnp.asarray(G))) for G in Gs], axis=1)
        # SOC row block ||x|| <= r: rows (r, x)
        A_soc = np.concatenate([np.zeros((1, n)), -np.eye(n)], axis=0)
        b_soc = np.concatenate([[3.0], np.zeros(n)])
        A_rows.append(np.concatenate([A_psd, A_soc], axis=0))
        b_rows.append(np.concatenate([b_psd, b_soc]))
    c = rng.normal(size=(B, n)).astype(np.float32)
    cones = ConeSpec([("psd", tri), ("soc", n + 1)])
    return ConeProgram(
        A=jnp.asarray(np.stack(A_rows), dtype),
        b=jnp.asarray(np.stack(b_rows), dtype),
        c=jnp.asarray(c, dtype),
        cones=cones,
    )


def main():
    from diffopt_tpu import solve_conic

    B = 4096
    cp = make_sdp_batch(B)

    def loss(cp):
        sol = jax.vmap(
            lambda c: solve_conic(c, method="gram", solver="ipm")
        )(cp)
        return jnp.sum(sol.x**2)

    step = jax.jit(jax.value_and_grad(loss))
    val, g = step(cp)
    _ = float(val)

    ts = []
    for i in range(3):
        cp2 = jax.tree.map(lambda x: x * (1 + np.float32(1e-7) * (i + 1)), cp)
        from diffopt_tpu.ir import ConeProgram

        cp2 = ConeProgram(A=cp2.A, b=cp2.b, c=cp2.c, cones=cp.cones)
        t0 = time.perf_counter()
        val, g = step(cp2)
        _ = float(val) + float(g.b[0, 0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        json.dumps(
            {
                "metric": "batched_sdp_solve_vjp_per_sec_per_chip",
                "value": round(B / dt, 2),
                "unit": "instances/s",
            }
        )
    )


if __name__ == "__main__":
    main()
