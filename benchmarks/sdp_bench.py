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
    """min c'x  s.t.  s = b - Ax in PSD(svec) x SOC, where the psd rows
    represent svec(S0 + sum_i x_i G_i) with S0 strictly PD (so x = 0 is
    strictly feasible), G_i random symmetric, and an SOC block ||x|| <= 3
    keeps the feasible set compact. Built VECTORIZED in numpy: a per-instance
    python loop with jnp svec calls costs one ~26 ms tunnel round-trip per
    device op x B instances (the round-2/3 SDP bench never finished its
    B=4096 batch build on the real chip — measured)."""
    from diffopt_tpu import ConeProgram, ConeSpec

    rng = np.random.default_rng(seed)
    tri = side * (side + 1) // 2
    # svec index/scale tables (upper triangle column-by-column, off-diag
    # scaled by sqrt2 — cones._tri_order convention)
    rows_idx, cols_idx, scale = [], [], []
    for c_ in range(side):
        for r_ in range(c_ + 1):
            rows_idx.append(r_)
            cols_idx.append(c_)
            scale.append(1.0 if r_ == c_ else np.sqrt(2.0))
    rows_idx = np.array(rows_idx)
    cols_idx = np.array(cols_idx)
    scale = np.array(scale)

    L = rng.normal(size=(B, side, side))
    S0 = L @ np.swapaxes(L, 1, 2) + side * np.eye(side)
    M = rng.normal(size=(B, n, side, side))
    G = (M + np.swapaxes(M, 2, 3)) / 2
    svec = lambda X: X[..., rows_idx, cols_idx] * scale  # (..., tri)
    b_psd = svec(S0)  # (B, tri)
    A_psd = -np.moveaxis(svec(G), 1, 2)  # (B, tri, n)
    A_soc = np.broadcast_to(
        np.concatenate([np.zeros((1, n)), -np.eye(n)], axis=0), (B, n + 1, n)
    )
    b_soc = np.broadcast_to(
        np.concatenate([[3.0], np.zeros(n)]), (B, n + 1)
    )
    cones = ConeSpec([("psd", tri), ("soc", n + 1)])
    return ConeProgram(
        A=jnp.asarray(np.concatenate([A_psd, A_soc], axis=1), dtype),
        b=jnp.asarray(np.concatenate([b_psd, b_soc], axis=1), dtype),
        c=jnp.asarray(rng.normal(size=(B, n)), dtype),
        cones=cones,
    )


def main():
    from diffopt_tpu import solve_conic_batched

    B = 4096
    cp = make_sdp_batch(B)

    def loss(cp):
        # fused single-kernel conic IPM (psd path: lanes-Jacobi NT scaling)
        # + batched gram reverse diff — the highest-throughput SDP entry
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

    cps = []
    for i in range(3):
        cp2 = jax.tree.map(lambda x: x * (1 + np.float32(1e-7) * (i + 1)), cp)
        cps.append(ConeProgram(A=cp2.A, b=cp2.b, c=cp2.c, cones=cp.cones))
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
                "metric": "batched_sdp_solve_vjp_per_sec_per_chip",
                "value": round(B / dt, 2),
                "unit": "instances/s",
            }
        )
    )


if __name__ == "__main__":
    main()
