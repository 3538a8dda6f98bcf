"""Secondary benchmark: LARGE-block SDP differentiation — the size-aware
conic-diff dispatch (round-2 verdict item 4).

A side-32 SDP has tri = 528 cone rows; dim(M) = n + 528 + 1. The dense diff
path materializes the (528, 528) DPi block and least-squares solves the
(537, 537) M per VJP; the matrix-free route (the reference's *only* conic
path, ``/root/reference/src/ConicProgram/ConicProgram.jl:323,372``) runs
LSQR on the prepared operator (one eigh total, matvecs only). ``'auto'``
picks it past ``config.conic_lsqr_threshold``.

Run directly: python benchmarks/large_sdp_diff_bench.py [--side 32] [--reps 8]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def make_sdp(side, n, seed=0, dtype=jnp.float64):
    from diffopt_tpu import ConeProgram, ConeSpec
    from diffopt_tpu.cones import sym_to_svec

    rng = np.random.default_rng(seed)
    tri = side * (side + 1) // 2
    L0 = rng.normal(size=(side, side))
    B0 = L0 @ L0.T + np.eye(side)
    cols = []
    for _ in range(n):
        Bi = rng.normal(size=(side, side))
        cols.append(-np.asarray(sym_to_svec(jnp.asarray(Bi + Bi.T, dtype))))
    A = np.stack(cols, axis=1)
    b = np.asarray(sym_to_svec(jnp.asarray(B0, dtype)))
    Y = rng.normal(size=(side, side)) / np.sqrt(side)
    ystar = np.asarray(
        sym_to_svec(jnp.asarray(Y @ Y.T + 0.5 * np.eye(side), dtype))
    )
    c = -A.T @ ystar
    return ConeProgram(
        A=jnp.asarray(A, dtype), b=jnp.asarray(b, dtype),
        c=jnp.asarray(c, dtype), cones=ConeSpec([("psd", tri)]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=32)
    ap.add_argument("--nvars", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="force CPU f64")
    args = ap.parse_args()

    if args.cpu or jax.default_backend() == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32

    from diffopt_tpu import conic_diff
    from diffopt_tpu.solvers import conic_ipm

    cp = make_sdp(args.side, args.nvars, dtype=dtype)
    sol, info = conic_ipm.solve(cp)
    assert bool(info.converged), "forward solve must converge"

    rng = np.random.default_rng(1)
    seeds = [
        jnp.asarray(rng.normal(size=cp.num_vars), dtype)
        for _ in range(args.reps)
    ]

    def run(method):
        fn = jax.jit(
            lambda dx: conic_diff.reverse_differentiate(
                cp, sol, dx, method=method
            )
        )
        fn(seeds[0])  # compile
        t0 = time.perf_counter()
        acc = 0.0
        for dx in seeds:
            out = fn(dx)
            acc += float(out.db[0])  # host sync (axon tunnel gotcha)
        return (time.perf_counter() - t0) / args.reps, acc

    t_lsqr, a1 = run("lsqr")
    t_dense, a2 = run("lstsq")
    assert abs(a1 - a2) < 1e-3 * (abs(a2) + 1.0), (a1, a2)

    result = {
        "metric": f"side{args.side}_sdp_reverse_diff_speedup_lsqr_vs_dense",
        "value": round(t_dense / t_lsqr, 3),
        "unit": "x",
        "lsqr_ms": round(1e3 * t_lsqr, 2),
        "dense_ms": round(1e3 * t_dense, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
