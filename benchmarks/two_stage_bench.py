"""Coupled two-stage (Schur/psum) throughput — BASELINE config 5's missing
datapoint (round-1 verdict item 9: "no throughput datapoint for the coupled
path").

Measures scenario-coupled QP solves + first-stage forward sensitivities per
second through ``parallel/schur.py`` on whatever devices are visible:

* on the real TPU (axon): single-chip throughput (axis_name=None — the psum
  degenerates to the local sum, same math);
* with JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=N: a
  shard_map scaling-efficiency measurement (time at 1 device vs N devices,
  fixed per-device scenario count — weak scaling).

Run directly: python benchmarks/two_stage_bench.py [--cpu-scaling]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def make_two_stage(S, n=8, m=4, p=2, c=4, seed=0, dtype=None):
    import jax.numpy as jnp

    from diffopt_tpu.parallel.schur import TwoStageQP

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(S, n, n))
    return TwoStageQP(
        Qs=jnp.asarray(L @ np.transpose(L, (0, 2, 1)) + n * np.eye(n), dtype),
        qs=jnp.asarray(rng.normal(size=(S, n)), dtype),
        As=jnp.asarray(rng.normal(size=(S, p, n)), dtype),
        bs=jnp.asarray(rng.normal(size=(S, p)), dtype),
        Gs=jnp.asarray(rng.normal(size=(S, m, n)), dtype),
        hs=jnp.asarray(rng.normal(size=(S, m)) + 2.0, dtype),
        Bs=jnp.asarray(rng.normal(size=(S, p, c)), dtype),
        Q0=jnp.asarray(np.eye(c) * c, dtype),
        q0=jnp.asarray(rng.normal(size=c), dtype),
    )


def main():
    import jax
    import jax.numpy as jnp

    from diffopt_tpu.parallel.schur import (
        solve_two_stage,
        two_stage_forward_sensitivity,
    )

    S = 8192
    ts = make_two_stage(S)

    def step(t):
        sol, info = solve_two_stage(t)
        fwd = two_stage_forward_sensitivity(t, sol, t)
        return jnp.sum(sol.z**2) + jnp.sum(fwd.xs**2)

    fn = jax.jit(step)
    _ = float(fn(ts))  # compile + deferred AOT

    times = []
    for i in range(3):
        t2 = jax.tree.map(lambda x: x * (1 + np.float32(1e-7) * (i + 1)), ts)
        t0 = time.perf_counter()
        v = float(fn(t2))  # scalar host transfer = sync (axon-safe)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "two_stage_coupled_solve_fwd_per_sec_per_chip",
                "value": round(S / dt, 2),
                "unit": "scenarios/s",
            }
        )
    )


def cpu_scaling():
    """Weak-scaling efficiency over the virtual CPU mesh (shard_map + psum)."""
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffopt_tpu.parallel import make_mesh
    from diffopt_tpu.parallel.schur import (
        TwoStageQP,
        solve_two_stage,
        two_stage_forward_sensitivity,
    )

    per_dev = 128

    def run(ndev):
        ts = make_two_stage(per_dev * ndev, dtype=jnp.float64)
        mesh = make_mesh(ndev, axis_name="scen")
        leaf = lambda x: P("scen", *([None] * (x.ndim - 1)))
        spec = jax.tree.map(leaf, ts)
        spec = TwoStageQP(
            Qs=spec.Qs, qs=spec.qs, As=spec.As, bs=spec.bs, Gs=spec.Gs,
            hs=spec.hs, Bs=spec.Bs, Q0=P(), q0=P(),
        )
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), spec,
            is_leaf=lambda x: isinstance(x, P),
        )
        ts = jax.device_put(ts, shardings)

        def local(t):
            sol, _ = solve_two_stage(t, axis_name="scen")
            fwd = two_stage_forward_sensitivity(t, sol, t, axis_name="scen")
            return jax.lax.psum(jnp.sum(sol.z**2) + jnp.sum(fwd.xs**2), "scen")

        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=(spec,), out_specs=P(),
                check_vma=False,
            )
        )
        _ = float(fn(ts))
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(fn(ts))
        return (time.perf_counter() - t0) / 3

    t1, t8 = run(1), run(8)
    eff = t1 / t8  # weak scaling: ideal == 1.0
    print(
        json.dumps(
            {
                "metric": "two_stage_weak_scaling_efficiency_8dev",
                "value": round(eff, 3),
                "unit": "t(1dev)/t(8dev) at fixed per-device load",
                "note": "virtual CPU devices share cores; TPU ICI efficiency is higher",
            }
        )
    )


if __name__ == "__main__":
    if "--cpu-scaling" in sys.argv:
        cpu_scaling()
    else:
        main()
