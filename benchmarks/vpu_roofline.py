"""VPU roofline microbenchmark: measured elementwise-FMA peak on this chip.

The fused QP/conic kernels are lanes-batched small linear algebra: 128
independent tiny factorizations per tile, batch on the lane axis. The MXU
cannot help this shape class — a systolic matmul contracts against a SHARED
operand, while per-lane batched contractions (A[i,k,l] * B[k,j,l] summed
over k) are 128 independent matrices with no shared operand; packing them
as a block diagonal wastes 127/128 of the array. So the per-iteration cost
is VPU elementwise work by construction, and the honest performance
question is "what fraction of the VPU roofline does the kernel achieve"
(round-3 verdict Missing #5 / ask #4). This kernel measures the roofline:
a long chain of dependent-free FMAs on VMEM-resident (8k, 128) blocks.

Run directly on the TPU: python benchmarks/vpu_roofline.py
"""

import json
import sys
import time
import pathlib
from functools import partial

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE = 512, 128  # 8 acc chains x 256 KB stays inside the 16 MB scoped-vmem stack
REPS = 10_000_000  # FMA chain length: ~1e13 flops/call, ~2 s at VPU rates
# (amortizes the ~26 ms tunnel round-trip to noise)
PASSES = 4


def _kernel(x_ref, o_ref):
    x = x_ref[:]
    a = x
    # 8 independent FMA chains to fill the VPU pipeline (a single chain is
    # latency-bound on the FMA's ~4-cycle dependency)
    accs = [x * (1.0 + 0.001 * i) for i in range(8)]

    def body(i, accs):
        return tuple(acc * a + 1.0e-9 for acc in accs)

    accs = jax.lax.fori_loop(0, REPS, body, tuple(accs))
    out = accs[0]
    for acc in accs[1:]:
        out = out + acc
    o_ref[:] = out


def main():
    x = jnp.full((ROWS, LANE), 0.9999, jnp.float32)
    f = jax.jit(
        lambda x: pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(x)
    )
    out = f(x)
    _ = float(out[0, 0])
    ts = []
    for i in range(PASSES):
        xi = x * (1 + 1e-7 * i)  # defeat the tunnel's memoization
        t0 = time.perf_counter()
        _ = float(f(xi)[0, 0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    # FLOPs: 8 chains x REPS FMAs (2 flops) per element
    flops = ROWS * LANE * 8 * REPS * 2
    print(
        json.dumps(
            {
                "metric": "vpu_fma_roofline",
                "value": round(flops / dt / 1e12, 3),
                "unit": "TFLOP/s f32",
            }
        )
    )


if __name__ == "__main__":
    main()
