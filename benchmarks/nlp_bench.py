"""Secondary benchmark: batched NLP KKT sensitivities per second (BASELINE
config 4). Run directly: python benchmarks/nlp_bench.py"""

import json
import sys
import time
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    from diffopt_tpu.nlp_diff import NLPProblem, NLPSolution, forward_differentiate
    from diffopt_tpu.solvers import nlp as nlpsolver

    n, nc = 16, 8
    rng = np.random.default_rng(0)
    Wm = rng.normal(size=(n, n)).astype(np.float32)
    Am = rng.normal(size=(nc, n)).astype(np.float32)

    nlp = NLPProblem(
        objective=lambda x, p: jnp.sum((Wm @ x - p[:n]) ** 2)
        + 0.1 * jnp.sum(x**4),
        constraints=lambda x, p: Am @ x - p[n:],
        kinds=("eq",) * nc,
        n=n,
    )

    B = 16384  # amortize dispatch + ~26ms tunnel latency (cf. ../bench.py)
    p_batch = jnp.asarray(rng.normal(size=(B, n + nc)).astype(np.float32))
    dp = jnp.asarray(rng.normal(size=(B, n + nc)).astype(np.float32))

    def solve_and_sens(p, d):
        sol, _ = nlpsolver.solve(nlp, p, max_iters=40, tol=1e-6)
        return forward_differentiate(nlp, sol, p, d).dx

    step = jax.jit(jax.vmap(solve_and_sens))
    out = step(p_batch, dp)
    _ = float(out[0, 0])

    ts = []
    for i in range(3):
        p2 = p_batch * (1 + np.float32(1e-6) * (i + 1))
        t0 = time.perf_counter()
        out = step(p2, dp)
        _ = float(out[0, 0])
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(
        json.dumps(
            {
                "metric": "batched_nlp_solve_sensitivity_per_sec_per_chip",
                "value": round(B / dt, 2),
                "unit": "instances/s",
            }
        )
    )


if __name__ == "__main__":
    main()
