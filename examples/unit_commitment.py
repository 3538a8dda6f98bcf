"""Relaxed unit commitment as a differentiable layer.

TPU-native rewrite of the reference's ChainRules integration demo
(``docs/src/examples/chainrules_unit.jl``): a multi-period economic
unit-commitment LP (binary activations relaxed to [0,1]) whose optimal cost
is differentiated w.r.t. the load profile with ``jax.grad`` — the marginal
prices — and whose dispatch is differentiated with ``jax.jacfwd``.
"""

import numpy as np

import jax
import jax.numpy as jnp

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffopt_tpu import QuadProgram, solve_qp


def make_uc_layer(T=4, n_units=2):
    """Variables per period t: p_{it} (power), u_{it} in [0,1] (relaxed
    activation). Constraints: demand equality, generation limits tied to u,
    ramping on p. Objective: linear generation + activation costs."""
    cgen = jnp.array([1.0, 3.0])
    cact = jnp.array([2.0, 1.0])
    pmax = jnp.array([6.0, 8.0])
    ramp = 3.0

    nv = 2 * n_units * T  # [p(0,:), u(0,:), p(1,:), u(1,:), ...]

    def pidx(t, i):
        return 2 * n_units * t + i

    def uidx(t, i):
        return 2 * n_units * t + n_units + i

    def build(demand):
        q = jnp.zeros(nv)
        for t in range(T):
            for i in range(n_units):
                q = q.at[pidx(t, i)].set(cgen[i])
                q = q.at[uidx(t, i)].set(cact[i])
        # demand equality rows
        A = jnp.zeros((T, nv))
        for t in range(T):
            for i in range(n_units):
                A = A.at[t, pidx(t, i)].set(1.0)
        b = demand
        rows = []
        h = []
        # p <= pmax * u ; p >= 0 ; 0 <= u <= 1 ; ramping |p_t - p_{t-1}| <= ramp
        for t in range(T):
            for i in range(n_units):
                r = np.zeros(nv)
                r[pidx(t, i)] = 1.0
                r[uidx(t, i)] = -float(pmax[i])
                rows.append(r)
                h.append(0.0)
                r = np.zeros(nv)
                r[pidx(t, i)] = -1.0
                rows.append(r)
                h.append(0.0)
                r = np.zeros(nv)
                r[uidx(t, i)] = 1.0
                rows.append(r)
                h.append(1.0)
                r = np.zeros(nv)
                r[uidx(t, i)] = -1.0
                rows.append(r)
                h.append(0.0)
                if t > 0:
                    r = np.zeros(nv)
                    r[pidx(t, i)] = 1.0
                    r[pidx(t - 1, i)] = -1.0
                    rows.append(r)
                    h.append(ramp)
                    rows.append(-r)
                    h.append(ramp)
        G = jnp.asarray(np.stack(rows))
        hv = jnp.asarray(np.array(h))
        # tiny quadratic regularization keeps the LP solution-map smooth
        Q = 1e-5 * jnp.eye(nv)
        return QuadProgram(Q=Q, q=q, A=A, b=b, G=G, h=hv)

    def cost(demand):
        qp = build(demand)
        sol = solve_qp(qp, max_iters=60)
        return jnp.dot(qp.q, sol.z)

    return build, cost


if __name__ == "__main__":
    build, cost = make_uc_layer()
    demand = jnp.array([4.0, 7.0, 9.0, 5.0])
    c = cost(demand)
    prices = jax.grad(cost)(demand)  # marginal price per period
    print("total cost:", float(c))
    print("marginal prices:", np.asarray(prices).round(3))
