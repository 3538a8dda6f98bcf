"""Heterogeneous-instance batching: padding and size-bucketing.

MOI's dynamic models have no JAX analogue (SURVEY.md §7 "Static shapes"):
batches must share shapes. These utilities pad a list of differently-sized
QuadPrograms into one static-shaped batch — inactive rows are padded so the
padded instance is mathematically identical to the original:

* objective: padded Q gets identity diagonal, padded q zeros, padded primal
  variables solve to 0 and are masked out of results;
* equality rows: pad with ``x_pad_i = 0`` rows (identity on padding vars);
* inequality rows: pad with ``0'x <= 1`` (never active, zero dual).

``bucket_by_shape`` groups instances into few shape buckets to bound padding
waste, the standard TPU batching pattern.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ir import QPSolution, QuadProgram

Array = jax.Array


def pad_qp(qp: QuadProgram, n: int, m: int, p: int) -> QuadProgram:
    """Pad one instance to (n, m, p) preserving its solution on the original
    coordinates."""
    n0, m0, p0 = qp.num_vars, qp.num_ineq, qp.num_eq
    if (n0, m0, p0) == (n, m, p):
        return qp
    dt = qp.Q.dtype
    Q = jnp.zeros((n, n), dt).at[:n0, :n0].set(qp.Q)
    idx = jnp.arange(n0, n)
    Q = Q.at[idx, idx].set(1.0)  # padded vars: min 1/2 x^2 -> 0
    q = jnp.zeros((n,), dt).at[:n0].set(qp.q)
    A = jnp.zeros((p, n), dt).at[:p0, :n0].set(qp.A)
    b = jnp.zeros((p,), dt).at[:p0].set(qp.b)
    # padded equality rows: x_pad = 0 for the first (p - p0) padding vars if
    # available, else trivially 0 = 0
    extra = min(p - p0, n - n0)
    if extra > 0:
        rows = jnp.arange(p0, p0 + extra)
        cols = jnp.arange(n0, n0 + extra)
        A = A.at[rows, cols].set(1.0)
    G = jnp.zeros((m, n), dt).at[:m0, :n0].set(qp.G)
    h = jnp.ones((m,), dt).at[:m0].set(qp.h)  # padded rows: 0'x <= 1
    return QuadProgram(Q=Q, q=q, A=A, b=b, G=G, h=h)


def pad_and_stack(qps: Sequence[QuadProgram]) -> Tuple[QuadProgram, list]:
    """Pad a list of instances to their max dims and stack into one batch.
    Returns (batched_qp, original_dims) for unpadding results."""
    dims = [(qp.num_vars, qp.num_ineq, qp.num_eq) for qp in qps]
    n = max(d[0] for d in dims)
    m = max(d[1] for d in dims)
    p = max(d[2] for d in dims)
    padded = [pad_qp(qp, n, m, p) for qp in qps]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
    return batched, dims


def unpad_solution(sol: QPSolution, dims: list) -> List[QPSolution]:
    """Slice a batched solution back to the original per-instance dims."""
    out = []
    for i, (n0, m0, p0) in enumerate(dims):
        out.append(
            QPSolution(
                z=sol.z[i, :n0], lam=sol.lam[i, :m0], nu=sol.nu[i, :p0]
            )
        )
    return out


def bucket_by_shape(
    qps: Sequence[QuadProgram], max_buckets: int = 4
) -> Dict[Tuple[int, int, int], List[int]]:
    """Group instance indices into at most ``max_buckets`` shape buckets
    (greedy by padded-volume cost). Returns {bucket_dims: [indices]}."""
    dims = [(qp.num_vars, qp.num_ineq, qp.num_eq) for qp in qps]
    uniq = sorted(set(dims))
    if len(uniq) <= max_buckets:
        buckets = {u: [] for u in uniq}
        for i, d in enumerate(dims):
            buckets[d].append(i)
        return buckets
    # greedy merge: split sorted unique dims into contiguous groups, bucket
    # dim = elementwise max of the group
    groups = np.array_split(np.arange(len(uniq)), max_buckets)
    buckets: Dict[Tuple[int, int, int], List[int]] = {}
    assign = {}
    for g in groups:
        members = [uniq[i] for i in g]
        bd = tuple(int(max(u[k] for u in members)) for k in range(3))
        buckets[bd] = []
        for u in members:
            assign[u] = bd
    for i, d in enumerate(dims):
        buckets[assign[d]].append(i)
    return buckets
