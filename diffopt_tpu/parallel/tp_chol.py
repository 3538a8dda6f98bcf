"""Tensor-parallel blocked Cholesky over a device mesh.

SURVEY.md §2's optional at-scale component: when a SINGLE instance's KKT
matrix outgrows one chip (n beyond the HBM/VMEM envelope of the batched
Pallas kernels), the factorization itself must be sharded. The reference has
no counterpart (it is single-threaded Julia; BASELINE.json mandates the
capability for the TPU framework).

Design (TPU-idiomatic, not a ScaLAPACK translation): 1-D block-column
distribution over a mesh axis inside ``shard_map``. Each device owns one
``n x nb`` column block (``nb = n / P``). The right-looking factorization
loops over the P block columns — a *static* Python loop, so XLA sees P
unrolled steps:

  1. every device computes the candidate panel from its local block (the
     non-owners' work is masked garbage — cheaper than divergent control
     flow on SPMD hardware),
  2. the owner's panel is broadcast with a masked ``psum`` (one ICI
     all-reduce; on a ring this is the bandwidth-optimal broadcast),
  3. devices to the right apply the rank-nb trailing update to their local
     columns (the compute-heavy ``(n, nb) @ (nb, nb)`` matmul — MXU work
     that overlaps across devices).

The distributed triangular solves follow the same masked-psum pattern
blockwise. Numerical behavior is identical to a local Cholesky up to
summation order; ``tests/test_tp_chol.py`` checks elementwise agreement on
the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def _tp_cholesky_local(H_local: Array, nparts: int, axis_name: str) -> Array:
    """shard_map body: ``H_local`` is this device's (n, nb) column block of a
    symmetric PD matrix; returns its column block of the lower-triangular
    Cholesky factor L (rows above the diagonal block zeroed)."""
    n, nb = H_local.shape
    dt = H_local.dtype
    d = jax.lax.axis_index(axis_name)
    L_local = H_local
    rows = jnp.arange(n)
    for k in range(nparts):
        mine = d == k
        r0 = k * nb
        # candidate panel from the local block (valid only on the owner)
        diag = jax.lax.dynamic_slice(L_local, (r0, 0), (nb, nb))
        # non-owners may hold a non-PD diagonal block at this point — swap in
        # the identity so their (discarded) Cholesky stays finite
        diag = jnp.where(mine, diag, jnp.eye(nb, dtype=dt))
        Lkk = jnp.linalg.cholesky(diag)
        # panel = A[:, k-block] Lkk^{-T}, rows above r0 belong to the upper
        # triangle and are zeroed
        panel = jax.lax.linalg.triangular_solve(
            Lkk, L_local, left_side=False, lower=True,
            transpose_a=True,
        )
        panel = jnp.where(rows[:, None] >= r0, panel, 0.0)
        panel = jnp.where(mine, panel, 0.0)
        panel = jax.lax.psum(panel, axis_name)  # broadcast block column k
        # trailing update for devices right of k: A -= L[:,k] L[myrows,k]'
        Lkj_t = jax.lax.dynamic_slice(
            panel, (d * nb, jnp.zeros((), d.dtype)), (nb, nb)
        )
        update = panel @ Lkj_t.T
        L_local = jnp.where(d > k, L_local - update, L_local)
        # the owner's block column is finished
        L_local = jnp.where(mine, panel, L_local)
    return L_local


def _tp_solve_local(
    L_local: Array, r_local: Array, nparts: int, axis_name: str
) -> Array:
    """shard_map body: solve ``L L' z = r`` given the distributed factor.
    ``r_local`` is this device's (nb,) slice of the right-hand side; returns
    the (nb,) slice of z. Blockwise forward then backward substitution, one
    masked psum per block step."""
    n, nb = L_local.shape
    dt = L_local.dtype
    d = jax.lax.axis_index(axis_name)
    # forward: y_k = Lkk^{-1} (r_k - sum_{j<k} L[k-rows, j] y_j)
    y = jnp.zeros((nb,), dt)
    for k in range(nparts):
        r0 = k * nb
        contrib = jax.lax.dynamic_slice(L_local, (r0, 0), (nb, nb)) @ y
        acc = jax.lax.psum(jnp.where(d < k, contrib, 0.0), axis_name)
        diag = jax.lax.dynamic_slice(L_local, (r0, 0), (nb, nb))
        diag = jnp.where(d == k, diag, jnp.eye(nb, dtype=dt))
        yk = jax.lax.linalg.triangular_solve(
            diag, (r_local - acc)[:, None], left_side=True, lower=True
        )[:, 0]
        y = jnp.where(d == k, yk, y)
    # backward: z_k = Lkk^{-T} (y_k - sum_{j>k} L[j-rows, k-cols]' z_j)
    # device k owns column block k, i.e. the blocks L[j-rows, k] for all j —
    # the contribution to row block k from z_j is L[j-rows, k]' z_j, which
    # lives on device k entirely once z_j is known; iterate k from the end
    # and broadcast each finished z_j instead:
    z = jnp.zeros((nb,), dt)
    for k in reversed(range(nparts)):
        # sum_{j>k} L[j-rows, k-cols]' z_j: device k can form it from its own
        # column block once it has all z_j (j > k) — gather them via psum of
        # the already-finished slices
        mask = (jnp.arange(nparts) == d)[:, None]
        zfull = jax.lax.psum(
            jnp.where(mask, z[None, :], jnp.zeros((), dt)), axis_name
        )
        acc = jnp.zeros((nb,), dt)
        for j in range(k + 1, nparts):
            blk = jax.lax.dynamic_slice(L_local, (j * nb, 0), (nb, nb))
            acc = acc + blk.T @ zfull[j]
        diag = jax.lax.dynamic_slice(L_local, (k * nb, 0), (nb, nb))
        diag = jnp.where(d == k, diag, jnp.eye(nb, dtype=dt))
        zk = jax.lax.linalg.triangular_solve(
            diag, (y - acc)[:, None], left_side=True, lower=True,
            transpose_a=True,
        )[:, 0]
        z = jnp.where(d == k, zk, z)
    return z


def tp_cholesky(H: Array, mesh: Mesh, axis_name: str = "tp") -> Array:
    """Cholesky-factor a symmetric PD ``(n, n)`` matrix with its column
    blocks sharded over ``mesh[axis_name]``; returns L with the same
    sharding. ``n`` must divide evenly by the axis size."""
    nparts = mesh.shape[axis_name]
    n = H.shape[-1]
    if n % nparts:
        raise ValueError(f"n={n} must be divisible by mesh axis size {nparts}")
    fn = jax.shard_map(
        partial(_tp_cholesky_local, nparts=nparts, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
    )
    return fn(H)


def tp_cholesky_solve(
    L: Array, r: Array, mesh: Mesh, axis_name: str = "tp"
) -> Array:
    """Solve ``L L' z = r`` with the factor's column blocks (and the vector)
    sharded over ``mesh[axis_name]``."""
    nparts = mesh.shape[axis_name]
    fn = jax.shard_map(
        partial(_tp_solve_local, nparts=nparts, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name), P(axis_name)),
        out_specs=P(axis_name),
    )
    return fn(L, r)


def tp_solve_psd(
    H: Array, r: Array, mesh: Mesh, axis_name: str = "tp"
) -> Array:
    """One-call sharded PSD solve ``H z = r`` (factor + two triangular
    solves), the tensor-parallel escape hatch for single KKT systems past
    one chip's memory: shard ``H`` column-blocks over the mesh axis and let
    the blocked factorization's collectives ride ICI."""
    L = tp_cholesky(H, mesh, axis_name)
    return tp_cholesky_solve(L, r, mesh, axis_name)
