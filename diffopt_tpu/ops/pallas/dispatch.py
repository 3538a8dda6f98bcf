"""Batching-aware dispatch: per-instance linalg that turns into Pallas
batched kernels under vmap.

The solvers are written per-instance and batched with ``jax.vmap``; these
wrappers use ``jax.custom_batching.custom_vmap`` so the *batched* execution
hits the batch-along-lanes Pallas kernels (``chol.py``) instead of XLA's
serialized small-matrix linalg, while the unbatched path stays plain jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .chol import cholesky_batched, cholesky_solve_batched

Array = jax.Array


def _flatten_batch(x, keep):
    lead = x.shape[: x.ndim - keep]
    return x.reshape((-1,) + x.shape[x.ndim - keep :]), lead


@jax.custom_batching.custom_vmap
def chol(H: Array) -> Array:
    """Lower Cholesky factor of one SPD matrix; Pallas-batched under vmap."""
    return jnp.linalg.cholesky(H)


@chol.def_vmap
def _chol_vmap(axis_size, in_batched, H):
    (hb,) = in_batched
    if not hb:
        H = jnp.broadcast_to(H, (axis_size,) + H.shape)
    if H.ndim > 3:
        Hf, lead = _flatten_batch(H, 2)
        return cholesky_batched(Hf).reshape(lead + Hf.shape[1:]), True
    return cholesky_batched(H), True


@jax.custom_batching.custom_vmap
def chol_solve(L: Array, rhs: Array) -> Array:
    """Solve ``L L' x = rhs`` for one instance; Pallas-batched under vmap.
    rhs may be (n,) or (n, k)."""
    return jax.scipy.linalg.cho_solve((L, True), rhs)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, L, rhs):
    lb, rb = in_batched
    if not lb:
        L = jnp.broadcast_to(L, (axis_size,) + L.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    if L.ndim > 3:
        Lf, lead = _flatten_batch(L, 2)
        rf, _ = _flatten_batch(rhs, rhs.ndim - (L.ndim - 2))
        out = cholesky_solve_batched(Lf, rf)
        return out.reshape(lead + out.shape[1:]), True
    return cholesky_solve_batched(L, rhs), True


@jax.custom_batching.custom_vmap
def ldl_factor(K: Array):
    """LDL' of one symmetric quasi-definite matrix; Pallas-batched under vmap.
    Returns (unit-lower L, diagonal d)."""
    # unbatched: do it via the batched kernel with B=1 on CPU-interpret or jnp
    from .chol import ldl_batched

    L, d = ldl_batched(K[None])
    return L[0], d[0]


@ldl_factor.def_vmap
def _ldl_factor_vmap(axis_size, in_batched, K):
    from .chol import ldl_batched

    (kb,) = in_batched
    if not kb:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    if K.ndim > 3:
        Kf, lead = _flatten_batch(K, 2)
        L, d = ldl_batched(Kf)
        return (
            L.reshape(lead + L.shape[1:]),
            d.reshape(lead + d.shape[1:]),
        ), (True, True)
    return ldl_batched(K), (True, True)


@jax.custom_batching.custom_vmap
def ldl_solve(L: Array, d: Array, rhs: Array) -> Array:
    from .chol import ldl_solve_batched

    return ldl_solve_batched(L[None], d[None], rhs[None])[0]


@ldl_solve.def_vmap
def _ldl_solve_vmap(axis_size, in_batched, L, d, rhs):
    from .chol import ldl_solve_batched

    lb, db, rb = in_batched
    if not lb:
        L = jnp.broadcast_to(L, (axis_size,) + L.shape)
    if not db:
        d = jnp.broadcast_to(d, (axis_size,) + d.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    if L.ndim > 3:
        Lf, lead = _flatten_batch(L, 2)
        df, _ = _flatten_batch(d, 1)
        rf, _ = _flatten_batch(rhs, rhs.ndim - (L.ndim - 2))
        out = ldl_solve_batched(Lf, df, rf)
        return out.reshape(lead + out.shape[1:]), True
    return ldl_solve_batched(L, d, rhs), True
