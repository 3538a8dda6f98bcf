"""Pallas TPU kernels: batched small-matrix Cholesky factor + solve.

The hot op of the whole framework (BASELINE config 2) is "factorize and solve
thousands of small (n<=128) SPD systems per step". XLA's batched
``jnp.linalg.cholesky``/``lu`` on TPU serializes poorly for tiny matrices —
measured ~100x off roofline. These kernels use the *batch-along-lanes* layout:
operands are transposed to ``(n, n, B)`` so every scalar step of the
right-looking Cholesky is a (sublane x lane) vector op across 128+ instances,
and the matrix stays resident in VMEM for all n steps.

Grid: one program per 128-instance tile. n is static and <= 128 (pad odd
sizes to a multiple of 8 with an identity diagonal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x, m, axis):
    r = (-x.shape[axis]) % m
    if r == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, r)
    return jnp.pad(x, pad)


def _chol_kernel(n: int, h_ref, l_ref):
    """Right-looking Cholesky on (n, n, LANE); unrolled static steps,
    factoring in place in the output buffer (input is aliased to it) so the
    VMEM footprint is one matrix block. The upper triangle keeps stale
    values; solves only read the lower triangle."""
    l_ref[:] = h_ref[:]
    for j in range(n):
        d = jax.lax.rsqrt(l_ref[j, j, :])  # (LANE,)
        col = l_ref[j:, j, :] * d[None, :]  # (n-j, LANE): L[j:, j]
        l_ref[j:, j, :] = col
        if j + 1 < n:
            sub = col[1:]  # (n-j-1, LANE)
            l_ref[j + 1 :, j + 1 :, :] = l_ref[j + 1 :, j + 1 :, :] - (
                sub[:, None, :] * sub[None, :, :]
            )


def _solve_kernel(n: int, k: int, l_ref, rhs_ref, out_ref, y_ref):
    """Solve L L' x = rhs via forward+back substitution; rhs (n, k, LANE)."""
    # forward: L y = rhs
    for j in range(n):
        acc = rhs_ref[j]  # (k, LANE)
        if j > 0:
            lrow = l_ref[j, :j, :]  # (j, LANE)
            acc = acc - jnp.sum(lrow[:, None, :] * y_ref[:j], axis=0)
        y_ref[j] = acc / l_ref[j, j, :][None, :]
    # backward: L' x = y  (L'[i, j] = l[j, i])
    for j in range(n - 1, -1, -1):
        acc = y_ref[j]
        if j + 1 < n:
            lcol = l_ref[j + 1 :, j, :]  # (n-j-1, LANE)
            acc = acc - jnp.sum(lcol[:, None, :] * out_ref[j + 1 :], axis=0)
        out_ref[j] = acc / l_ref[j, j, :][None, :]


def _to_lane_last(x: Array) -> Array:
    """(B, ...) -> (..., B) with B padded to LANE multiple."""
    x = jnp.moveaxis(x, 0, -1)
    return _pad_to(x, LANE, -1)


def cholesky_batched(H: Array) -> Array:
    """Batched Cholesky of SPD matrices: (B, n, n) -> lower L (B, n, n)."""
    B, n, _ = H.shape
    if n > LANE:
        return jnp.linalg.cholesky(H)
    # pad n to a multiple of 8 with identity diagonal (keeps SPD)
    npad = (-n) % 8
    if npad:
        H = jnp.pad(H, ((0, 0), (0, npad), (0, npad)))
        idx = jnp.arange(n, n + npad)
        H = H.at[:, idx, idx].set(1.0)
    nn = n + npad
    Ht = _to_lane_last(H)  # (nn, nn, Bp)
    Bp = Ht.shape[-1]
    out = pl.pallas_call(
        partial(_chol_kernel, nn),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((nn, nn, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (nn, nn, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nn, nn, Bp), H.dtype),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(Ht)
    L = jnp.moveaxis(out, -1, 0)[:B, :n, :n]
    return jnp.tril(L)


def cholesky_solve_batched(L: Array, rhs: Array) -> Array:
    """Solve L L' x = rhs; L (B, n, n) lower, rhs (B, n) or (B, n, k)."""
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]
    B, n, k = rhs.shape
    if n > LANE:
        out = jax.scipy.linalg.cho_solve((L, True), rhs)
        return out[..., 0] if vec else out
    npad = (-n) % 8
    kpad = (-k) % 8
    nn, kk = n + npad, k + kpad
    if npad:
        L = jnp.pad(L, ((0, 0), (0, npad), (0, npad)))
        idx = jnp.arange(n, nn)
        L = L.at[:, idx, idx].set(1.0)
    if npad or kpad:
        rhs = jnp.pad(rhs, ((0, 0), (0, npad), (0, kpad)))
    Lt = _to_lane_last(L)
    Rt = _to_lane_last(rhs)
    Bp = Lt.shape[-1]
    out = pl.pallas_call(
        partial(_solve_kernel, nn, kk),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((nn, nn, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, kk, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nn, kk, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nn, kk, Bp), rhs.dtype),
        scratch_shapes=[pltpu.VMEM((nn, kk, LANE), rhs.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(Lt, Rt)
    x = jnp.moveaxis(out, -1, 0)[:B, :n, :k]
    return x[..., 0] if vec else x


def psd_solve_batched(H: Array, rhs: Array) -> Array:
    """Fused convenience: solve SPD H x = rhs batched."""
    return cholesky_solve_batched(cholesky_batched(H), rhs)


# ---------------------------------------------------------------------------
# Unpivoted LDL' for symmetric quasi-definite matrices (Vanderbei): the
# symmetrized KKT systems are strongly factorizable, so no pivoting is needed.
# Same batch-along-lanes layout as the Cholesky kernels.
# ---------------------------------------------------------------------------


def _ldl_kernel(n: int, h_ref, l_ref, d_ref):
    """Right-looking LDL' on (n, n, LANE): A = L D L' with unit-lower L.
    In-place in the output buffer (input aliased); stale upper triangle."""
    l_ref[:] = h_ref[:]
    for j in range(n):
        dj = l_ref[j, j, :]  # (LANE,)
        d_ref[j, :] = dj
        inv = 1.0 / dj
        col = l_ref[j:, j, :] * inv[None, :]  # unit diagonal at row j
        l_ref[j:, j, :] = col
        if j + 1 < n:
            sub = col[1:]
            l_ref[j + 1 :, j + 1 :, :] = l_ref[j + 1 :, j + 1 :, :] - (
                sub[:, None, :] * sub[None, :, :] * dj[None, None, :]
            )


def _ldl_solve_kernel(n: int, k: int, l_ref, d_ref, rhs_ref, out_ref, y_ref):
    """Solve L D L' x = rhs; rhs (n, k, LANE)."""
    for j in range(n):
        acc = rhs_ref[j]
        if j > 0:
            lrow = l_ref[j, :j, :]
            acc = acc - jnp.sum(lrow[:, None, :] * y_ref[:j], axis=0)
        y_ref[j] = acc  # unit diagonal
    for j in range(n - 1, -1, -1):
        acc = y_ref[j] / d_ref[j, :][None, :]
        if j + 1 < n:
            lcol = l_ref[j + 1 :, j, :]
            acc = acc - jnp.sum(lcol[:, None, :] * out_ref[j + 1 :], axis=0)
        out_ref[j] = acc


def ldl_batched(K: Array):
    """Batched LDL' of symmetric quasi-definite matrices: (B, n, n) ->
    (L unit-lower (B, n, n), d (B, n))."""
    B, n, _ = K.shape
    npad = (-n) % 8
    if npad:
        K = jnp.pad(K, ((0, 0), (0, npad), (0, npad)))
        idx = jnp.arange(n, n + npad)
        K = K.at[:, idx, idx].set(1.0)
    nn = n + npad
    if nn > LANE:
        # fallback: eigh-free dense LU path
        raise NotImplementedError("ldl_batched supports n <= 128")
    Kt = _to_lane_last(K)
    Bp = Kt.shape[-1]
    L, d = pl.pallas_call(
        partial(_ldl_kernel, nn),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((nn, nn, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((nn, nn, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nn, nn, Bp), K.dtype),
            jax.ShapeDtypeStruct((nn, Bp), K.dtype),
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(Kt)
    return (
        jnp.tril(jnp.moveaxis(L, -1, 0)[:B, :n, :n]),
        jnp.moveaxis(d, -1, 0)[:B, :n],
    )


def ldl_solve_batched(L: Array, d: Array, rhs: Array) -> Array:
    """Solve L D L' x = rhs; L (B, n, n), d (B, n), rhs (B, n) or (B, n, k)."""
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]
    B, n, k = rhs.shape
    npad = (-n) % 8
    kpad = (-k) % 8
    nn, kk = n + npad, k + kpad
    if npad:
        L = jnp.pad(L, ((0, 0), (0, npad), (0, npad)))
        idx = jnp.arange(n, nn)
        L = L.at[:, idx, idx].set(1.0)
        d = jnp.pad(d, ((0, 0), (0, npad)), constant_values=1.0)
    if npad or kpad:
        rhs = jnp.pad(rhs, ((0, 0), (0, npad), (0, kpad)))
    Lt = _to_lane_last(L)
    dtl = _to_lane_last(d)
    Rt = _to_lane_last(rhs)
    Bp = Lt.shape[-1]
    out = pl.pallas_call(
        partial(_ldl_solve_kernel, nn, kk),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((nn, nn, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nn, kk, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nn, kk, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nn, kk, Bp), rhs.dtype),
        scratch_shapes=[pltpu.VMEM((nn, kk, LANE), rhs.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(Lt, dtl, Rt)
    x = jnp.moveaxis(out, -1, 0)[:B, :n, :k]
    return x[..., 0] if vec else x
