"""Batched eigendecomposition of SMALL symmetric matrices via cyclic Jacobi.

XLA lowers ``jnp.linalg.eigh`` to a QR-algorithm path that is catastrophically
slow for large batches of tiny matrices on TPU (the shape class every PSD
cone block produces: d <= ~8, batch 10^3..10^5). Cyclic Jacobi with a static
number of sweeps is the TPU-native answer: each (p, q) rotation is a handful
of elementwise VPU ops over the whole batch, the pair loop unrolls at trace
time (d(d-1)/2 pairs per sweep), and convergence is quadratic — 6-10 sweeps
reach fp precision for d <= 8 (verified against ``jnp.linalg.eigh``).

Replaces ``jnp.linalg.eigh``/``eigvalsh`` in the PSD-cone hot paths
(``solvers/conic_ipm.py`` NT scaling, ``cones.py`` projections). The
reference delegates these eigendecompositions to LAPACK via
MathOptSetDistances (``/root/reference/src/diff_opt.jl:509-519``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# Past this side length the unrolled pair loop stops paying for itself and
# LAPACK/XLA eigh wins; PSD blocks in this framework are tiny in practice.
MAX_JACOBI_SIDE = 12


def _sweeps_for(d: int, dtype) -> int:
    # quadratic convergence: off(A) ~ squares every sweep once ordered;
    # measured: d<=4 needs ~6 sweeps to f64 roundoff, d<=12 ~10
    base = 6 if d <= 4 else (8 if d <= 8 else 10)
    return base if dtype == jnp.float32 else base + 2


def jacobi_eigh(A: Array, sweeps: int | None = None):
    """Eigendecomposition ``A = V diag(w) V^T`` of a symmetric (..., d, d)
    batch. Eigenvalues are NOT sorted (every in-repo consumer is order-free:
    eigenvalue floors, matrix functions, min/max reductions)."""
    d = A.shape[-1]
    dt = A.dtype
    if sweeps is None:
        sweeps = _sweeps_for(d, dt)
    if d == 1:
        return A[..., 0, 0][..., None], jnp.ones(A.shape, dt)

    V = jnp.broadcast_to(jnp.eye(d, dtype=dt), A.shape)
    for _ in range(sweeps):
        for p in range(d - 1):
            for q in range(p + 1, d):
                app = A[..., p, p]
                aqq = A[..., q, q]
                apq = A[..., p, q]
                # rotation zeroing A[p,q]: theta = 1/2 atan2(2 apq, aqq - app)
                theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
                c = jnp.cos(theta)[..., None]
                s = jnp.sin(theta)[..., None]
                # A <- J^T A J with J the (p,q) Givens rotation
                rowp = A[..., p, :]
                rowq = A[..., q, :]
                A = A.at[..., p, :].set(c * rowp - s * rowq)
                A = A.at[..., q, :].set(s * rowp + c * rowq)
                colp = A[..., :, p]
                colq = A[..., :, q]
                A = A.at[..., :, p].set(c * colp - s * colq)
                A = A.at[..., :, q].set(s * colp + c * colq)
                vp = V[..., :, p]
                vq = V[..., :, q]
                V = V.at[..., :, p].set(c * vp - s * vq)
                V = V.at[..., :, q].set(s * vp + c * vq)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


def eigh_small(A: Array):
    """Drop-in ``(w, V) = eigh(A)`` that routes tiny sides through Jacobi and
    everything else through ``jnp.linalg.eigh`` (eigenvalues unsorted on the
    Jacobi path — consumers must be order-free)."""
    if A.shape[-1] <= MAX_JACOBI_SIDE:
        return jacobi_eigh(A)
    return jnp.linalg.eigh(A)


def eigvalsh_small(A: Array) -> Array:
    if A.shape[-1] <= MAX_JACOBI_SIDE:
        return jacobi_eigh(A)[0]
    return jnp.linalg.eigvalsh(A)
