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


def jacobi_eigh(A: Array, sweeps: int | None = None, vectors: bool = True):
    """Eigendecomposition ``A = V diag(w) V^T`` of a symmetric (..., d, d)
    batch. Eigenvalues are NOT sorted (every in-repo consumer is order-free:
    eigenvalue floors, matrix functions, min/max reductions).

    Rotations use the Rutishauser tangent formula ``t = sign(tau) /
    (|tau| + sqrt(1 + tau^2))`` instead of ``atan2``/``cos``/``sin`` — the
    classical-Jacobi angle computed with two sqrts and a divide, no
    transcendental-unit traffic (the PSD IPM issues ~10 of these per Newton
    iteration; the trig path was ~3 transcendentals x d(d-1)/2 pairs x
    sweeps per call). ``vectors=False`` skips the V accumulation
    (eigenvalue-only consumers: step-to-boundary minima, cone membership)."""
    d = A.shape[-1]
    dt = A.dtype
    if sweeps is None:
        sweeps = _sweeps_for(d, dt)
    if d == 1:
        w = A[..., 0, 0][..., None]
        return (w, jnp.ones(A.shape, dt)) if vectors else (w, None)

    eps = jnp.asarray(jnp.finfo(dt).eps, dt)
    V = jnp.broadcast_to(jnp.eye(d, dtype=dt), A.shape) if vectors else None
    for _ in range(sweeps):
        for p in range(d - 1):
            for q in range(p + 1, d):
                app = A[..., p, p]
                aqq = A[..., q, q]
                apq = A[..., p, q]
                # Rutishauser: tan(theta) of the angle zeroing A[p,q] is the
                # smaller-magnitude root of t^2 + 2 tau t - 1 = 0.
                # Skip (t = 0) once apq is negligible RELATIVE to the
                # diagonal — the rotation is a no-op in working precision,
                # and differentiating through it is the hazard: for
                # apq ~ 1e-196 (post-convergence), d(tau)/d(apq) divides by
                # apq^2 which UNDERFLOWS, turning jacfwd through the sweep
                # into inf/inf = NaN (measured on an all-negative-spectrum
                # projection input)
                small = jnp.abs(apq) <= eps * (jnp.abs(app) + jnp.abs(aqq))
                apq_s = jnp.where(small, 1.0, apq)
                tau = 0.5 * (aqq - app) / apq_s
                # hypot, not sqrt(1+tau^2): tau^2 overflows for near-zero
                # apq and the overflow turns jacfwd THROUGH the sweep into
                # inf/inf = NaN (cones.py consumers differentiate the
                # projection as an oracle in tests)
                t = jnp.where(
                    small,
                    0.0,
                    jnp.where(tau >= 0, 1.0, -1.0)
                    / (jnp.abs(tau) + jnp.hypot(1.0, tau)),
                )
                ct = jnp.hypot(1.0, t)
                c = (1.0 / ct)[..., None]
                s = (t / ct)[..., None]
                # A <- J^T A J with J the (p,q) Givens rotation
                rowp = A[..., p, :]
                rowq = A[..., q, :]
                A = A.at[..., p, :].set(c * rowp - s * rowq)
                A = A.at[..., q, :].set(s * rowp + c * rowq)
                colp = A[..., :, p]
                colq = A[..., :, q]
                A = A.at[..., :, p].set(c * colp - s * colq)
                A = A.at[..., :, q].set(s * colp + c * colq)
                if vectors:
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
        return jacobi_eigh(A, vectors=False)[0]
    return jnp.linalg.eigvalsh(A)
