"""Dense linear-algebra substrate for the differentiation rules.

The reference delegates its hot solves to UMFPACK LU / IterativeSolvers.lsqr
(``QuadraticProgram.jl:486-492``, ``NonLinearProgram.jl:406``). On TPU the
per-instance systems are small-to-medium dense matrices batched over many
instances, so the natural mapping is batched dense factorizations on the MXU.

``solve`` routes between:
  * ``lu``    — batched LU via ``jax.scipy.linalg.lu_factor`` (XLA batched LU)
  * ``lstsq`` — minimum-norm least-squares via normal equations with Tikhonov
                fallback, robust for the singular LP-KKT case the reference
                handles with lsqr (``QuadraticProgram.jl:333-335,486-492``)
  * ``qr``    — batched QR solve
plus optional fixed-point iterative refinement to recover near-f64 accuracy
from f32 factorizations on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from ..utils.precision import full_precision

Array = jax.Array


def lu_solve_dense(M: Array, rhs: Array) -> Array:
    """Batched dense LU solve; rhs may be (..., n) or (..., n, k)."""
    vec = rhs.ndim == M.ndim - 1
    if vec:
        rhs = rhs[..., None]
    out = jnp.linalg.solve(M, rhs)
    return out[..., 0] if vec else out


def qr_solve_dense(M: Array, rhs: Array) -> Array:
    vec = rhs.ndim == M.ndim - 1
    if vec:
        rhs = rhs[..., None]
    Q, R = jnp.linalg.qr(M)
    out = jax.scipy.linalg.solve_triangular(
        R, jnp.swapaxes(Q, -1, -2) @ rhs, lower=False
    )
    return out[..., 0] if vec else out


def lstsq_solve_dense(M: Array, rhs: Array, ridge: float = 0.0) -> Array:
    """Minimum-norm least-squares solve of a (possibly singular) square system.

    Solves ``(M'M + ridge*I) x = M' rhs`` via Cholesky-free LU on the regular
    normal system; with ridge=0 and a singular M this still returns a
    least-squares solution whenever the normal matrix is invertible on the
    row space — matching the role of ``IterativeSolvers.lsqr`` in the
    reference. For hard-singular normal matrices pass a tiny ridge.
    """
    vec = rhs.ndim == M.ndim - 1
    if vec:
        rhs = rhs[..., None]
    Mt = jnp.swapaxes(M, -1, -2)
    n = M.shape[-1]
    gram = Mt @ M
    if ridge:
        gram = gram + ridge * jnp.eye(n, dtype=M.dtype)
    out = _solve_psd_with_pinv_fallback(gram, Mt @ rhs)
    return out[..., 0] if vec else out


def _solve_psd_with_pinv_fallback(G: Array, rhs: Array) -> Array:
    """Solve G x = rhs for PSD G, falling back to eigh-pinv if singular."""
    w, U = jnp.linalg.eigh(G)
    tol = jnp.asarray(jnp.finfo(G.dtype).eps, G.dtype) * G.shape[-1]
    wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    inv_w = jnp.where(w > tol * wmax, 1.0 / jnp.where(w != 0, w, 1.0), 0.0)
    Ut = jnp.swapaxes(U, -1, -2)
    return U @ (inv_w[..., None] * (Ut @ rhs))


def refine(M: Array, rhs: Array, x: Array, solve_fn, iters: int = 2) -> Array:
    """Iterative refinement: improves ``x ~= M^-1 rhs`` using ``solve_fn`` as
    the (approximate) inner solver. Residuals and the solution estimate are
    accumulated in :func:`~diffopt_tpu.utils.precision.residual_dtype` (f64
    where x64 is live), so the refined f32 forward error floors near the f32
    storage epsilon rather than ``cond(M) * eps_f32``."""
    from ..utils.precision import residual_dtype

    vec = rhs.ndim == M.ndim - 1
    wdt = M.dtype
    rdt = residual_dtype(wdt)
    Mr = M.astype(rdt)
    rhsr = rhs.astype(rdt)

    def body(xr, _):
        r = rhsr - ((Mr @ xr[..., None])[..., 0] if vec else Mr @ xr)
        return xr + solve_fn(M, r.astype(wdt)).astype(rdt), None

    xr, _ = jax.lax.scan(body, x.astype(rdt), None, length=iters)
    return xr.astype(wdt)


@full_precision
def solve(
    M: Array,
    rhs: Array,
    method="lu",
    *,
    refine_iters: int = 0,
    ridge: float = 0.0,
) -> Array:
    """Front door used by the diff rules (reference ``solve_system``,
    ``QuadraticProgram.jl:486-492``). ``method`` may also be a callable
    ``(M, rhs) -> x`` — the reference's pluggable ``LinearAlgebraSolver``
    optimizer attribute (``QuadraticProgram.jl:475-502``)."""
    if callable(method):
        fn = method
    elif method == "lu":
        fn = lu_solve_dense
    elif method == "qr":
        fn = qr_solve_dense
    elif method == "lstsq":
        fn = partial(lstsq_solve_dense, ridge=ridge)
    else:
        raise ValueError(f"unknown solve method {method!r}")
    x = fn(M, rhs)
    if refine_iters:
        x = refine(M, rhs, x, fn, iters=refine_iters)
    return x


def tri_solve(L: Array, rhs: Array, lower: bool = True, trans: bool = False) -> Array:
    return jax.scipy.linalg.solve_triangular(
        L, rhs, lower=lower, trans=1 if trans else 0
    )
