"""Matrix-free LSQR (Paige & Saunders) on linear operators.

TPU-native replacement for ``IterativeSolvers.lsqr`` — the solver the
reference uses on its singular systems (``QuadraticProgram.jl:488``,
``ConicProgram.jl:323,372``). Works on a pair of closures ``(matvec,
rmatvec)`` so the conic residual operator M can be applied blockwise (A, A',
DPi) without materializing M; fixed-shape ``lax.while_loop`` with
convergence masking, batchable under ``vmap``.

Returns the minimum-norm least-squares solution for singular/inconsistent
systems — the property the QP backend relies on for LPs
(``QuadraticProgram.jl:333-335``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from ..utils.precision import full_precision

Array = jax.Array


class LSQRResult(NamedTuple):
    x: Array
    iterations: Array
    residual_norm: Array  # ||A'r|| — the least-squares optimality measure
    converged: Array


class _State(NamedTuple):
    x: Array
    u: Array
    v: Array
    w: Array
    alpha: Array
    beta: Array
    rhobar: Array
    phibar: Array
    it: Array
    done: Array
    arnorm: Array
    best_x: Array
    best_arnorm: Array


def _normalize(v: Array) -> Tuple[Array, Array]:
    n = jnp.linalg.norm(v)
    safe = jnp.where(n > 0, n, 1.0)
    return v / safe, n


@full_precision
def lsqr(
    matvec: Callable[[Array], Array],
    rmatvec: Callable[[Array], Array],
    b: Array,
    x_size: int,
    *,
    max_iters: int = 200,
    atol: float | None = None,
) -> LSQRResult:
    """Solve ``min ||A x - b||_2`` with ``A`` given as (matvec, rmatvec)."""
    dt = b.dtype
    if atol is None:
        atol = 1e-10 if dt == jnp.float64 else 1e-5

    u, beta = _normalize(b)
    v, alpha = _normalize(rmatvec(u))
    x0 = jnp.zeros((x_size,), dt)
    st = _State(
        x=x0,
        u=u,
        v=v,
        w=v,
        alpha=alpha,
        beta=beta,
        rhobar=alpha,
        phibar=beta,
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(alpha * beta == 0),
        arnorm=alpha * beta,
        best_x=x0,
        best_arnorm=alpha * beta,
    )
    arnorm0 = st.arnorm

    def cond(st: _State):
        return jnp.logical_and(st.it < max_iters, jnp.logical_not(st.done))

    def body(st: _State) -> _State:
        # bidiagonalization
        u, beta = _normalize(matvec(st.v) - st.alpha * st.u)
        v, alpha = _normalize(rmatvec(u) - beta * st.v)
        # orthogonal transformation
        rho = jnp.sqrt(st.rhobar**2 + beta**2)
        c = st.rhobar / rho
        s = beta / rho
        theta = s * alpha
        rhobar = -c * alpha
        phi = c * st.phibar
        phibar = s * st.phibar
        x = st.x + (phi / rho) * st.w
        w = v - (theta / rho) * st.w
        arnorm = alpha * jnp.abs(s * st.phibar)
        # keep the best iterate: after a rank breakdown (alpha or beta ~ 0)
        # the recurrences amplify noise, so never return a worse x than seen
        better = arnorm < st.best_arnorm
        best_x = jnp.where(better, x, st.best_x)
        best_arnorm = jnp.where(better, arnorm, st.best_arnorm)
        done = arnorm <= atol * jnp.maximum(arnorm0, 1.0)
        return _State(
            x, u, v, w, alpha, beta, rhobar, phibar, st.it + 1, done, arnorm,
            best_x, best_arnorm,
        )

    st = jax.lax.while_loop(cond, body, st)
    return LSQRResult(
        x=st.best_x,
        iterations=st.it,
        residual_norm=st.best_arnorm,
        converged=st.done,
    )


@full_precision
def lsqr_dense(M: Array, b: Array, **kw) -> LSQRResult:
    """LSQR on a materialized matrix (drop-in for the reference's
    ``lsqr(M, rhs)`` calls)."""
    return lsqr(lambda x: M @ x, lambda y: M.T @ y, b, M.shape[-1], **kw)
