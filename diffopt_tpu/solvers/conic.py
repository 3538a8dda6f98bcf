"""Batched conic solver: ADMM on the homogeneous self-dual embedding (SCS).

The reference differentiates solutions produced by SCS; a TPU-native framework
owns the solve. This is the O'Donoghue et al. splitting: with

    Q = [ 0   A'  c ]
        [-A   0   b ]
        [-c' -b'  0 ]     (skew-symmetric, (n+m+1)^2)

iterate::

    ut = (I + Q)^{-1} (u + v)          # one dense solve, factor cached
    u  = Pi_C(2 ut - (u + v))          # C = R^n x K* x R+
    v  = v + u - 2 ut + (u + v) - ...  # standard DR update: v += u - ut*2 + (u+v) ... see body

and recover ``x = u_x / tau, y = u_y / tau, s = v_y / tau``.

(I+Q) is constant, so the LU factor is computed once and every iteration is a
triangular solve + cone projection: pure MXU/VPU work that batches perfectly
under ``vmap``. Over-relaxation (alpha=1.5) is applied for faster convergence.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import cones as _cones
from ..ir import ConeProgram, ConeSolution

Array = jax.Array


class ConicSolveInfo(NamedTuple):
    iterations: Array
    primal_residual: Array
    dual_residual: Array
    gap: Array
    converged: Array


def _build_Q(cp: ConeProgram) -> Array:
    n, m = cp.num_vars, cp.num_rows
    A, b, c = cp.A, cp.b, cp.c
    dt = A.dtype
    row0 = jnp.concatenate(
        [jnp.zeros((n, n), dt), A.T, c[:, None]], axis=1
    )
    row1 = jnp.concatenate([-A, jnp.zeros((m, m), dt), b[:, None]], axis=1)
    row2 = jnp.concatenate([-c[None, :], -b[None, :], jnp.zeros((1, 1), dt)], axis=1)
    return jnp.concatenate([row0, row1, row2], axis=0)


def _proj_C(cp: ConeProgram, u: Array) -> Array:
    """Project onto C = R^n x K* x R+ (u-space cone of the embedding)."""
    n, m = cp.num_vars, cp.num_rows
    ux, uy, ut = u[:n], u[n : n + m], u[n + m :]
    uy = _cones.pi(cp.cones, uy)
    ut = jnp.clip(ut, min=0.0)
    return jnp.concatenate([ux, uy, ut])



def _ruiz_scales(cp: ConeProgram, iters: int = 10):
    """Ruiz equilibration scales (D rows, E cols) for A, block-uniform on
    non-polyhedral cone rows so s in K is preserved (SCS-style scaling)."""
    A = jnp.abs(cp.A)
    m, n = A.shape
    dt = A.dtype
    # per-row group id: polyhedral rows scale independently; soc/psd/exp rows
    # share their block's scale
    import numpy as np

    gid = np.zeros(m, int)
    g = 0
    for kind, off, dim in cp.cones.offsets():
        if kind in ("zero", "nonneg", "nonpos"):
            for r in range(off, off + dim):
                gid[r] = g
                g += 1
        else:
            for r in range(off, off + dim):
                gid[r] = g
            g += 1
    gid = jnp.asarray(gid)
    ngroups = g

    D = jnp.ones((m,), dt)
    E = jnp.ones((n,), dt)
    for _ in range(iters):
        As = D[:, None] * A * E[None, :]
        rnorm = jnp.max(As, axis=1)
        # group max then broadcast back
        gmax = jnp.zeros((ngroups,), dt).at[gid].max(rnorm)
        rnorm = gmax[gid]
        D = D / jnp.sqrt(jnp.maximum(rnorm, 1e-8))
        cnorm = jnp.max(D[:, None] * A * E[None, :], axis=0)
        E = E / jnp.sqrt(jnp.maximum(cnorm, 1e-8))
    return D, E


class _State(NamedTuple):
    u: Array
    v: Array
    it: Array
    done: Array


def _aa_extrapolate(X, F, x, f, reg=1e-10):
    """Type-II Anderson extrapolation from rolling histories (columns oldest
    to newest) of iterates X and fixed-point residuals F at the current
    (x, f). Returns x_aa = x + f - (dX + dF) theta with theta from the small
    regularized least-squares problem."""
    dF = F[:, 1:] - F[:, :-1]
    dX = X[:, 1:] - X[:, :-1]
    G = dF.T @ dF + reg * jnp.eye(dF.shape[1], dtype=X.dtype)
    theta = jnp.linalg.solve(G, (dF.T @ f)[:, None])[:, 0]
    return x + f - (dX + dF) @ theta


def solve(
    cp: ConeProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    alpha: float | None = None,
    check_every: int = 25,
    equilibrate: bool = False,
    accel: bool = False,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    """Solve one conic instance (vmap over batches). ``equilibrate`` applies
    SCS-style Ruiz scaling (block-uniform on non-polyhedral rows) before the
    splitting and unscales the returned solution — residuals are re-checked
    on the ORIGINAL data. Off by default: without SCS's sigma/rho step-size
    tuning it often slows DR convergence (measured); useful escape hatch for
    pathologically scaled data.

    ``max_iters``/``tol``/``alpha`` default from the active config; ``tol``
    is dtype-aware (a 1e-10 target can never converge in f32 — the iterate
    would burn all iterations and report ``converged=False`` at f32 accuracy).
    """
    from ..utils.config import get_config

    cfg = get_config()
    dt = cp.A.dtype
    if max_iters is None:
        max_iters = cfg.dr_max_iters
    if tol is None:
        tol = cfg.dr_tol(dt)
    elif dt != jnp.float64:
        tol = max(tol, cfg.dr_tol_f32)
    if alpha is None:
        alpha = cfg.dr_relaxation
    # TPU XLA matmuls default to bf16 inputs; the DR fixed-point map is one
    # matmul per iteration and its residual checks need real f32
    with jax.default_matmul_precision("highest"):
        return _solve_impl(
            cp, max_iters=max_iters, tol=tol, alpha=alpha,
            check_every=check_every, equilibrate=equilibrate, accel=accel,
        )


def _solve_impl(
    cp: ConeProgram,
    *,
    max_iters: int,
    tol: float,
    alpha: float,
    check_every: int,
    equilibrate: bool,
    accel: bool,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    if equilibrate:
        D, E = _ruiz_scales(cp)
        cp_s = ConeProgram(
            A=D[:, None] * cp.A * E[None, :],
            b=D * cp.b,
            c=E * cp.c,
            cones=cp.cones,
        )
        sol_s, info = solve(
            cp_s,
            max_iters=max_iters,
            tol=tol,
            alpha=alpha,
            check_every=check_every,
            equilibrate=False,
            accel=accel,
        )
        sol = ConeSolution(x=E * sol_s.x, y=D * sol_s.y, s=sol_s.s / D)
        # recompute convergence on original data
        pres = jnp.linalg.norm(cp.A @ sol.x + sol.s - cp.b) / (
            1.0 + jnp.linalg.norm(cp.b)
        )
        dres = jnp.linalg.norm(cp.A.T @ sol.y + cp.c) / (
            1.0 + jnp.linalg.norm(cp.c)
        )
        pobj = jnp.dot(cp.c, sol.x)
        dobj = -jnp.dot(cp.b, sol.y)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        conv = jnp.logical_and(
            pres < 100 * tol, jnp.logical_and(dres < 100 * tol, gap < 100 * tol)
        )
        return sol, ConicSolveInfo(
            iterations=info.iterations,
            primal_residual=pres,
            dual_residual=dres,
            gap=gap,
            converged=conv,
        )
    n, m = cp.num_vars, cp.num_rows
    N = n + m + 1
    dt = cp.A.dtype
    Q = _build_Q(cp)
    IQ = jnp.eye(N, dtype=dt) + Q
    # (I+Q) is fixed: precompute the dense inverse once so every ADMM
    # iteration is a single MXU matmul instead of pivoted triangular solves
    IQinv = jnp.linalg.inv(IQ)

    u0 = jnp.zeros((N,), dt).at[-1].set(1.0)
    v0 = jnp.zeros((N,), dt).at[-1].set(1.0)

    def residuals(u, v):
        tau = jnp.maximum(u[-1], 1e-12)
        x = u[:n] / tau
        y = u[n : n + m] / tau
        s = v[n : n + m] / tau
        pres = jnp.linalg.norm(cp.A @ x + s - cp.b) / (1.0 + jnp.linalg.norm(cp.b))
        dres = jnp.linalg.norm(cp.A.T @ y + cp.c) / (1.0 + jnp.linalg.norm(cp.c))
        pobj = jnp.dot(cp.c, x)
        dobj = -jnp.dot(cp.b, y)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return pres, dres, gap

    def dr_map(x):
        """One Douglas-Rachford step as a fixed-point map on the pair
        x = concat(u, v)."""
        u, v = x[:N], x[N:]
        ut = IQinv @ (u + v)
        ut_relaxed = alpha * ut + (1 - alpha) * u
        u_new = _proj_C(cp, ut_relaxed - v)
        v_new = v - ut_relaxed + u_new
        return jnp.concatenate([u_new, v_new])

    AA_MEM = 5

    def body(st: _State) -> _State:
        if not accel:
            def one_iter(x, _):
                return dr_map(x), None

            x, _ = jax.lax.scan(
                one_iter, jnp.concatenate([st.u, st.v]), None, length=check_every
            )
        else:
            # Safeguarded type-II Anderson acceleration (SCS 3.x style): an
            # extrapolated candidate is taken only when its fixed-point
            # residual beats the plain step's (costs a second map eval).
            # ~3x fewer iterations measured, but OFF by default on TPU: the
            # per-iteration small least-squares is latency-bound there and
            # wipes out the gain for small instances (useful on CPU/f64).
            def one_iter(carry, _):
                x, X, F = carry
                gx = dr_map(x)
                f = gx - x
                X = jnp.concatenate([X[:, 1:], x[:, None]], axis=1)
                F = jnp.concatenate([F[:, 1:], f[:, None]], axis=1)
                x_aa = _aa_extrapolate(X, F, x, f)
                g_aa = dr_map(x_aa)
                take = jnp.linalg.norm(g_aa - x_aa) < jnp.linalg.norm(f)
                x_next = jnp.where(take, g_aa, gx)
                return (x_next, X, F), None

            x0 = jnp.concatenate([st.u, st.v])
            X0 = jnp.tile(x0[:, None], (1, AA_MEM))
            F0 = jnp.zeros((2 * N, AA_MEM), dt)
            (x, _, _), _ = jax.lax.scan(
                one_iter, (x0, X0, F0), None, length=check_every
            )
        u, v = x[:N], x[N:]
        pres, dres, gap = residuals(u, v)
        done = jnp.logical_and(pres < tol, jnp.logical_and(dres < tol, gap < tol))
        return _State(u, v, st.it + check_every, done)

    def cond(st: _State):
        return jnp.logical_and(st.it < max_iters, jnp.logical_not(st.done))

    st = jax.lax.while_loop(
        cond, body, _State(u0, v0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )

    tau = jnp.maximum(st.u[-1], 1e-12)
    x = st.u[:n] / tau
    y = st.u[n : n + m] / tau
    s = st.v[n : n + m] / tau
    pres, dres, gap = residuals(st.u, st.v)
    info = ConicSolveInfo(
        iterations=st.it,
        primal_residual=pres,
        dual_residual=dres,
        gap=gap,
        converged=jnp.logical_and(
            pres < 10 * tol, jnp.logical_and(dres < 10 * tol, gap < 10 * tol)
        ),
    )
    return ConeSolution(x=x, y=y, s=s), info


def solve_batched(cp: ConeProgram, **kw) -> Tuple[ConeSolution, ConicSolveInfo]:
    fn = partial(solve, **kw)
    ndim = cp.c.ndim
    for _ in range(ndim - 1):
        fn = jax.vmap(fn)
    return fn(cp)
