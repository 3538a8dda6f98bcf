"""Conic program implicit differentiation (Agrawal et al. 2019).

TPU-native rebuild of the reference ConicProgram backend
(``/root/reference/src/ConicProgram/ConicProgram.jl``): differentiate the
solution map of ``min c'x s.t. Ax + s = b, s in K`` through the normalized
residual map of the homogeneous self-dual embedding.

Math (``ConicProgram.jl:217-254``): with the optimal ``(x, y, s)`` set
``u = x``, ``v = y - s``, ``w = 1``; ``Dpi = DPi_{K*}(v)``; and::

    M = [  0        A' Dpi   c ]
        [ -A      -Dpi + I   b ]
        [ -c'     -b' Dpi    0 ]

* forward (``ConicProgram.jl:257-334``): rhs = [dA'pi(v) + dc; -dA u + db;
  -<dc,u> - <db,pi(v)>]; dz = M^+ rhs; dx = -(du - x dw),
  dy = -(Dpi dv - y dw), ds = -(Dpi dv - dv - s dw).
* reverse (``ConicProgram.jl:336-394``): dz = [dx; Dpi'(dy+ds) - ds;
  -x'dx - y'dy - s'ds]; g = M^+ dz; with pz = [u; pi(v); 1]:
  dA_ij = g[n+i] pz[j] - pz[n+i] g[j]; db = g_m - g[end] pz_m;
  dc = g_n - g[end] pz_n  (rank-2/rank-1 reads of -g pz',
  ``ConicProgram.jl:396-443``).

``M`` is square but singular in general; the reference uses lsqr. Here the
default is a dense least-squares solve (batched-friendly); a matrix-free LSQR
over the implicit operator is in :mod:`diffopt_tpu.ops.lsqr` for large m+n.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import cones as _cones
from .cones import ConeSpec
from .ir import ConeProgram, ConeSolution, ConeTangent
from .ops import linalg
from .utils.precision import full_precision

Array = jax.Array


class ConeForward(NamedTuple):
    dx: Array
    dy: Array
    ds: Array


@full_precision
def residual_matrix(cp: ConeProgram, sol: ConeSolution) -> Array:
    """Materialize M (the reference's gradient cache, ``ConicProgram.jl:
    243-247``)."""
    A, b, c = cp.A, cp.b, cp.c
    n, m = cp.num_vars, cp.num_rows
    v = sol.y - sol.s
    Dpi = _cones.dpi_dense(cp.cones, v)
    At = jnp.swapaxes(A, -1, -2)
    eye_m = jnp.eye(m, dtype=A.dtype)
    row0 = jnp.concatenate(
        [jnp.zeros(A.shape[:-2] + (n, n), A.dtype), At @ Dpi, c[..., :, None]],
        axis=-1,
    )
    row1 = jnp.concatenate([-A, -Dpi + eye_m, b[..., :, None]], axis=-1)
    row2 = jnp.concatenate(
        [
            -c[..., None, :],
            -jnp.einsum("...i,...ij->...j", b, Dpi)[..., None, :],
            jnp.zeros(A.shape[:-2] + (1, 1), A.dtype),
        ],
        axis=-1,
    )
    return jnp.concatenate([row0, row1, row2], axis=-2)


def residual_operator(cp: ConeProgram, sol: ConeSolution):
    """Matrix-free (matvec, rmatvec) for M — applies A, A', and DPi blockwise
    via a *prepared* :func:`diffopt_tpu.cones.dpi_operator` without
    materializing the block-diagonal derivative (crucial for large PSD blocks
    where dense DPi is (tri x tri)); the per-block factorizations (PSD eigh,
    exp/pow linearizations) are hoisted out of the matvecs so LSQR iterations
    don't recompute them."""
    A, b, c = cp.A, cp.b, cp.c
    n, m = cp.num_vars, cp.num_rows
    v = sol.y - sol.s
    dpi_a, dpi_r = _cones.dpi_operator(cp.cones, v)

    def matvec(z):
        zu, zv, zw = z[:n], z[n : n + m], z[n + m]
        dpi_zv = dpi_a(zv)
        top = A.T @ dpi_zv + c * zw
        mid = -A @ zu - dpi_zv + zv + b * zw
        bot = -jnp.dot(c, zu) - jnp.dot(b, dpi_zv)
        return jnp.concatenate([top, mid, bot[None]])

    def rmatvec(z):
        zu, zv, zw = z[:n], z[n : n + m], z[n + m]
        # M' = [0, -A', -c; DPi'A, -DPi'+I, -DPi'b; c', b', 0]
        dpi_t = dpi_r(A @ zu - zv - b * zw)
        top = -A.T @ zv - c * zw
        mid = dpi_t + zv
        bot = jnp.dot(c, zu) + jnp.dot(b, zv)
        return jnp.concatenate([top, mid, bot[None]])

    return matvec, rmatvec


def _solve_M(M: Array, rhs: Array, method: str, refine_iters: int) -> Array:
    return linalg.solve(M, rhs, method, refine_iters=refine_iters)


def resolve_method(cp: ConeProgram, method: str | None = None) -> str:
    """Size-aware dispatch: ``'auto'`` routes to the matrix-free LSQR once
    ``dim(M) = n + m + 1`` exceeds ``config.conic_lsqr_threshold`` —
    materializing M for a side-30 SDP means building (465, 465) dense DPi
    blocks per instance inside every VJP; LSQR (the reference's *only* conic
    path, ``ConicProgram.jl:323,372``) needs matvecs only. Below the
    threshold the dense least-squares solve is both faster and more
    accurate."""
    from .utils.config import get_config

    if method is None:
        method = get_config().conic_method
    if method == "auto":
        N = cp.num_vars + cp.num_rows + 1
        return "lsqr" if N > get_config().conic_lsqr_threshold else "lstsq"
    return method


def _solve_system(
    cp: ConeProgram,
    sol: ConeSolution,
    rhs: Array,
    method: str,
    refine_iters: int,
    transpose: bool,
) -> Array:
    """Solve M z = rhs (or M' z = rhs): dense (materialized) methods, the
    matrix-free 'lsqr' path, or the Pallas 'gram' path (normal equations
    M'M x = M'rhs via the batch-along-lanes Cholesky — the fast batched
    option on TPU; pairs with refinement to absorb the squared condition).
    ``method='auto'`` dispatches by problem size (:func:`resolve_method`)."""
    method = resolve_method(cp, method)
    if method == "lsqr":
        from .ops.lsqr import lsqr
        from .utils.config import get_config

        mv, rmv = residual_operator(cp, sol)
        if transpose:
            mv, rmv = rmv, mv
        return lsqr(
            mv, rmv, rhs, rhs.shape[-1],
            max_iters=get_config().conic_lsqr_iters,
        ).x
    M = residual_matrix(cp, sol)
    if transpose:
        M = jnp.swapaxes(M, -1, -2)
    if method == "gram":
        from .ops.pallas.dispatch import chol, chol_solve

        dt = M.dtype
        N = M.shape[-1]
        # ridge must sit above the rounding noise of forming M'M
        # (~||M||^2 eps), else the f32 Cholesky can meet a negative pivot
        # (NaN); scale-relative, and refinement absorbs the bias
        delta0 = 1e-12 if dt == jnp.float64 else 1e-6
        Mt = jnp.swapaxes(M, -1, -2)
        G = Mt @ M
        scale = jnp.einsum("...ii->...", G)[..., None, None] / N
        G = G + delta0 * (1.0 + scale) * jnp.eye(N, dtype=dt)
        L = chol(G)

        def gsolve(r):
            return chol_solve(L, jnp.einsum("...ij,...i->...j", M, r))

        # refinement residuals accumulate in f64 where x64 is live (the
        # normal equations square cond(M); mixed-precision refinement is
        # what recovers the last f32 digits — see linalg.refine)
        from .utils.precision import residual_dtype

        rdt = residual_dtype(dt)
        Mr = M.astype(rdt)
        rhsr = rhs.astype(rdt)
        x = gsolve(rhs).astype(rdt)
        for _ in range(max(refine_iters, 2)):
            r = rhsr - jnp.einsum("...ij,...j->...i", Mr, x)
            x = x + gsolve(r.astype(dt)).astype(rdt)
        return x.astype(dt)
    return _solve_M(M, rhs, method, refine_iters)


def residual_map(cp: ConeProgram, sol: ConeSolution) -> Array:
    """The HSDE normalized-residual map N(z) = Q Pi(z) - (Pi(z) - z) at
    z = (x, y - s, 1) (Busseti-Moursi-Boyd 2018, "Solution refinement at
    regular points of conic problems"). N(z*) = 0 exactly at a solution, and
    DN(z) is :func:`residual_matrix` — the same M the diff rules solve."""
    A, b, c = cp.A, cp.b, cp.c
    x = sol.x
    v = sol.y - sol.s
    piv = _cones.pi(cp.cones, v)
    # z_w = 1 > 0 so Pi is the identity on the w component and the u - z
    # correction vanishes on the top/bottom blocks
    top = jnp.einsum("...ij,...i->...j", A, piv) + c
    mid = (
        -jnp.einsum("...ij,...j->...i", A, x)
        + b
        - (piv - v)
    )
    bot = (-jnp.sum(c * x, axis=-1) - jnp.sum(b * piv, axis=-1))[..., None]
    return jnp.concatenate([top, mid, bot], axis=-1)


@full_precision
def refine_solution(
    cp: ConeProgram,
    sol: ConeSolution,
    *,
    steps: int = 2,
    method: str = "auto",
) -> ConeSolution:
    """Newton refinement of a conic solution against the HSDE residual map —
    the conic analogue of the QP active-set polish (``ops/kkt.py:qp_polish``).

    An f32 interior-point solve floors at complementarity ~sqrt(eps_f32)
    (~3e-4 relative distance-to-solution under strict complementarity), and
    that floor dominates conic *gradient* error. At a strictly complementary
    solution the residual map N is smooth (v = y - s sits strictly inside the
    differentiable region of Pi for every active regime), so one or two
    Newton steps ``z <- z - DN(z)^+ N(z)`` land at f32-rounding accuracy.
    Steps are guarded per instance: accepted only when ||N|| strictly
    decreases and the homogenizing w stays positive (diffcp's refine plays
    this role for the reference's ecosystem). Unbatched; ``vmap`` to batch.
    """
    from .utils.precision import residual_dtype

    n, m = cp.num_vars, cp.num_rows
    dt = cp.A.dtype
    # Mixed precision: the Newton *residual* N(z) and the iterate z live in
    # the wider accumulation dtype (f64 where x64 is live) while each Newton
    # step is solved in the working dtype. An f32-evaluated residual floors
    # the polish at ~eps_f32 * ||data|| backward error; with f64 residuals
    # the inexact-Newton iteration contracts to the true solution of the
    # (exactly-representable) f32-data program, so the downstream gradient
    # sees a solution wrong only by the final f32 rounding of x/y/s.
    rdt = residual_dtype(dt)
    cpr = ConeProgram(
        A=cp.A.astype(rdt), b=cp.b.astype(rdt), c=cp.c.astype(rdt),
        cones=cp.cones,
    )

    def normalize(z):
        w = z[..., -1]
        wsafe = jnp.where(w > 0, w, 1.0)
        return z / wsafe[..., None], w > 0

    def to_sol(z):
        x = z[..., :n]
        v = z[..., n : n + m]
        piv = _cones.pi(cp.cones, v)
        return ConeSolution(x=x, y=piv, s=piv - v)

    def to_sol_w(z):
        return to_sol(z.astype(dt))

    z = jnp.concatenate(
        [
            sol.x.astype(rdt),
            (sol.y - sol.s).astype(rdt),
            jnp.ones(sol.x.shape[:-1] + (1,), rdt),
        ],
        axis=-1,
    )
    best_res = jnp.linalg.norm(residual_map(cpr, to_sol(z)), axis=-1)
    for _ in range(steps):
        Nz = residual_map(cpr, to_sol(z))
        dz = _solve_system(
            cp, to_sol_w(z), Nz.astype(dt), method, 0, transpose=False
        )
        z_new, w_ok = normalize(z - dz.astype(rdt))
        res_new = jnp.linalg.norm(residual_map(cpr, to_sol(z_new)), axis=-1)
        ok = jnp.logical_and(
            jnp.logical_and(res_new < best_res, w_ok),
            jnp.all(jnp.isfinite(z_new), axis=-1),
        )
        z = jnp.where(ok[..., None], z_new, z)
        best_res = jnp.where(ok, res_new, best_res)
    return to_sol_w(z)


@full_precision
def forward_differentiate(
    cp: ConeProgram,
    sol: ConeSolution,
    dcp: ConeTangent,
    *,
    method: str = "auto",
    refine_iters: int = 0,
) -> ConeForward:
    """JVP of the conic solution map along (dA, db, dc)."""
    n, m = cp.num_vars, cp.num_rows
    x, y, s = sol.x, sol.y, sol.s
    v = y - s
    vp = _cones.pi(cp.cones, v)

    dA, db, dc = dcp.dA, dcp.db, dcp.dc
    rhs = jnp.concatenate(
        [
            jnp.einsum("...ij,...i->...j", dA, vp) + dc,
            -jnp.einsum("...ij,...j->...i", dA, x) + db,
            (-jnp.sum(dc * x, axis=-1) - jnp.sum(db * vp, axis=-1))[..., None],
        ],
        axis=-1,
    )
    dz = _solve_system(cp, sol, rhs, method, refine_iters, transpose=False)
    du, dv, dw = dz[..., :n], dz[..., n : n + m], dz[..., n + m]

    dpidv = _cones.dpi_apply(cp.cones, v, dv)
    dx = -(du - x * dw[..., None])
    dy = -(dpidv - y * dw[..., None])
    ds = -(dpidv - dv - s * dw[..., None])
    return ConeForward(dx=dx, dy=dy, ds=ds)


@full_precision
def reverse_differentiate(
    cp: ConeProgram,
    sol: ConeSolution,
    dx: Array,
    dy: Optional[Array] = None,
    ds: Optional[Array] = None,
    *,
    method: str = "auto",
    refine_iters: int = 0,
) -> ConeTangent:
    """VJP of the conic solution map for cotangents (dx, dy, ds)."""
    n, m = cp.num_vars, cp.num_rows
    x, y, s = sol.x, sol.y, sol.s
    v = y - s
    vp = _cones.pi(cp.cones, v)
    dy = jnp.zeros_like(y) if dy is None else dy
    ds = jnp.zeros_like(s) if ds is None else ds

    dz = jnp.concatenate(
        [
            dx,
            _cones.dpi_rmatvec(cp.cones, v, dy + ds) - ds,
            (
                -jnp.sum(x * dx, axis=-1)
                - jnp.sum(y * dy, axis=-1)
                - jnp.sum(s * ds, axis=-1)
            )[..., None],
        ],
        axis=-1,
    )
    # True adjoint: solve with M' (the reference reuses M here,
    # ``ConicProgram.jl:372`` — but its harness never checks the conic adjoint
    # identity, ``test/utils.jl:334``; the transpose is what makes
    # <JVP(d), seed> == <d, VJP(seed)> hold, and matches diffcp's
    # adjoint_derivative).
    g = _solve_system(cp, sol, dz, method, refine_iters, transpose=True)

    # VJP of rhs(dA,db,dc) = dQ.pz with pz = [u; pi(v); 1], including the
    # global minus from dsol = -Dphi(M^{-1} rhs):
    gn, gm, gw = g[..., :n], g[..., n : n + m], g[..., n + m]
    outer = lambda a, b: a[..., :, None] * b[..., None, :]
    dA = outer(gm, x) - outer(vp, gn)
    db = gw[..., None] * vp - gm
    dc = gw[..., None] * x - gn
    return ConeTangent(dA=dA, db=db, dc=dc)
