"""Fully-fused batched nonsymmetric-cone IPM as a single Pallas TPU kernel.

The XLA-level nonsymmetric PDIPM (``solvers/conic_nsipm.py``) is
dispatch/HBM-bound on TPU: each Newton iteration issues thousands of tiny
elementwise ops over (B,)-shaped vectors (barrier gradients, 3x3 Hessian
algebra, and 18+7 line-search candidates x the full proximity graph), every
one round-tripping HBM. This kernel keeps a 128-instance tile resident in
VMEM for all iterations — the same speed-of-light design as the fused NT
conic kernel (``conic_pdip.py``), applied to the exp/pow family (BASELINE
config 3 family-completeness; round-3 verdict ask #5).

Math is identical to ``solvers/conic_nsipm.py`` (Skajaa-Ye-flavored Mehrotra
predictor-corrector with dual-scaling Hessian mu*hessF(s), proximity-bounded
line searches on static candidate grids, pure-centering recovery steps,
quasi-definite LDL' in [cone | x | eq] order, best-iterate tracking, stall
exit). Scope: internal layout ``[zero(p) | nonneg(l) | soc... | ns...]``
with ns in {exp, dual_exp, pow, dual_pow} — psd blocks take the vmapped XLA
path. Barrier gradients/Hessians are hand-derived closed forms on (3, LANE)
values (one log/exp per block per evaluation); the 3x3 floored-eigh Hessian
inverse reuses the lanes Jacobi from ``conic_pdip``.

Layout: batch-along-lanes, operands (rows, cols, LANE) (see ``pdip.py``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conic_pdip import (
    LANE,
    _J,
    _jacobi_eigh_ll,
    _ldl_any,
    _ldl_solve_any,
    _soc_slices,
)

Array = jax.Array


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ns_slices(l, soc_dims, n_ns):
    out = []
    off = l + sum(soc_dims)
    for _ in range(n_ns):
        out.append(slice(off, off + 3))
        off += 3
    return out


def _safe_margin_ll(g, u, eps):
    """Relative floor on a cone margin (cf. conic_nsipm._safe_margin):
    boundary-riding iterates round margins to <= 0; the floor keeps barrier
    gradients/Hessians finite (termination has fired by then)."""
    scale = jnp.sum(jnp.abs(u), axis=0)
    return jnp.maximum(g, eps * scale)


def _ns_parts(kind, alpha, u, eps):
    """Margin g, its gradient (3, LANE), its Hessian entries, and the
    log-barrier extra diagonal for one nonsymmetric block value u (3, LANE).

    Returns (g, dg (3,L), d2g as dict of nonzero entries, extra_diag (3,L),
    logdet_terms) with F = -log g + sum(-w_i log u_i) structure:
        grad F = -dg/g + dlin
        hess F = dg dg'/g^2 - d2g/g + diag(hlin)
    """
    dt = u.dtype
    z3 = jnp.zeros((u.shape[-1],), dt)
    if kind == "exp":
        x, y, z = u[0], u[1], u[2]
        Lg = jnp.log(z / y)
        g = _safe_margin_ll(y * Lg - x, u, eps)
        dg = jnp.stack([-jnp.ones_like(x), Lg - 1.0, y / z])
        d2g = {(1, 1): -1.0 / y, (1, 2): 1.0 / z, (2, 2): -y / z**2}
        dlin = jnp.stack([z3, -1.0 / y, -1.0 / z])
        hlin = jnp.stack([z3, 1.0 / y**2, 1.0 / z**2])
    elif kind == "dual_exp":
        t = -u[0]
        v, w = u[1], u[2]
        M = jnp.log(w / t)
        g = _safe_margin_ll(v + t + t * M, u, eps)
        dg = jnp.stack([-M, jnp.ones_like(t), t / w])
        d2g = {(0, 0): -1.0 / t, (0, 2): -1.0 / w, (2, 2): -t / w**2}
        dlin = jnp.stack([1.0 / t, z3, -1.0 / w])
        hlin = jnp.stack([1.0 / t**2, z3, 1.0 / w**2])
    else:  # pow / dual_pow
        a = float(alpha)
        x, y, z = u[0], u[1], u[2]
        if kind == "pow":
            P = jnp.exp(2 * a * jnp.log(x) + 2 * (1 - a) * jnp.log(y))
        else:
            P = jnp.exp(
                2 * a * jnp.log(x / a) + 2 * (1 - a) * jnp.log(y / (1 - a))
            )
        g = _safe_margin_ll(P - z**2, u, eps)
        dg = jnp.stack([2 * a * P / x, 2 * (1 - a) * P / y, -2 * z])
        d2g = {
            (0, 0): 2 * a * (2 * a - 1) * P / x**2,
            (0, 1): 4 * a * (1 - a) * P / (x * y),
            (1, 1): 2 * (1 - a) * (1 - 2 * a) * P / y**2,
            (2, 2): -2.0 * jnp.ones_like(z),
        }
        dlin = jnp.stack([-(1 - a) / x, -a / y, z3])
        hlin = jnp.stack([(1 - a) / x**2, a / y**2, z3])
    return g, dg, d2g, dlin, hlin


def _ns_grad(kind, alpha, u, eps):
    g, dg, _, dlin, _ = _ns_parts(kind, alpha, u, eps)
    return -dg / g[None, :] + dlin


def _ns_hess(kind, alpha, u, eps):
    """Dense (3, 3, LANE) barrier Hessian of one ns block."""
    g, dg, d2g, _, hlin = _ns_parts(kind, alpha, u, eps)
    H = dg[:, None, :] * dg[None, :, :] / (g * g)[None, None, :]
    rows = []
    for i in range(3):
        ent = []
        for j in range(3):
            key = (i, j) if i <= j else (j, i)
            v = d2g.get(key)
            piece = H[i, j : j + 1, :]
            if v is not None:
                piece = piece - (v / g)[None, :]
            if i == j:
                piece = piece + hlin[i][None, :]
            ent.append(piece)
        rows.append(jnp.concatenate(ent, axis=0)[None])
    return jnp.concatenate(rows, axis=0)


def _ns_interior_ll(kind, alpha, u):
    """Lanes interiority measure (cf. conic_nsipm._ns_interior): positive
    iff strictly interior; guarded against out-of-domain logs."""
    dt = u.dtype
    neg1 = jnp.full((u.shape[-1],), -1.0, dt)
    if kind == "exp":
        x, y, z = u[0], u[1], u[2]
        pos = (y > 0) & (z > 0)
        ys = jnp.where(pos, y, 1.0)
        zs = jnp.where(pos, z, 1.0)
        m3 = ys * jnp.log(zs / ys) - x
        return jnp.where(pos, jnp.minimum(jnp.minimum(y, z), m3), neg1)
    if kind == "dual_exp":
        t, v, w = -u[0], u[1], u[2]
        pos = (t > 0) & (w > 0)
        ts = jnp.where(pos, t, 1.0)
        ws = jnp.where(pos, w, 1.0)
        m3 = v + ts + ts * jnp.log(ws / ts)
        return jnp.where(pos, jnp.minimum(jnp.minimum(t, w), m3), neg1)
    a = float(alpha)
    x, y, z = u[0], u[1], u[2]
    sx, sy = (1.0, 1.0) if kind == "pow" else (a, 1.0 - a)
    pos = (x > 0) & (y > 0)
    xs = jnp.where(pos, x, 1.0)
    ys = jnp.where(pos, y, 1.0)
    phi = jnp.exp(a * jnp.log(xs / sx) + (1 - a) * jnp.log(ys / sy))
    m3 = phi - jnp.abs(z)
    return jnp.where(pos, jnp.minimum(jnp.minimum(x, y), m3), neg1)


_DUAL_KIND = {
    "exp": "dual_exp", "dual_exp": "exp", "pow": "dual_pow", "dual_pow": "pow",
}


def _ns_central_np(kind, alpha):
    """Static numpy central initial points (pure-host analogue of
    ``conic_nsipm._ns_central`` — no jax ops, so the kernel traces under an
    outer jit). Dual points are -grad F at the primal central point; for
    pow that collapses back to the primal point analytically."""
    exp0 = np.array(
        [-1.0513839453227140, 0.5564096194693700, 1.2589678847689470]
    )
    if kind == "exp":
        return exp0
    if kind == "dual_exp":
        x, y, z = exp0
        L = np.log(z / y)
        g = y * L - x
        gradF = np.array(
            [1.0 / g, -(L - 1.0) / g - 1.0 / y, -(y / z) / g - 1.0 / z]
        )
        return -gradF
    a = float(alpha)
    # pow central and dual_pow (= -grad F_pow at it) coincide:
    # -grad F at (sqrt(1+a), sqrt(2-a), 0) is ((1+a)/x0, (2-a)/y0, 0)
    return np.array([np.sqrt(1.0 + a), np.sqrt(2.0 - a), 0.0])


def _solve3_sym_ll(A, b):
    """Cramer solve of a symmetric (3, 3, LANE) system for (3, LANE) rhs
    (cf. conic_nsipm._solve3_sym)."""
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    x0 = (c00 * b[0] + c01 * b[1] + c02 * b[2]) / safe
    x1 = (c01 * b[0] + c11 * b[1] + c12 * b[2]) / safe
    x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / safe
    return jnp.stack([x0, x1, x2])


def _kernel(
    dims, socs, ns_kinds, iters, tol, reg, eps, neighborhood,
    pred_grid, cent_grid, *refs,
):
    # p >= 1 is guaranteed by solve_tile_fused_ns's guard (equality-free
    # layouts route to the vmapped XLA path), so no p == 0 branches here.
    n, p, l = dims
    (c_ref, bE_ref, bC_ref, AE_ref, AC_ref,
     x_ref, yE_ref, yC_ref, s_ref, it_ref, pres_ref, dres_ref,
     gap_ref) = refs
    soc_dims = socs
    n_ns = len(ns_kinds)
    mC = l + sum(soc_dims) + 3 * n_ns
    N = n + p + mC
    dt = c_ref.dtype
    c = c_ref[:]
    bC = bC_ref[:]
    AC = AC_ref[:]
    bE = bE_ref[:]
    AE = AE_ref[:]
    slices = _soc_slices(l, soc_dims)
    nslices = _ns_slices(l, soc_dims, n_ns)
    nu_deg = max(l + 2 * len(soc_dims) + 3 * n_ns, 1)
    eps_w = 1e-14 if dt == jnp.float64 else 1e-6

    def mv(M, v):
        return jnp.sum(M * v[None, :, :], axis=1)

    def rmv(M, v):
        return jnp.sum(M * v[:, None, :], axis=0)

    def _soc_det(sb):
        nu1 = jnp.sqrt(jnp.sum(sb[1:] ** 2, axis=0))
        det = (sb[0] - nu1) * (sb[0] + nu1)
        return jnp.maximum(det, eps * sb[0] ** 2)

    def grad_barrier(s):
        parts = [-1.0 / s[:l]] if l else []
        for sl in slices:
            sb = s[sl]
            det = _soc_det(sb)
            parts.append(-2.0 * _J(sb) / det[None, :])
        for (kind, alpha), sl in zip(ns_kinds, nslices):
            parts.append(_ns_grad(kind, alpha, s[sl], eps))
        return jnp.concatenate(parts, axis=0)

    def hbar_pair(s, mu):
        """Dense (mC, mC, LANE) Hbar = mu hessF(s) and its inverse / mu."""
        rows_H, rows_Hi = [], []

        def place(blk, off, d_):
            pieces = []
            if off:
                pieces.append(jnp.zeros((d_, off, LANE), dt))
            pieces.append(blk)
            if mC - off - d_:
                pieces.append(jnp.zeros((d_, mC - off - d_, LANE), dt))
            return jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else blk

        if l:
            diag = jnp.eye(l, dtype=dt)[:, :, None]
            rows_H.append(place(diag * (1.0 / s[:l] ** 2)[:, None, :], 0, l))
            rows_Hi.append(place(diag * (s[:l] ** 2)[:, None, :], 0, l))
        off = l
        for d_, sl in zip(soc_dims, slices):
            sb = s[sl]
            det = _soc_det(sb)
            Js = _J(sb)
            Jd = jnp.diag(
                jnp.concatenate([jnp.ones((1,)), -jnp.ones((d_ - 1,))])
            ).astype(dt)[:, :, None]
            Hb = (4.0 / det**2)[None, None, :] * Js[:, None, :] * Js[None, :, :] - (
                2.0 / det
            )[None, None, :] * Jd
            Hib = sb[:, None, :] * sb[None, :, :] - 0.5 * det[None, None, :] * Jd
            rows_H.append(place(Hb, off, d_))
            rows_Hi.append(place(Hib, off, d_))
            off += d_
        for (kind, alpha), sl in zip(ns_kinds, nslices):
            Hb = _ns_hess(kind, alpha, s[sl], eps)
            # floored 3x3 eigh inverse: near convergence the margin g -> 0
            # and Hb conditions like 1/mu^2 — raw Cramer cofactors overflow
            # (cf. conic_nsipm._hbar_pair)
            w_, Q = _jacobi_eigh_ll(Hb, 3)
            w_ = jnp.maximum(w_, eps_w * jnp.max(w_, axis=0)[None, :])
            Qt = jnp.swapaxes(Q, 0, 1)
            Qi = Q / w_[None, :, :]
            Hib_rows = []
            for i in range(3):
                Hib_rows.append(
                    jnp.sum(Qi[i][:, None, :] * Qt, axis=0)[None]
                )
            Hib = jnp.concatenate(Hib_rows, axis=0)
            rows_H.append(place(Hb, off, 3))
            rows_Hi.append(place(Hib, off, 3))
            off += 3
        H = jnp.concatenate(rows_H, axis=0)
        Hi = jnp.concatenate(rows_Hi, axis=0)
        return mu[None, None, :] * H, Hi / mu[None, None, :]

    def interior(u, dual):
        vals = []
        if l:
            vals.append(jnp.min(u[:l], axis=0))
        for sl in slices:
            ub = u[sl]
            vals.append(ub[0] - jnp.sqrt(jnp.sum(ub[1:] ** 2, axis=0)))
        for (kind, alpha), sl in zip(ns_kinds, nslices):
            k = _DUAL_KIND[kind] if dual else kind
            vals.append(_ns_interior_ll(k, alpha, u[sl]))
        out = vals[0]
        for v in vals[1:]:
            out = jnp.minimum(out, v)
        return out

    def feasible(sn, yn):
        fin = jnp.all(jnp.isfinite(sn), axis=0) & jnp.all(
            jnp.isfinite(yn), axis=0
        )
        return (interior(sn, False) > 0) & (interior(yn, True) > 0) & fin

    def prox_sq(s, y, mu):
        q = jnp.zeros((LANE,), dt)
        if l:
            q = q + jnp.sum((s[:l] * y[:l] - mu[None, :]) ** 2, axis=0)
        for sl in slices:
            sb, yb = s[sl], y[sl]
            det = _soc_det(sb)
            Js = _J(sb)
            z = yb - (2.0 * mu / det)[None, :] * Js
            Jz = _J(z)
            Hiz = jnp.sum(sb * z, axis=0)[None, :] * sb - 0.5 * det[None, :] * Jz
            q = q + jnp.sum(z * Hiz, axis=0)
        for (kind, alpha), sl in zip(ns_kinds, nslices):
            sb = s[sl]
            z = y[sl] + mu[None, :] * _ns_grad(kind, alpha, sb, eps)
            Hb = _ns_hess(kind, alpha, sb, eps)
            dj = jnp.sqrt(
                jnp.stack([Hb[0, 0], Hb[1, 1], Hb[2, 2]], axis=0)
            )
            Hs = Hb / dj[:, None, :] / dj[None, :, :]
            x_ = _solve3_sym_ll(Hs, z / dj) / dj
            q = q + jnp.sum(z * x_, axis=0)
        return q

    def residuals(x, yE, yC, s):
        rd = c + rmv(AC, yC) + rmv(AE, yE)
        rpE = mv(AE, x) - bE
        rpC = mv(AC, x) + s - bC
        return rd, rpE, rpC

    def metrics(x, yE, yC, s, rd, rpE, rpC):
        """Numerically identical (2-norms) to solvers/conic_nsipm.py so the
        converged flag does not flip across the fused/XLA boundary."""
        nrm = lambda u: jnp.sqrt(jnp.sum(u * u, axis=0))
        AxC = rpC - s + bC
        Ax2 = jnp.sum(AxC * AxC, axis=0)
        b2 = jnp.sum(bC * bC, axis=0)
        pres2 = jnp.sum(rpC * rpC, axis=0)
        dobj = -jnp.sum(bC * yC, axis=0)
        AxE = rpE + bE
        Ax2 = Ax2 + jnp.sum(AxE * AxE, axis=0)
        b2 = b2 + jnp.sum(bE * bE, axis=0)
        pres2 = pres2 + jnp.sum(rpE * rpE, axis=0)
        dobj = dobj - jnp.sum(bE * yE, axis=0)
        psc = 1.0 + jnp.maximum(jnp.sqrt(Ax2), jnp.maximum(nrm(s), jnp.sqrt(b2)))
        pres = jnp.sqrt(pres2) / psc
        dsc = 1.0 + jnp.maximum(nrm(rd - c), nrm(c))
        dres = nrm(rd) / dsc
        pobj = jnp.sum(c * x, axis=0)
        gaprel = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return pres, dres, gaprel

    def factor(Hbar, Hbar_inv):
        eye_n = reg * jnp.eye(n, dtype=dt)[:, :, None] * jnp.ones((1, 1, LANE), dt)
        ACt = jnp.swapaxes(AC, 0, 1)
        AEt = jnp.swapaxes(AE, 0, 1)
        top = jnp.concatenate(
            [-Hbar_inv, AC, jnp.zeros((mC, p, LANE), dt)], axis=1
        )
        mid = jnp.concatenate([ACt, eye_n, AEt], axis=1)
        eye_p = -reg * jnp.eye(p, dtype=dt)[:, :, None] * jnp.ones(
            (1, 1, LANE), dt
        )
        bot = jnp.concatenate(
            [jnp.zeros((p, mC, LANE), dt), AE, eye_p], axis=1
        )
        K = jnp.concatenate([top, mid, bot], axis=0)
        L, dv = _ldl_any(K, N)
        return L, dv, K, Hbar, Hbar_inv

    def solve_dir_once(F, rd, rpE, rpC, g):
        L, dv, K, Hbar, Hbar_inv = F
        rhs = jnp.concatenate([-rpC + mv(Hbar_inv, g), -rd, -rpE], axis=0)
        sol = _ldl_solve_any(L, dv, rhs, N)
        dyC = sol[:mC]
        dx = sol[mC : mC + n]
        dyE = sol[mC + n :]
        ds = -mv(Hbar_inv, g + dyC)
        return dx, dyE, dyC, ds

    def solve_dir(F, rd, rpE, rpC, g, refine: int):
        d = solve_dir_once(F, rd, rpE, rpC, g)
        L, dv, K, Hbar, Hbar_inv = F
        for _ in range(refine):
            dx, dyE, dyC, ds = d
            r1 = -rd - (rmv(AC, dyC) + rmv(AE, dyE))
            r2 = -rpE - mv(AE, dx)
            r3 = -rpC - (mv(AC, dx) + ds)
            r4 = -g - (dyC + mv(Hbar, ds))
            c1, c2, c3, c4 = solve_dir_once(F, -r1, -r2, -r3, -r4)
            d = (dx + c1, dyE + c2, dyC + c3, ds + c4)
        return d

    # ---- init: central s0, y0 = -grad F(s0) (mu0 = 1), x = 0 ---------------
    parts = [jnp.ones((l, LANE), dt)] if l else []
    for d_ in soc_dims:
        parts.append(
            jnp.concatenate(
                [jnp.ones((1, LANE), dt), jnp.zeros((d_ - 1, LANE), dt)], axis=0
            )
        )
    for kind, alpha in ns_kinds:
        pt = _ns_central_np(kind, alpha)
        # per-entry scalar fills: a jnp.asarray constant would be captured
        # by the kernel (pallas rejects captured array constants)
        parts.append(
            jnp.concatenate(
                [jnp.full((1, LANE), float(v), dt) for v in pt], axis=0
            )
        )
    s = jnp.concatenate(parts, axis=0)
    yC = -grad_barrier(s)
    x = jnp.zeros((n, LANE), dt)
    yE = jnp.zeros((p, LANE), dt)

    beta_wide = jnp.asarray(neighborhood, dt)
    alpha_stall = 0.05

    def ok_at(s0, y0, ds, dy, a, with_prox):
        sn = s0 + a * ds
        yn = y0 + a * dy
        good = feasible(sn, yn)
        if with_prox:
            mu_n = jnp.sum(sn * yn, axis=0) / nu_deg
            good = good & (mu_n > 0)
            p2 = prox_sq(sn, yn, mu_n)
            good = good & (p2 <= (beta_wide * mu_n) ** 2)
        return good

    def pred_search(s0, y0, ds, dy, grid, with_prox):
        amax = jnp.zeros((LANE,), dt)
        for a in grid:
            ok = ok_at(s0, y0, ds, dy, a, with_prox)
            amax = jnp.maximum(amax, jnp.where(ok, jnp.asarray(a, dt), 0.0))
        return amax

    def cent_search(s0, y0, ds, dy):
        best_a = jnp.zeros((LANE,), dt)
        best_v = jnp.full((LANE,), jnp.inf, dt)
        for a in cent_grid:
            sn = s0 + a * ds
            yn = y0 + a * dy
            mu_n = jnp.sum(sn * yn, axis=0) / nu_deg
            good = feasible(sn, yn) & (mu_n > 0)
            p2 = prox_sq(sn, yn, mu_n)
            rel = p2 / jnp.maximum(mu_n**2, 1e-30)
            val = jnp.where(good, rel, jnp.inf)
            better = val < best_v
            best_a = jnp.where(better, jnp.asarray(a, dt), best_a)
            best_v = jnp.where(better, val, best_v)
        return best_a

    refine = 1  # ns Hessians condition like 1/mu^2 (cf. conic_nsipm)

    def body(carry):
        (it, x, yE, yC, s, xb, yEb, yCb, sb_, errb, itdone,
         mu_prev, err_prev, stall, _) = carry
        rd, rpE, rpC = residuals(x, yE, yC, s)
        mu = jnp.sum(s * yC, axis=0) / nu_deg
        pres, dres, gaprel = metrics(x, yE, yC, s, rd, rpE, rpC)
        done = (pres < tol) & (dres < tol) & (gaprel < tol)
        itdone = jnp.where(done & (itdone < 0), it.astype(dt), itdone)
        err = jnp.maximum(jnp.maximum(pres, dres), gaprel)
        better = err < errb
        selb = lambda new, old: jnp.where(better[None, :], new, old)
        xb, yEb, yCb, sb_ = selb(x, xb), selb(yE, yEb), selb(yC, yCb), selb(s, sb_)
        errb = jnp.where(better, err, errb)
        stalled_now = (mu > 0.98 * mu_prev) & (err > 0.98 * err_prev)
        stall = jnp.where(stalled_now, stall + 1, jnp.zeros_like(stall))
        stalled = stall >= 5

        gradF = grad_barrier(s)
        Hbar, Hbar_inv = hbar_pair(s, mu)
        F = factor(Hbar, Hbar_inv)

        # Mehrotra affine probe (coarse grid, feasibility only, no
        # refinement — it only feeds the sigma heuristic)
        dxa, dyEa, dyCa, dsa = solve_dir_once(F, rd, rpE, rpC, yC)
        a_aff = pred_search(s, yC, dsa, dyCa, pred_grid[::2], with_prox=False)
        mu_aff = jnp.sum(
            (s + a_aff[None, :] * dsa) * (yC + a_aff[None, :] * dyCa), axis=0
        ) / nu_deg
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
        g = yC + (sigma * mu)[None, :] * gradF
        dxp, dyEp, dyCp, dsp = solve_dir(F, rd, rpE, rpC, g, refine)
        alpha_p = pred_search(s, yC, dsp, dyCp, pred_grid, with_prox=True)

        # pure-centering recovery (computed for every lane — cheap relative
        # to the predictor, selected per-lane where the line search
        # collapsed on the proximity boundary; cf. conic_nsipm)
        gc = yC + mu[None, :] * gradF
        zrd = jnp.zeros_like(rd)
        zpe = jnp.zeros_like(rpE)
        zpc = jnp.zeros_like(rpC)
        dxc, dyEc, dyCc, dsc = solve_dir_once(F, zrd, zpe, zpc, gc)
        alpha_c = cent_search(s, yC, dsc, dyCc)

        use_cent = (alpha_p < alpha_stall)[None, :]
        dx = jnp.where(use_cent, dxc, dxp)
        dyE = jnp.where(use_cent, dyEc, dyEp)
        dyC = jnp.where(use_cent, dyCc, dyCp)
        ds = jnp.where(use_cent, dsc, dsp)
        alpha = jnp.where(use_cent[0], alpha_c, alpha_p)

        finite = (
            jnp.all(jnp.isfinite(dx), axis=0)
            & jnp.all(jnp.isfinite(dyC), axis=0)
            & jnp.all(jnp.isfinite(ds), axis=0)
            & jnp.isfinite(alpha)
            & jnp.all(jnp.isfinite(dyE), axis=0)
        )
        # mu <= 0 cannot arise from the interiority-checked line searches,
        # but freeze defensively (cf. conic_pdip.py)
        dead = mu <= 0.0
        step = (finite & ~done & ~stalled & ~dead)[None, :]
        alpha = jnp.maximum(jnp.where(jnp.isfinite(alpha), alpha, 0.0), 0.0)[
            None, :
        ]
        upd = lambda v, dv: jnp.where(step, v + alpha * dv, v)
        alldone = jnp.all(done | ~finite | stalled | dead)
        return (
            it + 1, upd(x, dx), upd(yE, dyE), upd(yC, dyC), upd(s, ds),
            xb, yEb, yCb, sb_, errb, itdone, mu, err, stall, alldone,
        )

    def cond(carry):
        it, *_, alldone = carry
        return (it < iters) & ~alldone

    big = jnp.full((LANE,), 1e30, dt)
    (it, x, yE, yC, s, xb, yEb, yCb, sb_, errb, itdone,
     _, _, _, _) = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros((), jnp.int32), x, yE, yC, s,
            x, yE, yC, s, big, jnp.full((LANE,), -1.0, dt),
            big, big, jnp.zeros((LANE,), jnp.int32),
            jnp.zeros((), jnp.bool_),
        ),
    )
    # score the exit state once; return the best-by-err iterate
    rd, rpE, rpC = residuals(x, yE, yC, s)
    pres, dres, gaprel = metrics(x, yE, yC, s, rd, rpE, rpC)
    err = jnp.maximum(jnp.maximum(pres, dres), gaprel)
    fin = jnp.all(jnp.isfinite(x), axis=0) & jnp.all(jnp.isfinite(yC), axis=0)
    better = (err < errb) & fin
    sel = lambda new, old: jnp.where(better[None, :], new, old)
    x_out = sel(x, xb)
    yE_out = sel(yE, yEb)
    yC_out = sel(yC, yCb)
    s_out = sel(s, sb_)
    x_ref[:] = x_out
    yE_ref[:] = yE_out
    yC_ref[:] = yC_out
    s_ref[:] = s_out
    rd, rpE, rpC = residuals(x_out, yE_out, yC_out, s_out)
    pres_o, dres_o, gap_o = metrics(x_out, yE_out, yC_out, s_out, rd, rpE, rpC)
    itdone = jnp.where(itdone >= 0, itdone, it.astype(dt))
    it_ref[:] = itdone[None, :]
    pres_ref[:] = pres_o[None, :]
    dres_ref[:] = dres_o[None, :]
    gap_ref[:] = gap_o[None, :]


def solve_tile_fused_ns(
    c: Array, bE: Array, bC: Array, AE: Array, AC: Array,
    layout: Tuple[int, int, Tuple[int, ...], Tuple[Tuple[str, object], ...]],
    *,
    max_iters: int = 100,
    tol: float = 5e-6,
    reg: float = 1e-7,
    eps: float = 1e-7,
    step_frac: float = 0.99,
    neighborhood: float = 0.9,
):
    """Run the fused nonsymmetric-cone kernel on internally-laid-out batch
    data (batch-FIRST inputs, cf. ``conic_pdip.solve_tile_fused``;
    ``layout = (p, l, soc_dims, ns_kinds)`` with ns_kinds a tuple of
    (kind, alpha)). Returns (x, yE, yC, s, iterations, pres, dres, gaprel).

    Requires ``p >= 1``: equality-free layouts would trace zero-sized
    ``(0, LANE)`` values into the kernel, which Mosaic cannot lower (repo
    rule: guard p==0 outside kernels) — ``conic_nsipm.solve_batched_fused``
    routes such programs to the vmapped XLA path instead."""
    p, l, soc_dims, ns_kinds = layout
    if p == 0:
        raise ValueError(
            "solve_tile_fused_ns requires p >= 1 equality rows; route "
            "equality-free programs through conic_nsipm.solve_batched"
        )
    B, n = c.shape
    mC = bC.shape[-1]
    dt = c.dtype
    # the same static candidate grids as solvers/conic_nsipm.py
    pred_grid = tuple(
        float(a)
        for a in np.concatenate(
            [[1.0], step_frac * 0.8 ** np.arange(14), [0.02, 0.008, 0.003]]
        )
    )
    cent_grid = (1.0, 0.6, 0.35, 0.2, 0.1, 0.05, 0.02)
    padB = (-B) % LANE
    pad = lambda x: (
        jnp.concatenate([x, jnp.repeat(x[:1], padB, 0)], 0) if padB else x
    )
    to_ll = lambda x: jnp.moveaxis(pad(x), 0, -1)
    args = [to_ll(c), to_ll(bE), to_ll(bC), to_ll(AE), to_ll(AC)]
    Bp = B + padB

    def spec(x):
        shape = x.shape[:-1] + (LANE,)
        if x.ndim == 2:
            return pl.BlockSpec(shape, lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    vec_spec = lambda r: pl.BlockSpec(
        (r, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_specs = [vec_spec(n), vec_spec(p)]
    out_shape = [
        jax.ShapeDtypeStruct((n, Bp), dt),
        jax.ShapeDtypeStruct((p, Bp), dt),
    ]
    out_specs += [vec_spec(mC), vec_spec(mC)] + [vec_spec(1)] * 4
    out_shape += [
        jax.ShapeDtypeStruct((mC, Bp), dt),
        jax.ShapeDtypeStruct((mC, Bp), dt),
    ] + [jax.ShapeDtypeStruct((1, Bp), dt)] * 4

    out = pl.pallas_call(
        partial(
            _kernel, (n, p, l), tuple(soc_dims), tuple(ns_kinds),
            max_iters, tol, reg, eps, neighborhood,
            pred_grid, cent_grid,
        ),
        grid=(Bp // LANE,),
        in_specs=[spec(a) for a in args],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*args)
    back = lambda x: jnp.moveaxis(x, -1, 0)[:B]
    x, yE, yC, s, it, pres, dres, gap = out
    return (
        back(x), back(yE), back(yC), back(s),
        back(it)[:, 0], back(pres)[:, 0], back(dres)[:, 0], back(gap)[:, 0],
    )
