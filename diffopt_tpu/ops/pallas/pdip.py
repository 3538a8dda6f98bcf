"""Fully-fused batched PDIP QP solver as a single Pallas TPU kernel.

The staged solver (``solvers/qp.py``) round-trips HBM between every step:
H formation, Cholesky, solves, and state updates are separate XLA/Pallas
fusions. This kernel keeps a 128-instance tile's entire problem (Q, G, A,
vectors) and iterate state resident in VMEM for all interior-point
iterations — the speed-of-light design for BASELINE config 2.

Layout: batch-along-lanes, operands (n, n, LANE) etc. Per-lane early stop is
free: converged lanes take zero-length steps (no cross-lane sync). Fixed
iteration count via ``lax.fori_loop``; the per-iteration body is an unrolled
Mehrotra predictor-corrector with in-VMEM Cholesky + Schur elimination
(identical math to ``solvers/qp.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ir import QPSolution, QuadProgram

Array = jax.Array
LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- in-kernel dense helpers on (rows, cols, LANE) values -------------------


def _chol_value(Hv, n):
    """Cholesky of an (n, n, LANE) SPD value; returns lower L as a value.
    Shrinking-submatrix form: no scatter/.at ops (TPU Pallas lowering has no
    scatter), only slices and concatenates."""
    a = Hv
    cols = []
    for j in range(n):
        dj = jax.lax.rsqrt(a[0, 0, :])
        col = a[:, 0, :] * dj[None, :]  # (n-j, LANE)
        cols.append(col)
        if j + 1 < n:
            sub = col[1:]
            a = a[1:, 1:, :] - sub[:, None, :] * sub[None, :, :]
    lane = Hv.shape[-1]
    parts = []
    for j in range(n):
        if j == 0:
            full = cols[j]
        else:
            full = jnp.concatenate(
                [jnp.zeros((j, lane), Hv.dtype), cols[j]], axis=0
            )
        parts.append(full[:, None, :])
    return jnp.concatenate(parts, axis=1)


def _chol_solve_value(L, rhs, n):
    """Solve L L' x = rhs for rhs (n, k, LANE) values.

    Indexing discipline for Mosaic: only (int|slice, int|slice, slice)
    patterns on 3D values — int-int chains like ``L[j, i, None, :]`` lower to
    unsupported >2D gathers. Inner contractions are vectorized over the
    already-computed rows via stack + sum."""
    ys = []
    for j in range(n):
        acc = rhs[j]  # (k, LANE)
        if j > 0:
            Y = jnp.stack(ys, axis=0)  # (j, k, LANE)
            lrow = L[j, :j, :]  # (j, LANE)
            acc = acc - jnp.sum(lrow[:, None, :] * Y, axis=0)
        ys.append(acc / L[j, j, :][None, :])
    xs = [None] * n
    for j in range(n - 1, -1, -1):
        acc = ys[j]
        if j + 1 < n:
            X = jnp.stack(xs[j + 1 :], axis=0)  # (n-j-1, k, LANE)
            lcol = L[j + 1 :, j, :]  # (n-j-1, LANE)
            acc = acc - jnp.sum(lcol[:, None, :] * X, axis=0)
        xs[j] = acc / L[j, j, :][None, :]
    return jnp.stack(xs, axis=0)


# Past this dimension the fully-unrolled shrinking-submatrix forms stop
# compiling: every unrolled step leaves live (rows, LANE) slices and Mosaic's
# register allocator spills them to VMEM (measured at n=100: 226 MB of spill
# slots, 235 MB total vs the chip's 128 MB). The loop variants below trace
# ONE body under lax.fori_loop, with the factor held in a scoped VMEM
# scratch ref so row j is a DYNAMIC ROW load/store (pl.ds on the leading
# dim — O(n LANE)) instead of a one-hot O(n^2 LANE) reduction per step
# (lax.dynamic_slice on kernel VALUES has no Mosaic lowering — measured —
# but refs take pl.ds on non-vreg dims): only the trailing rank-1 update
# pays O(n^2 LANE), which is the actual FLOP content. Measured at
# n=100/m=48/p=24 vs the one-hot form: 230 ms -> 93 ms per B=1024 tile.
_UNROLL_MAX = 80


def _chol_value_loop(Hv, n):
    """Cholesky of an (n, n, LANE) SPD value via a fori_loop over a VMEM
    scratch ref. The trailing submatrix stays symmetric, so column j equals
    row j (a dynamic row load); after the rank-1 trailing update, L's column
    j is stored back INTO row j (never read again by later steps — rows < j
    hold stored L columns and their colL entries are zero, so trailing
    updates leave them untouched). Returns lower L (transpose of the stored
    rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = Hv.dtype
    lane = Hv.shape[-1]
    # 2D iota: Mosaic has no 1D iota lowering; (n, 1) broadcasts everywhere
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def scoped(A_ref):
        A_ref[:] = Hv

        def body(j, _):
            colj = A_ref[pl.ds(j, 1)][0]  # (n, LANE): row j == column j
            dj = jnp.sum(colj * (iota == j).astype(dt), axis=0)  # (LANE,)
            inv = jax.lax.rsqrt(dj)
            colL = colj * inv[None, :] * (iota >= j).astype(dt)
            A_ref[:] = A_ref[:] - colL[:, None, :] * colL[None, :, :]
            A_ref[pl.ds(j, 1)] = colL[None]
            return 0

        jax.lax.fori_loop(0, n, body, 0)
        return jnp.swapaxes(A_ref[:], 0, 1)

    return pl.run_scoped(scoped, pltpu.VMEM((n, n, lane), dt))


def _chol_solve_value_loop(L, rhs, n):
    """Solve L L' x = rhs for rhs (n, k, LANE) via substitution loops over
    VMEM scratch refs holding ONLY L' — both sweeps read L's columns, which
    are L's rows transposed: the forward solve in column-oriented saxpy form
    (after y_j is fixed, r_{i>j} -= L[i,j] y_j, so row j of R is final and
    R becomes y in place), the backward in row-dot form. One (n, n, LANE)
    matrix buffer instead of the original L + L' pair keeps the scoped-vmem
    stack (~16 MB measured limit) satisfied across the whole n <= 128 gate —
    two matrix buffers overflow it past n ~ 116 at k = 24 — and drops a full
    O(n^2 LANE) VMEM copy per call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = L.dtype
    k = rhs.shape[1]
    lane = rhs.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # 2D: no 1D iota

    def scoped(Lt_ref, R_ref, X_ref):
        Lt_ref[:] = jnp.swapaxes(L, 0, 1)
        R_ref[:] = rhs
        X_ref[:] = jnp.zeros_like(rhs)

        def fwd(j, _):
            colj = Lt_ref[pl.ds(j, 1)][0]  # (n, LANE) = L[:, j]
            ljj = jnp.sum(colj * (iota == j).astype(dt), axis=0)  # (LANE,)
            yj = R_ref[pl.ds(j, 1)][0] / ljj[None, :]  # (k, LANE)
            sub = colj * (iota > j).astype(dt)  # strictly-below part
            R_ref[:] = R_ref[:] - sub[:, None, :] * yj[None, :, :]
            R_ref[pl.ds(j, 1)] = yj[None]
            return 0

        jax.lax.fori_loop(0, n, fwd, 0)  # R now holds y

        def bwd(t, _):
            j = n - 1 - t
            colj = Lt_ref[pl.ds(j, 1)][0]  # (n, LANE) = L[:, j]
            ljj = jnp.sum(colj * (iota == j).astype(dt), axis=0)
            blw = colj * (iota > j).astype(dt)
            acc = jnp.sum(blw[:, None, :] * X_ref[:], axis=0)  # (k, LANE)
            yj = R_ref[pl.ds(j, 1)][0]
            X_ref[pl.ds(j, 1)] = ((yj - acc) / ljj[None, :])[None]
            return 0

        jax.lax.fori_loop(0, n, bwd, 0)
        return X_ref[:]

    return pl.run_scoped(
        scoped,
        pltpu.VMEM((n, n, lane), dt),
        pltpu.VMEM((n, k, lane), dt),
        pltpu.VMEM((n, k, lane), dt),
    )


def _chol_any(Hv, d):
    return _chol_value(Hv, d) if d <= _UNROLL_MAX else _chol_value_loop(Hv, d)


def _chol_solve_any(L, rhs, d):
    if d <= _UNROLL_MAX:
        return _chol_solve_value(L, rhs, d)
    return _chol_solve_value_loop(L, rhs, d)


def _pdip_kernel(
    dims: Tuple[int, int, int],
    iters: int,
    tol: float,
    reg: float,
    q_ref, b_ref, h_ref, Q_ref, G_ref, A_ref,
    z_ref, lam_ref, nu_ref, s_ref, it_ref,
):
    n, m, p = dims
    dt = q_ref.dtype
    Q = Q_ref[:]  # (n, n, LANE)
    G = G_ref[:] if m else None  # (m, n, LANE)
    A = A_ref[:] if p else None  # (p, n, LANE)
    q = q_ref[:]
    b = b_ref[:] if p else None
    h = h_ref[:] if m else None

    eye_scaled = reg * jnp.eye(n, dtype=dt)[:, :, None]

    def mv(M, v):  # (r, n, LANE) x (n, LANE) -> (r, LANE)
        return jnp.sum(M * v[None, :, :], axis=1)

    def rmv(M, v):  # M'(r, n, LANE) with v (r, LANE) -> (n, LANE)
        return jnp.sum(M * v[:, None, :], axis=0)

    def build_H(ls):
        Hv = Q + eye_scaled
        if not m:
            return Hv
        if m <= _UNROLL_MAX // 2:
            for k in range(m):
                gk = G[k]  # (n, LANE)
                lsk = ls[k]  # (LANE,) — avoid int+None mixed indexing (gather)
                Hv = Hv + (gk[:, None, :] * gk[None, :, :]) * lsk[None, None, :]
            return Hv

        # large m: an unrolled rank-1 chain leaves m live (n, n, LANE)
        # intermediates for Mosaic's register allocator to spill — loop it.
        # Row k of G is a dynamic row load from the INPUT ref (O(n LANE));
        # lsk is a one-hot reduction over the per-iteration (m, LANE) value
        # (O(m LANE) — values have no dynamic_slice lowering)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

        def hbody(k, Hc):
            gk = G_ref[pl.ds(k, 1)][0]  # (n, LANE)
            lsk = jnp.sum(ls * (iota_m == k).astype(dt), axis=0)  # (LANE,)
            return Hc + (gk[:, None, :] * gk[None, :, :]) * lsk[None, None, :]

        return jax.lax.fori_loop(0, m, hbody, Hv)

    def factor(lam, s):
        Hv = build_H(lam / s) if m else build_H(None)
        Lh = _chol_any(Hv, n)
        if p:
            At = jnp.swapaxes(A, 0, 1)  # (n, p, LANE)
            HiAt = _chol_solve_any(Lh, At, n)  # (n, p, LANE)
            Sv = reg * jnp.eye(p, dtype=dt)[:, :, None] * jnp.ones((1, 1, LANE), dt)
            rows = []
            for a_ in range(p):
                rows.append(jnp.sum(A[a_][:, None, :] * HiAt, axis=0))  # (p, LANE)
            Sv = Sv + jnp.stack(rows, axis=0)
            Ls = _chol_any(Sv, p)
        else:
            Ls = None
        return Lh, Ls

    def solve_dir(Lh, Ls, rd, rpe, rpi, rc, lam, s):
        if m:
            rhs_z = -rd + rmv(G, (rc - lam * rpi) / s)
        else:
            rhs_z = -rd
        z1 = _chol_solve_any(Lh, rhs_z[:, None, :], n)[:, 0, :]
        if p:
            rhs_s = mv(A, z1) + rpe
            dnu = _chol_solve_any(Ls, rhs_s[:, None, :], p)[:, 0, :]
            dz = z1 - _chol_solve_any(Lh, rmv(A, dnu)[:, None, :], n)[:, 0, :]
        else:
            dnu = jnp.zeros((p, LANE), dt)
            dz = z1
        if m:
            ds = -rpi - mv(G, dz)
            dlam = -(rc + lam * ds) / s
        else:
            ds = jnp.zeros((m, LANE), dt)
            dlam = jnp.zeros((m, LANE), dt)
        return dz, dnu, dlam, ds

    def residuals(z, nu, lam, s):
        """Residuals plus per-lane scale factors for RELATIVE termination:
        for instances whose data/solution scale is large, absolute residuals
        cannot reach tol in f32 — the relative criterion is the honest one
        (same treatment as solvers/conic_ipm.py)."""
        Qz = mv(Q, z)
        rd = Qz + q
        dscale = jnp.maximum(jnp.max(jnp.abs(Qz), axis=0), jnp.max(jnp.abs(q), axis=0))
        if m:
            Gl = rmv(G, lam)
            rd = rd + Gl
            dscale = jnp.maximum(dscale, jnp.max(jnp.abs(Gl), axis=0))
        if p:
            An = rmv(A, nu)
            rd = rd + An
            dscale = jnp.maximum(dscale, jnp.max(jnp.abs(An), axis=0))
        pscale = jnp.zeros((LANE,), dt)
        if p:
            Az = mv(A, z)
            rpe = Az - b
            pscale = jnp.maximum(
                jnp.max(jnp.abs(Az), axis=0), jnp.max(jnp.abs(b), axis=0)
            )
        else:
            rpe = jnp.zeros((p, LANE), dt)
        if m:
            Gz = mv(G, z)
            rpi = Gz + s - h
            pscale = jnp.maximum(
                pscale,
                jnp.maximum(
                    jnp.max(jnp.abs(Gz), axis=0), jnp.max(jnp.abs(h), axis=0)
                ),
            )
        else:
            rpi = jnp.zeros((m, LANE), dt)
        pobj = 0.5 * jnp.sum(z * Qz, axis=0) + jnp.sum(q * z, axis=0)
        return rd, rpe, rpi, 1.0 + dscale, 1.0 + pscale, 1.0 + jnp.abs(pobj)

    def step_len(v, dv, frac):
        ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
        amax = jnp.min(ratio, axis=0)  # (LANE,)
        return jnp.minimum(1.0, frac * amax)

    # ---- init (same as solvers/qp.py) -------------------------------------
    ones_m = jnp.ones((m, LANE), dt)
    Lh0, Ls0 = factor(ones_m, ones_m) if m else factor(None, None)
    rd0, rpe0, rpi0, *_ = residuals(
        jnp.zeros((n, LANE), dt), jnp.zeros((p, LANE), dt), ones_m * 0, ones_m * 0
    )
    dz0, dnu0, _, _ = solve_dir(Lh0, Ls0, rd0, rpe0, rpi0, -ones_m, ones_m, ones_m)
    z = dz0
    nu = dnu0
    if m:
        s0 = h - mv(G, z)
        shift = jnp.maximum(0.0, -jnp.min(s0, axis=0) * 1.5) + 1.0
        s = s0 + shift[None, :]
        lam = ones_m
    else:
        s = jnp.zeros((m, LANE), dt)
        lam = jnp.zeros((m, LANE), dt)

    def body(carry):
        (it, z, nu, lam, s, zb, nub, lamb, sb, errb,
         mu_prev, err_prev, stall, itdone, _) = carry
        rd, rpe, rpi, dscale, pscale, gscale = residuals(z, nu, lam, s)
        if m:
            mu = jnp.sum(s * lam, axis=0) / m  # (LANE,)
        else:
            mu = jnp.zeros((LANE,), dt)
        Lh, Ls = factor(lam, s)
        dza, dnua, dlama, dsa = solve_dir(Lh, Ls, rd, rpe, rpi, s * lam, lam, s)
        if m:
            ap = step_len(s, dsa, 1.0)
            ad = step_len(lam, dlama, 1.0)
            mu_aff = jnp.sum(
                (s + ap[None, :] * dsa) * (lam + ad[None, :] * dlama), axis=0
            ) / m
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
            rc = s * lam + dsa * dlama - (sigma * mu)[None, :]
        else:
            rc = s * lam
        dz, dnu, dlam, ds = solve_dir(Lh, Ls, rd, rpe, rpi, rc, lam, s)
        if m:
            alpha = jnp.minimum(step_len(s, ds, 0.99), step_len(lam, dlam, 0.99))
        else:
            alpha = jnp.ones((LANE,), dt)
        # per-lane freeze: converged or non-finite lanes take zero steps;
        # termination is scale-RELATIVE (cf. solvers/conic_ipm.py): absolute
        # residuals are unreachable in f32 once data/solution scales are large
        pres = (
            jnp.max(jnp.abs(rpe), axis=0) + jnp.max(jnp.abs(rpi), axis=0)
        ) / pscale
        dres = jnp.max(jnp.abs(rd), axis=0) / dscale
        gaprel = mu * m / gscale
        done = (pres < tol) & (dres < tol) & (gaprel < tol)
        # best-iterate tracking: oscillating lanes (stuck at the f32 floor)
        # would otherwise export whatever state iteration `iters` left
        err = jnp.maximum(jnp.maximum(pres, dres), gaprel)
        better = err < errb
        sel = lambda new, old: jnp.where(better[None, :], new, old)
        zb, nub, lamb, sb = sel(z, zb), sel(nu, nub), sel(lam, lamb), sel(s, sb)
        errb = jnp.where(better, err, errb)
        # per-lane stall exit (same scheme as the fused conic IPM): on the
        # headline bench distribution ~30-40% of f32 lanes floor at the
        # complementarity limit above the relative tol and oscillate — they
        # never set `done`, so without this the tile-level early exit never
        # fires and every tile runs the full `iters` cap (measured: staged
        # p50 is 7 iterations while tiles ran 25). Five consecutive
        # iterations without >2% progress on BOTH mu and err ⇒ the lane is
        # at its floor; freeze it on its best iterate.
        stalled_now = (mu > 0.98 * mu_prev) & (err > 0.98 * err_prev)
        stall = jnp.where(stalled_now, stall + 1, jnp.zeros_like(stall))
        stalled = stall >= 5
        finite = (
            jnp.all(jnp.isfinite(dz), axis=0)
            & jnp.all(jnp.isfinite(dnu), axis=0)
            & jnp.all(jnp.isfinite(dlam), axis=0)
            & jnp.all(jnp.isfinite(ds), axis=0)
        )
        # per-lane finish iteration: first body evaluation at which the
        # lane is converged, stalled, or dead — `it` bodies have completed
        # at that point (the conic kernel's itdone scheme)
        itdone = jnp.where(
            (done | stalled | ~finite) & (itdone < 0),
            it.astype(dt) * jnp.ones((LANE,), dt), itdone,
        )
        # per-lane freeze via select, NOT alpha=0: 0 * NaN would poison the
        # state of a lane whose direction blew up
        step = (finite & ~done & ~stalled)[None, :]
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)[None, :]
        upd = lambda x, dx: jnp.where(step, x + alpha * dx, x)
        # tile-level early exit: once every lane is converged, stalled, or
        # dead, the while_loop below stops — on well-conditioned batches
        # typical convergence is ~12-16 iterations, so this saves the
        # fixed-25 tail
        alldone = jnp.all(done | ~finite | stalled)
        return (
            it + 1, upd(z, dz), upd(nu, dnu), upd(lam, dlam), upd(s, ds),
            zb, nub, lamb, sb, errb, mu, err, stall, itdone, alldone,
        )

    def cond(carry):
        it, *_, alldone = carry
        return (it < iters) & ~alldone

    big = jnp.full((LANE,), 1e30, dt)
    (it, z, nu, lam, s, zb, nub, lamb, sb, errb,
     _, _, _, itdone, _) = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros((), jnp.int32), z, nu, lam, s,
            z, nu, lam, s, big,
            big, big, jnp.zeros((LANE,), jnp.int32),
            jnp.full((LANE,), -1.0, dt), jnp.zeros((), jnp.bool_),
        ),
    )
    # the exit state never got a best-update inside the loop: score it once
    rd, rpe, rpi, dscale, pscale, gscale = residuals(z, nu, lam, s)
    mu = jnp.sum(s * lam, axis=0) / m if m else jnp.zeros((LANE,), dt)
    pres = (jnp.max(jnp.abs(rpe), axis=0) + jnp.max(jnp.abs(rpi), axis=0)) / pscale
    dres = jnp.max(jnp.abs(rd), axis=0) / dscale
    err = jnp.maximum(jnp.maximum(pres, dres), mu * m / gscale)
    fin = jnp.all(jnp.isfinite(z), axis=0) & jnp.all(jnp.isfinite(lam), axis=0)
    better = (err < errb) & fin
    sel = lambda new, old: jnp.where(better[None, :], new, old)
    z_ref[:] = sel(z, zb)
    lam_ref[:] = sel(lam, lamb)
    nu_ref[:] = sel(nu, nub)
    s_ref[:] = sel(s, sb)
    itdone = jnp.where(itdone >= 0, itdone, it.astype(dt))
    it_ref[:] = itdone[None, :]


def solve_batched_fused(
    qp: QuadProgram,
    *,
    max_iters: int = 25,
    tol: float | None = None,
    reg: float | None = None,
    return_iters: bool = False,
):
    """Solve a (B, ...) batch of QPs with the fused kernel. B is padded to a
    LANE multiple; returns AK17-convention primal-dual solutions.

    With ``return_iters=True`` returns ``(sol, iterations)`` where
    ``iterations`` is the int32 per-instance count of IPM bodies executed
    before the lane converged, stalled, or froze (the `with_info`
    diagnostics source — the kkt_metrics residuals alone cannot report
    it)."""
    B = qp.q.shape[0]
    n, m, p = qp.num_vars, qp.num_ineq, qp.num_eq
    dt = qp.Q.dtype
    if m == 0 or p == 0 or n > 128:
        # zero-sized blocks don't map to TPU kernel operands, and the
        # in-kernel working set (~4 n^2 LANE words) exceeds VMEM past n~128
        # even at the raised 127 MB limit — take the staged path
        from ...solvers import qp as qpsolver

        sol, info = qpsolver.solve_batched(qp, max_iters=max_iters, tol=tol, reg=reg)
        return (sol, info.iterations) if return_iters else sol
    if tol is None:
        tol = 1e-9 if dt == jnp.float64 else 5e-6
    if reg is None:
        reg = 1e-11 if dt == jnp.float64 else 1e-7

    to_ll = lambda x: jnp.moveaxis(x, 0, -1)
    padB = (-B) % LANE
    padded = jax.tree.map(
        lambda x: jnp.concatenate([x, jnp.repeat(x[:1], padB, 0)], 0) if padB else x,
        qp,
    )
    Bp = B + padB
    args = [
        to_ll(padded.q),
        to_ll(padded.b),
        to_ll(padded.h),
        to_ll(padded.Q),
        to_ll(padded.G),
        to_ll(padded.A),
    ]

    def spec(x):
        shape = x.shape[:-1] + (LANE,)
        ndim = x.ndim
        if ndim == 2:
            return pl.BlockSpec(shape, lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        partial(_pdip_kernel, (n, m, p), max_iters, tol, reg),
        grid=(Bp // LANE,),
        in_specs=[spec(a) for a in args],
        out_specs=[
            pl.BlockSpec((n, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, Bp), dt),
            jax.ShapeDtypeStruct((m, Bp), dt),
            jax.ShapeDtypeStruct((p, Bp), dt),
            jax.ShapeDtypeStruct((m, Bp), dt),
            jax.ShapeDtypeStruct((1, Bp), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            # v5e has 128 MB of VMEM; leave ~1 MB headroom. The n~100 tile
            # (BASELINE config 2's stated envelope) needs >100 MB once the
            # grid pipeline double-buffers the (n, n, LANE) operands.
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(*args)
    z, lam, nu, _, itv = out
    back = lambda x: jnp.moveaxis(x, -1, 0)[:B]
    sol = QPSolution(z=back(z), lam=back(lam), nu=back(nu))
    if return_iters:
        return sol, back(itv)[:, 0].astype(jnp.int32)
    return sol
