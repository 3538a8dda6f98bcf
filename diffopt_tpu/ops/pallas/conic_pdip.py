"""Fully-fused batched symmetric-cone IPM as a single Pallas TPU kernel.

The XLA-level conic IPM (``solvers/conic_ipm.py``) round-trips HBM between
every NT-scaling / KKT-assembly / LDL' / step-length stage, and a ``vmap``-ed
``while_loop`` synchronizes the WHOLE batch on its slowest instance. This
kernel keeps a 128-instance tile's problem (A, b, c) and iterate state
resident in VMEM for all interior-point iterations and early-exits per tile —
the same speed-of-light design as the fused QP PDIP (``pdip.py``), applied to
BASELINE config 3's SOCP workload.

Scope: internal layout ``[zero(p) | nonneg(l) | soc(d_1)...soc(d_k)]`` —
the caller (``solvers/conic_ipm.solve_batched_fused``) applies the static
orthogonal row transform R (nonpos negation, rsoc rotation) on the host.
Math is identical to ``solvers/conic_ipm.py``: NT-scaled Mehrotra
predictor-corrector, quasi-definite LDL' Newton systems (value-semantics,
unrolled — no scatter), scale-relative termination, per-lane freeze and
best-iterate tracking.

Layout: batch-along-lanes — operands ``(rows, cols, LANE)``/``(rows, LANE)``
with the batch on the 128-wide lane axis (see ``pdip.py``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- value-semantics LDL' on (N, N, LANE) -----------------------------------


def _ldl_value(Kv, nn):
    """Unpivoted LDL' of a quasi-definite (nn, nn, LANE) value (Vanderbei).
    Shrinking-submatrix form: no scatter, only slices and concats
    (cf. ``pdip._chol_value``). Returns unit-lower L and diagonal d."""
    a = Kv
    cols, ds = [], []
    lane = Kv.shape[-1]
    for j in range(nn):
        dj = a[0, 0, :]  # (LANE,)
        ds.append(dj)
        col = a[:, 0, :] / dj[None, :]  # (nn-j, LANE), unit at row 0
        cols.append(col)
        if j + 1 < nn:
            sub = col[1:]
            a = a[1:, 1:, :] - sub[:, None, :] * sub[None, :, :] * dj[None, None, :]
    parts = []
    for j in range(nn):
        full = cols[j]
        if j:
            full = jnp.concatenate(
                [jnp.zeros((j, lane), Kv.dtype), full], axis=0
            )
        parts.append(full[:, None, :])
    return jnp.concatenate(parts, axis=1), jnp.stack(ds, axis=0)


def _ldl_solve_value(L, d, rhs, nn):
    """Solve L D L' x = rhs for rhs (nn, LANE) values (unit-lower L).

    Substitution sums carry a 3D (rows, 1, LANE) operand: Mosaic rejects 2D
    multi_reductions whose reduced dimension has a nonzero sublane offset
    (sliced L columns), while the 3D form lowers — same discipline as
    ``pdip._chol_solve_value``."""
    ys = []
    for j in range(nn):
        acc = rhs[j][None, :]  # (1, LANE)
        if j > 0:
            Y = jnp.stack(ys, axis=0)  # (j, 1, LANE)
            lrow = L[j, :j, :]  # (j, LANE)
            acc = acc - jnp.sum(lrow[:, None, :] * Y, axis=0)
        ys.append(acc)
    xs = [None] * nn
    for j in range(nn - 1, -1, -1):
        acc = ys[j] / d[j][None, :]
        if j + 1 < nn:
            X = jnp.stack(xs[j + 1 :], axis=0)  # (nn-j-1, 1, LANE)
            lcol = L[j + 1 :, j, :]
            acc = acc - jnp.sum(lcol[:, None, :] * X, axis=0)
        xs[j] = acc
    return jnp.concatenate(xs, axis=0)


# Past this dimension the unrolled shrinking-submatrix LDL' hits the same
# Mosaic register-spill wall as pdip's Cholesky (unrolled steps leave live
# (rows, LANE) slices); the loop forms below mirror pdip's scratch-ref
# variants — dynamic row load/stores on a pl.run_scoped VMEM buffer, with
# only the rank-1 trailing update paying O(N^2 LANE).
_LDL_UNROLL_MAX = 72


def _ldl_value_loop(Kv, nn):
    """Unpivoted LDL' of a quasi-definite (nn, nn, LANE) value via a
    fori_loop over a VMEM scratch ref (cf. ``pdip._chol_value_loop``). The
    quasi-definite matrix is symmetric, so column j equals row j; L's unit
    column j is stored back into row j (scaled rows are never re-read: their
    masked update entries are zero). Returns (unit-lower L, diagonal d)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = Kv.dtype
    lane = Kv.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)

    def scoped(A_ref, d_ref):
        A_ref[:] = Kv

        def body(j, _):
            colj = A_ref[pl.ds(j, 1)][0]  # (nn, LANE): row j == column j
            dj = jnp.sum(colj * (iota == j).astype(dt), axis=0)  # (LANE,)
            col = colj / dj[None, :]
            sub = col * (iota > j).astype(dt)  # strictly-below part
            A_ref[:] = A_ref[:] - sub[:, None, :] * sub[None, :, :] * dj[None, None, :]
            unit = col * (iota >= j).astype(dt)
            A_ref[pl.ds(j, 1)] = unit[None]
            d_ref[pl.ds(j, 1)] = dj[None]
            return 0

        jax.lax.fori_loop(0, nn, body, 0)
        return jnp.swapaxes(A_ref[:], 0, 1), d_ref[:]

    return pl.run_scoped(
        scoped, pltpu.VMEM((nn, nn, lane), dt), pltpu.VMEM((nn, lane), dt)
    )


def _ldl_solve_refine_loop(L, d, K, rhs, nn, passes):
    """Solve L D L' x = rhs (unit-lower L, rhs (nn, LANE)) via substitution
    fori_loops over scratch refs (cf. ``pdip._chol_solve_value_loop``),
    then apply ``passes`` iterative-refinement corrections against the
    assembled K (pass ``K=None, passes=0`` for a plain solve). Only L' is
    staged, ONCE for all 1 + passes substitution sweeps: the forward solve
    runs in column-oriented saxpy form (unit diagonal, so y_j is just the
    current r_j; then r_{i>j} -= L[i,j] y_j, and R becomes y in place), the
    backward in row-dot form — both read L's columns = L'-rows. One
    (nn, nn, LANE) matrix buffer instead of an L + L' pair keeps the
    scoped-vmem stack (~16 MB measured limit) satisfied at the N = 128 gate
    boundary (two buffers hit 16.8 MB there; re-staging per sweep would
    also re-pay the ~8.4 MB O(N^2 LANE) copy at N = 128, 2-3x per
    direction)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = L.dtype
    lane = rhs.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)

    def scoped(Lt_ref, R_ref, X_ref):
        Lt_ref[:] = jnp.swapaxes(L, 0, 1)
        X_ref[:] = jnp.zeros_like(rhs)

        def one_solve(rhs_val):
            R_ref[:] = rhs_val

            def fwd(j, _):
                colj = Lt_ref[pl.ds(j, 1)][0]  # L[:, j], unit at j
                yj = R_ref[pl.ds(j, 1)][0]
                sub = colj * (iota > j).astype(dt)
                R_ref[:] = R_ref[:] - sub * yj[None, :]
                return 0

            jax.lax.fori_loop(0, nn, fwd, 0)  # R now holds y

            def bwd(t, _):
                j = nn - 1 - t
                colj = Lt_ref[pl.ds(j, 1)][0]
                colj = colj * (iota > j).astype(dt)
                acc = jnp.sum(colj[:, None] * X_ref[:][:, None], axis=0)[0]
                yj = R_ref[pl.ds(j, 1)][0]
                dj = jnp.sum(d * (iota == j).astype(dt), axis=0)
                X_ref[pl.ds(j, 1)] = (yj / dj - acc)[None]
                return 0

            jax.lax.fori_loop(0, nn, bwd, 0)
            return X_ref[:]

        sol = one_solve(rhs)
        for _ in range(passes):
            resid = rhs - jnp.sum(K * sol[None, :, :], axis=1)
            sol = sol + one_solve(resid)
        return sol

    return pl.run_scoped(
        scoped,
        pltpu.VMEM((nn, nn, lane), dt),
        pltpu.VMEM((nn, lane), dt),
        pltpu.VMEM((nn, lane), dt),
    )


def _ldl_any(Kv, nn):
    if nn <= _LDL_UNROLL_MAX:
        return _ldl_value(Kv, nn)
    return _ldl_value_loop(Kv, nn)


def _ldl_solve_any(L, d, rhs, nn):
    if nn <= _LDL_UNROLL_MAX:
        return _ldl_solve_value(L, d, rhs, nn)
    return _ldl_solve_refine_loop(L, d, None, rhs, nn, passes=0)


# --- lane-aware Jordan / NT helpers on (mC, LANE) values ---------------------


def _soc_slices(l, soc_dims):
    out = []
    off = l
    for d in soc_dims:
        out.append(slice(off, off + d))
        off += d
    return out


def _psd_slices(l, soc_dims, psd_sides):
    out = []
    off = l + sum(soc_dims)
    for d in psd_sides:
        tri = d * (d + 1) // 2
        out.append(slice(off, off + tri))
        off += tri
    return out


# --- lanes-batched small symmetric linear algebra on (d, d, LANE) values ----
# Matrices live as 3D values with the 128-instance batch on the lane axis;
# rows/columns are rebuilt by slice+concat (Mosaic has no scatter and rejects
# (slice, int, slice) .at updates), and contractions carry full 3D operands
# (sum over axis 0/1 of elementwise products — the multi_reduction pattern
# that lowers; see _ldl_solve_value). All loops unroll at trace time: sides
# are <= _PSD_SIDE_MAX.


def _tri_order(d):
    """Static svec index order (upper triangle column-by-column), matching
    ``cones._tri_order``."""
    return [(r, c) for c in range(d) for r in range(c + 1)]


def _svec_to_mats(u, d):
    """svec block (tri, LANE) -> symmetric (d, d, LANE) value."""
    isq = 1.0 / math.sqrt(2.0)
    idx = {}
    for k, (r, c) in enumerate(_tri_order(d)):
        idx[(r, c)] = k
        idx[(c, r)] = k
    rows = []
    for i in range(d):
        ent = []
        for j in range(d):
            k = idx[(i, j)]
            e = u[k : k + 1, :]
            if i != j:
                e = e * isq
            ent.append(e)
        rows.append(jnp.concatenate(ent, axis=0)[None])
    return jnp.concatenate(rows, axis=0)


def _mats_to_svec(M, d):
    """Symmetric (d, d, LANE) value -> svec (tri, LANE), symmetrizing."""
    sq2 = math.sqrt(2.0)
    parts = []
    for (r, c) in _tri_order(d):
        if r == c:
            parts.append(M[r, r : r + 1, :])
        else:
            parts.append(
                (M[r, c : c + 1, :] + M[c, r : r + 1, :]) * (0.5 * sq2)
            )
    return jnp.concatenate(parts, axis=0)


def _matmul_ll(a, b, d):
    """Per-lane (d, d) @ (d, d) on (d, d, LANE) values."""
    rows = []
    for i in range(d):
        ai = a[i]  # (d, LANE)
        rows.append(jnp.sum(ai[:, None, :] * b, axis=0)[None])
    return jnp.concatenate(rows, axis=0)


def _sym_ll(M):
    return 0.5 * (M + jnp.swapaxes(M, 0, 1))


def _set_pair_axis0(A, p, q, newp, newq):
    pieces = []
    if p:
        pieces.append(A[:p])
    pieces.append(newp[None])
    if q - p - 1:
        pieces.append(A[p + 1 : q])
    pieces.append(newq[None])
    if A.shape[0] - q - 1:
        pieces.append(A[q + 1 :])
    return jnp.concatenate(pieces, axis=0)


def _set_pair_axis1(A, p, q, newp, newq):
    pieces = []
    if p:
        pieces.append(A[:, :p])
    pieces.append(newp[:, None, :])
    if q - p - 1:
        pieces.append(A[:, p + 1 : q])
    pieces.append(newq[:, None, :])
    if A.shape[1] - q - 1:
        pieces.append(A[:, q + 1 :])
    return jnp.concatenate(pieces, axis=1)


def _jacobi_eigh_ll(A, d, vectors=True):
    """Cyclic-Jacobi eigendecomposition of a symmetric (d, d, LANE) value
    (lanes-batched port of ``ops/smalleig.jacobi_eigh``; eigenvalues
    unsorted — all consumers here are order-free). Rutishauser tangent
    rotations; the pair loop unrolls (d(d-1)/2 per sweep)."""
    dt = A.dtype
    sweeps = (6 if d <= 4 else 8) + (2 if dt == jnp.float64 else 0)
    eps = float(jnp.finfo(dt).eps)
    V = None
    if vectors:
        V = jnp.eye(d, dtype=dt)[:, :, None] * jnp.ones((1, 1, LANE), dt)
    if d == 1:
        return A[0], V
    for _ in range(sweeps):
        for p_ in range(d - 1):
            for q_ in range(p_ + 1, d):
                app = A[p_, p_, :]
                aqq = A[q_, q_, :]
                apq = A[p_, q_, :]
                small = jnp.abs(apq) <= eps * (jnp.abs(app) + jnp.abs(aqq))
                apq_s = jnp.where(small, 1.0, apq)
                tau = 0.5 * (aqq - app) / apq_s
                # sqrt(1 + tau^2) is overflow-safe here: the relative-eps
                # skip bounds |tau| <= 0.5/eps
                t = jnp.where(
                    small,
                    0.0,
                    jnp.where(tau >= 0, 1.0, -1.0)
                    / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
                )
                ct = jnp.sqrt(1.0 + t * t)
                c = (1.0 / ct)[None, :]
                s = (t / ct)[None, :]
                rowp = A[p_]
                rowq = A[q_]
                A = _set_pair_axis0(A, p_, q_, c * rowp - s * rowq, s * rowp + c * rowq)
                colp = A[:, p_, :]
                colq = A[:, q_, :]
                A = _set_pair_axis1(A, p_, q_, c * colp - s * colq, s * colp + c * colq)
                if vectors:
                    vp = V[:, p_, :]
                    vq = V[:, q_, :]
                    V = _set_pair_axis1(V, p_, q_, c * vp - s * vq, s * vp + c * vq)
    w = jnp.concatenate([A[j, j : j + 1, :] for j in range(d)], axis=0)
    return w, V


def _psd_sqrt_pair_ll(X, d, eps):
    """(X^{1/2}, X^{-1/2}) of a (nearly) PD symmetric (d, d, LANE) value via
    lanes Jacobi with a relative eigenvalue floor (cf. conic_ipm._psd_sqrt_pair)."""
    w, V = _jacobi_eigh_ll(X, d)
    wf = jnp.maximum(w, eps * jnp.maximum(jnp.max(w, axis=0), 0.0)[None, :])
    wf = jnp.maximum(wf, jnp.asarray(1e-30, X.dtype))
    sq = jnp.sqrt(wf)
    Vt = jnp.swapaxes(V, 0, 1)
    Xh = _matmul_ll(V * sq[None, :, :], Vt, d)
    Xih = _matmul_ll(V / sq[None, :, :], Vt, d)
    return Xh, Xih


def _J(u):
    return jnp.concatenate([u[:1], -u[1:]], axis=0)


def _jdet_sqrt(u, eps):
    nu1 = jnp.sqrt(jnp.sum(u[1:] ** 2, axis=0))  # (LANE,)
    det = (u[0] - nu1) * (u[0] + nu1)
    return jnp.sqrt(jnp.maximum(det, eps * u[0] ** 2))


def _kernel(dims, socs, psds, iters, tol, reg, eps, *refs):
    n, p, l = dims
    if p:
        (c_ref, bE_ref, bC_ref, AE_ref, AC_ref,
         x_ref, yE_ref, yC_ref, s_ref, it_ref, pres_ref, dres_ref) = refs
    else:
        # zero-sized blocks don't map to TPU kernel operands (cf. pdip.py);
        # equality-free programs omit bE/AE/yE entirely and carry a (1, LANE)
        # dummy in their place inside the loop state
        (c_ref, bC_ref, AC_ref,
         x_ref, yC_ref, s_ref, it_ref, pres_ref, dres_ref) = refs
        bE_ref = AE_ref = yE_ref = None
    soc_dims = socs
    psd_sides = psds
    mC = l + sum(soc_dims) + sum(d * (d + 1) // 2 for d in psd_sides)
    N = n + p + mC
    dt = c_ref.dtype
    c = c_ref[:]
    bC = bC_ref[:]
    AC = AC_ref[:]  # (mC, n, LANE)
    bE = bE_ref[:] if p else None
    AE = AE_ref[:] if p else None
    slices = _soc_slices(l, soc_dims)
    pslices = _psd_slices(l, soc_dims, psd_sides)
    nu_deg = max(l + len(soc_dims) + sum(psd_sides), 1)

    def mv(M, v):  # (r, n, L) x (n, L) -> (r, L)
        return jnp.sum(M * v[None, :, :], axis=1)

    def rmv(M, v):  # M' v: (r, n, L), (r, L) -> (n, L)
        return jnp.sum(M * v[:, None, :], axis=0)

    # identity element of the C-block cone
    e_parts = [jnp.ones((l, LANE), dt)] if l else []
    for d_ in soc_dims:
        e_parts.append(
            jnp.concatenate(
                [jnp.ones((1, LANE), dt), jnp.zeros((d_ - 1, LANE), dt)], axis=0
            )
        )
    for d_ in psd_sides:
        rows = [
            (jnp.ones((1, LANE), dt) if r == cc else jnp.zeros((1, LANE), dt))
            for (r, cc) in _tri_order(d_)
        ]
        e_parts.append(jnp.concatenate(rows, axis=0))
    e = jnp.concatenate(e_parts, axis=0)

    def nt_scaling(s, y):
        """Returns (w (l,L) or None, [(eta (L,), v (d,L), wb (d,L))...],
        [(Rb, Rbi, Wnt) per psd block] with R = W_nt^{1/2} as (d, d, LANE))."""
        w = jnp.sqrt(s[:l] / y[:l]) if l else None
        blocks = []
        for sl in slices:
            sb_, yb_ = s[sl], y[sl]
            rs = _jdet_sqrt(sb_, eps)
            ry = _jdet_sqrt(yb_, eps)
            sb = sb_ / rs[None, :]
            yb = yb_ / ry[None, :]
            gamma = jnp.sqrt(
                jnp.maximum((1.0 + jnp.sum(sb * yb, axis=0)) / 2.0, eps)
            )
            wb = (sb + _J(yb)) / (2.0 * gamma)[None, :]
            head = wb[:1] + 1.0
            v = jnp.concatenate([head, wb[1:]], axis=0) / jnp.sqrt(
                2.0 * jnp.maximum(wb[0] + 1.0, eps)
            )[None, :]
            blocks.append((jnp.sqrt(rs / ry), v, wb))
        pblocks = []
        for d_, sl in zip(psd_sides, pslices):
            # W_nt = S^{1/2} (S^{1/2} Y S^{1/2})^{-1/2} S^{1/2} (the matrix
            # geometric mean solving W Y W = S; cf. conic_ipm._nt_scaling)
            S = _svec_to_mats(s[sl], d_)
            Y = _svec_to_mats(y[sl], d_)
            Sh, _ = _psd_sqrt_pair_ll(S, d_, eps)
            Z = _matmul_ll(Sh, _matmul_ll(Y, Sh, d_), d_)
            _, Zih = _psd_sqrt_pair_ll(_sym_ll(Z), d_, eps)
            Wnt = _sym_ll(_matmul_ll(Sh, _matmul_ll(Zih, Sh, d_), d_))
            Rb, Rbi = _psd_sqrt_pair_ll(Wnt, d_, eps)
            pblocks.append((Rb, Rbi, Wnt))
        return w, blocks, pblocks

    def W_apply(sc, u, inv):
        w, blocks, pblocks = sc
        parts = [u[:l] / w if inv else u[:l] * w] if l else []
        for sl, (eta, v, _) in zip(slices, blocks):
            ub = u[sl]
            if inv:
                # Wbar^-1 u = J Wbar J u = 2 (Jv)(v'Ju) - Ju
                ju = _J(ub)
                vju = jnp.sum(v * ju, axis=0)  # (LANE,)
                out = 2.0 * _J(v) * vju[None, :] - ju
                parts.append(out / eta[None, :])
            else:
                vu = jnp.sum(v * ub, axis=0)
                out = 2.0 * v * vu[None, :] - _J(ub)
                parts.append(out * eta[None, :])
        for d_, sl, (Rb, Rbi, _) in zip(psd_sides, pslices, pblocks):
            Rm = Rbi if inv else Rb
            U = _svec_to_mats(u[sl], d_)
            parts.append(
                _mats_to_svec(_matmul_ll(Rm, _matmul_ll(U, Rm, d_), d_), d_)
            )
        return jnp.concatenate(parts, axis=0)

    def w2_rows(sc):
        """W^2 as a dense (mC, mC, LANE) block-diagonal value:
        diag(w^2) and eta^2 (2 wb wb' - J) per soc block (the CVXOPT
        identity (2vv'-J)^2 = 2 wb wb' - J, verified numerically); the
        symmetric Kronecker square of W_nt per psd block, entrywise
        M[(i<=j),(k<=l)] = (w_a w_b / 2)(P_ik P_jl + P_il P_jk) with
        svec weights w = 1 (diag) / sqrt2 (off-diag) — equal to the
        column-by-column svec(W_nt E_b W_nt) build of conic_ipm._w2_dense."""
        w, blocks, pblocks = sc
        rows = []
        if l:
            diag = jnp.eye(l, dtype=dt)[:, :, None] * (w * w)[:, None, :]
            rows.append(
                jnp.concatenate([diag, jnp.zeros((l, mC - l, LANE), dt)], axis=1)
                if mC > l
                else diag
            )
        off = l
        for d_, (eta, _, wb) in zip(soc_dims, blocks):
            Jd = jnp.diag(
                jnp.concatenate([jnp.ones((1,)), -jnp.ones((d_ - 1,))])
            ).astype(dt)[:, :, None]
            blk = (2.0 * wb[:, None, :] * wb[None, :, :] - Jd) * (eta * eta)[
                None, None, :
            ]
            pieces = []
            if off:
                pieces.append(jnp.zeros((d_, off, LANE), dt))
            pieces.append(blk)
            if mC - off - d_:
                pieces.append(jnp.zeros((d_, mC - off - d_, LANE), dt))
            rows.append(jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else blk)
            off += d_
        sq2 = math.sqrt(2.0)
        for d_, (_, _, P) in zip(psd_sides, pblocks):
            tri = d_ * (d_ + 1) // 2
            order = _tri_order(d_)
            wts = [1.0 if r == cc else sq2 for (r, cc) in order]
            brows = []
            for a_, (i, j) in enumerate(order):
                ent = []
                for b_, (k, l_) in enumerate(order):
                    coef = 0.5 * wts[a_] * wts[b_]
                    ent.append(
                        coef
                        * (
                            P[i, k : k + 1, :] * P[j, l_, :][None, :]
                            + P[i, l_ : l_ + 1, :] * P[j, k, :][None, :]
                        )
                    )
                brows.append(jnp.concatenate(ent, axis=0)[None])
            blk = jnp.concatenate(brows, axis=0)  # (tri, tri, LANE)
            pieces = []
            if off:
                pieces.append(jnp.zeros((tri, off, LANE), dt))
            pieces.append(blk)
            if mC - off - tri:
                pieces.append(jnp.zeros((tri, mC - off - tri, LANE), dt))
            rows.append(jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else blk)
            off += tri
        return jnp.concatenate(rows, axis=0)

    def jmul(u, v):
        parts = [u[:l] * v[:l]] if l else []
        for sl in slices:
            ub, vb = u[sl], v[sl]
            head = jnp.sum(ub * vb, axis=0, keepdims=True)
            tail = ub[:1] * vb[1:] + vb[:1] * ub[1:]
            parts.append(jnp.concatenate([head, tail], axis=0))
        for d_, sl in zip(psd_sides, pslices):
            U = _svec_to_mats(u[sl], d_)
            V = _svec_to_mats(v[sl], d_)
            # (UV + VU)/2 = sym(UV) for symmetric U, V
            parts.append(_mats_to_svec(_matmul_ll(U, V, d_), d_))
        return jnp.concatenate(parts, axis=0)

    def jsolve(lam, d, lam_peigs=None):
        parts = [d[:l] / lam[:l]] if l else []
        for sl in slices:
            lb, db = lam[sl], d[sl]
            nl1 = jnp.sqrt(jnp.sum(lb[1:] ** 2, axis=0))
            det = (lb[0] - nl1) * (lb[0] + nl1)
            det = jnp.where(jnp.abs(det) > eps * lb[0] ** 2, det, eps * lb[0] ** 2)
            g0 = (lb[0] * db[0] - jnp.sum(lb[1:] * db[1:], axis=0)) / det
            g1 = (db[1:] - lb[1:] * g0[None, :]) / lb[0][None, :]
            parts.append(jnp.concatenate([g0[None, :], g1], axis=0))
        for k_, (d_, sl) in enumerate(zip(psd_sides, pslices)):
            # Lyapunov solve L G + G L = 2 D via the shared eigh of lam
            D = _svec_to_mats(d[sl], d_)
            if lam_peigs is None:
                w_, Q = _jacobi_eigh_ll(_svec_to_mats(lam[sl], d_), d_)
            else:
                w_, Q = lam_peigs[k_]
            denom = w_[:, None, :] + w_[None, :, :]
            floor = eps * jnp.max(jnp.abs(w_), axis=0)[None, None, :]
            denom = jnp.where(jnp.abs(denom) > floor, denom, floor)
            Qt = jnp.swapaxes(Q, 0, 1)
            inner = _matmul_ll(Qt, _matmul_ll(2.0 * D, Q, d_), d_) / denom
            parts.append(
                _mats_to_svec(_matmul_ll(Q, _matmul_ll(inner, Qt, d_), d_), d_)
            )
        return jnp.concatenate(parts, axis=0)

    def max_step(u, du, u_pisqrts=None):
        big = jnp.asarray(3.4e38, dt)
        if l:
            ratio = jnp.where(du[:l] < 0, -u[:l] / du[:l], big)
            amax = jnp.min(ratio, axis=0)
        else:
            amax = jnp.full((LANE,), big, dt)
        for k_, (d_, sl) in enumerate(zip(psd_sides, pslices)):
            # alpha_max = -1/lambda_min(U^{-1/2} dU U^{-1/2}) when min < 0
            dU = _svec_to_mats(du[sl], d_)
            if u_pisqrts is None:
                _, Uih = _psd_sqrt_pair_ll(_svec_to_mats(u[sl], d_), d_, eps)
            else:
                Uih = u_pisqrts[k_]
            Bm = _matmul_ll(Uih, _matmul_ll(dU, Uih, d_), d_)
            lmin_w, _ = _jacobi_eigh_ll(_sym_ll(Bm), d_, vectors=False)
            lmin = jnp.min(lmin_w, axis=0)
            amax = jnp.minimum(
                amax,
                jnp.where(lmin < 0, -1.0 / jnp.where(lmin < 0, lmin, -1.0), big),
            )
        for sl in slices:
            ub, db = u[sl], du[sl]
            qa = db[0] ** 2 - jnp.sum(db[1:] ** 2, axis=0)
            qb = 2.0 * (ub[0] * db[0] - jnp.sum(ub[1:] * db[1:], axis=0))
            nu1 = jnp.sqrt(jnp.sum(ub[1:] ** 2, axis=0))
            qc = jnp.maximum((ub[0] - nu1) * (ub[0] + nu1), 0.0)
            disc = qb**2 - 4.0 * qa * qc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            safe_a = jnp.where(jnp.abs(qa) > 1e-30, qa, 1.0)
            r1 = (-qb - sq) / (2.0 * safe_a)
            r2 = (-qb + sq) / (2.0 * safe_a)
            rlin = jnp.where(qb < 0, -qc / jnp.where(qb < 0, qb, 1.0), big)
            quad = jnp.minimum(
                jnp.where(r1 > 0, r1, big), jnp.where(r2 > 0, r2, big)
            )
            root = jnp.where(
                jnp.abs(qa) > 1e-30, jnp.where(disc >= 0, quad, big), rlin
            )
            cap = jnp.where(db[0] < 0, -ub[0] / jnp.where(db[0] < 0, db[0], 1.0), big)
            amax = jnp.minimum(amax, jnp.minimum(root, cap))
        return jnp.minimum(1.0, amax)

    def residuals(x, yE, yC, s):
        rd = c + rmv(AC, yC)
        if p:
            rd = rd + rmv(AE, yE)
        rpE = mv(AE, x) - bE if p else jnp.zeros((p, LANE), dt)
        rpC = mv(AC, x) + s - bC
        return rd, rpE, rpC

    def metrics(x, yE, yC, s, rd, rpE, rpC):
        """Scale-relative termination metrics, numerically IDENTICAL
        (2-norms) to solvers/conic_ipm.py so 'converged' does not flip
        across the fused/XLA dispatch boundary."""
        nrm = lambda u: jnp.sqrt(jnp.sum(u * u, axis=0))
        AxC = rpC - s + bC
        Ax2 = jnp.sum(AxC * AxC, axis=0)
        b2 = jnp.sum(bC * bC, axis=0)
        pres2 = jnp.sum(rpC * rpC, axis=0)
        if p:
            AxE = rpE + bE
            Ax2 = Ax2 + jnp.sum(AxE * AxE, axis=0)
            b2 = b2 + jnp.sum(bE * bE, axis=0)
            pres2 = pres2 + jnp.sum(rpE * rpE, axis=0)
        psc = 1.0 + jnp.maximum(
            jnp.sqrt(Ax2), jnp.maximum(nrm(s), jnp.sqrt(b2))
        )
        pres = jnp.sqrt(pres2) / psc
        dsc = 1.0 + jnp.maximum(nrm(rd - c), nrm(c))
        dres = nrm(rd) / dsc
        pobj = jnp.sum(c * x, axis=0)
        dobj = -jnp.sum(bC * yC, axis=0)
        if p:
            dobj = dobj - jnp.sum(bE * yE, axis=0)
        gaprel = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return pres, dres, gaprel

    def factor(sc):
        # Row/column order [cone | x | eq] (mirrors solvers/conic_ipm.py):
        # the unpivoted LDL' must eliminate the O(1) -W^2 block FIRST — with
        # x first the leading pivots are the tiny reg*I and the elimination
        # growth ~||A||^2/reg wipes out W^2 in f32 (O(1) backward error the
        # refinement pass cannot contract; stalled stragglers measured).
        W2 = w2_rows(sc)
        eye_n = reg * jnp.eye(n, dtype=dt)[:, :, None] * jnp.ones((1, 1, LANE), dt)
        ACt = jnp.swapaxes(AC, 0, 1)  # (n, mC, LANE)
        if p:
            AEt = jnp.swapaxes(AE, 0, 1)
            top = jnp.concatenate([-W2, AC, jnp.zeros((mC, p, LANE), dt)], axis=1)
            mid = jnp.concatenate([ACt, eye_n, AEt], axis=1)
            eye_p = -reg * jnp.eye(p, dtype=dt)[:, :, None] * jnp.ones(
                (1, 1, LANE), dt
            )
            bot = jnp.concatenate(
                [jnp.zeros((p, mC, LANE), dt), AE, eye_p], axis=1
            )
            K = jnp.concatenate([top, mid, bot], axis=0)
        else:
            top = jnp.concatenate([-W2, AC], axis=1)
            bot = jnp.concatenate([ACt, eye_n], axis=1)
            K = jnp.concatenate([top, bot], axis=0)
        L, dv = _ldl_any(K, N)
        return L, dv, K

    def solve_dir(F, sc, rd, rpE, rpC, g):
        L, dv, K = F
        pieces = [-rpC + W_apply(sc, g, inv=False), -rd]
        if p:
            pieces.append(-rpE)
        rhs = jnp.concatenate(pieces, axis=0)
        # refinement absorbs the remaining ~cond(W^2) elimination growth of
        # the cone-first factorization in f32; psd W^2 blocks condition
        # orders worse than soc near convergence (cf. conic_ipm refine_iters
        # bump), so they get a second pass — without it lanes hover at
        # pres ~1e-5 vs tol 5e-6 and churn to the iteration cap (measured)
        passes = 2 if psd_sides else 1
        if N <= _LDL_UNROLL_MAX:
            sol = _ldl_solve_value(L, dv, rhs, N)
            for _ in range(passes):
                resid = rhs - jnp.sum(K * sol[None, :, :], axis=1)
                sol = sol + _ldl_solve_value(L, dv, resid, N)
        else:
            # loop path: stage L' into scratch once for all sweeps
            sol = _ldl_solve_refine_loop(L, dv, K, rhs, N, passes)
        dyC = sol[:mC]
        dx = sol[mC : mC + n]
        dyE = sol[mC + n :] if p else jnp.zeros((1, LANE), dt)
        ds = -W_apply(sc, g + W_apply(sc, dyC, inv=False), inv=False)
        return dx, dyE, dyC, ds

    # ---- init (identity scaling, then shift into the interior) -------------
    sc0 = nt_scaling(e, e)
    F0 = factor(sc0)
    zx = jnp.zeros((n, LANE), dt)
    zyE = jnp.zeros((max(p, 1), LANE), dt)  # dummy row when p == 0
    zC = jnp.zeros((mC, LANE), dt)
    rd0, rpE0, rpC0 = residuals(zx, zyE, zC, zC)
    dx0, dyE0, _, _ = solve_dir(F0, sc0, rd0, rpE0, rpC0, -e)
    x = dx0
    yE = dyE0
    s0 = bC - mv(AC, x)
    parts = []
    if l:
        sh = jnp.maximum(0.0, -1.5 * jnp.min(s0[:l], axis=0)) + 1.0
        parts.append(s0[:l] + sh[None, :])
    for sl in slices:
        sb = s0[sl]
        excess = jnp.sqrt(jnp.sum(sb[1:] ** 2, axis=0)) - sb[0]
        shb = jnp.maximum(0.0, 1.5 * excess) + 1.0
        parts.append(jnp.concatenate([sb[:1] + shb[None, :], sb[1:]], axis=0))
    for d_, sl in zip(psd_sides, pslices):
        sb = s0[sl]
        wmin, _ = _jacobi_eigh_ll(_svec_to_mats(sb, d_), d_, vectors=False)
        shb = jnp.maximum(0.0, -1.5 * jnp.min(wmin, axis=0)) + 1.0
        eye_rows = jnp.concatenate(
            [
                (jnp.ones((1, LANE), dt) if r == cc else jnp.zeros((1, LANE), dt))
                for (r, cc) in _tri_order(d_)
            ],
            axis=0,
        )
        parts.append(sb + shb[None, :] * eye_rows)
    s = jnp.concatenate(parts, axis=0)
    yC = e

    def body(carry):
        (it, x, yE, yC, s, xb, yEb, yCb, sb_, errb, itdone,
         mu_prev, err_prev, stall, _) = carry
        rd, rpE, rpC = residuals(x, yE, yC, s)
        mu = jnp.sum(s * yC, axis=0) / nu_deg
        pres, dres, gaprel = metrics(x, yE, yC, s, rd, rpE, rpC)
        done = (pres < tol) & (dres < tol) & (gaprel < tol)
        # per-lane iteration count: record the first iteration at which a
        # lane satisfies the criteria (the tile keeps running for others)
        itdone = jnp.where(done & (itdone < 0), it.astype(dt), itdone)
        err = jnp.maximum(jnp.maximum(pres, dres), gaprel)
        better = err < errb
        selb = lambda new, old: jnp.where(better[None, :], new, old)
        xb, yEb, yCb, sb_ = selb(x, xb), selb(yE, yEb), selb(yC, yCb), selb(s, sb_)
        errb = jnp.where(better, err, errb)
        # per-lane stagnation exit (mirrors solvers/conic_ipm.py): lanes at
        # the f32 complementarity floor would otherwise hold the WHOLE tile
        # at max_iters — count iterations where neither mu nor err contracts
        # and freeze the lane at 5 (best-iterate keeps its best state)
        stalled_now = (mu > 0.98 * mu_prev) & (err > 0.98 * err_prev)
        stall = jnp.where(stalled_now, stall + 1, jnp.zeros_like(stall))
        stalled = stall >= 5

        sc = nt_scaling(s, yC)
        F = factor(sc)
        lam = W_apply(sc, s, inv=True)
        # step-to-boundary runs in the SCALED space: primal and dual both
        # step from lam (W is a cone automorphism, so s + a ds interior
        # <=> lam + a W^-1 ds interior), and ONE eigendecomposition per psd
        # block serves the Lyapunov jsolve and all four step computations
        # (each unscaled max_step would pay its own eigh + isqrt — the
        # dominant unrolled-op count of the psd path; cf. conic_ipm.py's
        # _lam_psd_eigs / _max_step_scaled_pair)
        lam_peigs = [
            _jacobi_eigh_ll(_svec_to_mats(lam[sl], d_), d_)
            for d_, sl in zip(psd_sides, pslices)
        ]
        lam_isq = []
        for (w_, Q), d_ in zip(lam_peigs, psd_sides):
            wf = jnp.maximum(
                w_, eps * jnp.maximum(jnp.max(w_, axis=0), 0.0)[None, :]
            )
            wf = jnp.maximum(wf, jnp.asarray(1e-30, dt))
            lam_isq.append(
                _matmul_ll(Q / jnp.sqrt(wf)[None, :, :], jnp.swapaxes(Q, 0, 1), d_)
            )

        dxa, dyEa, dyCa, dsa = solve_dir(F, sc, rd, rpE, rpC, lam)
        dsa_s = W_apply(sc, dsa, inv=True)
        dya_s = W_apply(sc, dyCa, inv=False)
        a_p = max_step(lam, dsa_s, lam_isq)
        a_d = max_step(lam, dya_s, lam_isq)
        mu_aff = jnp.sum(
            (s + a_p[None, :] * dsa) * (yC + a_d[None, :] * dyCa), axis=0
        ) / nu_deg
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        comp = (
            jmul(lam, lam)
            + jmul(dsa_s, dya_s)
            - (sigma * mu)[None, :] * e
        )
        g = jsolve(lam, comp, lam_peigs)
        dx, dyE, dyC, ds = solve_dir(F, sc, rd, rpE, rpC, g)

        alpha = 0.99 * jnp.minimum(
            max_step(lam, W_apply(sc, ds, inv=True), lam_isq),
            max_step(lam, W_apply(sc, dyC, inv=False), lam_isq),
        )
        alpha = jnp.minimum(alpha, 1.0)

        finite = (
            jnp.all(jnp.isfinite(dx), axis=0)
            & jnp.all(jnp.isfinite(dyC), axis=0)
            & jnp.all(jnp.isfinite(ds), axis=0)
            & jnp.isfinite(alpha)
        )
        if p:
            finite = finite & jnp.all(jnp.isfinite(dyE), axis=0)
        # complementarity collapse (mu <= 0): the NT scaling is meaningless
        # and further steps corrupt the lane — freeze it (best-iterate
        # carries the converged point out; cf. conic_ipm.py)
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
    # score the exit state once (it never got a best-update inside the loop)
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
    if p:
        yE_ref[:] = yE_out
    yC_ref[:] = yC_out
    s_ref[:] = s_out
    # report the metrics OF THE RETURNED STATE, split into primal/dual
    rd, rpE, rpC = residuals(x_out, yE_out, yC_out, s_out)
    pres_o, dres_o, _ = metrics(x_out, yE_out, yC_out, s_out, rd, rpE, rpC)
    itdone = jnp.where(itdone >= 0, itdone, it.astype(dt))
    it_ref[:] = itdone[None, :]
    pres_ref[:] = pres_o[None, :]
    dres_ref[:] = dres_o[None, :]


def solve_tile_fused(
    c: Array, bE: Array, bC: Array, AE: Array, AC: Array,
    layout: Tuple[int, int, Tuple[int, ...], Tuple[int, ...]],
    *,
    max_iters: int = 50,
    tol: float = 5e-6,
    reg: float = 1e-7,
    eps: float = 1e-7,
):
    """Run the fused kernel on internally-laid-out batch data.

    Inputs are batch-FIRST: c (B, n), bE (B, p), bC (B, mC), AE (B, p, n),
    AC (B, mC, n); ``layout = (p, l, soc_dims, psd_sides)``. Returns
    batch-first (x, yE, yC, s, per-instance iterations, pres, dres). B is
    padded to a LANE multiple.
    """
    p, l, soc_dims, psd_sides = layout
    B, n = c.shape
    mC = bC.shape[-1]
    dt = c.dtype
    padB = (-B) % LANE
    pad = lambda x: (
        jnp.concatenate([x, jnp.repeat(x[:1], padB, 0)], 0) if padB else x
    )
    to_ll = lambda x: jnp.moveaxis(pad(x), 0, -1)
    if p:
        args = [to_ll(c), to_ll(bE), to_ll(bC), to_ll(AE), to_ll(AC)]
    else:  # zero-sized operands don't map to TPU kernel inputs
        args = [to_ll(c), to_ll(bC), to_ll(AC)]
    Bp = B + padB

    def spec(x):
        shape = x.shape[:-1] + (LANE,)
        if x.ndim == 2:
            return pl.BlockSpec(shape, lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    vec_spec = lambda r: pl.BlockSpec(
        (r, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_specs = [vec_spec(n)]
    out_shape = [jax.ShapeDtypeStruct((n, Bp), dt)]
    if p:
        out_specs.append(vec_spec(p))
        out_shape.append(jax.ShapeDtypeStruct((p, Bp), dt))
    out_specs += [vec_spec(mC), vec_spec(mC), vec_spec(1), vec_spec(1), vec_spec(1)]
    out_shape += [
        jax.ShapeDtypeStruct((mC, Bp), dt),
        jax.ShapeDtypeStruct((mC, Bp), dt),
        jax.ShapeDtypeStruct((1, Bp), dt),
        jax.ShapeDtypeStruct((1, Bp), dt),
        jax.ShapeDtypeStruct((1, Bp), dt),
    ]

    out = pl.pallas_call(
        partial(
            _kernel, (n, p, l), tuple(soc_dims), tuple(psd_sides),
            max_iters, tol, reg, eps,
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
    if p:
        x, yE, yC, s, it, pres, dres = out
        yE = back(yE)
    else:
        x, yC, s, it, pres, dres = out
        yE = jnp.zeros((B, 0), dt)
    return (
        back(x), yE, back(yC), back(s),
        back(it)[:, 0], back(pres)[:, 0], back(dres)[:, 0],
    )
