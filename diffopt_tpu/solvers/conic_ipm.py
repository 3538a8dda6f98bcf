"""Batched conic interior-point solver (Nesterov-Todd scaled Mehrotra PDIPM).

The DR/ADMM solver (``solvers/conic.py``) is fully general but first-order:
thousands of fixed-point iterations to reach 1e-8. For the symmetric-cone
subclass (zero / nonneg / nonpos / SOC / RSOC blocks) this module implements
an ECOS/CVXOPT-style primal-dual interior-point method that converges in
~10-25 Newton steps — the algorithmic speed-of-light for BASELINE config 3's
SOCP benchmark. (The reference delegates conic solving to SCS —
``/root/reference/src/moi_wrapper.jl:483-487``; a TPU-native framework owns
the forward pass.)

Problem form (SCS geometric form, :class:`~diffopt_tpu.ir.ConeProgram`)::

    min c'x   s.t.  Ax + s = b,  s in K,   dual y in K* = K (symmetric part)

Method: rows are permuted/rotated by a static orthogonal map R into
``[zero | nonneg | soc...]`` layout (nonpos rows are negated, rsoc blocks are
rotated onto soc by the symmetric orthogonal T of ``cones._rsoc_rotation``);
zero rows become equality constraints with free duals. Each iteration builds
the NT scaling W per cone block (lam = W y = W^-1 s), condenses the Newton
system to ``H = (W^-1 A_C)'(W^-1 A_C)`` (PSD, batched Cholesky on the MXU),
eliminates equality duals via a Schur complement, and takes a Mehrotra
predictor-corrector step with Jordan-algebra second-order correction —
identical structure to the QP PDIP (``solvers/qp.py``), so everything is
static-shape ``lax`` control flow and batches under ``vmap``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ir import ConeProgram, ConeSolution
from ..cones import _tri_side, svec_to_sym, sym_to_svec
from ..ops.smalleig import eigh_small, eigvalsh_small
from ..ops.pallas.dispatch import chol, chol_solve, ldl_factor, ldl_solve
from .conic import ConicSolveInfo

Array = jax.Array

_IPM_KINDS = ("zero", "nonneg", "nonpos", "soc", "rsoc", "psd")


def supports(cones) -> bool:
    """True when every block is a symmetric cone this IPM handles (the full
    symmetric family: polyhedral, second-order incl. rotated, and PSD-svec —
    the reference's SCS delegate treats these as first-class,
    ``ConicProgram.jl:132-142``; exp/pow are the non-symmetric remainder and
    take the DR splitting)."""
    return all(k in _IPM_KINDS for k, _, _ in cones.blocks)


def _row_transform(cones, dtype, allow_ns: bool = False):
    """Static orthogonal R (as dense numpy) and the internal layout
    (p zero rows, l nonneg rows, soc dims, psd matrix sides) with rows
    ordered ``[zero | nonneg | soc... | psd...]``. ``R A x + R s = R b`` with
    ``R s`` in the internal cone; duals map back as ``y = R' y_int``. PSD
    rows pass through unchanged (svec coordinates are already self-dual —
    see the convention note in :mod:`diffopt_tpu.cones`).

    With ``allow_ns=True`` (the nonsymmetric IPM, ``conic_nsipm.py``),
    exp/pow blocks pass through unchanged at the end of the layout
    ``[zero | nonneg | soc... | psd... | ns...]`` and a sixth return value
    lists them as ``(kind, alpha)`` tuples (``alpha=None`` for exp)."""
    m = cones.total_dim
    R = np.zeros((m, m))
    zero_rows, soc_blocks, psd_blocks, ns_blocks_src = [], [], [], []
    for kind, off, dim, prm in cones.offsets_params():
        if kind == "zero":
            zero_rows.extend(range(off, off + dim))
        elif kind in ("nonneg", "nonpos"):
            pass  # placed by the second pass below
        elif kind in ("soc", "rsoc"):
            soc_blocks.append((kind, off, dim))
        elif kind == "psd":
            psd_blocks.append((off, dim))
        elif allow_ns and kind in ("exp", "pow", "dual_exp", "dual_pow"):
            ns_blocks_src.append((kind, off, prm))
        else:  # exhaustive: never silently rotate an unknown kind
            raise ValueError(f"_row_transform: unsupported cone kind {kind!r}")
    row = 0
    for r in zero_rows:
        R[row, r] = 1.0
        row += 1
    p = len(zero_rows)
    for kind, off, dim in cones.offsets():
        if kind == "nonneg":
            for r in range(off, off + dim):
                R[row, r] = 1.0
                row += 1
        elif kind == "nonpos":
            for r in range(off, off + dim):
                R[row, r] = -1.0
                row += 1
    l = row - p
    soc_dims = []
    isq = 1.0 / np.sqrt(2.0)
    for kind, off, dim in soc_blocks:
        if kind == "soc":
            for j in range(dim):
                R[row + j, off + j] = 1.0
        else:  # rsoc: T = [[isq, isq], [isq, -isq]] (+ I) maps rsoc onto soc
            R[row, off] = isq
            R[row, off + 1] = isq
            R[row + 1, off] = isq
            R[row + 1, off + 1] = -isq
            for j in range(2, dim):
                R[row + j, off + j] = 1.0
        soc_dims.append(dim)
        row += dim
    psd_sides = []
    for off, dim in psd_blocks:
        for j in range(dim):
            R[row + j, off + j] = 1.0
        psd_sides.append(_tri_side(dim))
        row += dim
    ns_blocks = []
    for kind, off, prm in ns_blocks_src:
        for j in range(3):
            R[row + j, off + j] = 1.0
        ns_blocks.append((kind, None if prm is None else float(prm)))
        row += 3
    assert row == m
    if allow_ns:
        return (
            jnp.asarray(R, dtype), p, l, tuple(soc_dims), tuple(psd_sides),
            tuple(ns_blocks),
        )
    return jnp.asarray(R, dtype), p, l, tuple(soc_dims), tuple(psd_sides)


# --- Jordan-algebra / NT-scaling helpers on the [nonneg | soc... | psd...]
# block. Every helper takes arrays shaped (mC,) or (mC, k) and acts blockwise
# on axis 0; the (l, soc_dims, psd_sides) layout is static so the block loop
# unrolls. PSD blocks live in svec coordinates; their Jordan algebra is the
# symmetric-matrix one (X o Y = (XY + YX)/2) and the NT scaling point is the
# matrix geometric mean W with W Y W = S (CVXOPT conelp section 4; eigh-based
# here — batched small eigendecompositions are cheap relative to the ~20k
# projections/eigh the DR splitting this path replaces would spend).


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


def _mats(u_blk):
    """svec block (tri,) or (tri, k) -> symmetric matrices (d, d) or
    (k, d, d) (batch moved to the front so jnp matmuls broadcast)."""
    if u_blk.ndim == 1:
        return svec_to_sym(u_blk)
    return svec_to_sym(jnp.moveaxis(u_blk, 0, -1))


def _unmats(M, ndim):
    """Inverse of :func:`_mats`."""
    v = sym_to_svec(M)
    if ndim == 1:
        return v
    return jnp.moveaxis(v, -1, 0)


def _jmul(l, soc_dims, psd_sides, u, v):
    """Jordan product u o v (elementwise on nonneg, arrow product per soc,
    symmetrized matrix product per psd block)."""
    parts = [u[:l] * v[:l]]
    for sl in _soc_slices(l, soc_dims):
        ub, vb = u[sl], v[sl]
        head = jnp.sum(ub * vb, axis=0, keepdims=True)
        tail = ub[:1] * vb[1:] + vb[:1] * ub[1:]
        parts.append(jnp.concatenate([head, tail], axis=0))
    for sl in _psd_slices(l, soc_dims, psd_sides):
        U, V = _mats(u[sl]), _mats(v[sl])
        parts.append(_unmats(0.5 * (U @ V + V @ U), u.ndim))
    return jnp.concatenate(parts, axis=0)


def _lam_psd_eigs(l, soc_dims, psd_sides, lam):
    """One eigendecomposition of each PSD block of the scaled point lam,
    shared per Newton iteration by the Lyapunov jsolve and all four
    step-to-boundary computations (previously each recomputed its own —
    ~5 extra Jacobi eigh per iteration on the SDP hot path, measured)."""
    return [
        eigh_small(_mats(lam[sl]))
        for sl in _psd_slices(l, soc_dims, psd_sides)
    ]


def _jsolve(l, soc_dims, psd_sides, lam, d, psd_eigs=None):
    """Solve lam o g = d for g (inverse arrow operator per soc block; a
    Lyapunov solve L G + G L = 2 D via eigh per psd block; pass
    ``psd_eigs`` from :func:`_lam_psd_eigs` to reuse the factorization)."""
    parts = [d[:l] / lam[:l]]
    eps = 1e-14 if lam.dtype == jnp.float64 else 1e-7
    for sl in _soc_slices(l, soc_dims):
        lb, db = lam[sl], d[sl]
        nl1 = jnp.linalg.norm(lb[1:])
        det = (lb[0] - nl1) * (lb[0] + nl1)
        det = jnp.where(jnp.abs(det) > eps * lb[0] ** 2, det, eps * lb[0] ** 2)
        g0 = (lb[0] * db[0] - jnp.sum(lb[1:] * db[1:], axis=0)) / det
        g1 = (db[1:] - jnp.multiply.outer(lb[1:], g0)) / lb[0]
        parts.append(jnp.concatenate([g0[None], g1], axis=0))
    for k, sl in enumerate(_psd_slices(l, soc_dims, psd_sides)):
        D = _mats(d[sl])
        if psd_eigs is None:
            w, Q = eigh_small(_mats(lam[sl]))
        else:
            w, Q = psd_eigs[k]
        denom = w[..., :, None] + w[..., None, :]
        floor = eps * jnp.max(jnp.abs(w), axis=-1)[..., None, None]
        denom = jnp.where(jnp.abs(denom) > floor, denom, floor)
        Qt = jnp.swapaxes(Q, -1, -2)
        G = Q @ ((Qt @ (2.0 * D) @ Q) / denom) @ Qt
        parts.append(_unmats(G, lam.ndim))
    return jnp.concatenate(parts, axis=0)


def _identity_elem(l, soc_dims, psd_sides, dt):
    parts = [jnp.ones((l,), dt)]
    for d in soc_dims:
        e = jnp.zeros((d,), dt).at[0].set(1.0)
        parts.append(e)
    for d in psd_sides:
        parts.append(sym_to_svec(jnp.eye(d, dtype=dt)))
    return jnp.concatenate(parts)


class _Scaling(NamedTuple):
    w: Array  # (l,) nonneg scales sqrt(s/y)
    etas: Tuple[Array, ...]  # per-soc scalar
    vs: Tuple[Array, ...]  # per-soc unit-ish vector with v'Jv = 1
    rs: Tuple[Array, ...]  # per-psd symmetric R = W_nt^{1/2} (d, d)
    ris: Tuple[Array, ...]  # per-psd R^{-1}


def _J(u):
    return jnp.concatenate([u[:1], -u[1:]], axis=0)


def _jdet_sqrt(u, eps):
    """sqrt(u0^2 - ||u1||^2) in the factored form (u0-||u1||)(u0+||u1||):
    the f32 cancellation near the boundary is then a single subtraction, and
    a relative floor keeps the NT scaling finite once the duality measure
    drops below f32 resolution (the iterate is frozen by the convergence
    check at that point)."""
    nu1 = jnp.linalg.norm(u[1:])
    det = (u[0] - nu1) * (u[0] + nu1)
    return jnp.sqrt(jnp.maximum(det, eps * u[0] ** 2))


def _psd_sqrt_pair(X, eps):
    """(X^{1/2}, X^{-1/2}) for a (nearly) PD symmetric X via eigh with a
    relative eigenvalue floor (f32: iterates ride ~mu from the boundary).
    Small sides take the batched Jacobi eigensolver (ops/smalleig.py) — XLA's
    QR-algorithm eigh is the SDP throughput bottleneck on TPU (measured)."""
    w, Q = eigh_small(X)
    w = jnp.maximum(w, eps * jnp.maximum(jnp.max(w, axis=-1), 0.0)[..., None])
    w = jnp.maximum(w, jnp.asarray(1e-30, X.dtype))
    Qt = jnp.swapaxes(Q, -1, -2)
    sq = jnp.sqrt(w)
    return (Q * sq[..., None, :]) @ Qt, (Q / sq[..., None, :]) @ Qt


def _nt_scaling(l, soc_dims, psd_sides, s, y) -> _Scaling:
    eps = 1e-14 if s.dtype == jnp.float64 else 1e-7
    w = jnp.sqrt(s[:l] / y[:l])
    etas, vs = [], []
    for sl in _soc_slices(l, soc_dims):
        sb_, yb_ = s[sl], y[sl]
        rs = _jdet_sqrt(sb_, eps)
        ry = _jdet_sqrt(yb_, eps)
        sb = sb_ / rs
        yb = yb_ / ry
        gamma = jnp.sqrt(jnp.maximum((1.0 + jnp.dot(sb, yb)) / 2.0, eps))
        wb = (sb + _J(yb)) / (2.0 * gamma)
        v = wb.at[0].add(1.0) / jnp.sqrt(2.0 * jnp.maximum(wb[0] + 1.0, eps))
        etas.append(jnp.sqrt(rs / ry))
        vs.append(v)
    rs_psd, ris_psd = [], []
    for sl in _psd_slices(l, soc_dims, psd_sides):
        # W_nt solves W Y W = S: W = S^{1/2} (S^{1/2} Y S^{1/2})^{-1/2} S^{1/2}
        # (the matrix geometric mean). Stored as the symmetric square root
        # R = W_nt^{1/2} and its inverse, so the svec scaling operator
        # X -> R X R is a symmetric PD matrix on the block — exactly the
        # shape the SOC path's eta(2vv'-J) plays.
        S = _mats(s[sl])
        Y = _mats(y[sl])
        Sh, _ = _psd_sqrt_pair(S, eps)
        Z = Sh @ Y @ Sh
        _, Zih = _psd_sqrt_pair(Z, eps)
        Wnt = Sh @ Zih @ Sh
        Wnt = 0.5 * (Wnt + jnp.swapaxes(Wnt, -1, -2))
        Rb, Rbi = _psd_sqrt_pair(Wnt, eps)
        rs_psd.append(Rb)
        ris_psd.append(Rbi)
    return _Scaling(
        w=w, etas=tuple(etas), vs=tuple(vs),
        rs=tuple(rs_psd), ris=tuple(ris_psd),
    )


def _w2_dense(l, soc_dims, psd_sides, sc: _Scaling, dt):
    """Materialize W^2 as a dense (mC, mC) block-diagonal matrix:
    diag(w^2) on nonneg rows, eta^2 (2vv' - J)^2 per soc block, the symmetric
    Kronecker of W_nt = R^2 per psd block (columns are svec(W_nt E_j W_nt)).
    Used by the quasi-definite LDL' Newton solve."""
    mC = l + sum(soc_dims) + sum(d * (d + 1) // 2 for d in psd_sides)
    W2 = jnp.zeros((mC, mC), dt)
    W2 = W2.at[jnp.arange(l), jnp.arange(l)].set(sc.w**2)
    off = l
    for d, eta, v in zip(soc_dims, sc.etas, sc.vs):
        J = jnp.diag(jnp.concatenate([jnp.ones((1,), dt), -jnp.ones((d - 1,), dt)]))
        Wb = 2.0 * jnp.outer(v, v) - J
        W2 = W2.at[off : off + d, off : off + d].set((eta**2) * (Wb @ Wb))
        off += d
    for d, Rb in zip(psd_sides, sc.rs):
        tri = d * (d + 1) // 2
        Wnt = Rb @ Rb
        basis = jnp.eye(tri, dtype=dt)
        cols = jax.vmap(lambda e: sym_to_svec(Wnt @ svec_to_sym(e) @ Wnt))(basis)
        W2 = W2.at[off : off + tri, off : off + tri].set(cols.T)
        off += tri
    return W2


def _w_apply(l, soc_dims, psd_sides, sc: _Scaling, u, inv: bool):
    """Apply W (or W^-1) blockwise: diag(w) on nonneg; eta (2 v v' - J) on soc
    (whose inverse is eta^-1 J (2 v v' - J) J, since v'Jv = 1); X -> R X R
    (or R^-1 X R^-1) per psd block with the symmetric R = W_nt^{1/2}."""
    w = sc.w.reshape(sc.w.shape + (1,) * (u.ndim - 1))
    parts = [u[:l] / w if inv else u[:l] * w]
    for (sl, eta, v) in zip(_soc_slices(l, soc_dims), sc.etas, sc.vs):
        ub = u[sl]
        if inv:
            ju = _J(ub)
            out = _J(2.0 * jnp.multiply.outer(v, jnp.tensordot(v, ju, axes=(0, 0))) - _J(ju))
            parts.append(out / eta)
        else:
            out = 2.0 * jnp.multiply.outer(v, jnp.tensordot(v, ub, axes=(0, 0))) - _J(ub)
            parts.append(out * eta)
    for (sl, Rb, Rbi) in zip(_psd_slices(l, soc_dims, psd_sides), sc.rs, sc.ris):
        Rm = Rbi if inv else Rb
        parts.append(_unmats(Rm @ _mats(u[sl]) @ Rm, u.ndim))
    return jnp.concatenate(parts, axis=0)


def _soc_boundary_step(ub, db, big):
    """Step-to-boundary for one soc block: smallest positive root of
    (u0+a d0)^2 - ||u1+a d1||^2 = a^2 qa + a qb + qc = 0 (qc > 0 inside)."""
    qa = db[0] ** 2 - jnp.sum(db[1:] ** 2)
    qb = 2.0 * (ub[0] * db[0] - jnp.sum(ub[1:] * db[1:]))
    nu1 = jnp.linalg.norm(ub[1:])
    qc = jnp.maximum((ub[0] - nu1) * (ub[0] + nu1), 0.0)
    disc = qb**2 - 4.0 * qa * qc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(jnp.abs(qa) > 1e-30, qa, 1.0)
    r1 = (-qb - sq) / (2.0 * safe_a)
    r2 = (-qb + sq) / (2.0 * safe_a)
    rlin = jnp.where(qb < 0, -qc / jnp.where(qb < 0, qb, 1.0), big)
    quad_root = jnp.minimum(
        jnp.where(r1 > 0, r1, big), jnp.where(r2 > 0, r2, big)
    )
    root = jnp.where(
        jnp.abs(qa) > 1e-30, jnp.where(disc >= 0, quad_root, big), rlin
    )
    # exit through u0 = 0 (cap when the head decreases)
    cap = jnp.where(db[0] < 0, -ub[0] / jnp.where(db[0] < 0, db[0], 1.0), big)
    return jnp.minimum(root, cap)


def _max_step(l, soc_dims, psd_sides, u, du, dt):
    """Largest alpha in (0,1] keeping u + alpha du in the cone interior
    (fraction-to-boundary applied by the caller)."""
    big = jnp.asarray(jnp.inf, dt)
    ratio = jnp.where(du[:l] < 0, -u[:l] / du[:l], big)
    amax = jnp.min(ratio, initial=jnp.inf)
    for sl in _psd_slices(l, soc_dims, psd_sides):
        # alpha_max = -1/lambda_min(U^{-1/2} dU U^{-1/2}) when that min < 0
        eps = 1e-14 if dt == jnp.float64 else 1e-7
        U = _mats(u[sl])
        dU = _mats(du[sl])
        _, Uih = _psd_sqrt_pair(U, eps)
        lmin = jnp.min(eigvalsh_small(Uih @ dU @ Uih), axis=-1)
        amax = jnp.minimum(
            amax, jnp.where(lmin < 0, -1.0 / jnp.where(lmin < 0, lmin, -1.0), big)
        )
    for sl in _soc_slices(l, soc_dims):
        amax = jnp.minimum(amax, _soc_boundary_step(u[sl], du[sl], big))
    return jnp.minimum(jnp.asarray(1.0, dt), amax)


def _lam_psd_isqrts(psd_eigs, eps, dt):
    """lam_blk^{-1/2} per psd block from the shared eigendecomposition."""
    out = []
    for w, Q in psd_eigs:
        wf = jnp.maximum(
            w, eps * jnp.maximum(jnp.max(w, axis=-1), 0.0)[..., None]
        )
        wf = jnp.maximum(wf, jnp.asarray(1e-30, dt))
        out.append((Q / jnp.sqrt(wf)[..., None, :]) @ jnp.swapaxes(Q, -1, -2))
    return out


def _max_step_scaled_pair(l, soc_dims, psd_sides, lam, dlam_a, dlam_b, psd_isqrts, dt):
    """Two step-to-boundary computations from the same scaled point lam
    (primal and dual directions of one predictor/corrector solve), with the
    per-psd-block congruence + eigvalsh STACKED into one batched call — the
    Jacobi eigensolver's rotation sweep is op-count-bound on TPU, so running
    it once on a (2, d, d) stack instead of twice on (d, d) halves the
    dominant dispatch cost of the SDP step computations."""
    big = jnp.asarray(jnp.inf, dt)
    amaxes = []
    for dlam in (dlam_a, dlam_b):
        ratio = jnp.where(dlam[:l] < 0, -lam[:l] / dlam[:l], big)
        amaxes.append(jnp.min(ratio, initial=jnp.inf))
    for k, sl in enumerate(_psd_slices(l, soc_dims, psd_sides)):
        isq = psd_isqrts[k]
        pair = jnp.stack(
            [isq @ _mats(dlam_a[sl]) @ isq, isq @ _mats(dlam_b[sl]) @ isq]
        )
        lmins = jnp.min(eigvalsh_small(pair), axis=-1)
        for i in range(2):
            lmin = lmins[i]
            amaxes[i] = jnp.minimum(
                amaxes[i],
                jnp.where(lmin < 0, -1.0 / jnp.where(lmin < 0, lmin, -1.0), big),
            )
    for sl in _soc_slices(l, soc_dims):
        for i, dlam in enumerate((dlam_a, dlam_b)):
            amaxes[i] = jnp.minimum(
                amaxes[i], _soc_boundary_step(lam[sl], dlam[sl], big)
            )
    one = jnp.asarray(1.0, dt)
    return jnp.minimum(one, amaxes[0]), jnp.minimum(one, amaxes[1])


class _State(NamedTuple):
    x: Array
    yE: Array
    yC: Array
    s: Array
    it: Array
    done: Array
    mu_prev: Array
    err_prev: Array
    stall: Array
    # Best-iterate tracking (same scheme as the fused kernel and the
    # nsipm): near the attainable floor the iterate oscillates, and once
    # complementarity collapses (mu <= 0) the NT scaling and
    # step-to-boundary are meaningless — without the best-state return, an
    # instance whose requested tol sits just below its floor would keep
    # stepping past convergence until the iterate EXPLODES and report the
    # wreckage (measured: the epigraph-RSOC-lowered QP at tol=1e-11
    # reached err 1.7e-11 at it=8, went mu < 0 at it=16, took a NEGATIVE
    # alpha at it=31, and finished at pres 0.72 with converged=False).
    x_best: Array
    yE_best: Array
    yC_best: Array
    s_best: Array
    err_best: Array


def solve(
    cp: ConeProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    reg: float | None = None,
    refine_iters: int | None = None,
    step_frac: float = 0.99,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    """Solve one symmetric-cone instance (vmap over batches via
    :func:`solve_batched`). Raises ``ValueError`` at trace time for cone
    kinds outside {zero, nonneg, nonpos, soc, rsoc, psd} — use the DR solver
    (``solvers/conic.py``) for exp/pow blocks."""
    from ..utils.config import get_config

    if max_iters is None:
        max_iters = get_config().ipm_max_iters
    # TPU XLA matmuls default to bf16 inputs; an interior point method's
    # residuals and Newton systems need real f32 (the Pallas LDL' kernel is
    # f32 VPU arithmetic already — this covers the surrounding jnp matmuls)
    with jax.default_matmul_precision("highest"):
        return _solve_impl(
            cp,
            max_iters=max_iters,
            tol=tol,
            reg=reg,
            refine_iters=refine_iters,
            step_frac=step_frac,
        )


def _solve_impl(
    cp: ConeProgram,
    *,
    max_iters: int,
    tol: float | None,
    reg: float | None,
    refine_iters: int | None,
    step_frac: float,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    if not supports(cp.cones):
        raise ValueError(
            "conic_ipm supports zero/nonneg/nonpos/soc/rsoc/psd blocks only; "
            f"got {cp.cones!r}"
        )
    if all(k == "zero" for k, _, _ in cp.cones.blocks):
        raise ValueError(
            "conic_ipm needs at least one non-zero cone block; "
            "use solvers.conic for equality-only programs"
        )
    from ..utils.config import get_config

    cfg = get_config()
    dt = cp.A.dtype
    if tol is None:
        tol = cfg.ipm_tol(dt)
    elif dt != jnp.float64:
        # complementarity products can't resolve below ~sqrt(eps_f32); an
        # unreachable tolerance would burn iterations and report converged
        # = False on solutions that are at f32 accuracy
        tol = max(tol, cfg.ipm_tol_f32)
    if reg is None:
        reg = cfg.ipm_reg(dt)
    n = cp.num_vars
    R, p, l, soc_dims, psd_sides = _row_transform(cp.cones, dt)
    A = R @ cp.A
    b = R @ cp.b
    c = cp.c
    AE, bE = A[:p], b[:p]
    AC, bC = A[p:], b[p:]
    mC = AC.shape[0]
    nu_deg = max(l + len(soc_dims) + sum(psd_sides), 1)
    e = _identity_elem(l, soc_dims, psd_sides, dt)
    eyen = jnp.eye(n, dtype=dt)

    jmul = partial(_jmul, l, soc_dims, psd_sides)
    jsolve = partial(_jsolve, l, soc_dims, psd_sides)
    W = lambda sc, u: _w_apply(l, soc_dims, psd_sides, sc, u, inv=False)
    Winv = lambda sc, u: _w_apply(l, soc_dims, psd_sides, sc, u, inv=True)

    def residuals(x, yE, yC, s):
        rd = c + AC.T @ yC + (AE.T @ yE if p else 0.0)
        rpE = AE @ x - bE
        rpC = AC @ x + s - bC
        return rd, rpE, rpC

    # Newton linear algebra: the quasi-definite LDL' path solves the
    # UNSQUARED NT system [[reg I, AE', AC'], [AE, -reg I, 0], [AC, 0, -W^2]]
    # directly (Vanderbei LDL', Pallas-batched) — the normal-equations
    # condensation H = (W^-1 AC)'(W^-1 AC) squares the ~1/mu conditioning,
    # which costs ~half the attainable f32 accuracy. Fall back to the
    # condensed Cholesky path past the Pallas LDL' size limit.
    use_ldl = (n + p + mC) <= 128

    if use_ldl:
        # Row/column order [cone | x | eq]: the unpivoted LDL' eliminates the
        # O(1) -W^2 block FIRST. With x first, the leading pivots are the
        # tiny reg*I (~1e-7) and elimination growth ~||A||^2/reg wipes out
        # the W^2 block entirely in f32 (O(1) backward error, refinement
        # diverges, the IPM stalls with primal residual frozen — measured).
        # Cone-first pivots are -W^2 (O(1)), then the x Schur complement
        # A'W^-2 A + reg (PD), then the equality Schur (negative definite):
        # growth stays ~cond(W^2), which one refinement pass absorbs.

        def factor(sc: _Scaling):
            W2 = _w2_dense(l, soc_dims, psd_sides, sc, dt)
            N = n + p + mC
            K = jnp.zeros((N, N), dt)
            K = K.at[:mC, :mC].set(-W2)
            K = K.at[:mC, mC : mC + n].set(AC)
            K = K.at[mC : mC + n, :mC].set(AC.T)
            K = K.at[mC : mC + n, mC : mC + n].set(reg * eyen)
            if p:
                K = K.at[mC : mC + n, mC + n :].set(AE.T)
                K = K.at[mC + n :, mC : mC + n].set(AE)
                K = K.at[mC + n :, mC + n :].set(-reg * jnp.eye(p, dtype=dt))
            return ldl_factor(K)

        def _solve_dir_once(K, sc, rd, rpE, rpC, g):
            L, dvec = K
            rhs = jnp.concatenate([-rpC + W(sc, g), -rd, -rpE])
            sol = ldl_solve(L, dvec, rhs)
            dyC = sol[:mC]
            dx = sol[mC : mC + n]
            dyE = sol[mC + n :]
            ds = -W(sc, g + W(sc, dyC))
            return dx, dyE, dyC, ds

    else:

        def factor(sc: _Scaling):
            B = Winv(sc, AC)  # (mC, n): W^-1 applied to each column
            H = B.T @ B + reg * eyen
            Lh = chol(H)
            if p:
                HiAt = chol_solve(Lh, AE.T)
                S = AE @ HiAt + reg * jnp.eye(p, dtype=dt)
                Ls = chol(S)
            else:
                Ls = jnp.zeros((0, 0), dt)
            return Lh, Ls, B

        def _solve_dir_once(K, sc, rd, rpE, rpC, g):
            """Newton direction given the scaled complementarity target g
            (W dyC + W^-1 ds = -g)."""
            Lh, Ls, B = K
            wirp = Winv(sc, rpC)
            rhs_x = -rd - B.T @ (wirp - g)
            x1 = chol_solve(Lh, rhs_x)
            if p:
                dyE = chol_solve(Ls, AE @ x1 + rpE)
                dx = x1 - chol_solve(Lh, AE.T @ dyE)
            else:
                dyE = jnp.zeros((0,), dt)
                dx = x1
            dyC = Winv(sc, B @ dx + wirp - g)
            ds = -W(sc, g + W(sc, dyC))
            return dx, dyE, dyC, ds

    if refine_iters is None:
        refine_iters = 0 if dt == jnp.float64 else 1
        if psd_sides:
            # PSD W^2 blocks can be orders worse conditioned than soc blocks;
            # the unpivoted quasi-definite LDL' with ~1e-11 reg pivots then
            # loses the Newton direction's primal-feasibility component (the
            # IPM stalls at pres ~1e-2) — one refinement pass against the
            # exact block system recovers it (measured)
            refine_iters = max(refine_iters, 1)
    refine_steps = refine_iters

    def solve_dir(K, sc, rd, rpE, rpC, g):
        """Direction with iterative refinement against the UNSQUARED Newton
        system: the normal-equations condensation H = B'B squares the NT
        system's conditioning (~1/mu), which in f32 degrades the direction
        near convergence (primal residual drift); one re-solve on the exact
        block residuals recovers it."""
        d = _solve_dir_once(K, sc, rd, rpE, rpC, g)
        for _ in range(refine_steps):
            dx, dyE, dyC, ds = d
            r1 = -rd - (AC.T @ dyC + (AE.T @ dyE if p else 0.0))
            r2 = -rpE - AE @ dx
            r3 = -rpC - (AC @ dx + ds)
            r4 = -g - (W(sc, dyC) + Winv(sc, ds))
            c1, c2, c3, c4 = _solve_dir_once(K, sc, -r1, -r2, -r3, -r4)
            d = (dx + c1, dyE + c2, dyC + c3, ds + c4)
        return d

    # --- initialization: one Newton solve at the identity scaling, then shift
    # s and yC into the cone interior (mirrors solvers/qp.py / CVXOPT conelp)
    sc0 = _nt_scaling(l, soc_dims, psd_sides, e, e)
    K0 = factor(sc0)
    rd0, rpE0, rpC0 = residuals(
        jnp.zeros((n,), dt), jnp.zeros((p,), dt), jnp.zeros((mC,), dt),
        jnp.zeros((mC,), dt),
    )
    dx0, dyE0, _, _ = solve_dir(K0, sc0, rd0, rpE0, rpC0, -e)
    x = dx0
    yE = dyE0
    s0 = bC - AC @ x
    # per-block shift along the identity element to reach the interior
    parts = []
    sh = jnp.maximum(0.0, -1.5 * jnp.min(s0[:l], initial=0.0)) + 1.0
    parts.append(s0[:l] + sh)
    for sl in _soc_slices(l, soc_dims):
        sb = s0[sl]
        excess = jnp.linalg.norm(sb[1:]) - sb[0]
        shb = jnp.maximum(0.0, 1.5 * excess) + 1.0
        parts.append(sb.at[0].add(shb))
    for d, sl in zip(psd_sides, _psd_slices(l, soc_dims, psd_sides)):
        sb = s0[sl]
        lmin = jnp.min(eigvalsh_small(svec_to_sym(sb)), axis=-1)
        shb = jnp.maximum(0.0, -1.5 * lmin) + 1.0
        parts.append(sb + shb * sym_to_svec(jnp.eye(d, dtype=dt)))
    s = jnp.concatenate(parts) if mC else s0
    yC = e

    def metrics(x, yE, yC, s, rd, rpE, rpC):
        """SCS-style scale-relative termination metrics: for instances whose
        optimal solution is large (||x|| >> ||b||), absolute residuals cannot
        reach eps*||b|| in f32 — relative-to-iterate normalization is the
        honest (and standard) criterion."""
        Ax_sc = jnp.maximum(
            jnp.linalg.norm(jnp.concatenate([rpE, rpC]) - jnp.concatenate(
                [jnp.zeros((p,), dt), s]) + b),  # = ||A x||
            jnp.maximum(jnp.linalg.norm(s), jnp.linalg.norm(b)),
        )
        pres = jnp.sqrt(jnp.sum(rpE**2) + jnp.sum(rpC**2)) / (1.0 + Ax_sc)
        Aty_sc = jnp.maximum(jnp.linalg.norm(rd - c), jnp.linalg.norm(c))
        dres = jnp.linalg.norm(rd) / (1.0 + Aty_sc)
        pobj = jnp.dot(c, x)
        dobj = -(jnp.dot(bE, yE) + jnp.dot(bC, yC))
        gaprel = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return pres, dres, gaprel

    def cond(st: _State):
        return jnp.logical_and(st.it < max_iters, jnp.logical_not(st.done))

    def body(st: _State) -> _State:
        x, yE, yC, s = st.x, st.yE, st.yC, st.s
        rd, rpE, rpC = residuals(x, yE, yC, s)
        mu = jnp.dot(s, yC) / nu_deg

        # convergence is tested BEFORE stepping: a converged iterate must not
        # take one more (numerically garbage once mu ~ f32 eps) step
        pres, dres, gaprel = metrics(x, yE, yC, s, rd, rpE, rpC)
        done_now = jnp.logical_and(
            pres < tol, jnp.logical_and(dres < tol, gaprel < tol)
        )

        sc = _nt_scaling(l, soc_dims, psd_sides, s, yC)
        K = factor(sc)
        lam = Winv(sc, s)  # = W yC
        # step-to-boundary runs in the scaled space: primal and dual both
        # step from the SAME point lam, so one eigendecomposition per psd
        # block serves the Lyapunov jsolve and all four step computations
        lam_eigs = _lam_psd_eigs(l, soc_dims, psd_sides, lam)
        eps_sc = 1e-14 if dt == jnp.float64 else 1e-7
        lam_isq = _lam_psd_isqrts(lam_eigs, eps_sc, dt)
        mstep_pair = lambda da, db_: _max_step_scaled_pair(
            l, soc_dims, psd_sides, lam, da, db_, lam_isq, dt
        )

        # predictor (affine): lam o (W dy + W^-1 ds) = -lam o lam  =>  g = lam
        dxa, dyEa, dyCa, dsa = solve_dir(K, sc, rd, rpE, rpC, lam)
        dsa_s = Winv(sc, dsa)  # scaled directions, reused by the corrector
        dya_s = W(sc, dyCa)
        a_p, a_d = mstep_pair(dsa_s, dya_s)
        mu_aff = jnp.dot(s + a_p * dsa, yC + a_d * dyCa) / nu_deg
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        # corrector with Mehrotra second-order term in the scaled variables
        comp = jmul(lam, lam) + jmul(dsa_s, dya_s) - (sigma * mu) * e
        g = jsolve(lam, comp, psd_eigs=lam_eigs)
        dx, dyE, dyC, ds = solve_dir(K, sc, rd, rpE, rpC, g)

        frac = jnp.asarray(step_frac, dt)
        a_cp, a_cd = mstep_pair(Winv(sc, ds), W(sc, dyC))
        alpha = frac * jnp.minimum(a_cp, a_cd)
        alpha = jnp.clip(alpha, jnp.asarray(0.0, dt), jnp.asarray(1.0, dt))

        finite = jnp.logical_and(
            jnp.isfinite(alpha),
            jnp.all(jnp.isfinite(jnp.concatenate([dx, dyE, dyC, ds]))),
        )
        # once complementarity collapses the scaling is meaningless and
        # further steps only corrupt the iterate — freeze (best-iterate
        # still carries the converged point out)
        dead = mu <= 0.0
        # freeze via select, not alpha = 0: 0 * NaN would poison the state
        step = finite & jnp.logical_not(done_now) & jnp.logical_not(dead)
        upd = lambda v, dv: jnp.where(step, v + alpha * dv, v)
        # stagnation exit: a vmapped batch runs in lockstep until EVERY
        # instance exits, so a few stuck instances (neither mu nor the
        # residual metrics contracting for 5 consecutive iterations) would
        # otherwise drag the whole batch to max_iters (measured on the SDP
        # bench: median 8 iterations, lockstep 50)
        err = jnp.maximum(pres, jnp.maximum(dres, gaprel))
        stalled_now = jnp.logical_and(
            mu > 0.98 * st.mu_prev, err > 0.98 * st.err_prev
        )
        stall = jnp.where(stalled_now, st.stall + 1, jnp.asarray(0, jnp.int32))
        done = (
            done_now | jnp.logical_not(finite) | (stall >= 5) | dead
        )
        better = err < st.err_best
        bupd = lambda cur, best: jnp.where(better, cur, best)
        return _State(
            upd(x, dx), upd(yE, dyE), upd(yC, dyC), upd(s, ds),
            st.it + 1, done, mu, err, stall,
            bupd(x, st.x_best), bupd(yE, st.yE_best),
            bupd(yC, st.yC_best), bupd(s, st.s_best),
            jnp.minimum(err, st.err_best),
        )

    st0 = _State(
        x, yE, yC, s, jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt),
        jnp.asarray(0, jnp.int32),
        x, yE, yC, s, jnp.asarray(jnp.inf, dt),
    )
    st = jax.lax.while_loop(cond, body, st0)

    # the loop's best-iterate bookkeeping only sees states it stepped FROM;
    # score the final iterate and return the better of the two
    rd, rpE, rpC = residuals(st.x, st.yE, st.yC, st.s)
    pres_f, dres_f, gap_f = metrics(st.x, st.yE, st.yC, st.s, rd, rpE, rpC)
    err_f = jnp.maximum(pres_f, jnp.maximum(dres_f, gap_f))
    take_final = err_f <= st.err_best
    pick = lambda fin, best: jnp.where(take_final, fin, best)
    st = st._replace(
        x=pick(st.x, st.x_best), yE=pick(st.yE, st.yE_best),
        yC=pick(st.yC, st.yC_best), s=pick(st.s, st.s_best),
    )
    rd, rpE, rpC = residuals(st.x, st.yE, st.yC, st.s)
    pres, dres, gaprel = metrics(st.x, st.yE, st.yC, st.s, rd, rpE, rpC)
    gap = jnp.dot(st.s, st.yC)
    conv = jnp.logical_and(
        pres < 10 * tol,
        jnp.logical_and(dres < 10 * tol, gaprel < 10 * tol),
    )
    # map back to the original row order: y = R' y_int, s = R' s_int
    y_int = jnp.concatenate([st.yE, st.yC])
    s_int = jnp.concatenate([jnp.zeros((p,), dt), st.s])
    sol = ConeSolution(x=st.x, y=R.T @ y_int, s=R.T @ s_int)
    info = ConicSolveInfo(
        iterations=st.it,
        primal_residual=pres,
        dual_residual=dres,
        gap=gap,
        converged=conv,
    )
    return sol, info


def solve_batched(cp: ConeProgram, **kw) -> Tuple[ConeSolution, ConicSolveInfo]:
    fn = partial(solve, **kw)
    for _ in range(cp.c.ndim - 1):
        fn = jax.vmap(fn)
    return fn(cp)


def solve_batched_fused(
    cp: ConeProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    reg: float | None = None,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    """Solve a (B, ...) batch with the fully-fused single-kernel IPM
    (``ops/pallas/conic_pdip.py``): one Pallas launch runs all NT-scaled
    Newton iterations with the 128-instance tile resident in VMEM, with
    per-tile early exit (the vmapped XLA path synchronizes the WHOLE batch
    on its slowest instance). Falls back to :func:`solve_batched` for
    unsupported layouts or Newton systems past the VMEM-unroll envelope, and
    to the DR splitting for cone kinds outside the IPM family (exp/pow) and
    for equality-only programs (``mC == 0``, no cone to scale)."""
    from ..utils.config import get_config

    cfg = get_config()
    dt = cp.A.dtype
    n = cp.num_vars

    def _dr_fallback():
        # forward the caller's tolerance; max_iters was sized for a ~20-step
        # Newton method, not a first-order splitting — use the DR default
        from . import conic as conicsolver

        return conicsolver.solve_batched(cp, tol=tol)

    if not supports(cp.cones):
        from . import conic_nsipm

        if conic_nsipm.supports(cp.cones) and any(
            k != "zero" for k, _, _ in cp.cones.blocks
        ):
            # exp/pow blocks: the nonsymmetric-cone PDIPM — fused Pallas
            # kernel where the layout allows, vmapped XLA otherwise (its
            # max_iters default is its own config knob)
            if cp.c.ndim == 2:
                return conic_nsipm.solve_batched_fused(
                    cp, max_iters=max_iters, tol=tol, reg=reg
                )
            return conic_nsipm.solve_batched(
                cp, max_iters=max_iters, tol=tol, reg=reg
            )
        return _dr_fallback()
    if max_iters is None:
        max_iters = cfg.ipm_max_iters
    R, p, l, soc_dims, psd_sides = _row_transform(cp.cones, dt)
    mC = l + sum(soc_dims) + sum(d * (d + 1) // 2 for d in psd_sides)
    N = n + p + mC
    if mC == 0:
        # equality-only program: nothing for an IPM to scale
        return _dr_fallback()
    from ..ops.pallas.conic_pdip import _interpret

    psd_cap = 3 if _interpret() else 6
    if any(d > psd_cap for d in psd_sides) or N > 128 or cp.c.ndim != 2:
        # psd sides past the in-kernel Jacobi envelope (unrolled rotation
        # sweeps) and Newton systems past the scratch-ref loop-LDL' envelope
        # (N <= 128, cf. the fused QP's n cap): the vmapped XLA IPM
        # (batched Jacobi eigh NT scaling + Pallas LDL'). Off-TPU the cap
        # tightens to side <= 3: XLA:CPU compiles the interpret-mode Jacobi
        # rotation slice+concat chains superlinearly (d=4 measured > 10 min
        # — an effective hang vs seconds through the XLA IPM; Mosaic
        # compiles the same d=4 kernel in ~30 s on TPU).
        return solve_batched(cp, max_iters=max_iters, tol=tol, reg=reg)
    if tol is None:
        tol = cfg.ipm_tol(dt)
    elif dt != jnp.float64:
        tol = max(tol, cfg.ipm_tol_f32)
    if reg is None:
        reg = cfg.ipm_reg(dt)
    eps = 1e-14 if dt == jnp.float64 else 1e-7

    from ..ops.pallas.conic_pdip import solve_tile_fused
    from ..utils.precision import full_precision

    @full_precision
    def run(cp):
        A_int = jnp.einsum("ij,bjk->bik", R, cp.A)
        b_int = cp.b @ R.T
        x, yE, yC, s, it, pres, dres = solve_tile_fused(
            cp.c, b_int[:, :p], b_int[:, p:], A_int[:, :p], A_int[:, p:],
            (p, l, soc_dims, psd_sides),
            max_iters=max_iters, tol=tol, reg=reg, eps=eps,
        )
        y = jnp.concatenate([yE, yC], axis=-1) @ R
        s_full = jnp.concatenate([jnp.zeros((s.shape[0], p), dt), s], axis=-1) @ R
        gap = jnp.sum(s * yC, axis=-1)
        err = jnp.maximum(pres, dres)
        return (
            ConeSolution(x=x, y=y, s=s_full),
            ConicSolveInfo(
                iterations=it.astype(jnp.int32),  # per instance
                primal_residual=pres,
                dual_residual=dres,
                gap=gap,
                converged=err < 10 * tol,
            ),
        )

    return run(cp)
