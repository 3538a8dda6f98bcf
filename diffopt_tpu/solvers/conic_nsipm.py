"""Batched nonsymmetric-cone interior-point solver (dual-scaling PDIPM).

The NT-scaled IPM (``solvers/conic_ipm.py``) covers the symmetric family
(zero/nonneg/nonpos/soc/rsoc/psd); exp/pow blocks have no symmetric Jordan
algebra, so round 1 routed them through the first-order DR splitting at
~20,000 iterations (the reference's SCS delegate does the same —
``/root/reference/src/moi_wrapper.jl:483-487`` delegates all solving; a
TPU-native framework owns it). This module is the second-order path for the
nonsymmetric remainder: a Skajaa–Ye-style primal-barrier PDIPM (the method
behind alfonso/Hypatia and Mosek's exp-cone support) that converges in
~10-30 Newton steps.

Problem form (identical to :mod:`conic_ipm`)::

    min c'x   s.t.  Ax + s = b,  s in K,  y in K*

with K a product of zero / nonneg / nonpos / soc / rsoc / psd / exp / pow /
dual_exp / dual_pow blocks. The central path is parameterized by the
*primal* logarithmically-homogeneous self-concordant barrier F of the
non-zero part of K:

    c + A'y = 0,   Ax + s = b,   y = -mu * grad F(s)

Each iteration linearizes the last equation at the current s —
``dy + mu H(s) ds = -(y + sigma * mu * grad F(s))`` with ``H = hess F`` —
which slots into the same quasi-definite ``[cone | x | eq]`` LDL' Newton
system as the NT IPM with ``W^2 <-> (mu H)^{-1}`` (the NT scaling satisfies
``W^2 = (mu hess F(w))^{-1}`` at the scaling point for symmetric cones, so
this is the strict generalization). Step sizes come from a bisection line
search on strict primal/dual cone interiority plus the Skajaa–Ye proximity
neighborhood ``||y + mu grad F(s)||_{H(s)^{-1}} <= beta mu`` — the
nonsymmetric replacement for the symmetric fraction-to-boundary closed
forms — with a pure centering step whenever the predictor's line search
collapses on the neighborhood boundary. Everything is static-shape ``lax``
control flow and batches under ``vmap``.

Barriers (all nu=3 for the 3-dim nonsymmetric cones):
  exp   K  = cl{(x,y,z): y e^{x/y} <= z, y>0}:
        F = -log(y log(z/y) - x) - log y - log z
  pow   K_a = {(x,y,z): x^a y^{1-a} >= |z|, x,y >= 0}:
        F = -log(x^{2a} y^{2(1-a)} - z^2) - (1-a) log x - a log y
  dual_exp / dual_pow: the corresponding dual-cone barriers (closed form
        below). Gradients/Hessians via ``jax.grad``/``jax.hessian`` on the
        3-vectors — closed-form enough for XLA to fuse, and exactly
        consistent with the membership tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ir import ConeProgram, ConeSolution
from ..cones import svec_to_sym, sym_to_svec
from ..ops.smalleig import eigh_small, eigvalsh_small
from ..ops.pallas.dispatch import chol, chol_solve, ldl_factor, ldl_solve
from .conic import ConicSolveInfo
from .conic_ipm import (
    _identity_elem,
    _psd_slices,
    _row_transform,
    _soc_slices,
)

Array = jax.Array

_NS_KINDS = (
    "zero", "nonneg", "nonpos", "soc", "rsoc", "psd",
    "exp", "pow", "dual_exp", "dual_pow",
)
_NONSYM = ("exp", "pow", "dual_exp", "dual_pow")


def supports(cones) -> bool:
    """True when every block kind is solvable here (the full ConeSpec
    family). The NT IPM stays the preferred route for purely symmetric
    programs (fewer, cheaper iterations); this solver exists for programs
    with at least one nonsymmetric block."""
    return all(k in _NS_KINDS for k, _, _ in cones.blocks)


def has_nonsymmetric(cones) -> bool:
    return any(k in _NONSYM for k, _, _ in cones.blocks)


# --- barriers for the 3-dim nonsymmetric cones (log-homogeneous, nu = 3) ---


def _safe_margin(g, u):
    """Clamp a cone margin to a relative floor before it feeds a log: near
    convergence the active-cone margin shrinks like mu while its f64/f32
    rounding noise is absolute (~eps * |u|), so a converged iterate can
    evaluate fractionally negative — the clamp keeps barrier values,
    gradients and Hessians finite (the termination check has already fired
    by then; same pattern as the soc ``_jdet_sqrt`` relative floor)."""
    eps = 1e-15 if u.dtype == jnp.float64 else 1e-7
    scale = jnp.sum(jnp.abs(u))
    return jnp.maximum(g, eps * scale)


def _barrier_fn(kind: str, alpha):
    if kind == "exp":

        def F(u):
            g = _safe_margin(u[1] * jnp.log(u[2] / u[1]) - u[0], u)
            return -jnp.log(g) - jnp.log(u[1]) - jnp.log(u[2])

    elif kind == "dual_exp":
        # K* = cl{(u,v,w): -u e^{v/u} <= e w, u<0}; with ub = -u > 0 the
        # interior condition is v + ub + ub log(w/ub) > 0
        def F(u):
            ub = -u[0]
            g = _safe_margin(u[1] + ub + ub * jnp.log(u[2] / ub), u)
            return -jnp.log(g) - jnp.log(ub) - jnp.log(u[2])

    elif kind == "pow":
        a = float(alpha)

        def F(u):
            phi2 = jnp.exp(2 * a * jnp.log(u[0]) + 2 * (1 - a) * jnp.log(u[1]))
            g = _safe_margin(phi2 - u[2] ** 2, u)
            return -jnp.log(g) - (1 - a) * jnp.log(u[0]) - a * jnp.log(u[1])

    elif kind == "dual_pow":
        # K_pow(a)* = {(u,v,w): (u/a)^a (v/(1-a))^{1-a} >= |w|}
        a = float(alpha)

        def F(u):
            phi2 = jnp.exp(
                2 * a * jnp.log(u[0] / a) + 2 * (1 - a) * jnp.log(u[1] / (1 - a))
            )
            g = _safe_margin(phi2 - u[2] ** 2, u)
            return -jnp.log(g) - (1 - a) * jnp.log(u[0]) - a * jnp.log(u[1])

    else:  # pragma: no cover - guarded by supports()
        raise ValueError(f"no nonsymmetric barrier for cone kind {kind!r}")
    return F


_DUAL_KIND = {
    "exp": "dual_exp", "dual_exp": "exp", "pow": "dual_pow", "dual_pow": "pow",
}


def _ns_central(kind: str, alpha, dt) -> Array:
    """A strictly interior, well-scaled starting point per nonsymmetric
    block (Hypatia's central initial points; the pow point satisfies
    -grad F(s0) well-conditioned)."""
    if kind == "exp":
        return jnp.asarray(
            [-1.0513839453227140, 0.5564096194693700, 1.2589678847689470], dt
        )
    if kind == "dual_exp":
        # -grad F_exp at the exp central point lies in int K_exp^*
        s0 = _ns_central("exp", None, jnp.float64)
        g = jax.grad(_barrier_fn("exp", None))(s0)
        return jnp.asarray(-g, dt)
    a = float(alpha)
    if kind == "pow":
        return jnp.asarray([np.sqrt(1.0 + a), np.sqrt(2.0 - a), 0.0], dt)
    # dual_pow: -grad F_pow at the pow central point
    s0 = _ns_central("pow", a, jnp.float64)
    g = jax.grad(_barrier_fn("pow", a))(s0)
    return jnp.asarray(-g, dt)


def _ns_interior(kind: str, alpha, u: Array) -> Array:
    """Scalar interiority measure of a 3-vector for cone ``kind``: positive
    iff strictly interior (guarded so out-of-domain inputs give negative
    measures, never NaN)."""
    if kind == "exp":
        x, y, z = u[0], u[1], u[2]
        pos = jnp.logical_and(y > 0, z > 0)
        ys = jnp.where(pos, y, 1.0)
        zs = jnp.where(pos, z, 1.0)
        m3 = ys * jnp.log(zs / ys) - x
        return jnp.where(pos, jnp.minimum(jnp.minimum(y, z), m3), -1.0)
    if kind == "dual_exp":
        ub, v, w = -u[0], u[1], u[2]
        pos = jnp.logical_and(ub > 0, w > 0)
        us = jnp.where(pos, ub, 1.0)
        ws = jnp.where(pos, w, 1.0)
        m3 = v + us + us * jnp.log(ws / us)
        return jnp.where(pos, jnp.minimum(jnp.minimum(ub, w), m3), -1.0)
    a = float(alpha)
    if kind == "pow":
        x, y, z = u[0], u[1], u[2]
        sx, sy = 1.0, 1.0
    else:  # dual_pow
        x, y, z = u[0], u[1], u[2]
        sx, sy = a, 1.0 - a
    pos = jnp.logical_and(x > 0, y > 0)
    xs = jnp.where(pos, x, 1.0)
    ys = jnp.where(pos, y, 1.0)
    phi = jnp.exp(a * jnp.log(xs / sx) + (1 - a) * jnp.log(ys / sy))
    m3 = phi - jnp.abs(z)
    return jnp.where(pos, jnp.minimum(jnp.minimum(x, y), m3), -1.0)


class _Layout(NamedTuple):
    """Static internal layout [nonneg(l) | soc... | psd... | ns...] of the
    non-zero cone rows (after the orthogonal row transform)."""
    l: int
    soc_dims: Tuple[int, ...]
    psd_sides: Tuple[int, ...]
    ns_blocks: Tuple[Tuple[str, object], ...]  # (kind, alpha)


def _ns_slices(lay: _Layout):
    out = []
    off = (
        lay.l + sum(lay.soc_dims)
        + sum(d * (d + 1) // 2 for d in lay.psd_sides)
    )
    for _ in lay.ns_blocks:
        out.append(slice(off, off + 3))
        off += 3
    return out


def _nu_total(lay: _Layout) -> int:
    """Sum of barrier parameters: 1 per nonneg coordinate, 2 per soc block
    (-log(s0^2-||s1||^2)), matrix side per psd block (-logdet), 3 per
    nonsymmetric block."""
    return max(
        lay.l + 2 * len(lay.soc_dims) + sum(lay.psd_sides)
        + 3 * len(lay.ns_blocks),
        1,
    )


def _psd_inv(v: Array):
    """Floored-eigh inverse of a PD svec block (relative floor keeps the
    inverse finite when boundary-riding eigenvalues round to <= 0)."""
    S = svec_to_sym(v)
    eps = 1e-15 if v.dtype == jnp.float64 else 1e-7
    w, Q = eigh_small(S)
    w = jnp.maximum(w, eps * jnp.maximum(jnp.max(w, axis=-1), 1e-300))
    return S, (Q / w[..., None, :]) @ jnp.swapaxes(Q, -1, -2)


def _soc_det(sb: Array) -> Array:
    """SOC Jordan determinant in the factored form (s0-||s1||)(s0+||s1||)
    with a relative floor — the same f32 cancellation hazard conic_ipm's
    ``_jdet_sqrt`` guards (near convergence the unfactored s0^2 - ||s1||^2
    can round to <= 0, turning barrier gradients/Hessians nonfinite)."""
    eps = 1e-14 if sb.dtype == jnp.float64 else 1e-7
    nu1 = jnp.linalg.norm(sb[1:])
    det = (sb[0] - nu1) * (sb[0] + nu1)
    return jnp.maximum(det, eps * sb[0] ** 2)


def _grad_barrier(lay: _Layout, s: Array) -> Array:
    """grad F(s) blockwise on the internal layout."""
    parts = [-1.0 / s[: lay.l]]
    for sl in _soc_slices(lay.l, lay.soc_dims):
        sb = s[sl]
        det = _soc_det(sb)
        Js = jnp.concatenate([sb[:1], -sb[1:]])
        parts.append(-2.0 * Js / det)
    for sl in _psd_slices(lay.l, lay.soc_dims, lay.psd_sides):
        _, Sinv = _psd_inv(s[sl])
        parts.append(-sym_to_svec(Sinv))
    for (kind, alpha), sl in zip(lay.ns_blocks, _ns_slices(lay)):
        parts.append(jax.grad(_barrier_fn(kind, alpha))(s[sl]))
    return jnp.concatenate(parts)


def _hbar_pair(lay: _Layout, s: Array, mu: Array, dt):
    """Dense block-diagonal ``Hbar = mu * hess F(s)`` and its inverse
    (mC x mC). mu*H plays exactly the role W^{-2} plays in the NT solver's
    quasi-definite Newton system; the closed forms below avoid forming 3x3
    autodiff Hessians anywhere but the nonsymmetric blocks.

      nonneg: H = diag(1/s^2)            H^{-1} = diag(s^2)
      soc:    H = (4/det^2)(Js)(Js)' - (2/det) J
              H^{-1} = s s' - (det/2) J            (log-homog degree-2 identity)
      psd:    H = symkron(S^{-1}), H^{-1} = symkron(S)   (svec operators)
      ns:     jax.hessian of the barrier; 3x3 inverse via floored eigh
    """
    mC = s.shape[0]
    H = jnp.zeros((mC, mC), dt)
    Hi = jnp.zeros((mC, mC), dt)
    il = jnp.arange(lay.l)
    H = H.at[il, il].set(1.0 / s[: lay.l] ** 2)
    Hi = Hi.at[il, il].set(s[: lay.l] ** 2)
    for sl in _soc_slices(lay.l, lay.soc_dims):
        sb = s[sl]
        d = sb.shape[0]
        det = _soc_det(sb)
        Js = jnp.concatenate([sb[:1], -sb[1:]])
        J = jnp.diag(
            jnp.concatenate([jnp.ones((1,), dt), -jnp.ones((d - 1,), dt)])
        )
        Hb = (4.0 / det**2) * jnp.outer(Js, Js) - (2.0 / det) * J
        Hib = jnp.outer(sb, sb) - 0.5 * det * J
        H = H.at[sl, sl].set(Hb)
        Hi = Hi.at[sl, sl].set(Hib)
    for d, sl in zip(lay.psd_sides, _psd_slices(lay.l, lay.soc_dims, lay.psd_sides)):
        S, Sinv = _psd_inv(s[sl])
        tri = d * (d + 1) // 2
        basis = jnp.eye(tri, dtype=dt)
        colsH = jax.vmap(lambda e: sym_to_svec(Sinv @ svec_to_sym(e) @ Sinv))(basis)
        colsHi = jax.vmap(lambda e: sym_to_svec(S @ svec_to_sym(e) @ S))(basis)
        H = H.at[sl, sl].set(colsH.T)
        Hi = Hi.at[sl, sl].set(colsHi.T)
    eps_w = 1e-14 if dt == jnp.float64 else 1e-6
    for (kind, alpha), sl in zip(lay.ns_blocks, _ns_slices(lay)):
        Hb = jax.hessian(_barrier_fn(kind, alpha))(s[sl])
        H = H.at[sl, sl].set(Hb)
        # near convergence the active-cone margin g -> 0 and Hb's spectrum
        # spans 1/g^2 .. O(1) (cond ~ 1/mu^2): a raw 3x3 linalg.inv
        # overflows in its cofactors and the computed matrix is numerically
        # indefinite. eigh is backward stable at any conditioning; a
        # relative eigenvalue floor keeps the inverse finite and PSD (the
        # floored directions are exactly the ones the dual-scaling method
        # cannot resolve past mu ~ sqrt(eps) anyway — termination fires
        # before the error matters; measured on the entropy program).
        w, Q = eigh_small(Hb)
        w = jnp.maximum(w, eps_w * jnp.max(w, axis=-1))
        Hib = (Q / w[..., None, :]) @ jnp.swapaxes(Q, -1, -2)
        Hi = Hi.at[sl, sl].set(Hib)
    return mu * H, Hi / mu


def _interior_measure(lay: _Layout, u: Array, dual: bool) -> Array:
    """Minimum blockwise interiority measure of ``u`` w.r.t. K (dual=False)
    or K* (dual=True). Positive iff strictly interior to every block.
    Polyhedral/soc/psd blocks are self-dual so the same measure serves both
    sides; nonsymmetric blocks swap to their dual-cone test."""
    dt = u.dtype
    vals = [jnp.min(u[: lay.l], initial=jnp.asarray(jnp.inf, dt))]
    for sl in _soc_slices(lay.l, lay.soc_dims):
        ub = u[sl]
        vals.append(ub[0] - jnp.linalg.norm(ub[1:]))
    for sl in _psd_slices(lay.l, lay.soc_dims, lay.psd_sides):
        vals.append(jnp.min(eigvalsh_small(svec_to_sym(u[sl])), axis=-1))
    for (kind, alpha), sl in zip(lay.ns_blocks, _ns_slices(lay)):
        k = _DUAL_KIND[kind] if dual else kind
        vals.append(_ns_interior(k, alpha, u[sl]))
    return jnp.min(jnp.stack(vals))


def _solve3_sym(A: Array, b: Array) -> Array:
    """Closed-form (Cramer) solve of a symmetric 3x3 system: elementwise
    cofactors, no LU — the shape XLA vectorizes across batch/grid vmaps."""
    a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
    a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    safe = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    x0 = (c00 * b[0] + c01 * b[1] + c02 * b[2]) / safe
    x1 = (c01 * b[0] + c11 * b[1] + c12 * b[2]) / safe
    x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) / safe
    return jnp.stack([x0, x1, x2])


def _prox_sq(lay: _Layout, s: Array, y: Array, mu: Array) -> Array:
    """Squared central-path proximity ``||y + mu grad F(s)||^2_{H(s)^{-1}}``
    (Skajaa–Ye / alfonso neighborhood). ``prox <= beta * mu`` with beta < 1
    certifies y in int K* by self-concordance of F — the per-block inner
    products alone cannot stop the dual sliding onto its boundary inside a
    3-dim nonsymmetric block (measured: the dual_exp test program stalled
    with y pinned to the exp boundary at pres ~ 1e-1)."""
    dt = s.dtype
    q = jnp.zeros((), dt)
    # nonneg: H^{-1} = diag(s^2), zeta_i = y_i - mu/s_i  =>  (s_i y_i - mu)^2
    q = q + jnp.sum((s[: lay.l] * y[: lay.l] - mu) ** 2)
    for sl in _soc_slices(lay.l, lay.soc_dims):
        sb, yb = s[sl], y[sl]
        det = _soc_det(sb)
        Js = jnp.concatenate([sb[:1], -sb[1:]])
        z = yb - 2.0 * mu * Js / det
        Jz = jnp.concatenate([z[:1], -z[1:]])
        Hiz = jnp.dot(sb, z) * sb - 0.5 * det * Jz
        q = q + jnp.dot(z, Hiz)
    for sl in _psd_slices(lay.l, lay.soc_dims, lay.psd_sides):
        S, Sinv = _psd_inv(s[sl])
        Z = svec_to_sym(y[sl]) - mu * Sinv
        # zeta' symkron(S) zeta = tr(Z S Z S) = ||S^{1/2} Z S^{1/2}||_F^2
        T = Z @ S
        q = q + jnp.sum(T * T.T)
    for (kind, alpha), sl in zip(lay.ns_blocks, _ns_slices(lay)):
        F = _barrier_fn(kind, alpha)
        sb = s[sl]
        z = y[sl] + mu * jax.grad(F)(sb)
        Hb = jax.hessian(F)(sb)
        # Jacobi-scaled closed-form 3x3 solve (entries span ~1/margin^2;
        # scaling keeps Cramer's rule finite at any conditioning the line
        # search can reach — and elementwise cofactors vectorize under the
        # candidate-grid/batch vmaps where XLA's batched LU on TPU does not)
        dj = jnp.sqrt(jnp.diagonal(Hb))
        Hs = Hb / dj[:, None] / dj[None, :]
        x = _solve3_sym(Hs, z / dj) / dj
        q = q + jnp.dot(z, x)
    return q


def _init_point(lay: _Layout, dt) -> Array:
    """Strictly interior, centered starting s0 ([nonneg|soc|psd] identity
    blocks + per-kind central points for the nonsymmetric blocks)."""
    base = _identity_elem(lay.l, lay.soc_dims, lay.psd_sides, dt)
    parts = [base]
    for kind, alpha in lay.ns_blocks:
        parts.append(_ns_central(kind, alpha, dt))
    return jnp.concatenate(parts)


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
    # Best-iterate tracking (same rationale as the NT IPM's): near the
    # complementarity floor the iterate OSCILLATES — err bounces in a
    # ~2x band and a late full step can land on a worse point right
    # before the stall exit fires (measured on the padded exp+psd batch
    # instance: err touched 4.2e-8 at it=20, wandered at the f64 floor,
    # then froze at 1.5e-7 for the stall counter — flipping `converged`
    # on a trajectory whose best point was 4x inside the threshold).
    # Returning the best-by-err iterate makes the flag a property of the
    # solve, not of which floor-noise sample the exit landed on.
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
    neighborhood: float = 0.9,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    """Solve one instance with the nonsymmetric-cone PDIPM (vmap over
    batches via :func:`solve_batched`). ``neighborhood`` is the Skajaa–Ye
    proximity bound beta (< 1) on ``||y + mu grad F(s)||_{H(s)^{-1}} / mu``
    enforced by the combined-step line search."""
    from ..utils.config import get_config

    if max_iters is None:
        max_iters = get_config().nsipm_max_iters
    with jax.default_matmul_precision("highest"):
        return _solve_impl(
            cp,
            max_iters=max_iters,
            tol=tol,
            reg=reg,
            refine_iters=refine_iters,
            step_frac=step_frac,
            neighborhood=neighborhood,
        )


def _solve_impl(
    cp: ConeProgram,
    *,
    max_iters: int,
    tol: float | None,
    reg: float | None,
    refine_iters: int | None,
    step_frac: float,
    neighborhood: float,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    if not supports(cp.cones):
        raise ValueError(
            f"conic_nsipm: unsupported cone kinds in {cp.cones!r}"
        )
    if all(k == "zero" for k, _, _ in cp.cones.blocks):
        raise ValueError(
            "conic_nsipm needs at least one non-zero cone block; "
            "use solvers.conic for equality-only programs"
        )
    from ..utils.config import get_config

    cfg = get_config()
    dt = cp.A.dtype
    if tol is None:
        tol = cfg.nsipm_tol(dt)
    elif dt != jnp.float64:
        tol = max(tol, cfg.nsipm_tol_f32)
    if reg is None:
        reg = cfg.ipm_reg(dt)
    n = cp.num_vars
    R, p, l, soc_dims, psd_sides, ns_blocks = _row_transform(
        cp.cones, dt, allow_ns=True
    )
    lay = _Layout(l, soc_dims, psd_sides, ns_blocks)
    A = R @ cp.A
    b = R @ cp.b
    c = cp.c
    AE, bE = A[:p], b[:p]
    AC, bC = A[p:], b[p:]
    mC = AC.shape[0]
    nu_deg = _nu_total(lay)
    eyen = jnp.eye(n, dtype=dt)

    if refine_iters is None:
        refine_iters = 0 if dt == jnp.float64 else 1
        if psd_sides or ns_blocks:
            # psd W^2 / nonsymmetric Hbar blocks condition like 1/mu^2 near
            # convergence; one refinement pass against the exact block system
            # recovers the lost digits (measured on the entropy program:
            # the Jacobi-scaled 3x3 inverses alone leave ~1e-7 relative
            # direction error at mu ~ 1e-9)
            refine_iters = max(refine_iters, 1)
    refine_steps = refine_iters

    def residuals(x, yE, yC, s):
        rd = c + AC.T @ yC + (AE.T @ yE if p else 0.0)
        rpE = AE @ x - bE
        rpC = AC @ x + s - bC
        return rd, rpE, rpC

    # Newton linear algebra mirrors the NT solver: the quasi-definite LDL'
    # solves the UNSQUARED system [[-Hbar^{-1}, AC, 0], [AC', reg I, AE'],
    # [0, AE, -reg I]] in [cone | x | eq] order (cone-first pivots are O(1);
    # x-first elimination growth ~||A||^2/reg destroys the cone block in f32
    # — see conic_ipm.py); past the Pallas LDL' size limit, the condensed
    # Cholesky path uses Hx = AC' Hbar AC + reg I (no inverse needed).
    use_ldl = (n + p + mC) <= 128

    if use_ldl:

        def factor(Hbar, Hbar_inv):
            N = n + p + mC
            K = jnp.zeros((N, N), dt)
            K = K.at[:mC, :mC].set(-Hbar_inv)
            K = K.at[:mC, mC : mC + n].set(AC)
            K = K.at[mC : mC + n, :mC].set(AC.T)
            K = K.at[mC : mC + n, mC : mC + n].set(reg * eyen)
            if p:
                K = K.at[mC : mC + n, mC + n :].set(AE.T)
                K = K.at[mC + n :, mC : mC + n].set(AE)
                K = K.at[mC + n :, mC + n :].set(-reg * jnp.eye(p, dtype=dt))
            return ldl_factor(K), Hbar, Hbar_inv

        def _solve_dir_once(K, rd, rpE, rpC, g):
            (L, dvec), Hbar, Hbar_inv = K
            rhs = jnp.concatenate([-rpC + Hbar_inv @ g, -rd, -rpE])
            sol = ldl_solve(L, dvec, rhs)
            dyC = sol[:mC]
            dx = sol[mC : mC + n]
            dyE = sol[mC + n :]
            ds = -(Hbar_inv @ (g + dyC))
            return dx, dyE, dyC, ds

    else:

        def factor(Hbar, Hbar_inv):
            Hx = AC.T @ (Hbar @ AC) + reg * eyen
            Lh = chol(Hx)
            if p:
                HiAt = chol_solve(Lh, AE.T)
                S = AE @ HiAt + reg * jnp.eye(p, dtype=dt)
                Ls = chol(S)
            else:
                Ls = jnp.zeros((0, 0), dt)
            return (Lh, Ls), Hbar, Hbar_inv

        def _solve_dir_once(K, rd, rpE, rpC, g):
            (Lh, Ls), Hbar, _ = K
            rhs_x = -rd + AC.T @ (g - Hbar @ rpC)
            x1 = chol_solve(Lh, rhs_x)
            if p:
                dyE = chol_solve(Ls, AE @ x1 + rpE)
                dx = x1 - chol_solve(Lh, AE.T @ dyE)
            else:
                dyE = jnp.zeros((0,), dt)
                dx = x1
            ds = -rpC - AC @ dx
            dyC = -g - Hbar @ ds
            return dx, dyE, dyC, ds

    def solve_dir(K, rd, rpE, rpC, g):
        """Direction with iterative refinement against the unsquared block
        residuals (complementarity row dyC + Hbar ds = -g)."""
        d = _solve_dir_once(K, rd, rpE, rpC, g)
        _, Hbar, _ = K
        for _ in range(refine_steps):
            dx, dyE, dyC, ds = d
            r1 = -rd - (AC.T @ dyC + (AE.T @ dyE if p else 0.0))
            r2 = -rpE - AE @ dx
            r3 = -rpC - (AC @ dx + ds)
            r4 = -g - (dyC + Hbar @ ds)
            c1, c2, c3, c4 = _solve_dir_once(K, -r1, -r2, -r3, -r4)
            d = (dx + c1, dyE + c2, dyC + c3, ds + c4)
        return d

    # --- initialization: central s0 per block, y0 = -grad F(s0) (interior
    # to K* by log-homogeneity, with <s0,y0> = nu so mu0 = 1), x0 = 0
    s = _init_point(lay, dt)
    yC = -_grad_barrier(lay, s)
    x = jnp.zeros((n,), dt)
    yE = jnp.zeros((p,), dt)

    def metrics(x, yE, yC, s, rd, rpE, rpC):
        """SCS-style scale-relative termination (same as conic_ipm)."""
        Ax_sc = jnp.maximum(
            jnp.linalg.norm(jnp.concatenate([rpE, rpC]) - jnp.concatenate(
                [jnp.zeros((p,), dt), s]) + b),
            jnp.maximum(jnp.linalg.norm(s), jnp.linalg.norm(b)),
        )
        pres = jnp.sqrt(jnp.sum(rpE**2) + jnp.sum(rpC**2)) / (1.0 + Ax_sc)
        Aty_sc = jnp.maximum(jnp.linalg.norm(rd - c), jnp.linalg.norm(c))
        dres = jnp.linalg.norm(rd) / (1.0 + Aty_sc)
        pobj = jnp.dot(c, x)
        dobj = -(jnp.dot(bE, yE) + jnp.dot(bC, yC))
        gaprel = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return pres, dres, gaprel

    # Skajaa–Ye-flavored scheme: Mehrotra predictor steps stay inside the
    # proximity neighborhood beta * mu; when the predictor's line search
    # collapses (the iterate is parked ON the neighborhood boundary and the
    # residual-reducing direction points outward — measured on the dual_exp
    # program, frozen at pres ~ 1e-1), a pure centering step (sigma = 1,
    # zero residual RHS: residuals untouched, only centrality improves)
    # pulls the iterate back inside so the next predictor can move.
    beta_wide = jnp.asarray(neighborhood, dt)
    alpha_stall = jnp.asarray(0.05, dt)

    def feasible(sn, yn):
        return jnp.logical_and(
            jnp.logical_and(
                _interior_measure(lay, sn, dual=False) > 0,
                _interior_measure(lay, yn, dual=True) > 0,
            ),
            jnp.all(jnp.isfinite(jnp.concatenate([sn, yn]))),
        )

    # Line searches evaluate a STATIC candidate grid under vmap: one
    # proximity/feasibility graph executed 32-wide, instead of a sequential
    # bisection inlining ~60 copies of it into the while_loop body (which
    # blew XLA's CPU compile past 30 minutes for the vmapped solver —
    # measured; the grid is also the TPU-friendlier shape: wide vector work
    # instead of a sequential scalar loop).
    _PRED_GRID = np.concatenate(
        [[1.0], step_frac * 0.8 ** np.arange(14), [0.02, 0.008, 0.003]]
    )  # 18 candidates: geometric ratio 0.8 down to ~0.044, then a sparse
    # sub-alpha_stall tail — small-but-nonzero predictor steps still exist
    # instead of collapsing straight to the centering branch, but the grid
    # stays narrow: every candidate evaluates the full proximity/feasibility
    # graph batch-wide, so grid width is the dominant per-iteration cost
    # (measured: the exp-family bench is line-search-bound), and a Mehrotra
    # step within 20% of the largest admissible alpha costs at most ~1
    # extra iteration.
    _CENT_GRID = np.array(
        [1.0, 0.6, 0.35, 0.2, 0.1, 0.05, 0.02]
    )

    def _ok_at(s0, y0, ds, dy, with_prox: bool, a):
        sn = s0 + a * ds
        yn = y0 + a * dy
        good = feasible(sn, yn)
        if with_prox:
            mu_n = jnp.dot(sn, yn) / nu_deg
            good = jnp.logical_and(good, mu_n > 0)
            prox2 = _prox_sq(lay, sn, yn, mu_n)
            good = jnp.logical_and(good, prox2 <= (beta_wide * mu_n) ** 2)
        return good

    def pred_search(s0, y0, ds, dy, with_prox: bool, coarse: bool = False):
        """Largest grid alpha in (0, 1] keeping (s0 + a ds, y0 + a dy)
        strictly interior to K x K* (and, when with_prox, inside the wide
        proximity neighborhood). ``coarse`` halves the grid — the affine
        probe only feeds Mehrotra's sigma heuristic, so a factor-0.64
        step-length resolution is plenty (the combined step re-searches on
        the full grid)."""
        grid = jnp.asarray(_PRED_GRID[::2] if coarse else _PRED_GRID, dt)
        ok = jax.vmap(partial(_ok_at, s0, y0, ds, dy, with_prox))(grid)
        return jnp.max(jnp.where(ok, grid, jnp.zeros((), dt)))

    def cent_search(s0, y0, ds, dy):
        """Centering step size: the feasible grid alpha with the smallest
        resulting proximity (prox along a centering direction is not
        monotone, so a sup-search does not apply)."""

        def prox_at(a):
            sn = s0 + a * ds
            yn = y0 + a * dy
            mu_n = jnp.dot(sn, yn) / nu_deg
            good = jnp.logical_and(feasible(sn, yn), mu_n > 0)
            p2 = _prox_sq(lay, sn, yn, mu_n)
            rel = p2 / jnp.maximum(mu_n**2, jnp.asarray(1e-300, dt))
            return jnp.where(good, rel, jnp.asarray(jnp.inf, dt))

        grid = jnp.asarray(_CENT_GRID, dt)
        vals = jax.vmap(prox_at)(grid)
        best = jnp.argmin(vals)
        # all-infeasible (cannot happen from a strictly interior iterate,
        # but guard the freeze path): alpha = 0
        alpha = jnp.where(jnp.isfinite(vals[best]), grid[best], 0.0)
        return alpha

    def cond(st: _State):
        return jnp.logical_and(st.it < max_iters, jnp.logical_not(st.done))

    def body(st: _State) -> _State:
        x, yE, yC, s = st.x, st.yE, st.yC, st.s
        rd, rpE, rpC = residuals(x, yE, yC, s)
        mu = jnp.dot(s, yC) / nu_deg

        pres, dres, gaprel = metrics(x, yE, yC, s, rd, rpE, rpC)
        done_now = jnp.logical_and(
            pres < tol, jnp.logical_and(dres < tol, gaprel < tol)
        )

        gradF = _grad_barrier(lay, s)
        Hbar, Hbar_inv = _hbar_pair(lay, s, mu, dt)
        K = factor(Hbar, Hbar_inv)

        # Mehrotra predictor: affine probe for the centering weight, then
        # the combined direction, line-searched inside the neighborhood.
        # The probe direction ONLY feeds the sigma heuristic, so it skips
        # iterative refinement (one LDL solve instead of 1 + refine_steps)
        # and searches the coarse grid — measured 34.6k -> ~49k exp
        # solves+VJPs/s on the TPU bench with iteration counts unchanged.
        dxa, dyEa, dyCa, dsa = _solve_dir_once(K, rd, rpE, rpC, yC)
        a_aff = pred_search(s, yC, dsa, dyCa, with_prox=False, coarse=True)
        mu_aff = jnp.dot(s + a_aff * dsa, yC + a_aff * dyCa) / nu_deg
        sigma = jnp.clip(
            (mu_aff / jnp.maximum(mu, jnp.asarray(1e-300, dt))) ** 3,
            0.0, 1.0,
        )
        g = yC + (sigma * mu) * gradF
        dxp, dyEp, dyCp, dsp = solve_dir(K, rd, rpE, rpC, g)
        alpha_p = pred_search(s, yC, dsp, dyCp, with_prox=True)

        def centering_step(_):
            # NOTE: under vmap, lax.cond lowers to select_n and BOTH branches
            # execute for the whole batch every iteration — so this branch is
            # paid unconditionally on batched solves. Keep it lean: the
            # centering direction skips iterative refinement (one LDL solve,
            # not 1 + refine_steps) — it is a recovery step whose step size
            # is chosen by proximity descent, not a precision-critical
            # Newton direction.
            zeros_rhs = (
                jnp.zeros_like(rd), jnp.zeros_like(rpE), jnp.zeros_like(rpC)
            )
            gc = yC + mu * gradF
            dx, dyE, dyC, ds = _solve_dir_once(K, *zeros_rhs, gc)
            alpha = cent_search(s, yC, ds, dyC)
            return dx, dyE, dyC, ds, alpha

        def predictor_step(_):
            return dxp, dyEp, dyCp, dsp, alpha_p

        dx, dyE, dyC, ds, alpha = jax.lax.cond(
            alpha_p < alpha_stall, centering_step, predictor_step,
            operand=None,
        )

        finite = jnp.logical_and(
            jnp.isfinite(alpha),
            jnp.all(jnp.isfinite(jnp.concatenate([dx, dyE, dyC, ds]))),
        )
        # stagnation exit: once mu stops contracting (the dual-scaling
        # Hessian conditions like 1/mu^2, so progress hard-stops near
        # sqrt(eps) complementarity), further iterations only burn the
        # batch's wall clock — vmapped batches run until EVERY instance
        # exits (cf. the NT IPM's freeze-before-step semantics). Like the
        # NT IPM's exit, it requires BOTH mu and the residual error to be
        # non-contracting: pure-centering recovery iterations deliberately
        # hold mu ~constant while restoring proximity, and must not be
        # counted as stalls while the residuals still move.
        err = jnp.maximum(pres, jnp.maximum(dres, gaprel))
        stalled_now = jnp.logical_and(
            mu > 0.98 * st.mu_prev, err > 0.98 * st.err_prev
        )
        stall = jnp.where(stalled_now, st.stall + 1, jnp.asarray(0, jnp.int32))
        step = jnp.logical_and(finite, jnp.logical_not(done_now))
        upd = lambda v, dv: jnp.where(step, v + alpha * dv, v)
        done = jnp.logical_or(
            done_now, jnp.logical_or(jnp.logical_not(finite), stall >= 5)
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

    # The loop's best-iterate bookkeeping only sees states it stepped FROM;
    # the final iterate's own metrics are computed here and compared.
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
    step_frac: float = 0.99,
    neighborhood: float = 0.9,
) -> Tuple[ConeSolution, ConicSolveInfo]:
    """Solve a (B, ...) batch with the fully-fused single-kernel
    nonsymmetric-cone IPM (``ops/pallas/ns_pdip.py``): one Pallas launch
    runs all dual-scaling Newton iterations + proximity line searches with
    the 128-instance tile resident in VMEM (the vmapped XLA path is
    dispatch/HBM-bound: thousands of tiny elementwise ops per iteration —
    measured ~49k exp solves+VJPs/s vs 262k for the fused NT SOCP kernel).
    Falls back to :func:`solve_batched` for psd blocks, equality-free
    programs, Newton systems past the loop-LDL' envelope, or non-2D
    batches."""
    from ..utils.config import get_config

    cfg = get_config()
    dt = cp.A.dtype
    if not supports(cp.cones):
        raise ValueError(
            f"conic_nsipm: unsupported cone kinds in {cp.cones!r}"
        )
    n = cp.num_vars
    R, p, l, soc_dims, psd_sides, ns_blocks = _row_transform(
        cp.cones, dt, allow_ns=True
    )
    mC = l + sum(soc_dims) + sum(
        d * (d + 1) // 2 for d in psd_sides
    ) + 3 * len(ns_blocks)
    N = n + p + mC
    if (
        psd_sides or not ns_blocks or mC == 0 or p == 0
        or N > 128 or cp.c.ndim != 2
    ):
        # forward the caller's full tuning surface — a fallback that silently
        # reverts reg/step_frac/neighborhood to defaults would change
        # iterates (and possibly the converged flag) with no error
        return solve_batched(
            cp, max_iters=max_iters, tol=tol, reg=reg,
            step_frac=step_frac, neighborhood=neighborhood,
        )
    if max_iters is None:
        max_iters = cfg.nsipm_max_iters
    if tol is None:
        tol = cfg.nsipm_tol(dt)
    elif dt != jnp.float64:
        tol = max(tol, cfg.nsipm_tol_f32)
    if reg is None:
        reg = cfg.ipm_reg(dt)
    eps = 1e-15 if dt == jnp.float64 else 1e-7

    from ..ops.pallas.ns_pdip import solve_tile_fused_ns
    from ..utils.precision import full_precision

    @full_precision
    def run(cp):
        A_int = jnp.einsum("ij,bjk->bik", R, cp.A)
        b_int = cp.b @ R.T
        x, yE, yC, s, it, pres, dres, gaprel = solve_tile_fused_ns(
            cp.c, b_int[:, :p], b_int[:, p:], A_int[:, :p], A_int[:, p:],
            (p, l, soc_dims, ns_blocks),
            max_iters=max_iters, tol=tol, reg=reg, eps=eps,
            step_frac=step_frac, neighborhood=neighborhood,
        )
        y = jnp.concatenate([yE, yC], axis=-1) @ R
        s_full = jnp.concatenate(
            [jnp.zeros((s.shape[0], p), dt), s], axis=-1
        ) @ R
        gap = jnp.sum(s * yC, axis=-1)
        conv = (pres < 10 * tol) & (dres < 10 * tol) & (gaprel < 10 * tol)
        return (
            ConeSolution(x=x, y=y, s=s_full),
            ConicSolveInfo(
                iterations=it.astype(jnp.int32),
                primal_residual=pres,
                dual_residual=dres,
                gap=gap,
                converged=conv,
            ),
        )

    return run(cp)
