"""Cone specifications and projection calculus.

TPU-native replacement for the reference's cone machinery: the runtime
``ProductOfSets`` row layout (``/root/reference/src/product_of_sets.jl:15-74``)
becomes a *static* :class:`ConeSpec`, and the projections pi / D-pi delegated to
MathOptSetDistances (``/root/reference/src/diff_opt.jl:483-519``) become
closed-form JAX ops that trace into fused XLA code.

As in the reference, projections act on the **dual cone** of each constraint
set: the conic residual map uses ``v = y - s`` projected onto K* (see
``ConicProgram.jl:222-249``).

Supported cone kinds (MOI set -> kind):

* ``zero``    — Zeros;        dual = Reals:     Pi(v) = v,       DPi = I
* ``nonneg``  — Nonnegatives; dual = Nonneg:    Pi = max(v, 0),  DPi = diag(v>=0)
* ``nonpos``  — Nonpositives; dual = Nonpos:    Pi = min(v, 0),  DPi = diag(v<=0)
* ``soc``     — SecondOrderCone (self-dual): closed-form 2x2 block formula
* ``rsoc``    — RotatedSecondOrderCone (self-dual): orthogonal rotation of soc
* ``psd``     — PSD cone in **svec** coordinates (self-dual): eigh-based
* ``exp``     — ExponentialCone; dual cone projection via Newton iteration.
* ``pow``     — PowerCone(alpha) (3-d); dual projection via Moreau + the
  scalar root-find of Hien (2015) on the boundary parametrization. Blocks
  carry the exponent: ``("pow", 3, alpha)``.
* ``dual_pow``— DualPowerCone(alpha); projects onto the primal power cone.

PSD convention: rows are the *scaled* triangle (svec) — upper triangle,
column-by-column, off-diagonal entries multiplied by sqrt(2) — so the
Euclidean inner product equals the Frobenius matrix product and the cone is
genuinely self-dual with a symmetric DPi. This is the SCS/diffcp internal
convention; the reference's MOI layer uses the *unscaled* triangle and pays
for it with weighted inner products (see the preprocessing note at
``/root/reference/src/ConicProgram/ConicProgram.jl:211-213``). Use
:func:`moi_tri_to_svec` / :func:`svec_to_moi_tri` to convert data and duals
expressed in MOI triangle coordinates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_KINDS = (
    "zero", "nonneg", "nonpos", "soc", "rsoc", "psd", "exp", "dual_exp",
    "pow", "dual_pow",
)


class ConeSpec:
    """Static, hashable ordered list of cone blocks.

    Blocks are ``(kind, dim)`` or, for parameterized cones (``pow`` /
    ``dual_pow``), ``(kind, dim, alpha)``. ``dim`` is the number of *rows*
    the block spans (for ``psd`` this is the triangle length ``d(d+1)/2``,
    not the matrix side). Blocks are normalized internally to
    ``(kind, dim, param)`` with ``param=None`` for unparameterized kinds.
    """

    __slots__ = ("blocks",)

    def __init__(self, blocks: Sequence[Tuple]):
        norm = []
        for blk in blocks:
            if len(blk) == 2:
                k, d = blk
                prm = None
            else:
                k, d, prm = blk
                # accept a spec's own normalized (kind, dim, None) blocks
                prm = None if prm is None else float(prm)
            norm.append((str(k), int(d), prm))
        blocks = tuple(norm)
        for k, d, prm in blocks:
            if k not in _KINDS:
                raise ValueError(f"unknown cone kind {k!r}; expected one of {_KINDS}")
            if k == "psd":
                side = _tri_side(d)
                if side * (side + 1) // 2 != d:
                    raise ValueError(f"psd block dim {d} is not a triangle number")
            if k in ("exp", "dual_exp", "pow", "dual_pow") and d != 3:
                raise ValueError(f"{k} cone blocks must have dim 3, got {d}")
            if k == "rsoc" and d < 2:
                raise ValueError(f"rsoc block dim must be >= 2, got {d}")
            if k in ("pow", "dual_pow"):
                if prm is None or not (0.0 < prm < 1.0):
                    raise ValueError(
                        f"{k} blocks need an exponent in (0,1): ('{k}', 3, alpha)"
                    )
            elif prm is not None:
                raise ValueError(f"{k} blocks take no parameter")
        self.blocks = blocks

    @property
    def total_dim(self) -> int:
        return sum(d for _, d, _ in self.blocks)

    def offsets(self):
        """Yield (kind, start, dim) for each block."""
        off = 0
        for k, d, _ in self.blocks:
            yield k, off, d
            off += d

    def offsets_params(self):
        """Yield (kind, start, dim, param) for each block."""
        off = 0
        for k, d, prm in self.blocks:
            yield k, off, d, prm
            off += d

    def __hash__(self):
        return hash(self.blocks)

    def __eq__(self, other):
        return isinstance(other, ConeSpec) and self.blocks == other.blocks

    def __repr__(self):
        return f"ConeSpec({list(self.blocks)})"


def _tri_side(tri_len: int) -> int:
    """Matrix side d such that d(d+1)/2 == tri_len (rounded)."""
    return int(round(((8 * tri_len + 1) ** 0.5 - 1) / 2))


def _tri_order(d: int):
    """Static (row, col) index list of the upper triangle, column-by-column:
    (0,0),(0,1),(1,1),(0,2),... — the MOI/SCS ordering."""
    import numpy as np

    order = []
    for c in range(d):
        for r in range(c + 1):
            order.append((r, c))
    return np.array(order)


def _svec_scale(d: int, dtype):
    """Per-entry svec scaling: 1 on the diagonal, sqrt(2) off-diagonal."""
    import numpy as np

    order = _tri_order(d)
    return jnp.asarray(
        np.where(order[:, 0] == order[:, 1], 1.0, np.sqrt(2.0)), dtype=dtype
    )


def svec_to_sym(v: Array) -> Array:
    """svec vector (off-diag scaled by sqrt2) -> symmetric matrix."""
    d = _tri_side(v.shape[-1])
    order = _tri_order(d)
    vals = v / _svec_scale(d, v.dtype)
    X = jnp.zeros(v.shape[:-1] + (d, d), v.dtype)
    X = X.at[..., order[:, 0], order[:, 1]].set(vals)
    X = X.at[..., order[:, 1], order[:, 0]].set(vals)
    return X


def sym_to_svec(X: Array) -> Array:
    """Symmetric matrix -> svec vector (off-diag scaled by sqrt2)."""
    d = X.shape[-1]
    order = _tri_order(d)
    return X[..., order[:, 0], order[:, 1]] * _svec_scale(d, X.dtype)


def moi_tri_to_svec(v: Array) -> Array:
    """MOI unscaled triangle coordinates -> svec (multiply off-diag by sqrt2)."""
    d = _tri_side(v.shape[-1])
    return v * _svec_scale(d, v.dtype)


def svec_to_moi_tri(v: Array) -> Array:
    """svec -> MOI unscaled triangle coordinates."""
    d = _tri_side(v.shape[-1])
    return v / _svec_scale(d, v.dtype)


# ---------------------------------------------------------------------------
# Per-kind projection Pi onto the dual cone, and its derivative applied to a
# tangent (DPi @ dv). The derivative-as-dense-matrix variants build the block
# for direct (materialized) residual systems.
# ---------------------------------------------------------------------------


def _pi_soc(v: Array) -> Array:
    t, x = v[..., 0], v[..., 1:]
    nx = jnp.linalg.norm(x, axis=-1)
    # Three regimes: inside (nx <= t) -> v; polar (nx <= -t) -> 0; else boundary
    alpha = jnp.clip((t + nx) / 2.0, min=0.0)
    safe_nx = jnp.where(nx > 0, nx, 1.0)
    proj_t = alpha
    proj_x = (alpha / safe_nx)[..., None] * x
    inside = nx <= t
    out_t = jnp.where(inside, t, proj_t)
    out_x = jnp.where(inside[..., None], x, proj_x)
    return jnp.concatenate([out_t[..., None], out_x], axis=-1)


def _dpi_soc_dense(v: Array) -> Array:
    """Dense DPi for the second-order cone at v = (t, x)."""
    d = v.shape[-1]
    t, x = v[0], v[1:]
    nx = jnp.linalg.norm(x)
    safe_nx = jnp.where(nx > 0, nx, 1.0)
    xb = x / safe_nx
    eye = jnp.eye(d, dtype=v.dtype)
    # Boundary case formula: 0.5*[[1, xb'], [xb, ((nx+t)/nx) I - (t/nx) xb xb']]
    blk = jnp.zeros((d, d), v.dtype)
    blk = blk.at[0, 0].set(0.5)
    blk = blk.at[0, 1:].set(0.5 * xb)
    blk = blk.at[1:, 0].set(0.5 * xb)
    lower = ((nx + t) / (2 * safe_nx)) * jnp.eye(d - 1, dtype=v.dtype) - (
        t / (2 * safe_nx)
    ) * jnp.outer(xb, xb)
    blk = blk.at[1:, 1:].set(lower)
    inside = nx <= t
    polar = nx <= -t
    return jnp.where(inside, eye, jnp.where(polar, jnp.zeros_like(eye), blk))


def _pi_psd_tri(v: Array) -> Array:
    from .ops.smalleig import eigh_small

    X = svec_to_sym(v)
    w, U = eigh_small(X)
    wp = jnp.clip(w, min=0.0)
    P = (U * wp[..., None, :]) @ jnp.swapaxes(U, -1, -2)
    return sym_to_svec(P)


def _psd_kmat(w: Array, dtype) -> Array:
    """Entrywise derivative weights K_ij = (wi+ + wj+) / (|wi| + |wj|)."""
    wp = jnp.clip(w, min=0.0)
    num = wp[:, None] + wp[None, :]
    den = jnp.abs(w)[:, None] + jnp.abs(w)[None, :]
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.5).astype(dtype)


def _dpi_psd_tri_apply(v: Array, dv: Array) -> Array:
    """DPi_psd(v) @ dv in triangle coordinates."""
    from .ops.smalleig import eigh_small

    X = svec_to_sym(v)
    dX = svec_to_sym(dv)
    w, U = eigh_small(X)
    K = _psd_kmat(w, v.dtype)
    inner = jnp.swapaxes(U, -1, -2) @ dX @ U
    out = U @ (K * inner) @ jnp.swapaxes(U, -1, -2)
    return sym_to_svec(out)


def _dpi_psd_tri_dense(v: Array) -> Array:
    from .ops.smalleig import eigh_small

    tri = v.shape[-1]
    # one eigh for the whole block (not one per basis column): the vmapped
    # part is only the cheap congruence U'(.)U per column
    w, U = eigh_small(svec_to_sym(v))
    K = _psd_kmat(w, v.dtype)
    Ut = jnp.swapaxes(U, -1, -2)
    basis = jnp.eye(tri, dtype=v.dtype)

    def col(e):
        inner = Ut @ svec_to_sym(e) @ U
        return sym_to_svec(U @ (K * inner) @ Ut)

    cols = jax.vmap(col)(basis)
    return jnp.swapaxes(cols, 0, 1)


# --- exponential cone ------------------------------------------------------
# K_exp = cl{(x,y,z): y>0, y*exp(x/y) <= z}; its dual is
# K_exp* = cl{(u,v,w): u<0, -u*exp(v/u) <= e*w}.
# Projection onto K_exp* via Moreau: Pi_{K*}(v) = v + Pi_K(-v).
# Pi_K uses the standard primal-dual Newton refinement on the KKT system of the
# projection problem (Friberg 2021 "Projection onto the exponential cone").


@jax.custom_jvp
def _proj_exp_primal(v0: Array) -> Array:
    """Projection of a 3-vector onto the primal exponential cone."""
    r, s, t = v0[0], v0[1], v0[2]
    dt = v0.dtype

    # Case 1: already in the cone.
    in_cone = jnp.logical_or(
        jnp.logical_and(s > 0, s * jnp.exp(r / jnp.where(s > 0, s, 1.0)) <= t),
        jnp.logical_and(jnp.logical_and(r <= 0, jnp.abs(s) <= 1e-300), t >= 0),
    )
    # Case 2: in the polar cone (-K*) -> projection is 0.
    u, w = -r, -t
    in_polar = jnp.logical_or(
        jnp.logical_and(
            u > 0, u * jnp.exp(-s / jnp.where(u > 0, u, 1.0)) <= jnp.exp(1.0) * w
        ),
        jnp.logical_and(jnp.logical_and(u <= 0, -s <= 0), w >= 0),
    )
    # Case 3: "heuristic" region r<=0, s<=0: project to (r, 0, max(t,0)).
    special = jnp.logical_and(r <= 0, s <= 0)

    # General case: solve for the boundary point with Newton on the scalarized
    # optimality conditions. Parametrize the projection x = (x1,x2,x3) on the
    # boundary x2*exp(x1/x2)=x3, with multiplier mu>0:
    #   x - v0 = mu * grad g(x),  g(x)=x2*exp(x1/x2)-x3.
    # Following Friberg, reduce to a 1-d root find in rho: guarded Newton/bisect.
    def general(v0):
        r, s, t = v0[0], v0[1], v0[2]

        def h(rho):
            # exp(rho) terms guarded
            erho = jnp.exp(rho)
            emrho = jnp.exp(-rho)
            f = ((rho - 1) * r + s) * erho - (r - rho * s) * emrho - (
                rho * (rho - 1) + 1
            ) * t
            df = (rho * r + s) * erho + (r - (rho - 1) * s) * emrho - (
                2 * rho - 1
            ) * t
            return f, df

        # Bracket the root then do safeguarded Newton.
        lo0, hi0 = _exp_root_bracket(r, s, t)

        def body(carry, _):
            lo, hi, rho = carry
            f, df = h(rho)
            lo = jnp.where(f < 0, rho, lo)
            hi = jnp.where(f < 0, hi, rho)
            newton = rho - f / jnp.where(jnp.abs(df) > 1e-30, df, 1.0)
            ok = jnp.logical_and(newton > lo, newton < hi)
            rho_next = jnp.where(ok, newton, 0.5 * (lo + hi))
            return (lo, hi, rho_next), None

        rho0 = 0.5 * (lo0 + hi0)
        (lo, hi, rho), _ = jax.lax.scan(body, (lo0, hi0, rho0), None, length=60)
        vp = jnp.maximum((rho - 1) * r + s, 1e-300) / (rho * (rho - 1) + 1)
        vd = jnp.maximum(r - rho * s, 1e-300) / (rho * (rho - 1) + 1)
        x1 = rho * vp
        x2 = vp
        x3 = vp * jnp.exp(rho)
        return jnp.stack([x1, x2, x3]).astype(dt)

    zero = jnp.zeros(3, dt)
    heur = jnp.stack([r, jnp.zeros((), dt), jnp.clip(t, min=0.0)])
    gen = general(v0)
    out = jnp.where(in_cone, v0, jnp.where(in_polar, zero, jnp.where(special, heur, gen)))
    return out


def _proj_kkt_dp(a00, a01, a11, g, dv):
    """Shared closed-form solve of the 3-dim projection-KKT tangent system
    ``[[A, g], [g', 0]] [dp; dmu] = [dv; 0]`` where ``A = I + mu*H`` has the
    block shape [[a00, a01, 0], [a01, a11, 0], [0, 0, 1]] (the boundary
    functions of the exp and power cones have zero z-curvature). Elementwise
    Cramer on the 2x2 + Schur complement for dmu — vectorizes under batch
    vmaps where XLA's batched 4x4 LU on TPU does not."""
    dt = g.dtype
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)  # dtype-relative: 1e-300 == 0 in f32
    zero = jnp.zeros((), dt)
    # Every guard acts on PRIMAL-only coefficients: the rule must stay
    # LINEAR in the tangent dv or jax cannot transpose the custom JVP into
    # a VJP (isfinite on a tangent-dependent value trips
    # `is_undefined_primal` during transposition — measured).
    fz = lambda a: jnp.where(jnp.isfinite(a), a, zero)
    det2 = a00 * a11 - a01 * a01
    safe2 = jnp.where(jnp.abs(det2) > tiny, det2, 1.0)
    m00 = fz(a11 / safe2)
    m01 = fz(-a01 / safe2)
    m11 = fz(a00 / safe2)

    def asolve(b):
        return jnp.stack(
            [m00 * b[0] + m01 * b[1], m01 * b[0] + m11 * b[1], b[2]]
        )

    gf = fz(g)
    w = fz(asolve(gf))  # primal-only
    denom = jnp.dot(gf, w)
    coef = fz(gf / jnp.where(jnp.abs(denom) > tiny, denom, 1.0))
    u = asolve(dv)
    return u - jnp.dot(coef, u) * w


@_proj_exp_primal.defjvp
def _proj_exp_primal_jvp(primals, tangents):
    """Closed-form implicit derivative of the exp-cone projection.

    Differentiating THROUGH the 60-step Newton scan (jacfwd of the solver)
    is both numerically fragile near the polar region and the measured
    throughput sink of every exp-cone differentiation path on TPU (the
    scan's jacfwd dominated the conic VJP at ~100x the solve cost). Instead
    differentiate the projection's KKT system at the solution (Hien 2015,
    Thm 4.2 — same construction as the power cone's JVP below):

        p - v + mu * grad g(p) = 0,   g(p) = p1 e^{p0/p1} - p2 = 0,
        [[I + mu H, grad g], [grad g', 0]] [dp; dmu] = [dv; 0]

    solved in closed form via the Schur complement on the 3x3 symmetric
    block (elementwise Cramer — vectorizes under batch vmaps where XLA's
    batched LU does not)."""
    (v0,) = primals
    (dv,) = tangents
    p = _proj_exp_primal(v0)
    dt = v0.dtype
    r, s, t = v0[0], v0[1], v0[2]
    in_cone = jnp.logical_or(
        jnp.logical_and(s > 0, s * jnp.exp(r / jnp.where(s > 0, s, 1.0)) <= t),
        jnp.logical_and(jnp.logical_and(r <= 0, jnp.abs(s) <= 1e-300), t >= 0),
    )
    u, w = -r, -t
    in_polar = jnp.logical_or(
        jnp.logical_and(
            u > 0, u * jnp.exp(-s / jnp.where(u > 0, u, 1.0)) <= jnp.exp(1.0) * w
        ),
        jnp.logical_and(jnp.logical_and(u <= 0, -s <= 0), w >= 0),
    )
    special = jnp.logical_and(r <= 0, s <= 0)

    # general branch: boundary point (x, y, z) with z = y e^{x/y}, mu = z - t.
    # The Hessian of g(p) = y e^{x/y} - z is RANK-1: H = (e^{x/y}/y) k k' with
    # k = (1, -x/y, 0), so A = I + mu H inverts in closed form by
    # Sherman-Morrison. Everything is computed in a scale-invariant form —
    # unit-norm khat ~ (y, -x), coefficient sigma = q/(1+q) in [0, 1] via its
    # RECIPROCAL 1/q = (y/hyp)^2 * y^2/(mu z) (products of bounded factors
    # whose underflow hits the correct limit sigma -> 1), and a unit-norm
    # gradient ghat ~ (y, y - x, -y^2/z) — because the raw terms e^{x/y}/y,
    # x/y^2, x^2/y^3 overflow f32 at near-degenerate boundary points with
    # tiny y (measured: a converged exp-cone program whose VJP seed came
    # back all-NaN in f32 while f64 survived).
    x = p[0]
    y = jnp.maximum(p[1], jnp.asarray(1e-30, dt))
    z = jnp.maximum(p[2], jnp.asarray(1e-30, dt))
    mu = jnp.maximum(p[2] - t, 0.0)
    # the floored hyp is used EVERYWHERE (x*x + y*y can underflow to 0 for
    # corner projections p ~ 0; a raw y/hyp = inf then turns sigma into
    # inf * 0 = NaN — and a NaN primal coefficient poisons the VJP transpose
    # even when an outer where() selects another branch)
    hyp = jnp.maximum(jnp.sqrt(x * x + y * y), jnp.asarray(1e-30, dt))
    khat = jnp.stack([y, -x]) / hyp
    # the floor must be a NORMAL number: 1e-38 is subnormal in f32 and the
    # TPU/XLA flush-to-zero mode rounds it to 0, so max(0, floor) = 0 and
    # invq = 0/0 = NaN — which poisons the VJP transpose of this rule even
    # when an outer where() selects another branch (measured: an exp-dual
    # projection at a special-region point returned all-NaN f32 cotangents)
    invq = (y / hyp) ** 2 * (y * y) / jnp.maximum(
        mu * z, jnp.asarray(jnp.finfo(dt).tiny, dt)
    )
    sigma = 1.0 / (1.0 + invq)

    def ainv(b):
        b01 = b[:2] - sigma * jnp.dot(khat, b[:2]) * khat
        return jnp.concatenate([b01, b[2:]])

    # g = e^{x/y} * (1, 1 - x/y, -y/z); scale-invariant in the KKT Schur
    # complement, so use the bounded multiple (y, y - x, -y^2/z) normalized
    gbar = jnp.stack([y, y - x, -(y * y) / z])
    ghat = gbar / jnp.linalg.norm(gbar)
    # all coefficient sanitization is on PRIMAL-only quantities — the rule
    # must stay linear in dv so jax can transpose it into the VJP
    fz = lambda a: jnp.where(jnp.isfinite(a), a, jnp.zeros((), dt))
    ghat = fz(ghat)
    w_s = fz(ainv(ghat))  # = A^-1 ghat, primal-only
    denom = jnp.dot(ghat, w_s)  # = ghat' A^-1 ghat > 0 (A is PD)
    coefv = fz(ghat / jnp.maximum(denom, jnp.asarray(1e-30, dt)))
    u_s = ainv(dv)
    dp_gen = u_s - jnp.dot(coefv, u_s) * w_s

    # heuristic region r<=0, s<=0: p = (r, 0, max(t, 0))
    dp_special = jnp.stack([
        dv[0], jnp.zeros((), dt), jnp.where(t > 0, dv[2], jnp.zeros((), dt))
    ])
    # polar-interior points the region tests miss (the value Newton still
    # converges to the corner p ~ 0, where the projection is locally the
    # zero map — the boundary-KKT formula does not apply there)
    at_zero = jnp.sum(jnp.abs(p)) <= 1e-12 * (1.0 + jnp.sum(jnp.abs(v0)))
    dp = jnp.where(
        in_cone, dv,
        jnp.where(jnp.logical_or(in_polar, at_zero), jnp.zeros(3, dt),
                  jnp.where(special, dp_special, dp_gen)),
    )
    return p, dp


def _exp_root_bracket(r, s, t):
    """Initial bracket [lo, hi] for the exp-cone Newton in rho (Friberg
    Alg. 5.1). A conservative static bracket suffices: h is monotone
    increasing in the relevant region, so [-30, 30] plus 60
    bisection-guarded Newton steps converges to ~1e-15."""
    del s, t
    return jnp.full_like(r, -30.0), jnp.full_like(r, 30.0)


def _pi_exp_dual(v: Array) -> Array:
    """Projection onto K_exp^* via Moreau: v = Pi_{K}(v)... specifically
    Pi_{K*}(v) = v + Pi_K(-v)."""
    return v + _proj_exp_primal(-v)


def _dpi_exp_dual_dense(v: Array) -> Array:
    return jax.jacfwd(_pi_exp_dual)(v)


# --- rotated second-order cone ----------------------------------------------
# K_rsoc = cl{(t,u,x): 2tu >= ||x||^2, t,u >= 0}. The symmetric orthogonal map
# T = [[1/sqrt2, 1/sqrt2, 0], [1/sqrt2, -1/sqrt2, 0], [0, 0, I]] carries K_rsoc
# onto K_soc, so the cone is self-dual and Pi_rsoc = T Pi_soc T (with T' = T).


def _rsoc_rotation(d: int, dtype) -> Array:
    import numpy as np

    T = np.eye(d)
    isq = 1.0 / np.sqrt(2.0)
    T[0, 0] = isq
    T[0, 1] = isq
    T[1, 0] = isq
    T[1, 1] = -isq
    return jnp.asarray(T, dtype)


def _pi_rsoc(v: Array) -> Array:
    T = _rsoc_rotation(v.shape[-1], v.dtype)
    return _pi_soc(v @ T) @ T  # T symmetric: v @ T == T @ v for vectors


def _dpi_rsoc_dense(v: Array) -> Array:
    T = _rsoc_rotation(v.shape[-1], v.dtype)
    return T @ _dpi_soc_dense(T @ v) @ T


# --- power cone --------------------------------------------------------------
# K_pow(a) = cl{(x,y,z): x^a y^(1-a) >= |z|, x,y >= 0}; its dual is
# K_pow(a)* = cl{(u,v,w): (u/a)^a (v/(1-a))^(1-a) >= |w|, u,v >= 0}.
# Projection onto K* via Moreau: Pi_{K*}(v) = v + Pi_K(-v).
# Pi_K follows Hien (2015) "Differential properties of Euclidean projection
# onto power cone" Thm 3.1 (the SCS proj_power parametrization): for a point
# in neither K nor the polar -K*, the projection is
#   (x(r), y(r), sign(z0) r)  with  r in (0, |z0|)  the root of
#   F(r) = x(r)^a y(r)^(1-a) - r,
#   x(r) = (x0 + sqrt(x0^2 + 4 a r (|z0|-r))) / 2,
#   y(r) = (y0 + sqrt(y0^2 + 4 (1-a) r (|z0|-r))) / 2.
# Safeguarded Newton (bisection bracket) in r. Differentiation does NOT go
# through the iteration (reverse mode through 60 scan steps is numerically
# fragile when r underflows near the polar region): the JVP is the
# closed-form implicit derivative of the projection KKT system
#   p - v0 + mu * grad(g)(p) = 0,  g(p) = |z| - x^a y^(1-a) = 0
# i.e. solve [[I + mu H, grad g], [grad g', 0]] [dp; dmu] = [dv; 0]
# (Hien 2015, Thm 4.2 — the derivative is the top-left block, symmetric).


def _pow_val(x: Array, y: Array, a: float) -> Array:
    """x^a * y^(1-a) for x,y >= 0 (only used inside boolean membership
    tests, where NaN gradients cannot leak)."""
    return jnp.maximum(x, 0.0) ** a * jnp.maximum(y, 0.0) ** (1 - a)


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def _proj_pow_primal(v0: Array, a: float) -> Array:
    """Projection of a 3-vector onto the primal power cone K_pow(a)."""
    x0, y0, z0 = v0[0], v0[1], v0[2]
    dt = v0.dtype
    zh = jnp.abs(z0)

    in_cone = (x0 >= 0) & (y0 >= 0) & (_pow_val(x0, y0, a) >= zh)
    in_polar = (
        (x0 <= 0)
        & (y0 <= 0)
        & (_pow_val(-x0 / a, -y0 / (1 - a), a) >= zh)
    )

    def general():
        zs = jnp.maximum(zh, jnp.asarray(1e-12, dt))

        def xr(r):
            return 0.5 * (x0 + jnp.sqrt(x0 * x0 + 4 * a * r * (zs - r)))

        def yr(r):
            return 0.5 * (y0 + jnp.sqrt(y0 * y0 + 4 * (1 - a) * r * (zs - r)))

        def F(r):
            lx = jnp.log(jnp.maximum(xr(r), 1e-300))
            ly = jnp.log(jnp.maximum(yr(r), 1e-300))
            return jnp.exp(a * lx + (1 - a) * ly) - r

        dF = jax.grad(F)

        # invariant F(lo) >= 0 >= F(hi) (F(0+) >= 0 always; if F never goes
        # negative on (0, zs] — the zh ~ 0 degenerate case — hi stays at zs
        # and the iteration converges to r = zs ~ 0, the correct limit)
        def body(carry, _):
            lo, hi, r = carry
            f = F(r)
            lo = jnp.where(f >= 0, r, lo)
            hi = jnp.where(f >= 0, hi, r)
            df = dF(r)
            newton = r - f / jnp.where(jnp.abs(df) > 1e-30, df, 1.0)
            ok = (newton > lo) & (newton < hi)
            r_next = jnp.where(ok, newton, 0.5 * (lo + hi))
            return (lo, hi, r_next), None

        lo0 = jnp.zeros((), dt)
        (lo, hi, r), _ = jax.lax.scan(
            body, (lo0, zs, 0.5 * zs), None, length=60
        )
        return jnp.stack([xr(r), yr(r), jnp.sign(z0) * r]).astype(dt)

    zero = jnp.zeros(3, dt)
    gen = general()
    return jnp.where(in_cone, v0, jnp.where(in_polar, zero, gen))


@_proj_pow_primal.defjvp
def _proj_pow_primal_jvp(a, primals, tangents):
    (v0,) = primals
    (dv,) = tangents
    p = _proj_pow_primal(v0, a)
    dt = v0.dtype
    x0, y0, z0 = v0[0], v0[1], v0[2]
    zh = jnp.abs(z0)
    in_cone = (x0 >= 0) & (y0 >= 0) & (_pow_val(x0, y0, a) >= zh)
    in_polar = (
        (x0 <= 0) & (y0 <= 0) & (_pow_val(-x0 / a, -y0 / (1 - a), a) >= zh)
    )

    x, y = jnp.maximum(p[0], 1e-30), jnp.maximum(p[1], 1e-30)
    r = jnp.abs(p[2])
    mu = jnp.maximum(zh - r, 0.0)
    sig = jnp.where(z0 >= 0, 1.0, -1.0).astype(dt)
    # phi = x^a y^(1-a) on the boundary (= r); gradient/Hessian in log form
    phi = jnp.exp(a * jnp.log(x) + (1 - a) * jnp.log(y))
    gx = -a * phi / x
    gy = -(1 - a) * phi / y
    g = jnp.stack([gx, gy, sig])
    # H = -hess(phi); z row/col are zero -> same closed-form KKT solve as
    # the exp cone (no batched 4x4 LU under vmap)
    hxx = -a * (a - 1) * phi / (x * x)
    hxy = -a * (1 - a) * phi / (x * y)
    hyy = -(1 - a) * (-a) * phi / (y * y)
    dp_gen = _proj_kkt_dp(
        1.0 + mu * hxx, mu * hxy, 1.0 + mu * hyy, g, dv
    )
    dp = jnp.where(in_cone, dv, jnp.where(in_polar, jnp.zeros(3, dt), dp_gen))
    return p, dp


def _pi_pow_dual(v: Array, a: float) -> Array:
    """Projection onto K_pow(a)^* via Moreau: Pi_{K*}(v) = v + Pi_K(-v)."""
    return v + _proj_pow_primal(-v, a)


# ---------------------------------------------------------------------------
# Public API over a full ConeSpec
# ---------------------------------------------------------------------------


def pi(cones: ConeSpec, v: Array) -> Array:
    """Project ``v`` onto the product of dual cones (reference ``DiffOpt.pi``,
    ``src/diff_opt.jl:491-499``)."""
    outs = []
    for kind, off, d, prm in cones.offsets_params():
        blk = v[..., off : off + d]
        if kind == "zero":
            outs.append(blk)
        elif kind == "nonneg":
            outs.append(jnp.clip(blk, min=0.0))
        elif kind == "nonpos":
            outs.append(jnp.clip(blk, max=0.0))
        elif kind == "soc":
            outs.append(_pi_soc(blk))
        elif kind == "rsoc":
            outs.append(_pi_rsoc(blk))
        elif kind == "psd":
            outs.append(_pi_psd_tri(blk))
        elif kind == "exp":
            outs.append(_pi_exp_dual(blk))
        elif kind == "dual_exp":
            # dual of the dual-exp set is the primal exp cone
            outs.append(_proj_exp_primal(blk))
        elif kind == "pow":
            outs.append(_pi_pow_dual(blk, prm))
        elif kind == "dual_pow":
            # dual of the dual-pow set is the primal power cone
            outs.append(_proj_pow_primal(blk, prm))
        else:  # pragma: no cover
            raise NotImplementedError(kind)
    return jnp.concatenate(outs, axis=-1) if outs else v[..., :0]


def dpi_apply(cones: ConeSpec, v: Array, dv: Array) -> Array:
    """Apply the block-diagonal derivative: ``DPi(v) @ dv`` without
    materializing the matrix (the TPU-native form of the reference's
    ``BlockDiagonal`` D-pi, ``src/diff_opt.jl:509-519``)."""
    outs = []
    for kind, off, d, prm in cones.offsets_params():
        blk = v[..., off : off + d]
        dblk = dv[..., off : off + d]
        if kind == "zero":
            outs.append(dblk)
        elif kind == "nonneg":
            outs.append(jnp.where(blk >= 0, dblk, 0.0))
        elif kind == "nonpos":
            outs.append(jnp.where(blk <= 0, dblk, 0.0))
        elif kind == "soc":
            outs.append(_dpi_soc_dense(blk) @ dblk)
        elif kind == "rsoc":
            outs.append(_dpi_rsoc_dense(blk) @ dblk)
        elif kind == "psd":
            outs.append(_dpi_psd_tri_apply(blk, dblk))
        elif kind in ("exp", "dual_exp"):
            fn = _pi_exp_dual if kind == "exp" else _proj_exp_primal
            _, out = jax.jvp(fn, (blk,), (dblk,))
            outs.append(out)
        elif kind in ("pow", "dual_pow"):
            fn = _pi_pow_dual if kind == "pow" else _proj_pow_primal
            _, out = jax.jvp(lambda b: fn(b, prm), (blk,), (dblk,))
            outs.append(out)
        else:  # pragma: no cover
            raise NotImplementedError(kind)
    return jnp.concatenate(outs, axis=-1) if outs else dv[..., :0]


def dpi_rmatvec(cones: ConeSpec, v: Array, dv: Array) -> Array:
    """Apply ``DPi(v)' @ dv``. All supported DPi blocks are symmetric except
    the exp-cone ones, which are handled via VJP."""
    outs = []
    for kind, off, d, prm in cones.offsets_params():
        blk = v[..., off : off + d]
        dblk = dv[..., off : off + d]
        if kind in ("exp", "dual_exp"):
            fn = _pi_exp_dual if kind == "exp" else _proj_exp_primal
            _, vjp = jax.vjp(fn, blk)
            outs.append(vjp(dblk)[0])
        elif kind in ("pow", "dual_pow"):
            fn = _pi_pow_dual if kind == "pow" else _proj_pow_primal
            _, vjp = jax.vjp(lambda b: fn(b, prm), blk)
            outs.append(vjp(dblk)[0])
        else:
            full = dpi_apply(
                ConeSpec([(kind, d, prm) if prm is not None else (kind, d)]),
                blk,
                dblk,
            )
            outs.append(full)
    return jnp.concatenate(outs, axis=-1) if outs else dv[..., :0]


def dpi_operator(cones: ConeSpec, v: Array):
    """Prepared ``(apply, rapply)`` closures for ``DPi(v)`` / ``DPi(v)'``.

    Per-block factorizations — the PSD eigendecomposition, SOC/RSOC dense
    blocks, exp/pow projection linearizations — are computed ONCE here and
    closed over, instead of being recomputed inside every call the way
    :func:`dpi_apply` does. This is the shape iterative solvers need: the
    matrix-free LSQR path (``ops/lsqr``, the reference's *only* conic solve,
    ``ConicProgram.jl:323,372``) applies DPi hundreds of times per solve at
    a fixed ``v``. Unbatched (``v`` is ``(m,)``); ``vmap`` the caller.
    """
    makers = []  # (offset, dim, apply_fn, rapply_fn)
    for kind, off, d, prm in cones.offsets_params():
        blk = v[off : off + d]
        if kind == "zero":
            f = r = lambda db: db
        elif kind == "nonneg":
            mask = blk >= 0
            f = r = (lambda mask: lambda db: jnp.where(mask, db, 0.0))(mask)
        elif kind == "nonpos":
            mask = blk <= 0
            f = r = (lambda mask: lambda db: jnp.where(mask, db, 0.0))(mask)
        elif kind in ("soc", "rsoc"):
            D = _dpi_soc_dense(blk) if kind == "soc" else _dpi_rsoc_dense(blk)
            f = r = (lambda D: lambda db: D @ db)(D)  # symmetric
        elif kind == "psd":
            from .ops.smalleig import eigh_small

            w, U = eigh_small(svec_to_sym(blk))
            K = _psd_kmat(w, v.dtype)
            Ut = jnp.swapaxes(U, -1, -2)

            def _mk_psd(U, Ut, K):
                def apply(db):
                    inner = Ut @ svec_to_sym(db) @ U
                    return sym_to_svec(U @ (K * inner) @ Ut)

                return apply

            f = r = _mk_psd(U, Ut, K)  # symmetric
        elif kind in ("exp", "dual_exp", "pow", "dual_pow"):
            if kind == "exp":
                fn = _pi_exp_dual
            elif kind == "dual_exp":
                fn = _proj_exp_primal
            elif kind == "pow":
                fn = (lambda prm: lambda b: _pi_pow_dual(b, prm))(prm)
            else:
                fn = (lambda prm: lambda b: _proj_pow_primal(b, prm))(prm)
            _, f = jax.linearize(fn, blk)
            _, vjp = jax.vjp(fn, blk)
            r = (lambda vjp: lambda db: vjp(db)[0])(vjp)
        else:  # pragma: no cover
            raise NotImplementedError(kind)
        makers.append((off, d, f, r))

    def apply(dv):
        outs = [f(dv[off : off + d]) for off, d, f, _ in makers]
        return jnp.concatenate(outs) if outs else dv[:0]

    def rapply(dv):
        outs = [r(dv[off : off + d]) for off, d, _, r in makers]
        return jnp.concatenate(outs) if outs else dv[:0]

    return apply, rapply


def dpi_dense(cones: ConeSpec, v: Array) -> Array:
    """Materialized block-diagonal ``DPi(v)`` (for direct/dense solves)."""
    m = cones.total_dim
    out = jnp.zeros(v.shape[:-1] + (m, m), v.dtype)
    for kind, off, d, prm in cones.offsets_params():
        blk = v[..., off : off + d]
        if kind == "zero":
            B = jnp.broadcast_to(jnp.eye(d, dtype=v.dtype), v.shape[:-1] + (d, d))
        elif kind == "nonneg":
            B = jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(
                (blk >= 0).astype(v.dtype)
            )
        elif kind == "nonpos":
            B = jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(
                (blk <= 0).astype(v.dtype)
            )
        elif kind == "soc":
            B = _dpi_soc_dense(blk) if blk.ndim == 1 else jax.vmap(_dpi_soc_dense)(blk)
        elif kind == "rsoc":
            B = (
                _dpi_rsoc_dense(blk)
                if blk.ndim == 1
                else jax.vmap(_dpi_rsoc_dense)(blk)
            )
        elif kind == "psd":
            B = (
                _dpi_psd_tri_dense(blk)
                if blk.ndim == 1
                else jax.vmap(_dpi_psd_tri_dense)(blk)
            )
        elif kind in ("exp", "dual_exp"):
            fn = _dpi_exp_dual_dense if kind == "exp" else jax.jacfwd(_proj_exp_primal)
            B = fn(blk) if blk.ndim == 1 else jax.vmap(fn)(blk)
        elif kind in ("pow", "dual_pow"):
            base = _pi_pow_dual if kind == "pow" else _proj_pow_primal
            fn = jax.jacfwd(lambda b: base(b, prm))
            B = fn(blk) if blk.ndim == 1 else jax.vmap(fn)(blk)
        else:  # pragma: no cover
            raise NotImplementedError(kind)
        out = out.at[..., off : off + d, off : off + d].set(B)
    return out


def contains_dual(cones: ConeSpec, v: Array, tol: float = 1e-8) -> Array:
    """Boolean check that v lies (approximately) in the product of dual cones."""
    return jnp.linalg.norm(pi(cones, v) - v, axis=-1) <= tol


def moi_tri_seed_to_svec(v: Array) -> Array:
    """Convert a *perturbation seed* expressed on MOI unscaled-triangle rows
    into svec coordinates under MOI's symmetric-half convention: a triangle
    value on an off-diagonal row denotes a symmetric matrix perturbation with
    HALF that value in each of the two mirrored entries (cf. the reference's
    ``quad_sym_half`` halving, ``jump_moi_overloads.jl:162-209``; its PSD
    tests' -0.5 sensitivity only reproduces under this convention). Net
    off-diagonal factor: (1/2) * sqrt(2) = 1/sqrt(2)."""
    d = _tri_side(v.shape[-1])
    scale = _svec_scale(d, v.dtype)
    return v * jnp.where(scale > 1.0, 0.5 * scale, scale)
