"""QP KKT implicit-differentiation core (OptNet / Amos-Kolter 2017).

Reimplements, TPU-first, the math of the reference QP backend
(``/root/reference/src/QuadraticProgram/QuadraticProgram.jl``):

* ``kkt_jacobian``  — the matrix ``J = LHS'`` of AK17 eq. (6); the reference
  builds ``LHS = J'`` at ``QuadraticProgram.jl:256-282`` (``create_LHS_matrix``)
* ``qp_forward``    — JVP: solves ``J d = -rhs(dData)``
  (= reference ``forward_differentiate!``, ``QuadraticProgram.jl:357-446``,
  which solves ``LHS' x = RHS``)
* ``qp_reverse``    — VJP: solves ``J' g = -seed`` and contracts to data
  cotangents (= reference ``reverse_differentiate!`` + lazy getters,
  ``QuadraticProgram.jl:316-351,448-473``)

Everything is dense, batched (leading dims broadcast via ``vmap`` by callers),
and static-shaped: empty constraint blocks are size-0 arrays that XLA folds
away.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ir import QPSolution, QPTangent, QuadProgram
from . import linalg
from ..utils.precision import full_precision

Array = jax.Array


class KKTSplit(NamedTuple):
    dz: Array
    dlam: Array
    dnu: Array


@full_precision
def kkt_jacobian(qp: QuadProgram, sol: QPSolution) -> Array:
    """Jacobian of the KKT residual wrt (z, lam, nu) at the solution::

        J = [ Q         G'        A' ]
            [ diag(lam)G diag(Gz-h) 0 ]
            [ A          0         0 ]

    This equals the transpose of the reference's ``create_LHS_matrix``
    (``QuadraticProgram.jl:256-282``).
    """
    n, m, p = qp.num_vars, qp.num_ineq, qp.num_eq
    slack = _mv(qp.G, sol.z) - qp.h  # (..., m)
    row0 = jnp.concatenate(
        [qp.Q, jnp.swapaxes(qp.G, -1, -2), jnp.swapaxes(qp.A, -1, -2)], axis=-1
    )
    row1 = jnp.concatenate(
        [
            sol.lam[..., None] * qp.G,
            _bdiag(slack),
            jnp.zeros(slack.shape[:-1] + (m, p), qp.Q.dtype),
        ],
        axis=-1,
    )
    row2 = jnp.concatenate(
        [
            qp.A,
            jnp.zeros(qp.b.shape[:-1] + (p, m), qp.Q.dtype),
            jnp.zeros(qp.b.shape[:-1] + (p, p), qp.Q.dtype),
        ],
        axis=-1,
    )
    return jnp.concatenate([row0, row1, row2], axis=-2)


def _bdiag(v: Array) -> Array:
    """Batched diag for a (..., m) vector (m may be 0)."""
    m = v.shape[-1]
    out = jnp.zeros(v.shape[:-1] + (m, m), v.dtype)
    idx = jnp.arange(m)
    return out.at[..., idx, idx].set(v)


def _split(x: Array, n: int, m: int) -> KKTSplit:
    return KKTSplit(x[..., :n], x[..., n : n + m], x[..., n + m :])


@full_precision
def qp_forward(
    qp: QuadProgram,
    sol: QPSolution,
    dqp: QPTangent,
    *,
    method: str = "lu",
    refine_iters: int = 0,
) -> KKTSplit:
    """Forward (JVP) sensitivity: directional derivative of (z, lam, nu) along
    the data perturbation ``dqp``.

    Solves ``J [dz; dlam; dnu] = -[rhs1; rhs2; rhs3]`` with the RHS of
    ``QuadraticProgram.jl:429-433``::

        rhs1 = dQ z + dq + dG' lam + dA' nu
        rhs2 = lam .* (dG z - dh)
        rhs3 = dA z - db
    """
    z, lam, nu = sol.z, sol.lam, sol.nu
    rhs1 = (
        _mv(dqp.dQ, z)
        + dqp.dq
        + _rmv(dqp.dG, lam)
        + _rmv(dqp.dA, nu)
    )
    rhs2 = lam * (_mv(dqp.dG, z) - dqp.dh)
    rhs3 = _mv(dqp.dA, z) - dqp.db
    rhs = jnp.concatenate([rhs1, rhs2, rhs3], axis=-1)
    if method == "ldl" and qp.num_vars + qp.num_ineq + qp.num_eq > 128:
        method = "lu"  # LDL kernel is single-tile; large systems take the LU path
    if method == "ldl":
        d = -qp_kkt_solve_ldl(
            qp, sol, rhs, transpose=False, refine_iters=max(refine_iters, 2)
        )
    elif method == "auto":
        # Q was a tracer at dispatch time (inside jit/vmap): decide at runtime
        d = -_auto_solve(qp, kkt_jacobian(qp, sol), rhs, refine_iters)
    else:
        J = kkt_jacobian(qp, sol)
        d = -linalg.solve(J, rhs, method, refine_iters=refine_iters)
    return _split(d, qp.num_vars, qp.num_ineq)


def _auto_solve(qp: QuadProgram, J: Array, rhs: Array, refine_iters: int) -> Array:
    """Runtime LP-vs-QP dispatch (reference ``iterative = norm(Q) ~= 0``,
    ``QuadraticProgram.jl:333-335``): ``lax.cond`` on ``||Q||`` routes an
    all-zero Q (singular KKT matrix) to the least-squares solve and everything
    else to LU. Under ``vmap`` the cond batches to a select — both branches
    run, but ``jnp.where`` never propagates NaNs from the unselected LU of a
    singular system."""
    is_lp = jnp.linalg.norm(qp.Q) == 0.0
    return jax.lax.cond(
        is_lp,
        lambda: linalg.solve(J, rhs, "lstsq", refine_iters=refine_iters),
        lambda: linalg.solve(J, rhs, "lu", refine_iters=refine_iters),
    )


@full_precision
def qp_reverse_system(
    qp: QuadProgram,
    sol: QPSolution,
    seed: KKTSplit,
    *,
    method: str = "lu",
    refine_iters: int = 0,
) -> KKTSplit:
    """Solve the adjoint system ``J' g = -[dl/dz; dl/dlam; dl/dnu]``.

    The reference solves ``LHS x = [dl_dz; 0; 0]`` (``QuadraticProgram.jl:
    316-341``) — identical with ``LHS = J'`` — and only supports primal seeds;
    here dual seeds are first-class.
    """
    rhs = jnp.concatenate([seed.dz, seed.dlam, seed.dnu], axis=-1)
    if method == "ldl" and qp.num_vars + qp.num_ineq + qp.num_eq > 128:
        method = "lu"
    if method == "ldl":
        g = -qp_kkt_solve_ldl(
            qp, sol, rhs, transpose=True, refine_iters=max(refine_iters, 2)
        )
    elif method == "auto":
        Jt = jnp.swapaxes(kkt_jacobian(qp, sol), -1, -2)
        g = -_auto_solve(qp, Jt, rhs, refine_iters)
    else:
        Jt = jnp.swapaxes(kkt_jacobian(qp, sol), -1, -2)
        g = -linalg.solve(Jt, rhs, method, refine_iters=refine_iters)
    return _split(g, qp.num_vars, qp.num_ineq)


@full_precision
def qp_reverse_accumulate(
    qp: QuadProgram, sol: QPSolution, g: KKTSplit
) -> QPTangent:
    """Contract the adjoint solution into data cotangents (the reference's
    lazy getters, materialized):

        dQ = (gz z' + z gz') / 2         QuadraticProgram.jl:448-458
        dq = gz
        dG = (lam.*glam) z' + lam gz'    QuadraticProgram.jl:467-473
        dh = -lam .* glam                QuadraticProgram.jl:307-311
        dA = gnu z' + nu gz'             QuadraticProgram.jl:461-466
        db = -gnu                        QuadraticProgram.jl:312-314
    """
    z, lam, nu = sol.z, sol.lam, sol.nu
    gz, glam, gnu = g.dz, g.dlam, g.dnu
    outer = lambda a, b: a[..., :, None] * b[..., None, :]
    dQ = 0.5 * (outer(gz, z) + outer(z, gz))
    dq = gz
    dG = outer(lam * glam, z) + outer(lam, gz)
    dh = -lam * glam
    dA = outer(gnu, z) + outer(nu, gz)
    db = -gnu
    return QPTangent(dQ=dQ, dq=dq, dA=dA, db=db, dG=dG, dh=dh)


@full_precision
def qp_reverse(
    qp: QuadProgram,
    sol: QPSolution,
    dz_seed: Array,
    dlam_seed: Array | None = None,
    dnu_seed: Array | None = None,
    *,
    method: str = "lu",
    refine_iters: int = 0,
) -> Tuple[QPTangent, KKTSplit]:
    """Reverse (VJP) sensitivity: cotangents of the data given cotangents of
    the solution. Returns ``(data_cotangents, adjoint_solution)``."""
    seed = KKTSplit(
        dz_seed,
        jnp.zeros_like(sol.lam) if dlam_seed is None else dlam_seed,
        jnp.zeros_like(sol.nu) if dnu_seed is None else dnu_seed,
    )
    g = qp_reverse_system(
        qp, sol, seed, method=method, refine_iters=refine_iters
    )
    return qp_reverse_accumulate(qp, sol, g), g


def _mv(M: Array, v: Array) -> Array:
    """Batched matrix-vector product (handles 0-sized dims)."""
    return jnp.einsum("...ij,...j->...i", M, v)


def _rmv(M: Array, v: Array) -> Array:
    """Batched M' v."""
    return jnp.einsum("...ij,...i->...j", M, v)


@full_precision
def kkt_residual(qp: QuadProgram, sol: QPSolution) -> Array:
    """Stationarity + complementarity + primal-feasibility residual, the
    implicit function whose Jacobian is :func:`kkt_jacobian`."""
    z, lam, nu = sol.z, sol.lam, sol.nu
    r1 = _mv(qp.Q, z) + qp.q + _rmv(qp.G, lam) + _rmv(qp.A, nu)
    r2 = lam * (_mv(qp.G, z) - qp.h)
    r3 = _mv(qp.A, z) - qp.b
    return jnp.concatenate([r1, r2, r3], axis=-1)


# ---------------------------------------------------------------------------
# Symmetrized (quasi-definite) KKT path — the Pallas-accelerated solve.
#
# J = R K with R = diag(I, diag(lam_e), I) and
#     K = [ Q + rp I    G'              A'   ]
#         [ G           diag(s/lam_e)-rn I  0 ]
#         [ A           0              -rn I ]
# where s = Gz - h <= 0 and lam_e = max(lam, floor). K is symmetric
# quasi-definite, so an unpivoted batched LDL' factorization (Pallas,
# batch-along-lanes) is stable (Vanderbei 1995), and ONE factorization serves
# both the forward (J d = rhs) and adjoint (J' g = seed) solves:
#     forward:  d = K^-1 (R^-1 rhs)     (rhs given with row2 pre-divided)
#     adjoint:  w = K^-1 seed,  g = R^-1 w.
# Regularization and the lam floor are removed by iterative refinement
# against the true (unsymmetrized) J.
# ---------------------------------------------------------------------------


def _kkt_symmetric(qp: QuadProgram, sol: QPSolution, lam_floor, reg):
    n, m, p = qp.num_vars, qp.num_ineq, qp.num_eq
    dt = qp.Q.dtype
    slack = qp.G @ sol.z - qp.h
    lam_e = jnp.maximum(sol.lam, lam_floor)
    row0 = jnp.concatenate(
        [
            qp.Q + reg * jnp.eye(n, dtype=dt),
            jnp.swapaxes(qp.G, -1, -2),
            jnp.swapaxes(qp.A, -1, -2),
        ],
        axis=-1,
    )
    row1 = jnp.concatenate(
        [
            qp.G,
            _bdiag(slack / lam_e - reg),
            jnp.zeros(slack.shape[:-1] + (m, p), dt),
        ],
        axis=-1,
    )
    row2 = jnp.concatenate(
        [
            qp.A,
            jnp.zeros(qp.b.shape[:-1] + (p, m), dt),
            -reg * jnp.eye(p, dtype=dt),
        ],
        axis=-1,
    )
    return jnp.concatenate([row0, row1, row2], axis=-2), lam_e


def _jmatvec(qp: QuadProgram, sol: QPSolution, x: Array, transpose: bool) -> Array:
    """Apply the true J (or J') without materializing it."""
    n, m = qp.num_vars, qp.num_ineq
    slack = qp.G @ sol.z - qp.h
    xz, xl, xn = x[..., :n], x[..., n : n + m], x[..., n + m :]
    if not transpose:
        r0 = _mv(qp.Q, xz) + _rmv(qp.G, xl) + _rmv(qp.A, xn)
        r1 = sol.lam * _mv(qp.G, xz) + slack * xl
        r2 = _mv(qp.A, xz)
    else:
        r0 = _mv(qp.Q, xz) + _rmv(qp.G, sol.lam * xl) + _rmv(qp.A, xn)
        r1 = _mv(qp.G, xz) + slack * xl
        r2 = _mv(qp.A, xz)
    return jnp.concatenate([r0, r1, r2], axis=-1)


@full_precision
def qp_kkt_solve_ldl(
    qp: QuadProgram,
    sol: QPSolution,
    rhs: Array,
    *,
    transpose: bool,
    refine_iters: int = 2,
    lam_floor: float | None = None,
    reg: float | None = None,
) -> Array:
    """Solve J x = rhs (or J' x = rhs) via the Pallas LDL' path.

    ``rhs`` is the true right-hand side (NOT pre-scaled). Refinement steps
    use true-J matvecs to remove the regularization and lam-floor bias.
    """
    dt = qp.Q.dtype
    if lam_floor is None:
        lam_floor = 1e-12 if dt == jnp.float64 else 1e-6
    if reg is None:
        reg = 1e-11 if dt == jnp.float64 else 1e-6
    n, m = qp.num_vars, qp.num_ineq

    from .pallas.dispatch import ldl_factor, ldl_solve

    K, lam_e = _kkt_symmetric(qp, sol, lam_floor, reg)
    L, d = ldl_factor(K)

    def approx_solve(r):
        if not transpose:
            r_scaled = jnp.concatenate(
                [r[..., :n], r[..., n : n + m] / lam_e, r[..., n + m :]], axis=-1
            )
            return ldl_solve(L, d, r_scaled)
        w = ldl_solve(L, d, r)
        return jnp.concatenate(
            [w[..., :n], w[..., n : n + m] / lam_e, w[..., n + m :]], axis=-1
        )

    x = approx_solve(rhs)
    for _ in range(refine_iters):
        r = rhs - _jmatvec(qp, sol, x, transpose)
        x = x + approx_solve(r)
    return x


# ---------------------------------------------------------------------------
# Active-set polish.
#
# An f32 interior-point solve terminates with complementarity products
# s_i lam_i ~ sqrt(eps_f32) ~ 5e-6 — that floor propagates into the KKT
# point and dominates gradient error on near-degenerate instances (measured:
# VJP linear algebra ~5e-8 vs point placement up to ~1e-2). Fixing the
# active set and re-solving the purely LINEAR KKT equations
#     Q z + G_a' lam_a + A' nu = -q,   G_a z = h_a,   A z = b,   lam_i = 0
# (a in the active set, i inactive) has no complementarity products, so one
# quasi-definite LDL' solve + refinement recovers ~f32-linear accuracy.
# The polish is guarded: it is accepted per instance only when it reduces
# the true KKT residual and keeps lam >= 0 and s >= -tol (a misclassified
# weakly-active set fails the guard and the original point is kept).
# ---------------------------------------------------------------------------


@full_precision
def qp_polish(qp: QuadProgram, sol: QPSolution, *, reg: float | None = None) -> QPSolution:
    """One active-set polish step on a solved instance (vmap for batches)."""
    n, m, p = qp.num_vars, qp.num_ineq, qp.num_eq
    dt = qp.Q.dtype
    if reg is None:
        reg = 1e-11 if dt == jnp.float64 else 1e-7
    if m == 0:
        return sol
    N = n + m + p
    s = qp.h - _mv(qp.G, sol.z)
    active = sol.lam > s
    af = active.astype(dt)
    Ga = qp.G * af[:, None]
    ha = qp.h * af
    Einact = 1.0 - af  # diag: 1 on inactive rows (forces lam_i = 0)

    row0 = jnp.concatenate(
        [qp.Q + reg * jnp.eye(n, dtype=dt), Ga.T, qp.A.T], axis=-1
    )
    row1 = jnp.concatenate(
        [Ga, -_bdiag(Einact + reg), jnp.zeros((m, p), dt)], axis=-1
    )
    row2 = jnp.concatenate(
        [qp.A, jnp.zeros((p, m), dt), -reg * jnp.eye(p, dtype=dt)], axis=-1
    )
    K = jnp.concatenate([row0, row1, row2], axis=-2)
    rhs = jnp.concatenate([-qp.q, ha, qp.b], axis=-1)

    def k0_matvec(w):
        wz, wl, wn = w[:n], w[n : n + m], w[n + m :]
        r0 = _mv(qp.Q, wz) + _rmv(Ga, wl) + _rmv(qp.A, wn)
        r1 = _mv(Ga, wz) - Einact * wl
        r2 = _mv(qp.A, wz)
        return jnp.concatenate([r0, r1, r2])

    if N <= 128:
        from .pallas.dispatch import ldl_factor, ldl_solve

        L, dvec = ldl_factor(K)
        solve = lambda r: ldl_solve(L, dvec, r)
    else:
        lu = jax.scipy.linalg.lu_factor(K)
        solve = lambda r: jax.scipy.linalg.lu_solve(lu, r[..., None])[..., 0]

    w = solve(rhs)
    for _ in range(2):
        w = w + solve(rhs - k0_matvec(w))

    z_p = w[:n]
    lam_p = jnp.where(active, w[n : n + m], 0.0)
    nu_p = w[n + m :]
    pol = QPSolution(z=z_p, lam=lam_p, nu=nu_p)

    s_p = qp.h - _mv(qp.G, z_p)
    hscale = 1.0 + jnp.max(jnp.abs(qp.h), initial=0.0)
    res_old = jnp.max(jnp.abs(kkt_residual(qp, sol)))
    res_new = jnp.max(jnp.abs(kkt_residual(qp, pol)))
    ok = jnp.logical_and(
        jnp.logical_and(res_new < res_old, jnp.all(jnp.isfinite(w))),
        jnp.logical_and(
            jnp.min(lam_p, initial=jnp.inf) >= -1e-5 * hscale,
            jnp.min(s_p, initial=jnp.inf) >= -1e-5 * hscale,
        ),
    )
    pick = lambda a, b: jnp.where(ok, a, b)
    return QPSolution(
        z=pick(z_p, sol.z),
        lam=pick(jnp.maximum(lam_p, 0.0), sol.lam),
        nu=pick(nu_p, sol.nu),
    )
