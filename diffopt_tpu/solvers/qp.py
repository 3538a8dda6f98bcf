"""Batched dense primal-dual interior-point QP/LP solver.

The reference differentiates solutions produced by external MOI solvers
(HiGHS, Ipopt, SCS — ``/root/reference/src/moi_wrapper.jl:483-487`` simply
delegates ``optimize!``). A TPU-native framework must own the forward pass, so
this module implements a Mehrotra predictor-corrector interior-point method
for

    min 1/2 z'Qz + q'z   s.t.  Az = b,  Gz + s = h,  s >= 0

entirely with static shapes and ``lax``-control flow: one instance is a
``(n+p) x (n+p)`` dense Newton system per iteration (MXU-friendly), and
batches of instances are ``vmap``-ed so every factorization in the batch runs
as one big batched LU on the chip.

Returns duals in the AK17 convention used throughout
(:class:`~diffopt_tpu.ir.QPSolution`): ``lam >= 0`` for ``Gz <= h`` and ``nu``
with Lagrangian ``+ nu.(Az - b)``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ir import QPSolution, QuadProgram
from ..ops.pallas.dispatch import chol, chol_solve
from ..utils.precision import full_precision

Array = jax.Array


class QPSolveInfo(NamedTuple):
    iterations: Array  # int32, iterations actually used
    primal_residual: Array
    dual_residual: Array
    duality_gap: Array
    converged: Array  # bool


class _State(NamedTuple):
    z: Array
    nu: Array
    lam: Array
    s: Array
    it: Array
    done: Array


def _sym_solve(K: Array, rhs: Array) -> Array:
    return jnp.linalg.solve(K, rhs[..., None])[..., 0]


@full_precision
def solve(
    qp: QuadProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    reg: float | None = None,
) -> Tuple[QPSolution, QPSolveInfo]:
    """Solve one QP instance (vmap over a batched QuadProgram for batches).

    ``max_iters``/``tol``/``reg`` default from the active
    :class:`~diffopt_tpu.utils.config.DiffOptConfig` (per-dtype tolerances:
    complementarity products can't resolve below ~sqrt(eps) in f32).
    """
    from ..utils.config import get_config

    cfg = get_config()
    n, m, p = qp.num_vars, qp.num_ineq, qp.num_eq
    dt = qp.Q.dtype
    if max_iters is None:
        max_iters = cfg.qp_max_iters
    if tol is None:
        tol = cfg.qp_tol(dt)
    if reg is None:
        reg = cfg.qp_reg(dt)
    Q, q, A, b, G, h = qp.Q, qp.q, qp.A, qp.b, qp.G, qp.h

    if m == 0 and p == 0:
        # Unconstrained: single Newton solve.
        z = -jnp.linalg.solve(Q + reg * jnp.eye(n, dtype=dt), q[..., None])[..., 0]
        r = Q @ z + q
        info = QPSolveInfo(
            iterations=jnp.asarray(1, jnp.int32),
            primal_residual=jnp.asarray(0.0, dt),
            dual_residual=jnp.linalg.norm(r),
            duality_gap=jnp.asarray(0.0, dt),
            converged=jnp.linalg.norm(r) < tol,
        )
        return QPSolution(z=z, lam=jnp.zeros((0,), dt), nu=jnp.zeros((0,), dt)), info

    eyen = jnp.eye(n, dtype=dt)

    def newton_mat(lam, s):
        """Cholesky factors of the condensed PD system: eliminate (ds, dlam)
        to get H = Q + G'(lam/s)G + reg I, then eliminate dnu via the Schur
        complement S = A H^-1 A' + reg I. Two batched Cholesky factorizations
        per IPM iteration — the MXU-friendly alternative to an indefinite LU.
        """
        ls = lam / s
        H = Q + (G.T * ls) @ G if m else Q
        Lh = chol(H + reg * eyen)
        if p:
            HiAt = chol_solve(Lh, A.T)
            S = A @ HiAt + reg * jnp.eye(p, dtype=dt)
            Ls = chol(S)
        else:
            Ls = jnp.zeros((0, 0), dt)
        return (Lh, Ls)

    def residuals(z, nu, lam, s):
        rd = Q @ z + q + G.T @ lam + A.T @ nu  # dual/stationarity
        rp_eq = A @ z - b
        rp_in = G @ z + s - h
        return rd, rp_eq, rp_in

    def step_len(v, dv, frac):
        """Largest alpha in (0,1] with v + alpha dv >= (1-frac)... standard
        fraction-to-boundary: alpha = min(1, frac * min_{dv<0}(-v/dv))."""
        ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
        amax = jnp.min(ratio, initial=jnp.inf)
        return jnp.minimum(1.0, frac * amax).astype(dt)

    def solve_dir(K, rd, rp_eq, rp_in, r_cent, lam, s):
        """Back-substitute the condensed system for (dz, dnu, dlam, ds).

        Full system: Q dz + G'dlam + A'dnu = -rd
                     A dz                  = -rp_eq
                     G dz + ds             = -rp_in
                     S dlam + Lam ds       = -r_cent
        Eliminate ds = -rp_in - G dz, dlam = -(r_cent + lam*ds)/s.
        """
        Lh, Ls = K
        rhs_z = -rd + G.T @ ((r_cent - lam * rp_in) / s) if m else -rd
        z1 = chol_solve(Lh, rhs_z)
        if p:
            dnu = chol_solve(Ls, A @ z1 + rp_eq)
            dz = z1 - chol_solve(Lh, A.T @ dnu)
        else:
            dnu = jnp.zeros((0,), dt)
            dz = z1
        ds = -rp_in - G @ dz if m else s[:0]
        dlam = -(r_cent + lam * ds) / s if m else lam[:0]
        return dz, dnu, dlam, ds

    # --- initialization (least-squares style, cf. Mehrotra / CVXGEN) --------
    K0 = newton_mat(jnp.ones((m,), dt), jnp.ones((m,), dt))
    rd0, rpe0, rpi0 = residuals(
        jnp.zeros((n,), dt), jnp.zeros((p,), dt), jnp.zeros((m,), dt), jnp.zeros((m,), dt)
    )
    dz0, dnu0, dlam0, ds0 = solve_dir(
        K0, rd0, rpe0, rpi0, -jnp.ones((m,), dt), jnp.ones((m,), dt), jnp.ones((m,), dt)
    )
    z = dz0
    nu = dnu0
    s = h - G @ z if m else jnp.zeros((0,), dt)
    shift_s = jnp.maximum(0.0, -jnp.min(s, initial=0.0) * 1.5) + 1.0
    s = s + shift_s
    lam = jnp.ones((m,), dt)

    def cond(st: _State):
        return jnp.logical_and(st.it < max_iters, jnp.logical_not(st.done))

    def body(st: _State) -> _State:
        z, nu, lam, s = st.z, st.nu, st.lam, st.s
        rd, rp_eq, rp_in = residuals(z, nu, lam, s)
        mu = (jnp.dot(s, lam) / m) if m else jnp.asarray(0.0, dt)

        K = newton_mat(lam, s)
        # affine (predictor) direction
        r_cent_aff = s * lam
        dza, dnua, dlama, dsa = solve_dir(K, rd, rp_eq, rp_in, r_cent_aff, lam, s)
        if m:
            a_p = step_len(s, dsa, jnp.asarray(1.0, dt))
            a_d = step_len(lam, dlama, jnp.asarray(1.0, dt))
            mu_aff = jnp.dot(s + a_p * dsa, lam + a_d * dlama) / m
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)
            # corrector: centering + Mehrotra second-order term
            r_cent = s * lam + dsa * dlama - sigma * mu
        else:
            r_cent = s * lam
        dz, dnu, dlam, ds = solve_dir(K, rd, rp_eq, rp_in, r_cent, lam, s)
        frac = jnp.asarray(0.99, dt)
        if m:
            alpha = jnp.minimum(step_len(s, ds, frac), step_len(lam, dlam, frac))
        else:
            alpha = jnp.asarray(1.0, dt)
        z_n = z + alpha * dz
        nu_n = nu + alpha * dnu
        lam_n = lam + alpha * dlam
        s_n = s + alpha * ds

        # NaN guard: near-degenerate active sets can blow up the condensed
        # system once mu ~ eps; freeze at the last good iterate (the analogue
        # of the reference's singular-KKT fallbacks, ConicProgram.jl:320-324).
        finite = jnp.all(
            jnp.isfinite(jnp.concatenate([z_n, nu_n, lam_n, s_n]))
        )
        z_n = jnp.where(finite, z_n, z)
        nu_n = jnp.where(finite, nu_n, nu)
        lam_n = jnp.where(finite, lam_n, lam)
        s_n = jnp.where(finite, s_n, s)

        rd, rp_eq, rp_in = residuals(z_n, nu_n, lam_n, s_n)
        pres = jnp.sqrt(jnp.sum(rp_eq**2) + jnp.sum(rp_in**2))
        dres = jnp.linalg.norm(rd)
        mu_n = (jnp.dot(s_n, lam_n) / m) if m else jnp.asarray(0.0, dt)
        done = jnp.logical_and(
            pres < tol, jnp.logical_and(dres < tol, mu_n < tol)
        )
        done = jnp.logical_or(done, jnp.logical_not(finite))
        return _State(z_n, nu_n, lam_n, s_n, st.it + 1, done)

    st0 = _State(z, nu, lam, s, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    st = jax.lax.while_loop(cond, body, st0)

    rd, rp_eq, rp_in = residuals(st.z, st.nu, st.lam, st.s)
    pres = jnp.sqrt(jnp.sum(rp_eq**2) + jnp.sum(rp_in**2))
    dres = jnp.linalg.norm(rd)
    gap = jnp.dot(st.s, st.lam) if m else jnp.asarray(0.0, dt)
    mu_f = gap / m if m else gap
    # `done` may have been set by the NaN-freeze guard; report convergence
    # from the actual residuals (with a small slack on the gap, which can
    # stall one notch above tol on degenerate LP faces).
    conv = jnp.logical_and(
        pres < 10 * tol, jnp.logical_and(dres < 10 * tol, mu_f < 100 * tol)
    )
    info = QPSolveInfo(
        iterations=st.it,
        primal_residual=pres,
        dual_residual=dres,
        duality_gap=gap,
        converged=conv,
    )
    return QPSolution(z=st.z, lam=st.lam, nu=st.nu), info


def kkt_metrics(
    qp: QuadProgram, sol: QPSolution, *, tol: float | None = None
) -> QPSolveInfo:
    """Post-hoc KKT residual metrics for an externally produced solution —
    the status source for solve paths that don't carry per-instance solver
    state (the fused Pallas PDIP). Batch-aware over leading dims.

    ``iterations`` is reported as -1 (unknown); ``converged`` uses the same
    scale-RELATIVE criterion as the fused kernel's termination (with
    :func:`solve`'s 10x/100x exit-report slack): absolute residuals are
    unreachable in f32 once data/solution scales are large, and an absolute
    flag here would mark entire well-solved large-scale batches unconverged
    (measured on the headline bench distribution: relative residuals ~3e-8,
    absolute flag 0% converged) — which ``nan_on_unconverged`` would then
    NaN-poison wholesale. The slack variable is reconstructed as
    ``max(h - Gz, 0)`` so primal infeasibility shows up as ``max(Gz - h, 0)``
    mass in ``primal_residual``. ``primal_residual``/``dual_residual`` are
    reported relative (max-abs over rows, divided by the scale factors);
    ``duality_gap`` stays the raw complementarity sum.
    """
    from ..utils.config import get_config

    dt = qp.Q.dtype
    if tol is None:
        tol = get_config().qp_tol(dt)
    m = qp.num_ineq
    z, lam, nu = sol.z, sol.lam, sol.nu
    Qz = jnp.einsum("...ij,...j->...i", qp.Q, z)
    Gl = jnp.einsum("...ji,...j->...i", qp.G, lam)
    An = jnp.einsum("...ji,...j->...i", qp.A, nu)
    rd = Qz + qp.q + Gl + An
    amax = lambda x: (
        jnp.max(jnp.abs(x), axis=-1) if x.shape[-1] else
        jnp.zeros(x.shape[:-1], dt)
    )
    dscale = 1.0 + jnp.maximum(
        jnp.maximum(amax(Qz), amax(qp.q)), jnp.maximum(amax(Gl), amax(An))
    )
    Az = jnp.einsum("...ij,...j->...i", qp.A, z)
    Gz = jnp.einsum("...ij,...j->...i", qp.G, z)
    rp_eq = Az - qp.b
    viol = jnp.maximum(Gz - qp.h, 0.0)
    s = jnp.maximum(qp.h - Gz, 0.0)
    pscale = 1.0 + jnp.maximum(
        jnp.maximum(amax(Az), amax(qp.b)), jnp.maximum(amax(Gz), amax(qp.h))
    )
    pobj = 0.5 * jnp.sum(z * Qz, axis=-1) + jnp.sum(qp.q * z, axis=-1)
    gscale = 1.0 + jnp.abs(pobj)
    pres = (amax(rp_eq) + amax(viol)) / pscale
    dres = amax(rd) / dscale
    gap = jnp.sum(s * lam, axis=-1)
    mu_f = (gap / m if m else gap) / gscale
    conv = jnp.logical_and(
        pres < 10 * tol, jnp.logical_and(dres < 10 * tol, mu_f < 100 * tol)
    )
    conv = jnp.logical_and(
        conv,
        jnp.all(jnp.isfinite(z), axis=-1)
        & jnp.all(jnp.isfinite(lam), axis=-1)
        & jnp.all(jnp.isfinite(nu), axis=-1),
    )
    return QPSolveInfo(
        iterations=jnp.broadcast_to(jnp.asarray(-1, jnp.int32), conv.shape),
        primal_residual=pres,
        dual_residual=dres,
        duality_gap=gap,
        converged=conv,
    )


def solve_batched(
    qp: QuadProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    reg: float | None = None,
) -> Tuple[QPSolution, QPSolveInfo]:
    """vmap wrapper: all leading dims of the QuadProgram fields are batch."""
    fn = partial(solve, max_iters=max_iters, tol=tol, reg=reg)
    ndim = qp.q.ndim
    for _ in range(ndim - 1):
        fn = jax.vmap(fn)
    return fn(qp)
