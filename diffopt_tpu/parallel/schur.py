"""Schur-complement reduction for block-arrow (scenario-coupled) systems.

BASELINE config 5: scenario batches of QPs coupled through a small set of
first-stage variables. The KKT system of

    min  sum_s [ 1/2 x_s'Q_s x_s + q_s'x_s ] + 1/2 z'Q0 z + q0'z
    s.t. A_s x_s + B_s z = b_s   (dual nu_s)
         G_s x_s <= h_s          (dual lam_s)

is block-arrow: independent per-scenario KKT blocks K_s over (x_s, lam_s,
nu_s), a small coupling block over z, and cross blocks C_s carrying B_s. Each
device factorizes its local scenarios with the Pallas LDL' kernel, local
Schur contributions ``C' K^-1 C`` are ``psum``-reduced over the mesh axis
(ICI), the small coupling system is solved replicated, and back-substitution
is local. No reference counterpart (the reference is single-threaded,
SURVEY.md §2) — this is the TPU-native scale-out mandated by BASELINE.json.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ir import _pytree_dataclass
from ..ops.pallas.dispatch import ldl_factor, ldl_solve
from ..utils.precision import full_precision

Array = jax.Array


@full_precision
def schur_arrow_solve(
    Kloc: Array,
    C: Array,
    K0: Array,
    rloc: Array,
    r0: Array,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Solve the symmetric block-arrow system

        [ blkdiag(Kloc)   C   ] [xloc]   [rloc]
        [ C'              K0  ] [x0  ] = [r0  ]

    with ``Kloc (S, nb, nb)`` quasi-definite local blocks, ``C (S, nb, c)``,
    ``K0 (c, c)``. When ``axis_name`` is given (inside ``shard_map``), S is
    the local shard and the coupling reduction is a ``psum`` over the mesh.
    """
    L, d = jax.vmap(lambda K: ldl_factor(K))(Kloc)
    KinvC = jax.vmap(ldl_solve)(L, d, C)  # (S, nb, c)
    Kinvr = jax.vmap(ldl_solve)(L, d, rloc)  # (S, nb)
    S_c = jnp.einsum("sic,sid->scd", C, KinvC)
    r_c = jnp.einsum("sic,si->sc", C, Kinvr)
    S_sum = jnp.sum(S_c, axis=0)
    r_sum = jnp.sum(r_c, axis=0)
    if axis_name is not None:
        S_sum = jax.lax.psum(S_sum, axis_name)
        r_sum = jax.lax.psum(r_sum, axis_name)
    S0 = K0 - S_sum
    x0 = jnp.linalg.solve(S0, (r0 - r_sum)[:, None])[:, 0]
    xloc = jax.vmap(ldl_solve)(L, d, rloc - jnp.einsum("sic,c->si", C, x0))
    return xloc, x0


@_pytree_dataclass
class TwoStageQP:
    """Scenario-coupled QP (see module docstring). Shapes: ``Qs (S, n, n)``,
    ``qs (S, n)``, ``As (S, p, n)``, ``bs (S, p)``, ``Gs (S, m, n)``,
    ``hs (S, m)``, ``Bs (S, p, c)``, ``Q0 (c, c)``, ``q0 (c,)``."""

    Qs: Array
    qs: Array
    As: Array
    bs: Array
    Gs: Array
    hs: Array
    Bs: Array
    Q0: Array
    q0: Array

    @property
    def dims(self):
        S, n = self.qs.shape
        p = self.bs.shape[-1]
        m = self.hs.shape[-1]
        c = self.q0.shape[-1]
        return S, n, m, p, c


class TwoStageSolution(NamedTuple):
    xs: Array  # (S, n)
    lams: Array  # (S, m)
    nus: Array  # (S, p)
    z: Array  # (c,)


def to_monolithic(ts: TwoStageQP):
    """Flatten into one big QuadProgram over [x_1..x_S, z] (test oracle)."""
    from ..ir import QuadProgram

    S, n, m, p, c = ts.dims
    N = S * n + c
    dt = ts.Qs.dtype
    Q = jnp.zeros((N, N), dt)
    for s in range(S):
        Q = Q.at[s * n : (s + 1) * n, s * n : (s + 1) * n].set(ts.Qs[s])
    Q = Q.at[S * n :, S * n :].set(ts.Q0)
    q = jnp.concatenate([ts.qs.reshape(-1), ts.q0])
    A = jnp.zeros((S * p, N), dt)
    for s in range(S):
        A = A.at[s * p : (s + 1) * p, s * n : (s + 1) * n].set(ts.As[s])
        A = A.at[s * p : (s + 1) * p, S * n :].set(ts.Bs[s])
    b = ts.bs.reshape(-1)
    G = jnp.zeros((S * m, N), dt)
    for s in range(S):
        G = G.at[s * m : (s + 1) * m, s * n : (s + 1) * n].set(ts.Gs[s])
    h = ts.hs.reshape(-1)
    return QuadProgram(Q=Q, q=q, A=A, b=b, G=G, h=h)


def _scenario_kkt_blocks(ts: TwoStageQP, sol: TwoStageSolution, lam_floor, reg):
    """Per-scenario symmetrized KKT blocks K_s over (x_s, lam_s, nu_s), the
    cross blocks C_s (B_s in the nu rows), and the coupling block K0."""
    S, n, m, p, c = ts.dims
    dt = ts.Qs.dtype
    slack = jnp.einsum("smn,sn->sm", ts.Gs, sol.xs) - ts.hs
    lam_e = jnp.maximum(sol.lams, lam_floor)

    nb = n + m + p
    K = jnp.zeros((S, nb, nb), dt)
    K = K.at[:, :n, :n].set(ts.Qs + reg * jnp.eye(n, dtype=dt))
    K = K.at[:, :n, n : n + m].set(jnp.swapaxes(ts.Gs, -1, -2))
    K = K.at[:, n : n + m, :n].set(ts.Gs)
    idx = jnp.arange(m)
    K = K.at[:, n + idx, n + idx].set(slack / lam_e - reg)
    K = K.at[:, :n, n + m :].set(jnp.swapaxes(ts.As, -1, -2))
    K = K.at[:, n + m :, :n].set(ts.As)
    idp = jnp.arange(p)
    K = K.at[:, n + m + idp, n + m + idp].set(-reg)

    C = jnp.zeros((S, nb, c), dt)
    C = C.at[:, n + m :, :].set(ts.Bs)

    K0 = ts.Q0 + reg * jnp.eye(c, dtype=dt)
    return K, C, K0, lam_e


@full_precision
def two_stage_forward_sensitivity(
    ts: TwoStageQP,
    sol: TwoStageSolution,
    dts: TwoStageQP,
    *,
    axis_name: Optional[str] = None,
    lam_floor: float | None = None,
    reg: float | None = None,
) -> TwoStageSolution:
    """JVP of the coupled solution map along a data perturbation ``dts``,
    computed via the Schur-arrow solve — never materializing the monolithic
    KKT system. Inside ``shard_map`` the scenario axis is sharded and the
    coupling reduction rides ``psum`` over ``axis_name``.
    """
    S, n, m, p, c = ts.dims
    dt = ts.Qs.dtype
    if lam_floor is None:
        lam_floor = 1e-12 if dt == jnp.float64 else 1e-6
    if reg is None:
        reg = 1e-11 if dt == jnp.float64 else 1e-6

    K, C, K0, lam_e = _scenario_kkt_blocks(ts, sol, lam_floor, reg)

    # AK17-style RHS, block-arrow layout. Scenario rows:
    #   r_x  = dQ_s x_s + dq_s + dG_s' lam_s + dA_s' nu_s
    #   r_l  = (dG_s x_s - dh_s)           (pre-divided complementarity row)
    #   r_nu = dA_s x_s + dB_s z - db_s
    # Coupling row: r_z = dQ0 z + dq0 + sum_s dB_s' nu_s   (psum over mesh)
    r_x = (
        jnp.einsum("sij,sj->si", dts.Qs, sol.xs)
        + dts.qs
        + jnp.einsum("smj,sm->sj", dts.Gs, sol.lams)
        + jnp.einsum("spj,sp->sj", dts.As, sol.nus)
    )
    r_l = jnp.einsum("smj,sj->sm", dts.Gs, sol.xs) - dts.hs
    r_nu = (
        jnp.einsum("spj,sj->sp", dts.As, sol.xs)
        + jnp.einsum("spc,c->sp", dts.Bs, sol.z)
        - dts.bs
    )
    rloc = -jnp.concatenate([r_x, r_l, r_nu], axis=-1)
    r_z_local = jnp.einsum("spc,sp->c", dts.Bs, sol.nus)
    if axis_name is not None:
        r_z_local = jax.lax.psum(r_z_local, axis_name)
    r0 = -(jnp.einsum("cd,d->c", dts.Q0, sol.z) + dts.q0 + r_z_local)

    dloc, dz = schur_arrow_solve(K, C, K0, rloc, r0, axis_name=axis_name)
    dxs = dloc[:, :n]
    dlams = dloc[:, n : n + m]
    dnus = dloc[:, n + m :]
    return TwoStageSolution(xs=dxs, lams=dlams, nus=dnus, z=dz)


@full_precision
def two_stage_reverse_sensitivity(
    ts: TwoStageQP,
    sol: TwoStageSolution,
    dxs: Array,
    dz: Array,
    *,
    axis_name: Optional[str] = None,
    lam_floor: float | None = None,
    reg: float | None = None,
) -> TwoStageQP:
    """VJP of the coupled solution map: data cotangents for primal seeds
    (``dxs`` per scenario, ``dz`` on the coupling variables).

    The symmetrized arrow system K is symmetric, so the adjoint reuses the
    same Schur solve: with J = R K (R rescaling the lam rows), J' g = -seed
    becomes K w = -seed, g_lam = w_lam / lam_e. Cotangents then follow the
    AK17 accumulation per block, plus the coupling blocks:
    dB_s = g_nu_s z' + nu_s g_z', dQ0 = (g_z z' + z g_z')/2, dq0 = g_z.
    """
    S, n, m, p, c = ts.dims
    dt = ts.Qs.dtype
    if lam_floor is None:
        lam_floor = 1e-12 if dt == jnp.float64 else 1e-6
    if reg is None:
        reg = 1e-11 if dt == jnp.float64 else 1e-6

    K, C, K0, lam_e = _scenario_kkt_blocks(ts, sol, lam_floor, reg)
    rloc = -jnp.concatenate(
        [dxs, jnp.zeros((S, m), dt), jnp.zeros((S, p), dt)], axis=-1
    )
    r0 = -dz
    wloc, wz = schur_arrow_solve(K, C, K0, rloc, r0, axis_name=axis_name)
    gx = wloc[:, :n]
    glam = wloc[:, n : n + m] / lam_e
    gnu = wloc[:, n + m :]
    gz = wz

    outer = lambda a, b: a[..., :, None] * b[..., None, :]
    xs, lams, nus, z = sol.xs, sol.lams, sol.nus, sol.z
    dQs = 0.5 * (outer(gx, xs) + outer(xs, gx))
    dqs = gx
    dGs = outer(lams * glam, xs) + outer(lams, gx)
    dhs = -lams * glam
    dAs = outer(gnu, xs) + outer(nus, gx)
    dbs = -gnu
    dBs = gnu[..., :, None] * z[None, None, :] + nus[..., :, None] * gz[None, None, :]
    dQ0 = 0.5 * (jnp.outer(gz, z) + jnp.outer(z, gz))
    dq0 = gz
    return TwoStageQP(
        Qs=dQs, qs=dqs, As=dAs, bs=dbs, Gs=dGs, hs=dhs, Bs=dBs, Q0=dQ0, q0=dq0
    )


class TwoStageSolveInfo(NamedTuple):
    iterations: Array
    primal_residual: Array
    dual_residual: Array
    duality_gap: Array
    converged: Array


@full_precision
def solve_two_stage(
    ts: TwoStageQP,
    *,
    max_iters: int = 50,
    tol: float | None = None,
    reg: float | None = None,
    axis_name: Optional[str] = None,
) -> Tuple[TwoStageSolution, TwoStageSolveInfo]:
    """Interior-point solve of the coupled two-stage QP where every Newton
    step is a :func:`schur_arrow_solve` — per-scenario Pallas LDL'
    factorizations, psum-reduced coupling, no monolithic system. Inside
    ``shard_map`` (``axis_name`` set) scenarios are sharded over the mesh:
    this is BASELINE config 5's "10^5 QPs over a pod" solver.

    Condensed per-scenario blocks over (x_s, nu_s) (inequalities eliminated
    through their complementarity rows as in ``solvers/qp.py``), coupling
    variable z replicated.
    """
    S, n, m, p, c = ts.dims
    dt = ts.Qs.dtype
    if tol is None:
        tol = 1e-9 if dt == jnp.float64 else 5e-6
    if reg is None:
        reg = 1e-11 if dt == jnp.float64 else 1e-7

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    nb = n + p

    def residuals(xs, z, nus, lams, s):
        rd = (
            jnp.einsum("sij,sj->si", ts.Qs, xs)
            + ts.qs
            + jnp.einsum("smi,sm->si", ts.Gs, lams)
            + jnp.einsum("spi,sp->si", ts.As, nus)
        )
        rz = (
            jnp.einsum("cd,d->c", ts.Q0, z)
            + ts.q0
            + psum(jnp.einsum("spc,sp->c", ts.Bs, nus))
        )
        rpe = (
            jnp.einsum("spi,si->sp", ts.As, xs)
            + jnp.einsum("spc,c->sp", ts.Bs, z)
            - ts.bs
        )
        rpi = jnp.einsum("smi,si->sm", ts.Gs, xs) + s - ts.hs
        return rd, rz, rpe, rpi

    def build_blocks(lams, s):
        ls = lams / s  # (S, m)
        H = ts.Qs + jnp.einsum("smi,sm,smj->sij", ts.Gs, ls, ts.Gs)
        K = jnp.zeros((S, nb, nb), dt)
        K = K.at[:, :n, :n].set(H + reg * jnp.eye(n, dtype=dt))
        K = K.at[:, :n, n:].set(jnp.swapaxes(ts.As, -1, -2))
        K = K.at[:, n:, :n].set(ts.As)
        idp = jnp.arange(p)
        K = K.at[:, n + idp, n + idp].set(-reg)
        C = jnp.zeros((S, nb, c), dt)
        C = C.at[:, n:, :].set(ts.Bs)
        K0 = ts.Q0 + reg * jnp.eye(c, dtype=dt)
        return K, C, K0

    def solve_newton(K, C, K0, rhs_x, rhs_z, rhs_nu, lams, s, rpi, rc):
        # eliminate (ds, dlam): rhs_x += G'((rc - lam*rpi)/s)
        rx = rhs_x + jnp.einsum(
            "smi,sm->si", ts.Gs, (rc - lams * rpi) / s
        )
        rloc = jnp.concatenate([rx, rhs_nu], axis=-1)
        dloc, dz = schur_arrow_solve(K, C, K0, rloc, rhs_z, axis_name=axis_name)
        dxs = dloc[:, :n]
        dnus = dloc[:, n:]
        ds = -rpi - jnp.einsum("smi,si->sm", ts.Gs, dxs)
        dlams = -(rc + lams * ds) / s
        return dxs, dz, dnus, dlams, ds

    def step_len(v, dv, frac):
        ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
        amax = jnp.min(ratio)
        if axis_name is not None:
            amax = jax.lax.pmin(amax, axis_name)
        return jnp.minimum(1.0, frac * amax).astype(dt)

    # init
    K, C, K0 = build_blocks(jnp.ones((S, m), dt), jnp.ones((S, m), dt))
    rd0, rz0, rpe0, rpi0 = residuals(
        jnp.zeros((S, n), dt), jnp.zeros((c,), dt), jnp.zeros((S, p), dt),
        jnp.zeros((S, m), dt), jnp.zeros((S, m), dt),
    )
    dxs, dz, dnus, _, _ = solve_newton(
        K, C, K0, -rd0, -rz0, -rpe0, jnp.ones((S, m), dt), jnp.ones((S, m), dt),
        rpi0, -jnp.ones((S, m), dt),
    )
    xs, z, nus = dxs, dz, dnus
    s0 = ts.hs - jnp.einsum("smi,si->sm", ts.Gs, xs)
    smin = jnp.min(s0)
    if axis_name is not None:
        smin = jax.lax.pmin(smin, axis_name)
    s = s0 + jnp.maximum(0.0, -smin * 1.5) + 1.0
    lams = jnp.ones((S, m), dt)

    def cond(carry):
        *_, it, done = carry
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    def body(carry):
        xs, z, nus, lams, s, it, done = carry
        rd, rz, rpe, rpi = residuals(xs, z, nus, lams, s)
        total_m = S * m if axis_name is None else None
        gap_sum = psum(jnp.sum(s * lams))
        count_m = psum(jnp.asarray(float(S * m), dt))
        mu = gap_sum / count_m
        K, C, K0 = build_blocks(lams, s)
        # predictor
        dxa, dza, dna, dla, dsa = solve_newton(
            K, C, K0, -rd, -rz, -rpe, lams, s, rpi, s * lams
        )
        ap = step_len(s, dsa, jnp.asarray(1.0, dt))
        ad = step_len(lams, dla, jnp.asarray(1.0, dt))
        mu_aff = psum(jnp.sum((s + ap * dsa) * (lams + ad * dla))) / count_m
        sig = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)
        rc = s * lams + dsa * dla - sig * mu
        dxs, dz, dnus, dlams, ds = solve_newton(
            K, C, K0, -rd, -rz, -rpe, lams, s, rpi, rc
        )
        frac = jnp.asarray(0.99, dt)
        alpha = jnp.minimum(step_len(s, ds, frac), step_len(lams, dlams, frac))
        xs_n = xs + alpha * dxs
        z_n = z + alpha * dz
        nus_n = nus + alpha * dnus
        lams_n = lams + alpha * dlams
        s_n = s + alpha * ds
        finite = jnp.all(jnp.isfinite(xs_n)) & jnp.all(jnp.isfinite(s_n))
        if axis_name is not None:
            # all shards must freeze together (alpha is already pmin-synced;
            # this syncs the NaN guard too)
            finite = jnp.min(jax.lax.all_gather(finite, axis_name))
        xs_n = jnp.where(finite, xs_n, xs)
        z_n = jnp.where(finite, z_n, z)
        nus_n = jnp.where(finite, nus_n, nus)
        lams_n = jnp.where(finite, lams_n, lams)
        s_n = jnp.where(finite, s_n, s)
        rd, rz, rpe, rpi = residuals(xs_n, z_n, nus_n, lams_n, s_n)
        pres = jnp.sqrt(
            psum(jnp.sum(rpe**2) + jnp.sum(rpi**2))
        )
        dres = jnp.sqrt(psum(jnp.sum(rd**2)) + jnp.sum(rz**2))
        mu_n = psum(jnp.sum(s_n * lams_n)) / count_m
        done_n = (pres < tol) & (dres < tol) & (mu_n < tol)
        done_n = done_n | jnp.logical_not(finite)
        return (xs_n, z_n, nus_n, lams_n, s_n, it + 1, done_n)

    carry = (xs, z, nus, lams, s, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    xs, z, nus, lams, s, it, done = jax.lax.while_loop(cond, body, carry)

    rd, rz, rpe, rpi = residuals(xs, z, nus, lams, s)
    count_m = psum(jnp.asarray(float(S * m), dt))
    pres = jnp.sqrt(psum(jnp.sum(rpe**2) + jnp.sum(rpi**2)))
    dres = jnp.sqrt(psum(jnp.sum(rd**2)) + jnp.sum(rz**2))
    gap = psum(jnp.sum(s * lams))
    info = TwoStageSolveInfo(
        iterations=it,
        primal_residual=pres,
        dual_residual=dres,
        duality_gap=gap,
        converged=(pres < 10 * tol) & (dres < 10 * tol) & (gap / count_m < 100 * tol),
    )
    return TwoStageSolution(xs=xs, lams=lams, nus=nus, z=z), info
