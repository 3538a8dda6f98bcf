"""Embedded NLP solver: primal-dual interior point (Ipopt-style), in JAX.

The reference never solves — it differentiates Ipopt's solutions
(``/root/reference/src/moi_wrapper.jl:483-487``). A TPU-native framework owns
the forward pass, so this module implements a damped primal-dual
interior-point method for the :class:`~diffopt_tpu.nlp_diff.NLPProblem` form::

    min/max f(x, p)   s.t.  c_i(x,p) {=,<=,>=} 0,   lb <= x <= ub

internally rewritten (exactly like the sensitivity system,
``nlp_utilities.jl:181-279``) as

    min sigma*f(w)  s.t.  C(w) = 0,  l <= w <= u,   w = [x; s_geq; s_leq]

with adaptive barrier mu = 0.1 * avg complementarity, fraction-to-boundary
steps, a condensed symmetric Newton system (two bound-condensed blocks +
equality block solved by LU), Levenberg regularization for nonconvexity, and
a NaN-freeze guard. All static shapes; batches via ``vmap``.

Returns duals converted to the JuMP/MOI conventions used by
:mod:`diffopt_tpu.nlp_diff` (y = -yhat, zL = zl, zU = -zu — sense-independent;
see the output-conversion comment at the bottom of :func:`solve`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..nlp_diff import NLPProblem, NLPSolution
from ..utils.precision import full_precision

Array = jax.Array

_BIG = 1e20


class NLPSolveInfo(NamedTuple):
    iterations: Array
    kkt_residual: Array
    constraint_violation: Array
    complementarity: Array
    converged: Array


class _State(NamedTuple):
    w: Array
    yhat: Array
    zl: Array
    zu: Array
    mu: Array
    lm: Array  # adaptive Levenberg regularization (nonconvexity guard)
    it: Array
    done: Array


@full_precision
def solve(
    nlp: NLPProblem,
    p: Array,
    x0: Optional[Array] = None,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    reg: float = 1e-8,
) -> Tuple[NLPSolution, NLPSolveInfo]:
    from ..utils.config import get_config

    cfg = get_config()
    if max_iters is None:
        max_iters = cfg.nlp_max_iters
    if tol is None:
        tol = cfg.nlp_tol
    n, nc = nlp.n, nlp.nc
    sigma = nlp.sense_mult
    n_geq, n_leq = len(nlp.geq_locs), len(nlp.leq_locs)
    n_ineq = n_geq + n_leq
    len_w = n + n_ineq
    dt = jnp.asarray(p).dtype if hasattr(p, "dtype") else jnp.float64

    # bounds on w (slacks: geq in [0, inf), leq in (-inf, 0])
    lw = np.concatenate([nlp.lb, np.zeros(n_geq), np.full(n_leq, -np.inf)])
    uw = np.concatenate([nlp.ub, np.full(n_geq, np.inf), np.zeros(n_leq)])
    has_l = np.isfinite(lw)
    has_u = np.isfinite(uw)
    lw_c = jnp.asarray(np.where(has_l, lw, -_BIG), dt)
    uw_c = jnp.asarray(np.where(has_u, uw, _BIG), dt)
    mask_l = jnp.asarray(has_l, dt)
    mask_u = jnp.asarray(has_u, dt)

    def f_int(w):
        return sigma * nlp.objective(w[:n], p)

    def C_int(w):
        if nc == 0:
            return jnp.zeros((0,), dt)
        cv = nlp.constraints(w[:n], p)
        s_all = jnp.zeros((nc,), dt)
        if n_geq:
            s_all = s_all.at[nlp.geq_locs].set(w[n : n + n_geq])
        if n_leq:
            s_all = s_all.at[nlp.leq_locs].set(w[n + n_geq :])
        return cv - s_all

    grad_f = jax.grad(f_int)
    jac_C = jax.jacfwd(C_int) if nc else (lambda w: jnp.zeros((0, len_w), dt))

    def hess_L(w, yhat):
        lag = lambda w_: f_int(w_) + (jnp.dot(yhat, C_int(w_)) if nc else 0.0)
        return jax.hessian(lag)(w)

    def residuals(st: _State):
        w, yhat, zl, zu = st.w, st.yhat, st.zl, st.zu
        g = grad_f(w)
        J = jac_C(w)
        r_stat = g + (J.T @ yhat if nc else 0.0) - zl * mask_l + zu * mask_u
        r_feas = C_int(w)
        sl = (w - lw_c) * mask_l + (1 - mask_l)
        su = (uw_c - w) * mask_u + (1 - mask_u)
        r_cl = (sl * zl - st.mu) * mask_l
        r_cu = (su * zu - st.mu) * mask_u
        return r_stat, r_feas, r_cl, r_cu, J, sl, su

    def kkt_error(st: _State, mu):
        r_stat, r_feas, r_cl, r_cu, _, sl, su = residuals(st._replace(mu=mu))
        return jnp.max(
            jnp.array(
                [
                    jnp.max(jnp.abs(r_stat), initial=0.0),
                    jnp.max(jnp.abs(r_feas), initial=0.0),
                    jnp.max(jnp.abs(r_cl), initial=0.0),
                    jnp.max(jnp.abs(r_cu), initial=0.0),
                ]
            )
        )

    # ---- initialization ---------------------------------------------------
    if x0 is None:
        x_init = jnp.clip(
            jnp.zeros((n,), dt),
            jnp.asarray(np.where(has_l[:n], lw[:n] + 0.5, -1.0), dt),
            jnp.asarray(np.where(has_u[:n], uw[:n] - 0.5, 1.0), dt),
        )
    else:
        x_init = jnp.asarray(x0, dt)
    cv0 = nlp.constraints(x_init, p) if nc else jnp.zeros((0,), dt)
    s0_geq = jnp.clip(cv0[nlp.geq_locs], min=1.0) if n_geq else jnp.zeros((0,), dt)
    s0_leq = jnp.clip(cv0[nlp.leq_locs], max=-1.0) if n_leq else jnp.zeros((0,), dt)
    w0 = jnp.concatenate([x_init, s0_geq, s0_leq])
    # push strictly inside the bounds
    w0 = jnp.clip(w0, lw_c + 0.1 * mask_l, uw_c - 0.1 * mask_u)
    st0 = _State(
        w=w0,
        yhat=jnp.zeros((nc,), dt),
        zl=jnp.ones((len_w,), dt) * mask_l,
        zu=jnp.ones((len_w,), dt) * mask_u,
        mu=jnp.asarray(1e-1, dt),
        lm=jnp.asarray(reg, dt),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )

    frac = jnp.asarray(0.99, dt)

    def step_len(v, dv, mask):
        ratio = jnp.where((dv < 0) & (mask > 0), -v / dv, jnp.inf)
        amax = jnp.min(ratio, initial=jnp.inf)
        return jnp.minimum(1.0, frac * amax).astype(dt)

    def cond(st: _State):
        return jnp.logical_and(st.it < max_iters, jnp.logical_not(st.done))

    def body(st: _State) -> _State:
        r_stat, r_feas, r_cl, r_cu, J, sl, su = residuals(st)
        W = hess_L(st.w, st.yhat)
        # condensed: Wt = W + Zl/Sl + Zu/Su (+ reg); solve
        # [Wt J'; J -delta][dw; dy] = [-r_stat - (mu - sl*zl terms)...; -r_feas]
        dl = (st.zl / sl) * mask_l
        du_ = (st.zu / su) * mask_u
        Wt = W + jnp.diag(dl + du_ + st.lm)
        rhs_w = -(
            r_stat
            - (st.mu / sl - st.zl) * mask_l  # from eliminating dzl
            + (st.mu / su - st.zu) * mask_u  # from eliminating dzu
        )
        if nc:
            K = jnp.block(
                [[Wt, J.T], [J, -reg * jnp.eye(nc, dtype=dt)]]
            )
            rhs = jnp.concatenate([rhs_w, -r_feas])
            if len_w + nc <= 128:
                # symmetric quasi-definite once the Levenberg shift makes Wt
                # PD (backtracking rejects + grows lm otherwise): batched
                # Pallas LDL' instead of XLA's slow batched LU, one
                # refinement pass to absorb borderline pivots
                from ..ops.pallas.dispatch import ldl_factor, ldl_solve

                L, dvec = ldl_factor(K)
                d = ldl_solve(L, dvec, rhs)
                d = d + ldl_solve(L, dvec, rhs - K @ d)
            else:
                d = jnp.linalg.solve(K, rhs[:, None])[:, 0]
            dw, dy = d[:len_w], d[len_w:]
        else:
            dw = jnp.linalg.solve(Wt, rhs_w[:, None])[:, 0]
            dy = jnp.zeros((0,), dt)
        dzl = ((st.mu - sl * st.zl) * mask_l - st.zl * dw * mask_l) / sl
        dzu = ((st.mu - su * st.zu) * mask_u + st.zu * dw * mask_u) / su

        a_p = jnp.minimum(
            step_len(sl, dw * mask_l, mask_l), step_len(su, -dw * mask_u, mask_u)
        )
        a_d = jnp.minimum(step_len(st.zl, dzl, mask_l), step_len(st.zu, dzu, mask_u))

        # backtracking on the KKT error (simple merit): halve the primal step
        # up to 3 times if the error does not decrease — guards nonconvex
        # steps that the pure fraction-to-boundary rule lets through
        err0 = kkt_error(st, st.mu)

        def cand_err(ap, ad):
            stc = st._replace(
                w=st.w + ap * dw,
                yhat=st.yhat + ad * dy,
                zl=(st.zl + ad * dzl) * mask_l,
                zu=(st.zu + ad * dzu) * mask_u,
            )
            return kkt_error(stc, st.mu)

        # NaN-aware: a NaN candidate error must count as 'worse' (NaN > x is
        # False), else a NaN direction from the unpivoted LDL' would shrink
        # the Levenberg shift and livelock
        for _ in range(3):
            worse = jnp.logical_not(cand_err(a_p, a_d) <= err0 * 1.5)
            a_p = jnp.where(worse, a_p * 0.5, a_p)
            a_d = jnp.where(worse, a_d * 0.5, a_d)
        # Levenberg update: grow when even the backtracked step is bad
        # (bends the direction toward steepest descent), decay otherwise
        still_bad = jnp.logical_not(cand_err(a_p, a_d) <= err0 * 1.5)
        lm_n = jnp.where(
            still_bad,
            jnp.minimum(st.lm * 10.0, 1e6),
            jnp.maximum(st.lm / 3.0, reg),
        ).astype(dt)
        a_p = jnp.where(still_bad, 0.0, a_p)
        a_d = jnp.where(still_bad, 0.0, a_d)

        w_n = st.w + a_p * dw
        y_n = st.yhat + a_d * dy
        zl_n = (st.zl + a_d * dzl) * mask_l
        zu_n = (st.zu + a_d * dzu) * mask_u

        finite = jnp.all(
            jnp.isfinite(jnp.concatenate([w_n, y_n, zl_n, zu_n]))
        )
        w_n = jnp.where(finite, w_n, st.w)
        y_n = jnp.where(finite, y_n, st.yhat)
        zl_n = jnp.where(finite, zl_n, st.zl)
        zu_n = jnp.where(finite, zu_n, st.zu)

        # adaptive barrier: mu = 0.1 * average complementarity
        sl_n = (w_n - lw_c) * mask_l + (1 - mask_l)
        su_n = (uw_c - w_n) * mask_u + (1 - mask_u)
        n_active = jnp.maximum(jnp.sum(mask_l) + jnp.sum(mask_u), 1.0)
        compl = (
            jnp.sum(sl_n * zl_n * mask_l) + jnp.sum(su_n * zu_n * mask_u)
        ) / n_active
        mu_n = jnp.maximum(0.1 * compl, tol / 10.0).astype(dt)

        st_n = _State(w_n, y_n, zl_n, zu_n, mu_n, lm_n, st.it + 1, st.done)
        err = kkt_error(st_n, jnp.asarray(0.0, dt))
        done = jnp.logical_or(err < tol, jnp.logical_not(finite))
        return st_n._replace(done=done)

    st = jax.lax.while_loop(cond, body, st0)

    err = kkt_error(st, jnp.asarray(0.0, dt))
    viol = jnp.max(jnp.abs(C_int(st.w)), initial=0.0)
    sl = (st.w - lw_c) * mask_l + (1 - mask_l)
    su = (uw_c - st.w) * mask_u + (1 - mask_u)
    compl = jnp.maximum(
        jnp.max(sl * st.zl * mask_l, initial=0.0),
        jnp.max(su * st.zu * mask_u, initial=0.0),
    )
    info = NLPSolveInfo(
        iterations=st.it,
        kkt_residual=err,
        constraint_violation=viol,
        complementarity=compl,
        converged=err < 10 * tol,
    )

    # convert internal multipliers to the JuMP/MOI conventions nlp_diff
    # ingests. The mapping is SENSE-INDEPENDENT: the internal problem is
    # min sigma*f but the reported Lagrangian is stationarity of
    # f - sigma*y*c (reference nlp_utilities.jl:46-54), which cancels the
    # sigma — geq duals >= 0, leq <= 0, zL >= 0, zU <= 0 for Min AND Max
    # (the reference's dual-sign asserts, nlp_utilities.jl:219-266).
    x = st.w[:n]
    y = -st.yhat
    zL = st.zl[:n]
    zU = -st.zu[:n]
    return NLPSolution(x=x, y=y, zL=zL, zU=zU), info
