"""Nonlinear-program (NLP) KKT sensitivity — the sIpopt method, TPU-first.

Rebuilds the reference NonLinearProgram backend
(``/root/reference/src/NonLinearProgram/NonLinearProgram.jl`` and
``nlp_utilities.jl``): factorize the KKT-system Jacobian ``M`` at a local
optimum of a parameterized NLP and solve ``M ds = -N dp`` for primal AND dual
sensitivities; reverse mode transposes the same system.

Where the reference uses MOI.Nonlinear's sparse reverse AD for the Lagrangian
Hessian and constraint Jacobian (``nlp_utilities.jl:35-77``), here the user
hands plain JAX functions ``objective(x, p)`` / ``constraints(x, p)`` and the
derivatives come from ``jax.hessian`` / ``jax.jacfwd`` — traced, fused, and
batchable.

Problem form (matching ``NonLinearProgram.jl:37-79``)::

    min/max  f(x, p)
    s.t.     c_i(x, p) (=, <=, >=) 0     for each constraint kind
             lb <= x <= ub                (+-inf where absent)

(fold constants into ``c_i``; "c(x) <= b" is ``kind='leq'`` with c := c - b).

Slack augmentation, bound handling, the M/N block layout, the LU-with-
inertia-correction loop, and the JuMP-convention sign fixups replicate
``nlp_utilities.jl:181-396,457-500`` exactly — these sign conventions are
load-bearing for parity with the reference's tests.

Dual conventions (JuMP/MOI): y >= 0 for >= constraints, y <= 0 for <=
constraints; bound duals zL >= 0 (lower), zU <= 0 (upper) — for BOTH Min and
Max senses (the duals satisfy stationarity of ``f - sigma*y*c``; the
reference's dual-sign asserts at ``nlp_utilities.jl:219-266`` enforce exactly
this sense-independence, and its ``_sense_mult`` fixups at
``nlp_utilities.jl:486-499`` — replicated in ``_sign_fix`` — convert the
internal sensitivity rows back to it).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from .utils.precision import full_precision

Array = jax.Array


class NLPProblem:
    """Static description of a parameterized NLP.

    ``objective(x, p) -> scalar``; ``constraints(x, p) -> (nc,)`` (may be None
    when nc == 0); ``kinds`` a tuple of 'eq' | 'leq' | 'geq' per constraint;
    ``lb``/``ub`` concrete (n,) arrays with +-inf. The bound pattern and
    constraint kinds are static structure (they fix the KKT block layout).
    """

    def __init__(
        self,
        objective: Callable,
        constraints: Optional[Callable],
        kinds: Sequence[str],
        n: int,
        lb=None,
        ub=None,
        sense: str = "min",
    ):
        self.objective = objective
        self.constraints = constraints
        self.kinds = tuple(kinds)
        for k in self.kinds:
            if k not in ("eq", "leq", "geq"):
                raise ValueError(f"bad constraint kind {k!r}")
        self.n = int(n)
        self.lb = np.full(n, -np.inf) if lb is None else np.asarray(lb, float)
        self.ub = np.full(n, np.inf) if ub is None else np.asarray(ub, float)
        if sense not in ("min", "max"):
            raise ValueError("sense must be 'min' or 'max'")
        self.sense = sense

        # Static index sets (reference Cache fields, NonLinearProgram.jl:14-25)
        self.geq_locs = np.array([i for i, k in enumerate(self.kinds) if k == "geq"], int)
        self.leq_locs = np.array([i for i, k in enumerate(self.kinds) if k == "leq"], int)
        self.has_low = np.nonzero(np.isfinite(self.lb))[0]
        self.has_up = np.nonzero(np.isfinite(self.ub))[0]

    @property
    def nc(self) -> int:
        return len(self.kinds)

    @property
    def sense_mult(self) -> float:
        return 1.0 if self.sense == "min" else -1.0


class NLPSolution(NamedTuple):
    """Local optimum in JuMP conventions: primal ``x``; constraint duals ``y``
    (nc,); bound duals ``zL``/``zU`` (n,), zero where the bound is absent or
    inactive."""

    x: Array
    y: Array
    zL: Array
    zU: Array


class NLPForward(NamedTuple):
    dx: Array  # (n,) primal sensitivity (or (n, np) full Jacobian)
    dy: Array  # (nc,) constraint-dual sensitivity
    dzL: Array  # (n,) lower-bound-dual sensitivity (zeros where no bound)
    dzU: Array  # (n,) upper-bound-dual sensitivity
    singular: Array  # bool: inertia correction failed -> zeros returned


def _derivatives(nlp: NLPProblem, sol: NLPSolution, p: Array):
    """Lagrangian Hessian blocks and constraint Jacobians at the solution.

    The Lagrangian multiplier convention matches the reference's evaluator
    call (obj multiplier 1.0, constraint multipliers ``-sigma*y``,
    ``nlp_utilities.jl:48-54``).
    """
    sigma = nlp.sense_mult
    x = sol.x

    if nlp.nc:
        lag = lambda x_, p_: nlp.objective(x_, p_) + jnp.dot(
            -sigma * sol.y, nlp.constraints(x_, p_)
        )
    else:
        lag = nlp.objective

    W = jax.hessian(lag, argnums=0)(x, p)  # (n, n)
    Wxp = jax.jacfwd(jax.grad(lag, argnums=0), argnums=1)(x, p)  # (n, np)
    if nlp.nc:
        Jx = jax.jacfwd(nlp.constraints, argnums=0)(x, p)  # (nc, n)
        Jp = jax.jacfwd(nlp.constraints, argnums=1)(x, p)  # (nc, np)
    else:
        Jx = jnp.zeros((0, nlp.n), x.dtype)
        Jp = jnp.zeros((0,) + p.shape, x.dtype)
    return W, Wxp, Jx, Jp


@full_precision
def build_sensitivity_system(nlp: NLPProblem, sol: NLPSolution, p: Array):
    """Assemble (M, N) exactly as ``nlp_utilities.jl:286-396``.

    Layout of the unknown block ``s = [w; y_cons; z_low; z_up]`` with
    ``w = [x; s_geq; s_leq]``, ``z_low = [primal-lower duals; geq-slack
    duals]``, ``z_up = [primal-upper duals; leq-slack duals]``.
    Returns (M, N, layout) where layout carries the static offsets.
    """
    sigma = nlp.sense_mult
    n, nc = nlp.n, nlp.nc
    n_geq, n_leq = len(nlp.geq_locs), len(nlp.leq_locs)
    n_ineq = n_geq + n_leq
    len_w = n + n_ineq
    nl_x, nu_x = len(nlp.has_low), len(nlp.has_up)
    num_low = nl_x + n_geq
    num_up = nu_x + n_leq
    total = len_w + nc + num_low + num_up
    dt = sol.x.dtype

    W, Wxp, Jx, Jp = _derivatives(nlp, sol, p)
    num_p = Wxp.shape[-1]

    cons_val = nlp.constraints(sol.x, p) if nc else jnp.zeros((0,), dt)
    s_geq = cons_val[nlp.geq_locs]  # slack values: c(x) - 0 (>= 0)
    s_leq = cons_val[nlp.leq_locs]  # (<= 0)

    # w-space bound index sets: [primal bounds; slack bounds]
    low_idx_w = np.concatenate([nlp.has_low, n + np.arange(n_geq)]).astype(int)
    up_idx_w = np.concatenate([nlp.has_up, n + n_geq + np.arange(n_leq)]).astype(int)
    X_L = jnp.concatenate([jnp.asarray(nlp.lb[nlp.has_low], dt), jnp.zeros(n_geq, dt)])
    X_U = jnp.concatenate([jnp.asarray(nlp.ub[nlp.has_up], dt), jnp.zeros(n_leq, dt)])
    w = jnp.concatenate([sol.x, s_geq, s_leq])

    # bound-dual values in the internal (sIpopt) convention
    # (nlp_utilities.jl:211-266): V_L = sigma * dual_low >= 0,
    # V_U = -sigma * dual_up >= 0; slack bounds carry the constraint dual.
    V_L = jnp.concatenate([sigma * sol.zL[nlp.has_low], sigma * sol.y[nlp.geq_locs]])
    V_U = jnp.concatenate(
        [-sigma * sol.zU[nlp.has_up], -sigma * sol.y[nlp.leq_locs]]
    )

    # A over w: constraint Jacobian with -1 slack columns
    A = jnp.zeros((nc, len_w), dt)
    A = A.at[:, :n].set(Jx)
    if n_geq:
        A = A.at[nlp.geq_locs, n + np.arange(n_geq)].set(-1.0)
    if n_leq:
        A = A.at[nlp.leq_locs, n + n_geq + np.arange(n_leq)].set(-1.0)

    M = jnp.zeros((total, total), dt)
    M = M.at[:n, :n].set(W)
    M = M.at[:len_w, len_w : len_w + nc].set(A.T)
    M = M.at[len_w : len_w + nc, :len_w].set(A)
    lo0 = len_w + nc
    if num_low:
        M = M.at[low_idx_w, lo0 + np.arange(num_low)].set(-1.0)  # I_L
        M = M.at[lo0 + np.arange(num_low), low_idx_w].set(V_L)  # V_L rows
        M = M.at[lo0 + np.arange(num_low), lo0 + np.arange(num_low)].set(
            w[low_idx_w] - X_L
        )
    up0 = lo0 + num_low
    if num_up:
        M = M.at[up_idx_w, up0 + np.arange(num_up)].set(1.0)  # I_U
        M = M.at[up0 + np.arange(num_up), up_idx_w].set(V_U)
        M = M.at[up0 + np.arange(num_up), up0 + np.arange(num_up)].set(
            X_U - w[up_idx_w]
        )

    N = jnp.zeros((total, num_p), dt)
    N = N.at[:n, :].set(Wxp)
    N = N.at[len_w : len_w + nc, :].set(Jp)

    layout = dict(
        n=n, nc=nc, n_geq=n_geq, n_leq=n_leq, len_w=len_w,
        nl_x=nl_x, nu_x=nu_x, num_low=num_low, num_up=num_up, total=total,
    )
    return M, N, layout


def factorize_with_inertia(
    M: Array,
    layout: dict,
    st: float | None = None,
    max_corrections: int | None = None,
):
    """LU with the reference's inertia-correction loop
    (``NonLinearProgram.jl:356-422``): on a singular factorization, add
    ``st * diag(+1 on w/bound rows, -1 on constraint rows)`` repeatedly.

    ``st``/``max_corrections`` default from the active config
    (``inertia_shift``/``inertia_max_corrections`` — the reference's
    hard-coded ``1e-6`` x 50). Returns ``(lu, piv, singular)`` —
    ``singular=True`` after ``max_corrections`` failed shifts (the reference
    then warns and returns zero sensitivities).
    """
    from .utils.config import get_config

    cfg = get_config()
    if st is None:
        st = cfg.inertia_shift
    if max_corrections is None:
        max_corrections = cfg.inertia_max_corrections
    total, len_w, nc = layout["total"], layout["len_w"], layout["nc"]
    dt = M.dtype
    d = jnp.ones((total,), dt).at[len_w : len_w + nc].set(-1.0)
    Dm = jnp.diag(d)

    eps = jnp.asarray(jnp.finfo(dt).eps, dt)

    def is_singular(lu):
        diagU = jnp.abs(jnp.diagonal(lu))
        bad = jnp.logical_not(jnp.all(jnp.isfinite(diagU)))
        tiny = jnp.min(diagU) <= eps * jnp.maximum(jnp.max(diagU), 1.0) * total
        return jnp.logical_or(bad, tiny)

    lu0, piv0 = jax.scipy.linalg.lu_factor(M)

    def cond(carry):
        lu, piv, k, sing = carry
        return jnp.logical_and(sing, k < max_corrections)

    def body(carry):
        lu, piv, k, _ = carry
        J = M + (k + 1).astype(dt) * st * Dm
        lu2, piv2 = jax.scipy.linalg.lu_factor(J)
        return lu2, piv2, k + 1, is_singular(lu2)

    lu, piv, k, sing = jax.lax.while_loop(
        cond, body, (lu0, piv0, jnp.asarray(0, jnp.int32), is_singular(lu0))
    )
    return lu, piv, sing


def _sign_fix(layout: dict, sigma: float, v: Array) -> Array:
    """JuMP-convention sign fixups on sensitivity rows
    (``nlp_utilities.jl:486-499``): constraint-dual rows *= -sigma, lower
    bound dual rows *= sigma, upper bound dual rows *= -sigma."""
    len_w, nc = layout["len_w"], layout["nc"]
    num_low, num_up = layout["num_low"], layout["num_up"]
    scale = jnp.ones((layout["total"],), v.dtype)
    scale = scale.at[len_w : len_w + nc].set(-sigma)
    scale = scale.at[len_w + nc : len_w + nc + num_low].set(sigma)
    scale = scale.at[len_w + nc + num_low :].set(-sigma)
    return v * scale if v.ndim == 1 else v * scale[:, None]


def _extract(nlp: NLPProblem, layout: dict, ds: Array, singular: Array) -> NLPForward:
    n, nc = layout["n"], layout["nc"]
    len_w, num_low = layout["len_w"], layout["num_low"]
    nl_x, nu_x = layout["nl_x"], layout["nu_x"]
    dx = ds[:n]
    dy = ds[len_w : len_w + nc]
    dzL = jnp.zeros((n,) + ds.shape[1:], ds.dtype)
    if nl_x:
        dzL = dzL.at[nlp.has_low].set(ds[len_w + nc : len_w + nc + nl_x])
    dzU = jnp.zeros((n,) + ds.shape[1:], ds.dtype)
    if nu_x:
        up0 = len_w + nc + num_low
        dzU = dzU.at[nlp.has_up].set(ds[up0 : up0 + nu_x])
    return NLPForward(dx=dx, dy=dy, dzL=dzL, dzU=dzU, singular=singular)


@full_precision
def forward_differentiate(
    nlp: NLPProblem, sol: NLPSolution, p: Array, dp: Array, factorization=None
) -> NLPForward:
    """Directional sensitivity ``ds = -M^{-1} N dp`` with sign fixups
    (reference ``forward_differentiate!``, ``NonLinearProgram.jl:502-528``).

    ``factorization(M, layout) -> (lu, piv, singular)`` overrides the default
    LU-with-inertia-correction (the reference's pluggable
    ``NonLinearKKTJacobianFactorization`` attribute, ``src/diff_opt.jl:96-120``).
    """
    M, N, layout = build_sensitivity_system(nlp, sol, p)
    fact = factorization or factorize_with_inertia
    lu, piv, sing = fact(M, layout)
    rhs = N @ dp
    ds = -jax.scipy.linalg.lu_solve((lu, piv), rhs[:, None])[:, 0]
    ds = _sign_fix(layout, nlp.sense_mult, ds)
    ds = jnp.where(sing, jnp.zeros_like(ds), ds)
    return _extract(nlp, layout, ds, sing)


@full_precision
def solution_jacobian(
    nlp: NLPProblem, sol: NLPSolution, p: Array, factorization=None
) -> NLPForward:
    """Full Jacobian ``ds/dp`` (every output gains a trailing num_p dim) —
    the reference's materialized ``Delta s`` (``nlp_utilities.jl:457-500``)."""
    M, N, layout = build_sensitivity_system(nlp, sol, p)
    fact = factorization or factorize_with_inertia
    lu, piv, sing = fact(M, layout)
    ds = -jax.scipy.linalg.lu_solve((lu, piv), N)
    ds = _sign_fix(layout, nlp.sense_mult, ds)
    ds = jnp.where(sing, jnp.zeros_like(ds), ds)
    return _extract(nlp, layout, ds, sing)


@full_precision
def reverse_differentiate(
    nlp: NLPProblem,
    sol: NLPSolution,
    p: Array,
    dx: Optional[Array] = None,
    dy: Optional[Array] = None,
    dzL: Optional[Array] = None,
    dzU: Optional[Array] = None,
    factorization=None,
) -> Array:
    """Parameter cotangent ``dp = (ds/dp)' seed`` (reference
    ``reverse_differentiate!``, ``NonLinearProgram.jl:530-582``), computed
    directionally via one transposed solve."""
    M, N, layout = build_sensitivity_system(nlp, sol, p)
    fact = factorization or factorize_with_inertia
    lu, piv, sing = fact(M, layout)
    n, nc = layout["n"], layout["nc"]
    len_w, num_low = layout["len_w"], layout["num_low"]
    nl_x, nu_x = layout["nl_x"], layout["nu_x"]
    dt = sol.x.dtype

    seed = jnp.zeros((layout["total"],), dt)
    if dx is not None:
        seed = seed.at[:n].set(dx)
    if dy is not None and nc:
        seed = seed.at[len_w : len_w + nc].set(dy)
    if dzL is not None and nl_x:
        seed = seed.at[len_w + nc : len_w + nc + nl_x].set(dzL[nlp.has_low])
    if dzU is not None and nu_x:
        up0 = len_w + nc + num_low
        seed = seed.at[up0 : up0 + nu_x].set(dzU[nlp.has_up])

    seed = _sign_fix(layout, nlp.sense_mult, seed)
    t = jax.scipy.linalg.lu_solve((lu, piv), seed[:, None], trans=1)[:, 0]
    dp = -(N.T @ t)
    return jnp.where(sing, jnp.zeros_like(dp), dp)
