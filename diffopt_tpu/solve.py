"""Differentiable solve entry points: the AD-integration layer.

The reference exposes ChainRules ``frule``/``rrule`` for the optimization
solution map in its examples (``/root/reference/docs/src/examples/
chainrules_unit.jl:164-297``) and Flux layers backed by QPs
(``custom-relu.jl:25-61``). Here that role is played by ``jax.custom_vjp`` /
``jax.custom_jvp`` wrappers around the embedded solvers, so ``solve_qp`` drops
directly into ``jax.grad`` / ``jax.jacfwd`` and Flax/Optax training loops.

Both wrappers differentiate *through the KKT system at the solution* (implicit
function theorem), never through solver iterations.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ir import QPSolution, QPTangent, QuadProgram
from .ops import kkt
from .solvers import qp as qpsolver
from .utils.config import get_config

Array = jax.Array


def _poison_unconverged(sol, converged):
    """NaN out non-converged instances: with ``config.nan_on_unconverged``
    a silently-wrong gradient from an unconverged solve becomes an
    impossible-to-miss NaN in both the value and anything differentiated
    through it (the jit-safe analogue of the reference's refusal to
    differentiate non-OPTIMAL solutions, ``moi_wrapper.jl:550-556``)."""

    def f(a):
        c = jnp.reshape(
            converged, converged.shape + (1,) * (a.ndim - converged.ndim)
        )
        return jnp.where(c, a, jnp.asarray(jnp.nan, a.dtype))

    return jax.tree.map(f, sol)


def _zero_info_tangent(info):
    """Tangent pytree for a solver-info struct: zeros for float leaves,
    float0 for int/bool leaves (solver diagnostics are non-differentiable
    outputs riding along the custom rules)."""
    import numpy as np

    def f(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return np.zeros(a.shape, dtype=jax.dtypes.float0)

    return jax.tree.map(f, info)


@lru_cache(maxsize=None)
def _make_solve_qp_vjp(max_iters, tol, reg, method, refine_iters, with_info, poison):
    from . import qp_diff

    @jax.custom_vjp
    def _solve(qp: QuadProgram):
        sol, info = qpsolver.solve(qp, max_iters=max_iters, tol=tol, reg=reg)
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    def _fwd(qp):
        out = _solve(qp)
        sol = out[0] if with_info else out
        return out, (qp, sol)

    def _bwd(res, cot):
        qp, sol = res
        cot_sol = cot[0] if with_info else cot
        grads = qp_diff.reverse_differentiate(
            qp,
            sol,
            cot_sol.z,
            cot_sol.lam,
            cot_sol.nu,
            method=method,
            refine_iters=refine_iters,
        )
        return (
            QuadProgram(
                Q=grads.dQ, q=grads.dq, A=grads.dA, b=grads.db, G=grads.dG, h=grads.dh
            ),
        )

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_qp_jvp(max_iters, tol, reg, method, refine_iters, with_info, poison):
    from . import qp_diff

    @jax.custom_jvp
    def _solve(qp: QuadProgram):
        sol, info = qpsolver.solve(qp, max_iters=max_iters, tol=tol, reg=reg)
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    @_solve.defjvp
    def _jvp(primals, tangents):
        (qp,) = primals
        (dqp,) = tangents
        out = _solve(qp)
        sol = out[0] if with_info else out
        dtan = QPTangent(
            dQ=dqp.Q, dq=dqp.q, dA=dqp.A, db=dqp.b, dG=dqp.G, dh=dqp.h
        )
        d = qp_diff.forward_differentiate(
            qp, sol, dtan, method=method, refine_iters=refine_iters
        )
        dsol = QPSolution(z=d.dz, lam=d.dlam, nu=d.dnu)
        if with_info:
            return out, (dsol, _zero_info_tangent(out[1]))
        return out, dsol

    return _solve


def solve_qp(
    qp: QuadProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    reg: float | None = None,
    method: str | None = None,
    refine_iters: int | None = None,
    mode: str = "vjp",
    with_info: bool = False,
):
    """Solve a QP and make the solution differentiable w.r.t. the problem data.

    ``mode='vjp'`` (default) registers a custom reverse rule (use under
    ``jax.grad``); ``mode='jvp'`` registers a forward rule (use under
    ``jax.jacfwd``/``jax.jvp``). The two differ only in which AD transform
    they support — values are identical.

    ``with_info=True`` returns ``(sol, info)`` — the solver's
    :class:`~diffopt_tpu.solvers.qp.QPSolveInfo` diagnostics (residuals,
    ``converged``) ride along as a non-differentiable aux output (use
    ``jax.grad(..., has_aux=True)``). The reference refuses to differentiate
    non-OPTIMAL solves (``moi_wrapper.jl:550-556``); inside jit that check
    must be the caller's (or, with ``config.nan_on_unconverged``, gradients
    of unconverged instances are NaN-poisoned rather than silently wrong).

    ``method=None`` resolves to the config's ``kkt_method`` (default 'auto':
    LPs route to the least-squares solve of the singular KKT system, like the
    reference's ``QuadraticProgram.jl:333-335`` — jit/vmap-safe via
    ``lax.cond`` when Q is a tracer).
    """
    cfg = get_config()
    if method is None:
        method = cfg.kkt_method
    if refine_iters is None:
        refine_iters = cfg.kkt_refine_iters
    key = (max_iters, tol, reg, method, refine_iters, with_info,
           cfg.nan_on_unconverged)
    if mode == "vjp":
        return _make_solve_qp_vjp(*key)(qp)
    elif mode == "jvp":
        return _make_solve_qp_jvp(*key)(qp)
    raise ValueError(f"mode must be 'vjp' or 'jvp', got {mode!r}")


# ---------------------------------------------------------------------------
# Conic
# ---------------------------------------------------------------------------

from .ir import ConeProgram, ConeSolution, ConeTangent  # noqa: E402
from . import conic_diff  # noqa: E402
from .solvers import conic as conicsolver  # noqa: E402
from .solvers import conic_ipm  # noqa: E402


def _conic_solver_fn(solver, cones, max_iters, tol, alpha):
    """Resolve the forward-pass solver. ``auto`` picks the NT-scaled interior
    point method for symmetric-cone programs (~20 Newton steps), the
    nonsymmetric-cone PDIPM for programs with exp/pow blocks (~30-80 Newton
    steps, ``solvers/conic_nsipm.py``), and the DR splitting only for
    equality-only programs or by explicit request. ``max_iters=None``
    resolves to each solver's own config default (no magic-value sentinel:
    an explicit ``max_iters`` is always honored by whichever solver runs)."""
    from .solvers import conic_nsipm

    nonzero = any(k != "zero" for k, _, _ in cones.blocks)
    if solver == "auto":
        if conic_ipm.supports(cones) and nonzero:
            solver = "ipm"
        elif conic_nsipm.supports(cones) and nonzero:
            solver = "nsipm"
        else:
            solver = "dr"
    if solver == "ipm":
        return lambda cp: conic_ipm.solve(cp, max_iters=max_iters, tol=tol)
    if solver == "nsipm":
        return lambda cp: conic_nsipm.solve(cp, max_iters=max_iters, tol=tol)
    if solver == "dr":
        return lambda cp: conicsolver.solve(
            cp, max_iters=max_iters, tol=tol, alpha=alpha
        )
    raise ValueError(
        f"solver must be 'auto', 'ipm', 'nsipm' or 'dr', got {solver!r}"
    )


@lru_cache(maxsize=None)
def _make_solve_conic_vjp(
    max_iters, tol, alpha, method, refine_iters, solver, polish, with_info, poison
):
    @jax.custom_vjp
    def _solve(cp: ConeProgram):
        sol, info = _conic_solver_fn(solver, cp.cones, max_iters, tol, alpha)(cp)
        if polish:
            sol = conic_diff.refine_solution(cp, sol, steps=polish, method=method)
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    def _fwd(cp):
        out = _solve(cp)
        sol = out[0] if with_info else out
        return out, (cp, sol)

    def _bwd(res, cot):
        cp, sol = res
        cot_sol = cot[0] if with_info else cot
        grads = conic_diff.reverse_differentiate(
            cp, sol, cot_sol.x, cot_sol.y, cot_sol.s,
            method=method, refine_iters=refine_iters,
        )
        return (ConeProgram(A=grads.dA, b=grads.db, c=grads.dc, cones=cp.cones),)

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_conic_jvp(
    max_iters, tol, alpha, method, refine_iters, solver, polish, with_info, poison
):
    @jax.custom_jvp
    def _solve(cp: ConeProgram):
        sol, info = _conic_solver_fn(solver, cp.cones, max_iters, tol, alpha)(cp)
        if polish:
            sol = conic_diff.refine_solution(cp, sol, steps=polish, method=method)
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    @_solve.defjvp
    def _jvp(primals, tangents):
        (cp,) = primals
        (dcp,) = tangents
        out = _solve(cp)
        sol = out[0] if with_info else out
        fwd = conic_diff.forward_differentiate(
            cp,
            sol,
            ConeTangent(dA=dcp.A, db=dcp.b, dc=dcp.c),
            method=method,
            refine_iters=refine_iters,
        )
        dsol = ConeSolution(x=fwd.dx, y=fwd.dy, s=fwd.ds)
        if with_info:
            return out, (dsol, _zero_info_tangent(out[1]))
        return out, dsol

    return _solve


def solve_conic(
    cp: ConeProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    alpha: float | None = None,
    method: str | None = None,
    refine_iters: int | None = None,
    mode: str = "vjp",
    solver: str = "auto",
    polish: int | None = None,
    with_info: bool = False,
):
    """Solve a cone program differentiably (implicit diff of the homogeneous
    self-dual embedding at the solution). ``solver='auto'`` uses the NT-scaled
    interior-point method (``solvers/conic_ipm.py``) for symmetric-cone
    programs (zero/nonneg/nonpos/soc/rsoc/psd), the nonsymmetric-cone PDIPM
    (``solvers/conic_nsipm.py``) for programs with exp/pow/dual_exp/dual_pow
    blocks, and DR splitting (``solvers/conic.py``) for equality-only
    programs; pass ``'dr'`` / ``'ipm'`` / ``'nsipm'`` to force one.
    ``polish`` Newton-refines the solved point against the HSDE residual map
    before differentiating (:func:`conic_diff.refine_solution` — recovers
    ~1e-6 conic gradients from f32 solves; default per dtype from config).
    ``max_iters``/``tol``/``alpha``/``method`` default from the active config
    (per-solver, dtype-aware).

    ``with_info=True`` returns ``(sol, info)`` with the solver's
    ``ConicSolveInfo`` (residuals, gap, ``converged``) as a
    non-differentiable aux output — differentiating an unconverged conic
    solve yields garbage, and the reference refuses it outright
    (``moi_wrapper.jl:550-556``); with ``config.nan_on_unconverged`` the
    unconverged instances are NaN-poisoned instead."""
    from .solvers import conic_nsipm

    cfg = get_config()
    if method is None:
        method = cfg.conic_method
    if refine_iters is None:
        refine_iters = cfg.conic_refine(cp.A.dtype)
    if polish is None:
        polish = cfg.conic_polish_steps(cp.A.dtype)
    if solver == "auto":
        nonzero = any(k != "zero" for k, _, _ in cp.cones.blocks)
        if conic_ipm.supports(cp.cones) and nonzero:
            solver = "ipm"
        elif conic_nsipm.supports(cp.cones) and nonzero:
            solver = "nsipm"
        else:
            solver = "dr"
    key = (max_iters, tol, alpha, method, refine_iters, solver, polish,
           with_info, cfg.nan_on_unconverged)
    if mode == "vjp":
        return _make_solve_conic_vjp(*key)(cp)
    elif mode == "jvp":
        return _make_solve_conic_jvp(*key)(cp)
    raise ValueError(f"mode must be 'vjp' or 'jvp', got {mode!r}")


# ---------------------------------------------------------------------------
# NLP
# ---------------------------------------------------------------------------

from . import nlp_diff  # noqa: E402
from .nlp_diff import NLPProblem, NLPSolution  # noqa: E402
from .solvers import nlp as nlpsolver  # noqa: E402


@lru_cache(maxsize=None)
def _make_solve_nlp_vjp(nlp: NLPProblem, max_iters, tol, with_x0, with_info, poison):
    """custom_vjp wrapper over the embedded NLP IPM + the sIpopt reverse
    rule — the AD-composable analogue of ``_make_solve_qp_vjp`` for the NLP
    backend (the reference reaches its NLP backend through the exact same
    verbs/parameter layer as QP/conic:
    ``NonLinearProgram.jl:502-582``, ``parameters.jl:283-301``)."""

    def _raw(p, *x0):
        sol, info = nlpsolver.solve(
            nlp, p, x0[0] if with_x0 else None, max_iters=max_iters, tol=tol
        )
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    _solve = jax.custom_vjp(_raw)

    def _fwd(p, *x0):
        out = _raw(p, *x0)
        sol = out[0] if with_info else out
        return out, (p, sol) + tuple(x0)

    def _bwd(res, cot):
        p, sol = res[0], res[1]
        cot_sol = cot[0] if with_info else cot
        dp = nlp_diff.reverse_differentiate(
            nlp, sol, p, dx=cot_sol.x, dy=cot_sol.y, dzL=cot_sol.zL,
            dzU=cot_sol.zU,
        )
        if with_x0:
            # the solution map does not depend on the start point (a local
            # optimum is an attractor): zero cotangent for the warm start
            return dp, jnp.zeros_like(res[2])
        return (dp,)

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_nlp_jvp(nlp: NLPProblem, max_iters, tol, with_x0, with_info, poison):
    def _raw(p, *x0):
        sol, info = nlpsolver.solve(
            nlp, p, x0[0] if with_x0 else None, max_iters=max_iters, tol=tol
        )
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    _solve = jax.custom_jvp(_raw)

    @_solve.defjvp
    def _jvp(primals, tangents):
        p, *x0 = primals
        dp = tangents[0]
        out = _raw(p, *x0)
        sol = out[0] if with_info else out
        fwd = nlp_diff.forward_differentiate(nlp, sol, p, dp)
        dsol = NLPSolution(x=fwd.dx, y=fwd.dy, zL=fwd.dzL, zU=fwd.dzU)
        if with_info:
            return out, (dsol, _zero_info_tangent(out[1]))
        return out, dsol

    return _solve


def solve_nlp(
    nlp: NLPProblem,
    p: Array,
    x0: Optional[Array] = None,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    mode: str = "vjp",
    with_info: bool = False,
):
    """Solve a parameterized NLP and make the full primal-dual solution
    differentiable w.r.t. ``p`` (implicit sIpopt sensitivity at the local
    optimum, :mod:`diffopt_tpu.nlp_diff`) — so an NLP layer drops into
    ``jax.grad``/``jax.jacfwd``/Optax exactly like ``solve_qp``/``solve_conic``.

    ``x0`` (optional warm start) is treated as non-differentiable: the
    solution map of a local optimum does not depend on the start point.
    ``mode='vjp'`` for reverse-mode, ``'jvp'`` for forward-mode transforms.

    ``with_info=True`` returns ``(sol, info)`` with the IPM's
    ``NLPSolveInfo`` as a non-differentiable aux output; with
    ``config.nan_on_unconverged`` unconverged solves NaN-poison the solution
    (and hence any gradient) instead of silently returning a wrong one —
    the reference's LOCALLY_SOLVED status check (``moi_wrapper.jl:659-670``).
    """
    with_x0 = x0 is not None
    key = (nlp, max_iters, tol, with_x0, with_info,
           get_config().nan_on_unconverged)
    if mode == "vjp":
        fn = _make_solve_nlp_vjp(*key)
    elif mode == "jvp":
        fn = _make_solve_nlp_jvp(*key)
    else:
        raise ValueError(f"mode must be 'vjp' or 'jvp', got {mode!r}")
    if with_x0:
        return fn(p, jax.lax.stop_gradient(x0))
    return fn(p)


# ---------------------------------------------------------------------------
# Batched entry with the fused Pallas PDIP solver
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_solve_qp_batched_vjp(max_iters, method, refine_iters, polish, with_info, poison):
    from .ops.pallas.pdip import solve_batched_fused

    @jax.custom_vjp
    def _solve(qp: QuadProgram):
        out = solve_batched_fused(
            qp, max_iters=max_iters, return_iters=with_info
        )
        sol, iters = out if with_info else (out, None)
        if polish:
            # active-set polish (ops/kkt.py): removes the f32 sqrt(eps)
            # complementarity floor from the KKT point, which otherwise
            # dominates gradient error on near-degenerate instances
            sol = jax.vmap(lambda q, s: kkt.qp_polish(q, s))(qp, sol)
        if with_info or poison:
            # residual diagnostics are post-hoc KKT metrics; the kernel
            # exports its own per-lane iteration counts
            info = qpsolver.kkt_metrics(qp, sol)
            if iters is not None:
                info = info._replace(
                    iterations=jnp.broadcast_to(iters, info.converged.shape)
                )
            if poison:
                sol = _poison_unconverged(sol, info.converged)
            if with_info:
                return sol, info
        return sol

    def _fwd(qp):
        out = _solve(qp)
        sol = out[0] if with_info else out
        return out, (qp, sol)

    def _bwd(res, cot):
        qp, sol = res
        cot_sol = cot[0] if with_info else cot
        grads, _ = jax.vmap(
            lambda q, s, cz, cl, cn: kkt.qp_reverse(
                q, s, cz, cl, cn, method=method, refine_iters=refine_iters
            )
        )(qp, sol, cot_sol.z, cot_sol.lam, cot_sol.nu)
        return (
            QuadProgram(
                Q=grads.dQ, q=grads.dq, A=grads.dA, b=grads.db, G=grads.dG, h=grads.dh
            ),
        )

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_conic_batched_vjp(
    max_iters, tol, method, refine_iters, polish, with_info, poison
):
    from .solvers.conic_ipm import solve_batched_fused

    @jax.custom_vjp
    def _solve(cp: ConeProgram):
        sol, info = solve_batched_fused(cp, max_iters=max_iters, tol=tol)
        if polish:
            # refine_solution is unbatched (exp/pow projection scans index
            # leading axes); the symmetric-cone blocks merely tolerated the
            # batched call via broadcasting — vmap is the correct route
            sol = jax.vmap(
                lambda A, b, c, s: conic_diff.refine_solution(
                    ConeProgram(A=A, b=b, c=c, cones=cp.cones),
                    s, steps=polish, method="gram",
                )
            )(cp.A, cp.b, cp.c, sol)
        if poison:
            sol = _poison_unconverged(sol, info.converged)
        return (sol, info) if with_info else sol

    def _fwd(cp):
        out = _solve(cp)
        sol = out[0] if with_info else out
        return out, (cp, sol)

    def _bwd(res, cot):
        cp, sol = res
        cot_sol = cot[0] if with_info else cot
        grads = jax.vmap(
            lambda A, b, c, s, cx, cy, cs: conic_diff.reverse_differentiate(
                ConeProgram(A=A, b=b, c=c, cones=cp.cones),
                s, cx, cy, cs, method=method, refine_iters=refine_iters,
            )
        )(cp.A, cp.b, cp.c, sol, cot_sol.x, cot_sol.y, cot_sol.s)
        return (ConeProgram(A=grads.dA, b=grads.db, c=grads.dc, cones=cp.cones),)

    _solve.defvjp(_fwd, _bwd)
    return _solve


def solve_conic_batched(
    cp: ConeProgram,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    method: str = "gram",
    refine_iters: int = 2,
    polish: int | None = None,
    with_info: bool = False,
):
    """Solve a leading-dim batch of symmetric-cone programs with the fused
    single-kernel IPM (``ops/pallas/conic_pdip.py``), Newton-polish the
    solved points against the HSDE residual (dtype-aware default), and
    differentiate through the homogeneous-embedding residual at the
    solutions. The highest-throughput conic entry point (BASELINE config 3);
    falls back to the vmapped XLA IPM for unsupported layouts.
    ``with_info=True`` returns ``(sol, info)`` with per-instance convergence
    diagnostics as a non-differentiable aux output."""
    if polish is None:
        polish = get_config().conic_polish_steps(cp.A.dtype)
    return _make_solve_conic_batched_vjp(
        max_iters, tol, method, refine_iters, polish, with_info,
        get_config().nan_on_unconverged,
    )(cp)


def solve_qp_batched(
    qp: QuadProgram,
    *,
    max_iters: int = 25,
    method: str = "ldl",
    refine_iters: int = 2,
    polish: bool = True,
    with_info: bool = False,
):
    """Solve a leading-dim batch of QPs with the fused single-kernel PDIP
    (``ops/pallas/pdip.py``), active-set polish the KKT points, and
    differentiate through the Pallas LDL' KKT path. The highest-throughput
    entry point (BASELINE config 2). ``with_info=True`` returns
    ``(sol, info)`` with post-hoc KKT residual diagnostics
    (:func:`~diffopt_tpu.solvers.qp.kkt_metrics`) as a non-differentiable
    aux output."""
    return _make_solve_qp_batched_vjp(
        max_iters, method, refine_iters, polish, with_info,
        get_config().nan_on_unconverged,
    )(qp)
