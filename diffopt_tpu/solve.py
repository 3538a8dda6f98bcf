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


@lru_cache(maxsize=None)
def _make_solve_qp_vjp(max_iters, tol, reg, method, refine_iters):
    from . import qp_diff

    @jax.custom_vjp
    def _solve(qp: QuadProgram) -> QPSolution:
        sol, _ = qpsolver.solve(qp, max_iters=max_iters, tol=tol, reg=reg)
        return sol

    def _fwd(qp):
        sol = _solve(qp)
        return sol, (qp, sol)

    def _bwd(res, cot: QPSolution):
        qp, sol = res
        grads = qp_diff.reverse_differentiate(
            qp,
            sol,
            cot.z,
            cot.lam,
            cot.nu,
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
def _make_solve_qp_jvp(max_iters, tol, reg, method, refine_iters):
    from . import qp_diff

    @jax.custom_jvp
    def _solve(qp: QuadProgram) -> QPSolution:
        sol, _ = qpsolver.solve(qp, max_iters=max_iters, tol=tol, reg=reg)
        return sol

    @_solve.defjvp
    def _jvp(primals, tangents):
        (qp,) = primals
        (dqp,) = tangents
        sol = _solve(qp)
        dtan = QPTangent(
            dQ=dqp.Q, dq=dqp.q, dA=dqp.A, db=dqp.b, dG=dqp.G, dh=dqp.h
        )
        d = qp_diff.forward_differentiate(
            qp, sol, dtan, method=method, refine_iters=refine_iters
        )
        return sol, QPSolution(z=d.dz, lam=d.dlam, nu=d.dnu)

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
) -> QPSolution:
    """Solve a QP and make the solution differentiable w.r.t. the problem data.

    ``mode='vjp'`` (default) registers a custom reverse rule (use under
    ``jax.grad``); ``mode='jvp'`` registers a forward rule (use under
    ``jax.jacfwd``/``jax.jvp``). The two differ only in which AD transform
    they support — values are identical.

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
    key = (max_iters, tol, reg, method, refine_iters)
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
def _make_solve_conic_vjp(max_iters, tol, alpha, method, refine_iters, solver, polish):
    @jax.custom_vjp
    def _solve(cp: ConeProgram) -> ConeSolution:
        sol, _ = _conic_solver_fn(solver, cp.cones, max_iters, tol, alpha)(cp)
        if polish:
            sol = conic_diff.refine_solution(cp, sol, steps=polish, method=method)
        return sol

    def _fwd(cp):
        sol = _solve(cp)
        return sol, (cp, sol)

    def _bwd(res, cot: ConeSolution):
        cp, sol = res
        grads = conic_diff.reverse_differentiate(
            cp, sol, cot.x, cot.y, cot.s, method=method, refine_iters=refine_iters
        )
        return (ConeProgram(A=grads.dA, b=grads.db, c=grads.dc, cones=cp.cones),)

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_conic_jvp(max_iters, tol, alpha, method, refine_iters, solver, polish):
    @jax.custom_jvp
    def _solve(cp: ConeProgram) -> ConeSolution:
        sol, _ = _conic_solver_fn(solver, cp.cones, max_iters, tol, alpha)(cp)
        if polish:
            sol = conic_diff.refine_solution(cp, sol, steps=polish, method=method)
        return sol

    @_solve.defjvp
    def _jvp(primals, tangents):
        (cp,) = primals
        (dcp,) = tangents
        sol = _solve(cp)
        fwd = conic_diff.forward_differentiate(
            cp,
            sol,
            ConeTangent(dA=dcp.A, db=dcp.b, dc=dcp.c),
            method=method,
            refine_iters=refine_iters,
        )
        return sol, ConeSolution(x=fwd.dx, y=fwd.dy, s=fwd.ds)

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
) -> ConeSolution:
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
    (per-solver, dtype-aware)."""
    from .solvers import conic_nsipm

    cfg = get_config()
    if method is None:
        method = cfg.conic_method
    if refine_iters is None:
        refine_iters = cfg.conic_refine_iters
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
    key = (max_iters, tol, alpha, method, refine_iters, solver, polish)
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
def _make_solve_nlp_vjp(nlp: NLPProblem, max_iters, tol, with_x0):
    """custom_vjp wrapper over the embedded NLP IPM + the sIpopt reverse
    rule — the AD-composable analogue of ``_make_solve_qp_vjp`` for the NLP
    backend (the reference reaches its NLP backend through the exact same
    verbs/parameter layer as QP/conic:
    ``NonLinearProgram.jl:502-582``, ``parameters.jl:283-301``)."""

    def _raw(p, *x0):
        sol, _ = nlpsolver.solve(
            nlp, p, x0[0] if with_x0 else None, max_iters=max_iters, tol=tol
        )
        return sol

    _solve = jax.custom_vjp(_raw)

    def _fwd(p, *x0):
        sol = _raw(p, *x0)
        return sol, (p, sol) + tuple(x0)

    def _bwd(res, cot: NLPSolution):
        p, sol = res[0], res[1]
        dp = nlp_diff.reverse_differentiate(
            nlp, sol, p, dx=cot.x, dy=cot.y, dzL=cot.zL, dzU=cot.zU
        )
        if with_x0:
            # the solution map does not depend on the start point (a local
            # optimum is an attractor): zero cotangent for the warm start
            return dp, jnp.zeros_like(res[2])
        return (dp,)

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_nlp_jvp(nlp: NLPProblem, max_iters, tol, with_x0):
    def _raw(p, *x0):
        sol, _ = nlpsolver.solve(
            nlp, p, x0[0] if with_x0 else None, max_iters=max_iters, tol=tol
        )
        return sol

    _solve = jax.custom_jvp(_raw)

    @_solve.defjvp
    def _jvp(primals, tangents):
        p, *x0 = primals
        dp = tangents[0]
        sol = _raw(p, *x0)
        fwd = nlp_diff.forward_differentiate(nlp, sol, p, dp)
        return sol, NLPSolution(x=fwd.dx, y=fwd.dy, zL=fwd.dzL, zU=fwd.dzU)

    return _solve


def solve_nlp(
    nlp: NLPProblem,
    p: Array,
    x0: Optional[Array] = None,
    *,
    max_iters: int | None = None,
    tol: float | None = None,
    mode: str = "vjp",
) -> NLPSolution:
    """Solve a parameterized NLP and make the full primal-dual solution
    differentiable w.r.t. ``p`` (implicit sIpopt sensitivity at the local
    optimum, :mod:`diffopt_tpu.nlp_diff`) — so an NLP layer drops into
    ``jax.grad``/``jax.jacfwd``/Optax exactly like ``solve_qp``/``solve_conic``.

    ``x0`` (optional warm start) is treated as non-differentiable: the
    solution map of a local optimum does not depend on the start point.
    ``mode='vjp'`` for reverse-mode, ``'jvp'`` for forward-mode transforms.
    """
    with_x0 = x0 is not None
    key = (nlp, max_iters, tol, with_x0)
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
def _make_solve_qp_batched_vjp(max_iters, method, refine_iters, polish):
    from .ops.pallas.pdip import solve_batched_fused

    @jax.custom_vjp
    def _solve(qp: QuadProgram) -> QPSolution:
        sol = solve_batched_fused(qp, max_iters=max_iters)
        if polish:
            # active-set polish (ops/kkt.py): removes the f32 sqrt(eps)
            # complementarity floor from the KKT point, which otherwise
            # dominates gradient error on near-degenerate instances
            sol = jax.vmap(lambda q, s: kkt.qp_polish(q, s))(qp, sol)
        return sol

    def _fwd(qp):
        sol = _solve(qp)
        return sol, (qp, sol)

    def _bwd(res, cot: QPSolution):
        qp, sol = res
        grads, _ = jax.vmap(
            lambda q, s, cz, cl, cn: kkt.qp_reverse(
                q, s, cz, cl, cn, method=method, refine_iters=refine_iters
            )
        )(qp, sol, cot.z, cot.lam, cot.nu)
        return (
            QuadProgram(
                Q=grads.dQ, q=grads.dq, A=grads.dA, b=grads.db, G=grads.dG, h=grads.dh
            ),
        )

    _solve.defvjp(_fwd, _bwd)
    return _solve


@lru_cache(maxsize=None)
def _make_solve_conic_batched_vjp(max_iters, tol, method, refine_iters, polish):
    from .solvers.conic_ipm import solve_batched_fused

    @jax.custom_vjp
    def _solve(cp: ConeProgram) -> ConeSolution:
        sol, _ = solve_batched_fused(cp, max_iters=max_iters, tol=tol)
        if polish:
            sol = conic_diff.refine_solution(
                cp, sol, steps=polish, method="gram"
            )
        return sol

    def _fwd(cp):
        sol = _solve(cp)
        return sol, (cp, sol)

    def _bwd(res, cot: ConeSolution):
        cp, sol = res
        grads = jax.vmap(
            lambda A, b, c, s, cx, cy, cs: conic_diff.reverse_differentiate(
                ConeProgram(A=A, b=b, c=c, cones=cp.cones),
                s, cx, cy, cs, method=method, refine_iters=refine_iters,
            )
        )(cp.A, cp.b, cp.c, sol, cot.x, cot.y, cot.s)
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
) -> ConeSolution:
    """Solve a leading-dim batch of symmetric-cone programs with the fused
    single-kernel IPM (``ops/pallas/conic_pdip.py``), Newton-polish the
    solved points against the HSDE residual (dtype-aware default), and
    differentiate through the homogeneous-embedding residual at the
    solutions. The highest-throughput conic entry point (BASELINE config 3);
    falls back to the vmapped XLA IPM for unsupported layouts."""
    if polish is None:
        polish = get_config().conic_polish_steps(cp.A.dtype)
    return _make_solve_conic_batched_vjp(
        max_iters, tol, method, refine_iters, polish
    )(cp)


def solve_qp_batched(
    qp: QuadProgram,
    *,
    max_iters: int = 25,
    method: str = "ldl",
    refine_iters: int = 2,
    polish: bool = True,
) -> QPSolution:
    """Solve a leading-dim batch of QPs with the fused single-kernel PDIP
    (``ops/pallas/pdip.py``), active-set polish the KKT points, and
    differentiate through the Pallas LDL' KKT path. The highest-throughput
    entry point (BASELINE config 2)."""
    return _make_solve_qp_batched_vjp(max_iters, method, refine_iters, polish)(qp)
