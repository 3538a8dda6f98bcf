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

Array = jax.Array


@lru_cache(maxsize=None)
def _make_solve_qp_vjp(max_iters, tol, reg, method, refine_iters):
    @jax.custom_vjp
    def _solve(qp: QuadProgram) -> QPSolution:
        sol, _ = qpsolver.solve(qp, max_iters=max_iters, tol=tol, reg=reg)
        return sol

    def _fwd(qp):
        sol = _solve(qp)
        return sol, (qp, sol)

    def _bwd(res, cot: QPSolution):
        qp, sol = res
        grads, _ = kkt.qp_reverse(
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
        d = kkt.qp_forward(qp, sol, dtan, method=method, refine_iters=refine_iters)
        return sol, QPSolution(z=d.dz, lam=d.dlam, nu=d.dnu)

    return _solve


def solve_qp(
    qp: QuadProgram,
    *,
    max_iters: int = 50,
    tol: float | None = None,
    reg: float | None = None,
    method: str = "lu",
    refine_iters: int = 0,
    mode: str = "vjp",
) -> QPSolution:
    """Solve a QP and make the solution differentiable w.r.t. the problem data.

    ``mode='vjp'`` (default) registers a custom reverse rule (use under
    ``jax.grad``); ``mode='jvp'`` registers a forward rule (use under
    ``jax.jacfwd``/``jax.jvp``). The two differ only in which AD transform
    they support — values are identical.
    """
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


_DR_DEFAULT_ITERS = 20000


def _conic_solver_fn(solver, cones, max_iters, tol, alpha):
    """Resolve the forward-pass solver. ``auto`` picks the NT-scaled interior
    point method for symmetric-cone programs (~20 Newton steps) and the DR
    splitting otherwise (exp/pow/psd blocks)."""
    if solver == "auto":
        solver = "ipm" if conic_ipm.supports(cones) else "dr"
    if solver == "ipm":
        # a DR-scaled default (20000) would just inflate the while_loop trip
        # count: substitute the IPM default, but respect an explicit request
        iters = 50 if max_iters == _DR_DEFAULT_ITERS else max_iters
        return lambda cp: conic_ipm.solve(cp, max_iters=iters, tol=tol)
    if solver == "dr":
        return lambda cp: conicsolver.solve(
            cp, max_iters=max_iters, tol=tol, alpha=alpha
        )
    raise ValueError(f"solver must be 'auto', 'ipm' or 'dr', got {solver!r}")


@lru_cache(maxsize=None)
def _make_solve_conic_vjp(max_iters, tol, alpha, method, refine_iters, solver):
    @jax.custom_vjp
    def _solve(cp: ConeProgram) -> ConeSolution:
        sol, _ = _conic_solver_fn(solver, cp.cones, max_iters, tol, alpha)(cp)
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
def _make_solve_conic_jvp(max_iters, tol, alpha, method, refine_iters, solver):
    @jax.custom_jvp
    def _solve(cp: ConeProgram) -> ConeSolution:
        sol, _ = _conic_solver_fn(solver, cp.cones, max_iters, tol, alpha)(cp)
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
    max_iters: int = 20000,
    tol: float = 1e-10,
    alpha: float = 1.5,
    method: str = "lstsq",
    refine_iters: int = 0,
    mode: str = "vjp",
    solver: str = "auto",
) -> ConeSolution:
    """Solve a cone program differentiably (implicit diff of the homogeneous
    self-dual embedding at the solution). ``solver='auto'`` uses the NT-scaled
    interior-point method (``solvers/conic_ipm.py``) for symmetric-cone
    programs and DR splitting (``solvers/conic.py``) otherwise; pass ``'dr'``
    / ``'ipm'`` to force one."""
    if solver == "auto" and (
        not conic_ipm.supports(cp.cones)
        or all(k == "zero" for k, _, _ in cp.cones.blocks)
    ):
        solver = "dr"
    key = (max_iters, tol, alpha, method, refine_iters, solver)
    if mode == "vjp":
        return _make_solve_conic_vjp(*key)(cp)
    elif mode == "jvp":
        return _make_solve_conic_jvp(*key)(cp)
    raise ValueError(f"mode must be 'vjp' or 'jvp', got {mode!r}")


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
def _make_solve_conic_batched_vjp(max_iters, tol, method, refine_iters):
    from .solvers.conic_ipm import solve_batched_fused

    @jax.custom_vjp
    def _solve(cp: ConeProgram) -> ConeSolution:
        sol, _ = solve_batched_fused(cp, max_iters=max_iters, tol=tol)
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
    max_iters: int = 50,
    tol: float | None = None,
    method: str = "gram",
    refine_iters: int = 2,
) -> ConeSolution:
    """Solve a leading-dim batch of symmetric-cone programs with the fused
    single-kernel IPM (``ops/pallas/conic_pdip.py``) and differentiate through
    the homogeneous-embedding residual at the solutions. The
    highest-throughput conic entry point (BASELINE config 3); falls back to
    the vmapped XLA IPM for unsupported layouts."""
    return _make_solve_conic_batched_vjp(max_iters, tol, method, refine_iters)(cp)


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
