"""Differentiation verbs for quadratic programs.

The user-facing equivalent of the reference's QP backend entry points
``DiffOpt.forward_differentiate!`` / ``DiffOpt.reverse_differentiate!``
(``/root/reference/src/QuadraticProgram/QuadraticProgram.jl:316-446``), recast
as pure functions over the pytree IR. Like the reference, these differentiate a
*given* primal-dual solution; :mod:`diffopt_tpu.solvers.qp` provides the
embedded solver, and :func:`diffopt_tpu.solve_qp` fuses both behind
``jax.custom_vjp``.

All functions operate on unbatched instances and are ``vmap``/``jit``
compatible; batching over instances is a transform, not an API.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ir import QPSolution, QPTangent, QuadProgram
from .ops import kkt
from .ops.kkt import KKTSplit
from .utils.precision import full_precision

Array = jax.Array


def _resolve_method(qp: QuadProgram, method: str | None) -> str:
    """Reference: ``iterative = norm(Q) ~= 0`` selects lsqr for LPs whose KKT
    matrix is singular (``QuadraticProgram.jl:333-335``). Here: 'auto' picks
    'lstsq' when Q is concretely all-zero, else 'lu'. When Q is a tracer
    (inside ``jit``/``vmap``) the decision cannot be made at trace time, so
    'auto' stays and :mod:`diffopt_tpu.ops.kkt` dispatches at runtime with a
    ``lax.cond`` on ``||Q||`` — an LP differentiated inside jit gets the
    least-squares path, never a silent LU of a singular KKT matrix."""
    if method is None:
        from .utils.config import get_config

        method = get_config().kkt_method
    if method != "auto":
        return method
    try:
        qnorm = np.linalg.norm(np.asarray(jax.core.concrete_or_error(None, qp.Q)))
        return "lstsq" if qnorm == 0.0 else "lu"
    except Exception:
        return "auto"  # runtime lax.cond dispatch (ops/kkt.py)


@full_precision
def forward_differentiate(
    qp: QuadProgram,
    sol: QPSolution,
    dqp: QPTangent,
    *,
    method: str | None = None,
    refine_iters: int = 0,
) -> KKTSplit:
    """JVP of the QP solution map: tangents (dz, dlam, dnu) for a data
    perturbation ``dqp``. AK17 eq. (6)."""
    return kkt.qp_forward(
        qp, sol, dqp, method=_resolve_method(qp, method), refine_iters=refine_iters
    )


@full_precision
def reverse_differentiate(
    qp: QuadProgram,
    sol: QPSolution,
    dz: Array,
    dlam: Optional[Array] = None,
    dnu: Optional[Array] = None,
    *,
    method: str | None = None,
    refine_iters: int = 0,
) -> QPTangent:
    """VJP of the QP solution map: data cotangents for a primal (and optional
    dual) seed. AK17 eqns (7)-(8)."""
    grads, _ = kkt.qp_reverse(
        qp,
        sol,
        dz,
        dlam,
        dnu,
        method=_resolve_method(qp, method),
        refine_iters=refine_iters,
    )
    return grads
