"""Named-parameter front end — the reference's POI layer as function
composition.

The reference needs 585 lines (``/root/reference/src/parameters.jl``) to chain
per-parameter perturbations through MOI constraint functions, including
special product rules for parameter-times-variable and parameter-times-
parameter terms (``parameters.jl:147-203,390-441``). In JAX the entire layer
collapses: the user writes ``build(theta) -> QuadProgram/ConeProgram`` (or,
for NLPs, ``build(theta) -> p``) in plain jnp (bilinear ``theta*x``
coefficient terms and quadratic ``theta^2`` constants included), and the
chain rule through ``build`` composes with the solution-map rules
automatically under ``jax.jvp``/``jax.grad``.

This module packages that pattern with the reference's verb names:

    layer = ParametricProgram(build, kind="qp")
    sol   = layer.solve(theta)                       # differentiable
    dsol  = layer.forward_differentiate(theta, dtheta)
    dtheta = layer.reverse_differentiate(theta, dz=...)

NLP programs (the reference reaches its NLP backend through the same POI
layer, ``parameters.jl:283-301`` + ``NonLinearProgram.jl:502-582``)::

    layer = ParametricProgram(build, kind="nlp", nlp=my_nlp_problem)
    sol   = layer.solve(theta)                       # NLPSolution, differentiable
    dth   = layer.reverse_differentiate(theta, dx=...)

where ``build(theta)`` returns the NLP parameter vector ``p`` and
``my_nlp_problem`` is the static :class:`~diffopt_tpu.nlp_diff.NLPProblem`.

Citations for behavior parity: README example semantics (``README.md:36-99``,
``pc*x >= 3p`` with dx/dp = 3/pc and dx/dpc = -3p/pc^2), quadratic-parameter
RHS cross-derivatives (``test/parameters.jl:317-444``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .ir import ConeProgram, ConeSolution, QPSolution, QuadProgram
from .nlp_diff import NLPProblem, NLPSolution
from .solve import solve_conic, solve_nlp, solve_qp

Array = jax.Array


class ParametricProgram:
    """A program whose data is an arbitrary traced function of parameters.

    ``build(theta)`` must return a :class:`QuadProgram` (``kind='qp'``), a
    :class:`ConeProgram` (``kind='conic'``), or the NLP parameter vector ``p``
    (``kind='nlp'``, which additionally needs the static ``nlp=``
    :class:`NLPProblem`). ``theta`` may be any pytree.
    """

    def __init__(
        self,
        build: Callable,
        kind: str = "qp",
        nlp: Optional[NLPProblem] = None,
        **solve_options,
    ):
        if kind not in ("qp", "conic", "nlp"):
            raise ValueError("kind must be 'qp', 'conic' or 'nlp'")
        if kind == "nlp" and nlp is None:
            raise ValueError("kind='nlp' needs the static nlp=NLPProblem(...)")
        if kind != "nlp" and nlp is not None:
            raise ValueError(f"nlp= is only meaningful with kind='nlp'")
        self.build = build
        self.kind = kind
        self.nlp = nlp
        self.solve_options = dict(solve_options)

    def _solve(self, theta, mode: str):
        prog = self.build(theta)
        if self.kind == "qp":
            return solve_qp(prog, mode=mode, **self.solve_options)
        if self.kind == "conic":
            return solve_conic(prog, mode=mode, **self.solve_options)
        return solve_nlp(self.nlp, prog, mode=mode, **self.solve_options)

    def solve(self, theta):
        """Differentiable solve (reverse-mode ready; use under jax.grad)."""
        return self._solve(theta, "vjp")

    def forward_differentiate(self, theta, dtheta):
        """JVP: tangent of the full primal-dual solution along dtheta
        (reference ``forward_differentiate!(::POI.Optimizer)``,
        ``parameters.jl:283-301``)."""
        _, dsol = jax.jvp(lambda t: self._solve(t, "jvp"), (theta,), (dtheta,))
        return dsol

    def reverse_differentiate(self, theta, **seeds):
        """VJP: parameter cotangents for solution seeds (reference
        ``reverse_differentiate!(::POI.Optimizer)``, ``parameters.jl:511-534``).

        Seeds are given per solution field, e.g. ``dz=...`` (and optionally
        ``dlam=``/``dnu=`` for QP, ``dx=``/``dy=``/``ds=`` for conic,
        ``dx=``/``dy=``/``dzL=``/``dzU=`` for NLP).
        """
        sol, vjp_fn = jax.vjp(lambda t: self._solve(t, "vjp"), theta)
        if self.kind == "qp":
            cot = QPSolution(
                z=seeds.get("dz", jnp.zeros_like(sol.z)),
                lam=seeds.get("dlam", jnp.zeros_like(sol.lam)),
                nu=seeds.get("dnu", jnp.zeros_like(sol.nu)),
            )
        elif self.kind == "conic":
            cot = ConeSolution(
                x=seeds.get("dx", jnp.zeros_like(sol.x)),
                y=seeds.get("dy", jnp.zeros_like(sol.y)),
                s=seeds.get("ds", jnp.zeros_like(sol.s)),
            )
        else:
            cot = NLPSolution(
                x=seeds.get("dx", jnp.zeros_like(sol.x)),
                y=seeds.get("dy", jnp.zeros_like(sol.y)),
                zL=seeds.get("dzL", jnp.zeros_like(sol.zL)),
                zU=seeds.get("dzU", jnp.zeros_like(sol.zU)),
            )
        (dtheta,) = vjp_fn(cot)
        return dtheta
