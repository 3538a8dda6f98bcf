"""Session API: solve once, differentiate many times with cached factors.

The reference's dispatcher (``/root/reference/src/moi_wrapper.jl``) keeps a
two-level cache: the backend's ``gradient_cache`` (KKT factorization, reused
across repeated differentiations — ``QuadraticProgram.jl:182-186``) is
invalidated on any model mutation (``model.diff = nothing`` at ~20 call
sites). In a functional JAX design the compilation cache is keyed on shapes
automatically; what remains worth caching is the *numeric factorization* when
a user differentiates the same solved program repeatedly with different
seeds. :class:`QPDiffContext` does exactly that.

Also carries the reference's error/status semantics: jitted code cannot throw
data-dependently (``moi_wrapper.jl:659-670`` refuses to differentiate
non-OPTIMAL solutions), so statuses surface as flags, and the host-side
wrapper raises outside jit. ``differentiate_time_sec`` mirrors the
``DifferentiateTimeSec`` attribute (``src/diff_opt.jl:256-266``).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from .ir import QPSolution, QPTangent, QuadProgram
from .ops import kkt, linalg
from .ops.kkt import KKTSplit
from .solvers import qp as qpsolver

Array = jax.Array


class NotSolvedError(RuntimeError):
    """Raised when differentiating an unsolved/unconverged program outside
    jit (reference ``moi_wrapper.jl:659-670``)."""


class QPDiffContext:
    """Solve + differentiate session for one (possibly batched) QuadProgram.

    ``ctx = QPDiffContext(qp)`` solves and LU-factorizes the KKT Jacobian
    once; every subsequent ``forward(...)`` / ``reverse(...)`` is a pair of
    triangular solves — the reference's gradient-cache reuse
    (``test/conic_program.jl:764-774`` semantics). Create a new context after
    changing problem data (functional invalidation).
    """

    def __init__(
        self,
        qp: QuadProgram,
        sol: Optional[QPSolution] = None,
        *,
        check: bool = True,
        solver_kwargs: Optional[dict] = None,
    ):
        self.qp = qp
        t0 = time.perf_counter()
        if sol is None:
            sol, info = qpsolver.solve_batched(qp, **(solver_kwargs or {}))
            self.solve_info = info
            if check and not bool(jnp.all(info.converged)):
                raise NotSolvedError(
                    "cannot differentiate: solver did not converge "
                    f"(primal {float(jnp.max(info.primal_residual)):.2e}, "
                    f"dual {float(jnp.max(info.dual_residual)):.2e})"
                )
        else:
            self.solve_info = None
        self.sol = sol
        J = kkt.kkt_jacobian(qp, sol)
        self._lu = jax.scipy.linalg.lu_factor(J)
        self.differentiate_time_sec = float("nan")
        self._factor_time_sec = time.perf_counter() - t0

    def _timed(self, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        self.differentiate_time_sec = time.perf_counter() - t0
        return out

    def forward(self, dqp: QPTangent) -> KKTSplit:
        """JVP with the cached factorization (reference
        ``forward_differentiate!`` on a warm cache)."""

        def run():
            z, lam, nu = self.sol.z, self.sol.lam, self.sol.nu
            rhs1 = (
                jnp.einsum("...ij,...j->...i", dqp.dQ, z)
                + dqp.dq
                + jnp.einsum("...ij,...i->...j", dqp.dG, lam)
                + jnp.einsum("...ij,...i->...j", dqp.dA, nu)
            )
            rhs2 = lam * (jnp.einsum("...ij,...j->...i", dqp.dG, z) - dqp.dh)
            rhs3 = jnp.einsum("...ij,...j->...i", dqp.dA, z) - dqp.db
            rhs = jnp.concatenate([rhs1, rhs2, rhs3], axis=-1)
            d = -jax.scipy.linalg.lu_solve(self._lu, rhs[..., None])[..., 0]
            n, m = self.qp.num_vars, self.qp.num_ineq
            return KKTSplit(d[..., :n], d[..., n : n + m], d[..., n + m :])

        return self._timed(run)

    def reverse(
        self,
        dz: Array,
        dlam: Optional[Array] = None,
        dnu: Optional[Array] = None,
    ) -> QPTangent:
        """VJP with the cached factorization (transposed solves reuse the
        same LU — the reference refactorizes for the transposed system)."""

        def run():
            seed = jnp.concatenate(
                [
                    dz,
                    jnp.zeros_like(self.sol.lam) if dlam is None else dlam,
                    jnp.zeros_like(self.sol.nu) if dnu is None else dnu,
                ],
                axis=-1,
            )
            g = -jax.scipy.linalg.lu_solve(self._lu, seed[..., None], trans=1)[
                ..., 0
            ]
            n, m = self.qp.num_vars, self.qp.num_ineq
            split = KKTSplit(g[..., :n], g[..., n : n + m], g[..., n + m :])
            return kkt.qp_reverse_accumulate(self.qp, self.sol, split)

        return self._timed(run)
