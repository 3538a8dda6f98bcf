"""Typed configuration — the reference's scattered hard-coded tolerances as
explicit, *wired* knobs (SURVEY.md §5 flags the load-bearing constants:
``norm(RHS) <= 1e-400`` / ``1e-4`` conic zero-shortcuts ``ConicProgram.jl:
320,369``, ``tol=1e-6`` NLP dual-sign assertions ``nlp_utilities.jl:181``,
``iterative = norm(Q) ~= 0`` LP detection ``QuadraticProgram.jl:333``,
inertia step ``1e-6`` x 50 ``NonLinearProgram.jl:356-381``).

Every public solve/differentiate entry point resolves its ``None`` defaults
from the active config (:func:`get_config`), so the per-dtype tolerances live
in exactly one place. Swap the whole config with :func:`set_config` or
scoped-ly with :func:`use_config`::

    with use_config(DiffOptConfig(qp_max_iters=5)):
        sol = solve_qp(qp)          # solver capped at 5 IPM iterations

Configs are plain frozen dataclasses: derive variants with
``dataclasses.replace(get_config(), qp_tol_f32=1e-4)``.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiffOptConfig:
    # --- QP/KKT differentiation (qp_diff / ops/kkt) -------------------------
    # 'auto' routes LPs (||Q|| == 0) to the least-squares path like the
    # reference's `iterative = norm(Q) ~= 0` (QuadraticProgram.jl:333-335)
    kkt_method: str = "auto"  # 'auto' | 'lu' | 'lstsq' | 'qr' | 'ldl'
    kkt_refine_iters: int = 0
    ldl_lam_floor_f64: float = 1e-12
    ldl_lam_floor_f32: float = 1e-6
    ldl_reg_f64: float = 1e-11
    ldl_reg_f32: float = 1e-6

    # --- embedded QP interior-point solver ----------------------------------
    qp_max_iters: int = 50
    qp_tol_f64: float = 1e-9
    qp_tol_f32: float = 5e-6  # complementarity floors at ~sqrt(eps_f32)
    qp_reg_f64: float = 1e-11
    qp_reg_f32: float = 1e-7

    # --- embedded conic solvers ---------------------------------------------
    # NT-scaled IPM (symmetric cones: zero/nonneg/nonpos/soc/rsoc/psd)
    ipm_max_iters: int = 50
    ipm_tol_f64: float = 1e-9
    ipm_tol_f32: float = 5e-6
    ipm_reg_f64: float = 1e-11
    ipm_reg_f32: float = 1e-7
    # nonsymmetric-cone PDIPM (exp/pow/dual_exp/dual_pow + symmetric mix):
    # dual-scaling steps are shorter than NT steps, so the cap is higher;
    # the f64 tolerance is looser than the NT IPM's because the dual-scaling
    # Hessian conditions like 1/mu^2 (vs 1/mu for NT scalings) — the last
    # decade of gap costs ~10x the iterations, and the HSDE Newton polish
    # recovers solution accuracy post-hoc where it matters
    nsipm_max_iters: int = 150
    nsipm_tol_f64: float = 1e-8
    nsipm_tol_f32: float = 5e-6
    # DR/ADMM splitting (general cones: + exp/pow)
    dr_max_iters: int = 20000
    dr_tol_f64: float = 1e-10
    dr_tol_f32: float = 3e-6  # a 1e-10 target can never converge in f32
    dr_relaxation: float = 1.5

    # --- conic differentiation ----------------------------------------------
    # 'auto' = size-aware: dense 'lstsq' below conic_lsqr_threshold, the
    # matrix-free 'lsqr' above it (materializing M for a side-30 SDP builds
    # (tri, tri) dense DPi blocks per instance — conic_diff.resolve_method)
    conic_method: str = "auto"  # 'auto' | 'lstsq' | 'lu' | 'qr' | 'gram' | 'lsqr'
    conic_lsqr_threshold: int = 500  # dim(M) = n + m + 1 above which 'auto' -> 'lsqr'
    # LSQR runs to its relative-arnorm tolerance and exits early; the cap
    # just bounds the while_loop (side-32 SDP converges at ~250 iterations)
    conic_lsqr_iters: int = 1000
    conic_refine_iters: int = 0
    # f32 M-solves refine by default: with residual_dtype accumulation the
    # two passes take the lstsq/gram forward error from ~cond^2 * eps_f32
    # down to ~the f32 storage epsilon (the last factor between 1e-5 and
    # 1e-6 conic gradients; f64 solves already sit at ~1e-9 unrefined)
    conic_refine_iters_f32: int = 2
    # Newton polish of the solved point against the HSDE residual map
    # (conic_diff.refine_solution): removes the f32 complementarity floor
    # from conic gradients the way qp_polish does for QPs. f64 solves already
    # sit at ~1e-9 so polish is off there by default.
    conic_polish_steps_f64: int = 0
    conic_polish_steps_f32: int = 2

    # --- solve-status semantics ----------------------------------------------
    # NaN-poison the solution (and hence anything differentiated through it)
    # of non-converged instances in the solve_* AD entry points: the jit-safe
    # analogue of the reference's refusal to differentiate non-OPTIMAL solves
    # (moi_wrapper.jl:550-556,659-670). Off by default (degenerate-but-usable
    # boundary solves would otherwise poison training loops); pair with
    # solve_*(..., with_info=True) to inspect instead.
    nan_on_unconverged: bool = False

    # --- embedded NLP interior-point solver ---------------------------------
    nlp_max_iters: int = 100
    nlp_tol: float = 1e-9

    # --- NLP sensitivity -----------------------------------------------------
    # reference: st=1e-6, max 50 corrections (NonLinearProgram.jl:356-381)
    inertia_shift: float = 1e-6
    inertia_max_corrections: int = 50
    # reference: dual-sign assertion tolerance (nlp_utilities.jl:181)
    dual_sign_tol: float = 1e-6

    # ------------------------------------------------------------------------
    def qp_tol(self, dtype) -> float:
        return self.qp_tol_f64 if dtype == jnp.float64 else self.qp_tol_f32

    def qp_reg(self, dtype) -> float:
        return self.qp_reg_f64 if dtype == jnp.float64 else self.qp_reg_f32

    def ipm_tol(self, dtype) -> float:
        return self.ipm_tol_f64 if dtype == jnp.float64 else self.ipm_tol_f32

    def ipm_reg(self, dtype) -> float:
        return self.ipm_reg_f64 if dtype == jnp.float64 else self.ipm_reg_f32

    def nsipm_tol(self, dtype) -> float:
        return (
            self.nsipm_tol_f64 if dtype == jnp.float64 else self.nsipm_tol_f32
        )

    def dr_tol(self, dtype) -> float:
        return self.dr_tol_f64 if dtype == jnp.float64 else self.dr_tol_f32

    def conic_refine(self, dtype) -> int:
        return (
            self.conic_refine_iters
            if dtype == jnp.float64
            else max(self.conic_refine_iters, self.conic_refine_iters_f32)
        )

    def conic_polish_steps(self, dtype) -> int:
        return (
            self.conic_polish_steps_f64
            if dtype == jnp.float64
            else self.conic_polish_steps_f32
        )


DEFAULT_CONFIG = DiffOptConfig()

_active_config: DiffOptConfig = DEFAULT_CONFIG


def get_config() -> DiffOptConfig:
    """The config whose values resolve ``None`` defaults at trace time."""
    return _active_config


def set_config(cfg: DiffOptConfig) -> None:
    """Install ``cfg`` globally (the reference's optimizer-attribute knobs,
    e.g. ``QuadraticProgram.LinearAlgebraSolver``, ``moi_wrapper.jl:475-502``,
    become process-level configuration here)."""
    global _active_config
    if not isinstance(cfg, DiffOptConfig):
        raise TypeError(f"expected DiffOptConfig, got {type(cfg)!r}")
    _active_config = cfg


@contextlib.contextmanager
def use_config(cfg: DiffOptConfig):
    """Scoped :func:`set_config` (restores the previous config on exit)."""
    global _active_config
    prev = _active_config
    set_config(cfg)
    try:
        yield cfg
    finally:
        _active_config = prev
